"""Tests for the dataflow operators (flow map/filter/forEach/push/rewire),
schedules, subscription modes, and enrichment stubs."""

from __future__ import annotations

import hashlib
from datetime import datetime

import pytest

from pyspark.sql import functions as F

from servihabitat_etl_spyke_spark.operators import enrich as EN
from servihabitat_etl_spyke_spark.operators import flow as FL
from servihabitat_etl_spyke_spark.streaming import schedules as SCH
from servihabitat_etl_spyke_spark.streaming.topics import (
    changes_only, subscribe_single)


# -- flow ---------------------------------------------------------------------


def test_flow_map_and_filter(spark):
    df = spark.createDataFrame([(1, 10.0), (2, 200.0), (3, 30.0)], ["id", "v"])
    kept = FL.flow_filter(df, lambda pdf: pdf["v"] < 100)
    out = FL.flow_map(
        kept, lambda pdf: pdf.assign(v=pdf["v"] * 2), "id long, v double")
    assert sorted(map(tuple, out.collect())) == [(1, 20.0), (3, 60.0)]


def test_flow_foreach_parallel_counts(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], ["id"])
    assert FL.flow_foreach(df, lambda row: None, parallel=True) == 10


def test_flow_foreach_series_is_ordered(spark):
    df = spark.createDataFrame([(i,) for i in range(8)], ["id"]).orderBy("id")
    seen = []
    FL.flow_foreach(df, lambda row: seen.append(row["id"]), parallel=False)
    assert seen == list(range(8))


def test_flow_push_appends_with_nulls(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "name"])
    out = FL.flow_push(df, {"id": 2}).orderBy("id").collect()
    assert [tuple(r) for r in out] == [(1, "a"), (2, None)]


def test_rewire_is_identity_rename(spark):
    df = spark.createDataFrame([(5,)], ["x"])
    assert df.select(FL.rewire("x", "y")).columns == ["y"]


# -- schedules ----------------------------------------------------------------


def test_one_shot_at_parses_reference_date_shape():
    dt = SCH.one_shot_at("14:30", 1, "March", 2023)
    assert dt == datetime(2023, 3, 1, 14, 30)
    assert SCH.delay_seconds(dt, datetime(2023, 3, 1, 14, 0)) == 1800


def test_periodic_cron_expr_matches_reference_format():
    # periodicSchedule.ts: '0 ' + minutes + ' ' + hours + ' * * ' + days
    assert SCH.periodic_cron_expr(30, 9, "monday, friday") == "0 30 9 * * 1,5"


def test_next_fires_skips_to_wanted_weekday():
    # 2026-08-13 is a Thursday
    after = datetime(2026, 8, 13, 12, 0)
    fires = SCH.next_fires(0, 9, "monday", after, n=2)
    assert fires == [datetime(2026, 8, 17, 9, 0), datetime(2026, 8, 24, 9, 0)]
    assert all(f.weekday() == 0 for f in fires)


def test_next_fires_same_day_if_time_ahead():
    after = datetime(2026, 8, 13, 8, 0)  # Thursday, before 09:00
    assert SCH.next_fires(0, 9, "thursday", after, n=1) == [
        datetime(2026, 8, 13, 9, 0)]


def test_trigger_kwargs_shapes():
    assert SCH.one_shot_trigger_kwargs() == {"availableNow": True}
    assert SCH.periodic_trigger_kwargs(30) == {"processingTime": "30 seconds"}


# -- subscription modes (T10) -------------------------------------------------


def test_changes_only_emits_first_and_transitions(spark):
    rows = [("u1", 1, "a"), ("u1", 2, "a"), ("u1", 3, "b"), ("u1", 4, "b"),
            ("u1", 5, "a"), ("u2", 6, "x")]
    df = spark.createDataFrame(rows, ["user", "seq", "val"])
    out = changes_only(df, ["user"], "val", ["seq"]).orderBy("seq").collect()
    assert [r["seq"] for r in out] == [1, 3, 5, 6]


def test_subscribe_single_takes_first_match(spark):
    df = spark.createDataFrame(
        [("a/b", 2), ("a/b", 1), ("c/d", 0)], ["topic", "seq"])
    out = subscribe_single(df, "a/+", order_cols=["seq"]).collect()
    assert [(r["topic"], r["seq"]) for r in out] == [("a/b", 1)]


# -- enrichment stubs (UD5/UD6) ----------------------------------------------


def test_llm_enrich_deterministic_fake(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "world")], ["id", "prompt"])
    out = {r["id"]: r["completion"]
           for r in EN.llm_enrich(df, "prompt").collect()}
    for i, text in ((1, "hello"), (2, "world")):
        assert out[i] == "llm:" + hashlib.md5(text.encode()).hexdigest()[:12]


def test_http_enrich_batches_respect_batch_size(spark):
    df = spark.createDataFrame([(i, f"u{i}") for i in range(10)], ["id", "url"])

    # the client runs in executor workers — report batch size in the output
    def spy(batch):
        return [f"batch={len(batch)}"] * len(batch)
    out = EN.http_enrich(df.coalesce(1), "url", client=spy, batch_size=4)
    sizes = [int(r["response"].split("=")[1]) for r in out.collect()]
    assert len(sizes) == 10
    assert all(n <= 4 for n in sizes) and sum(set(sizes)) >= 4


def test_http_llm_client_is_explicit_stub(spark):
    client = EN.http_llm_client("https://example.invalid/v1", "key")
    with pytest.raises(NotImplementedError):
        client(["prompt"])


def test_to_json_keeps_null_fields_and_enrich_propagates_null(spark):
    """F4 to_json emits {"a":null} like JSON.stringify/DuckDB (Spark's
    default silently drops null fields); the enrich operators return
    NULL for a NULL prompt instead of billing a request for the literal
    text 'None'."""
    from servihabitat_etl_spyke_spark.functions.core import to_json_pretty
    from servihabitat_etl_spyke_spark.operators.enrich import llm_enrich
    df = spark.createDataFrame([(1, None), (2, "hi")],
                               "id long, t string")
    js = {r.id: r.js for r in df.select(
        "id", to_json_pretty(F.struct("t", "id")).alias("js")).collect()}
    assert js[1] == '{"t":null,"id":1}'
    out = {r.id: r.completion
           for r in llm_enrich(df, "t").collect()}
    assert out[1] is None and out[2] is not None
