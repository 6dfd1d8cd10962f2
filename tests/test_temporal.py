"""Temporal join operators (operators/temporal.py): semantic unit tests
against tiny hand-built frames plus plan-shape gates for the query forms.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row, functions as F

from servihabitat_etl_spyke_spark.operators.temporal import (asof_join,
                                                             interval_join)
from servihabitat_etl_spyke_spark.queries import QUERIES


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame([
        Row(k="a", lid=1, lts=ts("2024-01-01 10:00:00")),
        Row(k="a", lid=2, lts=ts("2024-01-01 12:00:00")),
        Row(k="b", lid=3, lts=ts("2024-01-01 10:00:00")),
    ])
    right = spark.createDataFrame([
        Row(k="a", rid=10, rts=ts("2024-01-01 09:00:00")),
        Row(k="a", rid=11, rts=ts("2024-01-01 10:00:00")),  # ties lid=1's ts
        Row(k="a", rid=12, rts=ts("2024-01-01 11:30:00")),
        Row(k="b", rid=20, rts=ts("2024-01-01 10:30:00")),  # after lid=3
    ])
    out = {r.lid: r for r in asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_cols=["rid"]).collect()}
    assert out[1].rid == 11           # ts tie counts as "at or before"
    assert out[2].rid == 12           # latest earlier, not just any earlier
    assert out[3].rid is None         # nothing at or before -> NULL match
    assert out[3].rts_asof is None


def test_asof_join_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame(
        [Row(k="a", lid=1, lts=ts("2024-01-01 12:00:00"))])
    right = spark.createDataFrame(
        [Row(k="a", rid=10, rts=ts("2024-01-01 09:00:00"))])
    with_tol = asof_join(left, right, on=["k"], left_ts="lts",
                         right_ts="rts", right_cols=["rid"],
                         tolerance_sec=3600).collect()[0]
    without = asof_join(left, right, on=["k"], left_ts="lts",
                        right_ts="rts", right_cols=["rid"]).collect()[0]
    assert without.rid == 10
    assert with_tol.rid is None       # 3h-old quote > 1h tolerance


def test_asof_join_tie_resolves_to_largest_payload(spark):
    left = spark.createDataFrame(
        [Row(k="a", lid=1, lts=ts("2024-01-01 10:00:00"))])
    right = spark.createDataFrame([
        Row(k="a", rid=10, rts=ts("2024-01-01 09:00:00")),
        Row(k="a", rid=11, rts=ts("2024-01-01 09:00:00")),
    ])
    out = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts",
                    right_cols=["rid"]).collect()[0]
    assert out.rid == 11              # deterministic: max id wins the tie


def test_interval_join_matches_naive_inequality_join(spark, sf_dir):
    """Bucketed plan == naive theta join on real event data (all users)."""
    from servihabitat_etl_spyke_spark.catalog import load_table
    ev = load_table(spark, sf_dir, "events")
    errors = (ev.filter(F.col("event_type") == "error")
              .select("user_id", F.col("event_id").alias("err_id"), "ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", F.col("event_id").alias("click_id"),
                      F.col("ts").alias("cts")))
    fast = interval_join(errors, clicks, on=["user_id"], left_ts="ts",
                         right_ts="cts", lower_sec=-600, upper_sec=0)
    naive = (errors.join(clicks, "user_id")
             .filter((F.col("cts") >= F.col("ts")
                      - F.expr("INTERVAL 600 SECONDS"))
                     & (F.col("cts") < F.col("ts"))))
    fast_pairs = {(r.err_id, r.click_id) for r in fast.collect()}
    naive_pairs = {(r.err_id, r.click_id) for r in naive.collect()}
    assert fast_pairs == naive_pairs
    assert len(fast_pairs) > 0


def test_interval_join_boundary_inclusivity(spark):
    """[lower, upper) exactly: left-closed, right-open."""
    left = spark.createDataFrame(
        [Row(k="a", lid=1, lts=ts("2024-01-01 10:00:00"))])
    right = spark.createDataFrame([
        Row(k="a", rid=1, rts=ts("2024-01-01 09:50:00")),  # == lower: in
        Row(k="a", rid=2, rts=ts("2024-01-01 10:00:00")),  # == upper: out
        Row(k="a", rid=3, rts=ts("2024-01-01 09:49:59")),  # < lower: out
        Row(k="a", rid=4, rts=ts("2024-01-01 09:59:59")),  # inside: in
    ])
    out = interval_join(left, right, on=["k"], left_ts="lts", right_ts="rts",
                        lower_sec=-600, upper_sec=0)
    assert {r.rid for r in out.collect()} == {1, 4}


def test_asof_plan_single_shuffle_no_nested_loop(spark, sf_dir):
    """The as-of query must run as window-over-union: exactly one exchange
    by user_id feeding the sort, and never a nested-loop join (the naive
    theta-join plan it replaces)."""
    df = QUERIES["asof_join_events"](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Window") >= 1


def test_interval_query_is_equi_join(spark, sf_dir):
    """Bucketing must turn the range predicate into an equi-join (hash
    join on (user_id, bin)), not a nested loop."""
    df = QUERIES["range_join_events"](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q21_compiles_to_semi_and_anti_join(spark, sf_dir):
    plan = QUERIES["q21_sole_late_supplier"](spark, sf_dir) \
        ._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_q13_left_join_keeps_zero_bucket(spark, sf_dir):
    """The zero-orders bucket must survive (condition in ON, not WHERE)."""
    rows = {r.c_count: r.custdist
            for r in QUERIES["q13_customer_distribution"](spark, sf_dir)
            .collect()}
    from servihabitat_etl_spyke_spark.catalog import load_table
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(rows.values()) == n_cust


def test_asof_forward_and_tolerance(spark):
    from datetime import datetime

    from servihabitat_etl_spyke_spark.operators.temporal import asof_join

    def ts(s):
        return datetime(2024, 1, 1, 0, 0, s)

    left = spark.createDataFrame(
        [(1, 10, ts(10)), (1, 11, ts(40)), (2, 20, ts(5))],
        "k long, lid long, lts timestamp")
    right = spark.createDataFrame(
        [(1, 100, ts(12)), (1, 101, ts(12)), (1, 102, ts(50)),
         (2, 200, ts(1))],
        "k long, rid long, rts timestamp")
    out = {r["lid"]: r["rid"] for r in asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_cols=["rid"], direction="forward").collect()}
    # nearest following; tie at ts(12) -> largest rid wins
    assert out == {10: 101, 11: 102, 20: None}
    # tolerance: ts(40) -> ts(50) gap is 10s; 5s tolerance nulls it
    tol = {r["lid"]: r["rid"] for r in asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_cols=["rid"], direction="forward",
        tolerance_sec=5).collect()}
    assert tol == {10: 101, 11: None, 20: None}


def test_interval_join_rejects_shared_columns(spark):
    """Shared non-key columns (including identical ts names) must raise a
    clear ValueError, matching the streaming twin's precondition, instead
    of an AMBIGUOUS_REFERENCE analysis error."""
    import pytest

    from servihabitat_etl_spyke_spark.operators.temporal import interval_join
    left = spark.createDataFrame([(1, 1.0)], "user_id long, ts double")
    right = spark.createDataFrame([(1, 2.0)], "user_id long, ts double")
    with pytest.raises(ValueError, match="both sides"):
        interval_join(left, right, on=["user_id"], left_ts="ts",
                      right_ts="ts", lower_sec=0, upper_sec=10)


def test_asof_join_null_ts_and_null_keys_never_match(spark):
    """Round-6 review fixes: a right row with NULL right_ts must never be
    carried into left rows (asc window order put NULLs FIRST), NULL join
    keys match nothing (equi-join convention, not window-partition
    NULL-grouping), and a right_cols/left collision raises instead of
    emitting duplicate column names."""
    import pytest
    from servihabitat_etl_spyke_spark.operators.temporal import asof_join
    left = spark.createDataFrame(
        [(1, 5), (None, 5)], "k long, t long").select(
        "k", F.timestamp_micros(F.col("t") * 1000000).alias("t"))
    right = spark.createDataFrame(
        [(1, None, "NULL-TS"), (None, 3, "NULL-KEY")],
        "k long, rts long, payload string").select(
        "k", F.timestamp_micros(F.col("rts") * 1000000).alias("rts"),
        "payload")
    out = {(r.k): r.payload for r in asof_join(
        left, right, ["k"], "t", "rts", ["payload"]).collect()}
    # both left rows come back (left-outer) and neither matched
    assert out == {1: None, None: None}

    with pytest.raises(ValueError, match="also exist on the left"):
        asof_join(left, right.withColumnRenamed("payload", "t"),
                  ["k"], "t", "rts", ["t"])
