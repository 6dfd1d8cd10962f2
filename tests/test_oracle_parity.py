"""Mirror of the driver's correctness gate: every query with an oracle runs
on Spark AND DuckDB; row count, sorted column names, and an order-insensitive
value hash must match.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

from tests.conftest import SF_DIR


def _canon_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat(sep=" ") if isinstance(v, dt.datetime) else v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def table_digest(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        "\x1f".join(_canon_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\x1e".join(canon_rows).encode()).hexdigest()
    return len(rows), sorted(cols), h


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    pdf = con.execute(sql).df()
    con.close()
    return cols, rows, pdf


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    d_cols, d_rows, d_pdf = duckdb_run(ORACLES[name], sf_dir)

    # The driver canonicalizes BOTH sides through pandas, where dtype
    # matters: DuckDB widens integer sum() to HUGEINT, which lands as
    # float64 and hash-mismatches Spark's int64 even when values are
    # byte-identical (the fn_json_parse r01 FAIL). An integral Spark
    # column whose DuckDB twin is float WITHOUT any NaN means the oracle
    # needs an explicit CAST(... AS BIGINT).
    integral = {f.name for f in sdf.schema.fields
                if f.dataType.typeName() in
                ("long", "integer", "short", "byte")}
    for c in d_pdf.columns:
        if c in integral and d_pdf[c].dtype.kind == "f":
            assert d_pdf[c].isna().any(), (
                f"{name}: oracle column {c!r} is HUGEINT/float in pandas "
                f"but Spark emits integer — wrap the oracle aggregate in "
                f"CAST(... AS BIGINT)")

    s_n, s_names, s_hash = table_digest(s_cols, s_rows)
    d_n, d_names, d_hash = table_digest(d_cols, d_rows)

    assert s_names == d_names, f"{name}: column names differ"
    assert s_n == d_n, f"{name}: row count {s_n} != {d_n}"
    if s_hash != d_hash:
        s_set = set("\x1f".join(map(_canon_cell, r)) for r in s_rows)
        d_set = set("\x1f".join(map(_canon_cell, r)) for r in d_rows)
        only_s = list(s_set - d_set)[:3]
        only_d = list(d_set - s_set)[:3]
        pytest.fail(f"{name}: value hash mismatch.\nspark-only: {only_s}\nduck-only: {only_d}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_every_query_runs(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_no_complex_typed_output_columns(spark, sf_dir):
    """The driver harness canonicalizes results via pandas.sort_values,
    which dies on unhashable cells (TypeError: unhashable type 'list').
    No registry query — oracled OR rows-only — may emit array/map/struct
    output columns (the agg_approx_percentiles r01 crash)."""
    bad = []
    for name, fn in QUERIES.items():
        for f in fn(spark, sf_dir).schema.fields:
            if f.dataType.typeName() in ("array", "map", "struct"):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert not bad, f"complex-typed output columns: {bad}"
