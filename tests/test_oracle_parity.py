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
    con.close()
    return cols, rows


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    d_cols, d_rows = duckdb_run(ORACLES[name], sf_dir)

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
