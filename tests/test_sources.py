"""Source-layer tests: sheet header-zip + keyed upsert, virtual tables,
idempotent bootstrap."""

from __future__ import annotations

import pytest

from servihabitat_etl_spyke_spark.sources import (
    catalog_table, files_table, init_table, registry_table,
    sheet_from_rows, sheet_upsert,
)
from servihabitat_etl_spyke_spark.sources.sheets import (
    read_sheet, sheet_append_if_missing,
)


def test_sheet_zip_semantics(spark):
    df = sheet_from_rows(spark, [
        [" id ", "name"], ["1", "a"], ["2"], ["3", "c", "drop-me"]])
    assert df.columns == ["id", "name"]
    rows = {r.id: r.name for r in df.collect()}
    assert rows == {"1": "a", "2": "", "3": "c"}


def test_sheet_needs_header(spark):
    with pytest.raises(ValueError):
        sheet_from_rows(spark, [])


def test_sheet_csv_roundtrip(spark, tmp_path):
    p = tmp_path / "sheet.csv"
    p.write_text("id,qty\n1,10\n2,20\n")
    df = read_sheet(spark, str(p))
    # sheets are untyped: everything is a string
    assert dict(df.dtypes) == {"id": "string", "qty": "string"}
    assert df.count() == 2


def test_sheet_upsert_and_insert_only(spark):
    sheet = sheet_from_rows(spark, [["id", "v"], ["1", "a"], ["2", "b"]])
    batch = spark.createDataFrame(
        [("2", "B"), ("3", "c")], "id string, v string")
    up = {r.id: r.v for r in sheet_upsert(sheet, batch, "id").collect()}
    assert up == {"1": "a", "2": "B", "3": "c"}
    ins = {r.id: r.v
           for r in sheet_append_if_missing(sheet, batch, "id").collect()}
    assert ins == {"1": "a", "2": "b", "3": "c"}


def test_files_table(spark, tmp_path):
    (tmp_path / "a.py").write_text("x = 1\n")
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "b.py").write_text("y = 22\n")
    (tmp_path / "skip.txt").write_text("no")
    df = files_table(spark, str(tmp_path), suffixes=(".py",))
    rows = {r.relpath: r.n_bytes for r in df.collect()}
    assert rows == {"a.py": 6, "sub/b.py": 7}


def test_catalog_table(spark, sf_dir):
    df = catalog_table(spark, sf_dir, ("region", "nation", "nope"))
    rows = {r.table_name: r.n_columns for r in df.collect()}
    assert rows == {"region": 2, "nation": 3}


def test_registry_table(spark):
    df = registry_table(spark, {"m1": "idle", "m2": "running"})
    assert df.filter("state = 'running'").count() == 1


def test_init_table_idempotent(spark, tmp_path):
    path = str(tmp_path / "seeded")
    df1, seeded1 = init_table(spark, path, [(1, "a")], "id int, v string")
    df2, seeded2 = init_table(spark, path, [(9, "z"), (8, "y")],
                              "id int, v string")
    assert seeded1 is True and seeded2 is False
    assert df2.count() == 1 and df2.first().v == "a"
