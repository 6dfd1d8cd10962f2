"""S8/S9: sheet-style row store — first row is the header, every other row
zips against it; writes are keyed update-else-append.

The reference reads range ``A:Z`` and zips header+rows into objects
(``googleSheetClient.ts:122-145``), padding missing trailing cells to
``''``; its ``put`` finds the row by id and updates in place, else appends
(``:198-238``). Spark-first: a sheet is a small dimension — ingest via
``createDataFrame`` (or CSV-with-header for file-backed sheets) and
broadcast it into joins; the keyed put is the same anti-join upsert the
DynamoDB sink uses.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F


def sheet_from_rows(spark: SparkSession,
                    rows: Sequence[Sequence[str]]) -> DataFrame:
    """Zip ``rows[0]`` (header) with the remaining rows.

    Mirrors getSpreadSheetElements: short rows pad with ``''``, extra cells
    beyond the header are dropped, and every value stays a string (sheets
    have no types). Header names pass through sanitize (strip whitespace),
    matching the objects bundle's key hygiene (objectsSchemas.ts:64-77).
    """
    if not rows:
        raise ValueError("sheet needs at least a header row")
    header = [str(h).strip() for h in rows[0]]
    n = len(header)
    data = [tuple((list(map(str, r)) + [""] * n)[:n]) for r in rows[1:]]
    schema = ", ".join(f"`{h}` string" for h in header)
    return spark.createDataFrame(data, schema)


def read_sheet(spark: SparkSession, path: str) -> DataFrame:
    """File-backed sheet: CSV with a header row, all columns string-typed
    (no inference — sheet semantics are untyped)."""
    return (spark.read.option("header", "true")
            .option("inferSchema", "false").csv(path))


def sheet_upsert(sheet: DataFrame, updates: DataFrame,
                 key: str) -> DataFrame:
    """S9 keyed put, batched: rows whose key exists are replaced in place,
    new keys are appended — new-version-wins anti-join union (same shape
    as the DynamoDB S6 upsert; with Delta this is one MERGE INTO)."""
    kept = sheet.join(updates.select(key), on=key, how="left_anti")
    return kept.unionByName(updates.select(sheet.columns))


def sheet_append_if_missing(sheet: DataFrame, rows: DataFrame,
                            key: str) -> DataFrame:
    """Insert-only variant: existing keys keep their current row."""
    fresh = rows.join(sheet.select(key), on=key, how="left_anti")
    return sheet.unionByName(fresh.select(sheet.columns))
