"""Dataflow operator library: the reference's visually-programmed flow
operators (map / filter / forEach — SURVEY.md §2.2 P8, §2.9 UD4) as
Arrow-vectorized Spark transforms.

Reference semantics (`packages/protolib/src/bundles/flow/contextV2/
{map.ts:6-42, filter.ts:6-43, forEach.ts:5-58}`): an async callback applied
per element of an in-memory list, with series (ordered), parallel, and
manual (callback-driven accept/reject) modes, plus an early-`stop` flag.

Spark mapping: the *list* is a DataFrame; the *callback* is a Python
function over pandas batches (Arrow transfer — the 10-100x-over-row-UDF
path), so "parallel mode" is simply partition parallelism. The series-mode
ordering guarantee is meaningless for pure element-wise callbacks (the
reference only awaits ordering, results are positional), so a vectorized
apply is semantics-preserving. `stop` maps to `limit` (bounded
consumption), not an imperative flag.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F


def flow_map(df: DataFrame, fn: Callable[[pd.DataFrame], pd.DataFrame],
             schema: str) -> DataFrame:
    """UD4 map: per-element transform as mapInPandas over Arrow batches.

    ``fn`` receives a pandas DataFrame batch and returns the mapped batch
    (columns per ``schema``). Stays off the driver entirely; one Python
    worker per partition, vectorized."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield fn(pdf)
    return df.mapInPandas(run, schema=schema)


def flow_filter(df: DataFrame,
                predicate: Callable[[pd.DataFrame], pd.Series]) -> DataFrame:
    """P8 flow filter: accept/reject callback as a vectorized boolean
    predicate over pandas batches; schema is unchanged (pure row subset,
    like the reference's filteredList.push(item)).

    A NULL/NaN predicate result REJECTS the row (SQL filter semantics,
    and the reference's accept(): only an explicit truthy accepts) —
    a bare astype(bool) would map NaN to True and keep exactly the rows
    a null predicate should drop."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mask = predicate(pdf)
            yield pdf[mask.fillna(False).astype(bool)]
    return df.mapInPandas(run, schema=df.schema)


def flow_foreach(df: DataFrame,
                 fn: Callable[[Any], None], *, parallel: bool = True) -> int:
    """UD4 forEach: side-effecting per-element callback.

    parallel=True (reference 'parallel' mode) -> foreachPartition on the
    executors. parallel=False (reference 'series' mode: strict element
    order) -> ordered driver-side iteration via toLocalIterator, one
    partition in memory at a time — inherently non-distributed, use only
    for small control-flow lists (that is also all the reference uses it
    for). Returns the number of elements visited."""
    if parallel:
        counter = df.sparkSession.sparkContext.accumulator(0)

        def run(rows: Iterator[Any]) -> None:
            n = 0
            for row in rows:
                fn(row)
                n += 1
            counter.add(n)
        df.foreachPartition(run)
        return counter.value
    n = 0
    for row in df.toLocalIterator():
        fn(row)
        n += 1
    return n


def flow_push(df: DataFrame, row: dict[str, Any]) -> DataFrame:
    """U1 append (contextV2/push.ts:5-23): ``[...list, item]`` — union a
    single-row DataFrame in the existing schema (missing keys -> null).
    Keys that are NOT schema columns raise — the reference appends the
    item verbatim, so silently dropping a misspelled field would diverge
    AND lose caller data."""
    spark = df.sparkSession
    unknown = set(row) - {f.name for f in df.schema.fields}
    if unknown:
        raise ValueError(
            f"flow_push: keys {sorted(unknown)} not in schema "
            f"{df.columns}; the reference's [...list, item] keeps every "
            "field, so dropping them silently would lose data")
    one = spark.createDataFrame(
        [tuple(row.get(f.name) for f in df.schema.fields)], df.schema)
    return df.unionByName(one)


def rewire(col: Column | str, name: str) -> Column:
    """F6 rewire (contextV2/rewire.ts:5-22): identity, renaming the wire."""
    return (F.col(col) if isinstance(col, str) else col).alias(name)
