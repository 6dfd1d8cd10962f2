"""Single-pass column profiling — the data-quality monitor a pipeline
runs on every ingested table: null counts, distinct cardinality, min/max
per column, computed in ONE aggregation over one scan (never a per-column
pass; at 100 TB the scan IS the cost and this amortizes it across all
columns).

Exact ``countDistinct`` is the default so an external oracle can verify
bit-for-bit; it plans through Spark's Expand (one input row fans out per
distinct aggregate), which is the documented trade — for very wide tables
at full scale pass ``approx=True`` and the distinct counts become HLL
sketches (``approx_count_distinct``), collapsing the Expand.

The aggregated single row is brought to the driver and reshaped long —
O(#columns) values, it IS the profile (same justified-collect class as
k-means centroids in operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_NUMERIC = {"long", "integer", "short", "byte", "double", "float", "decimal"}

_SCHEMA = ("col_name string, dtype string, n_rows long, n_nulls long, "
           "n_distinct long, min_num double, max_num double, "
           "min_str string, max_str string")


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  approx: bool = False) -> DataFrame:
    """One row per profiled column: (col_name, dtype, n_rows, n_nulls,
    n_distinct, min_num, max_num, min_str, max_str). Numeric columns
    report min/max as double; string columns as strings; other types
    (timestamps, arrays, …) report cardinality/nulls only."""
    types = dict((f.name, f.dataType.typeName()) for f in df.schema.fields)
    names = sorted(columns if columns is not None else types)
    for n in names:
        if n not in types:
            raise ValueError(f"profile_table: no column {n!r}")

    nd = (F.approx_count_distinct if approx
          else lambda c: F.countDistinct(F.col(c)))
    aggs = [F.count(F.lit(1)).alias("__n")]
    for n in names:
        c = F.col(n)
        aggs += [F.count(c).alias(f"{n}__nn"), nd(n).alias(f"{n}__nd")]
        if types[n] in _NUMERIC:
            aggs += [F.min(c).cast("double").alias(f"{n}__mn"),
                     F.max(c).cast("double").alias(f"{n}__mx")]
        elif types[n] == "string":
            aggs += [F.min(c).alias(f"{n}__mns"),
                     F.max(c).alias(f"{n}__mxs")]
    row = df.agg(*aggs).first().asDict()

    def _num(key):
        v = row.get(key)
        return float(v) if v is not None else None

    out = []
    for n in names:
        out.append((
            n, types[n], row["__n"], row["__n"] - row[f"{n}__nn"],
            row[f"{n}__nd"],
            _num(f"{n}__mn"), _num(f"{n}__mx"),
            row.get(f"{n}__mns"), row.get(f"{n}__mxs"),
        ))
    return df.sparkSession.createDataFrame(out, _SCHEMA)
