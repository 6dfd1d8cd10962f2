"""Single-pass column profiling — the data-quality monitor a pipeline
runs on every ingested table: null counts, distinct cardinality, min/max
per column, computed from ONE read of the source (never a per-column
pass; at 100 TB the scan IS the cost and this amortizes it across all
columns).

Exact ``countDistinct`` is the default so an external oracle can verify
bit-for-bit; a mixed exact-distinct/plain aggregate plans through
Spark's Expand (one input row fans out per distinct aggregate plus one
for the plain stats), so the exact path projects + materializes the
profiled columns once and aggregates those cached blocks twice (see
:func:`profile_agg` — measured 2.1x at sf0.1). For very wide tables at
full scale pass ``approx=True`` and the distinct counts become HLL
sketches (``approx_count_distinct``) in one mixed aggregate with no
Expand and no materialization.

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


def profile_agg(df: DataFrame, columns: list[str] | None = None,
                approx: bool = False) -> DataFrame:
    """The aggregation behind :func:`profile_table`, returned as a
    single wide row — exposed so plan tests can pin the invariant that
    the whole profile reads its input ONCE, no matter how many columns
    are profiled.

    Exact path (``approx=False``, r12 guide §1.2): Spark plans a MIXED
    exact-distinct/plain aggregate through Expand — every input row
    fans out once per distinct column plus once for the plain stats —
    which measured 2.1x slower at sf0.1 than aggregating twice over a
    materialized projection (the Expand interplay, not the scan, is
    the cost: distinct-only 0.75 s + plain-only 0.35 s vs 2.1 s
    mixed). The profiled columns are therefore projected and
    localCheckpoint'ed once (ONE scan of the source), and the distinct
    counts and plain stats run as two aggregates over those cached
    blocks, glued by a 1-row x 1-row join. One pass over the source is
    preserved; the materialization holds only the profiled columns.

    Approx path (``approx=True``, the 100 TB form): unchanged single
    mixed aggregate — HLL sketches need no Expand, so it is one scan
    feeding one aggregate with no materialization, which is the right
    shape when the projection is too large to pin."""
    types = dict((f.name, f.dataType.typeName()) for f in df.schema.fields)
    names = sorted(columns if columns is not None else types)
    for n in names:
        if n not in types:
            raise ValueError(f"profile_table: no column {n!r}")

    plain = [F.count(F.lit(1)).alias("__n")]
    for n in names:
        c = F.col(n)
        plain += [F.count(c).alias(f"{n}__nn")]
        if types[n] in _NUMERIC:
            plain += [F.min(c).cast("double").alias(f"{n}__mn"),
                      F.max(c).cast("double").alias(f"{n}__mx")]
        elif types[n] == "string":
            plain += [F.min(c).alias(f"{n}__mns"),
                      F.max(c).alias(f"{n}__mxs")]
    if approx or not names:
        nd = [F.approx_count_distinct(n).alias(f"{n}__nd") for n in names]
        return df.agg(*(plain + nd))
    src = df.select(*names).localCheckpoint()
    nd = [F.countDistinct(F.col(n)).alias(f"{n}__nd") for n in names]
    return src.agg(*plain).join(src.agg(*nd))


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  approx: bool = False) -> DataFrame:
    """One row per profiled column: (col_name, dtype, n_rows, n_nulls,
    n_distinct, min_num, max_num, min_str, max_str). Numeric columns
    report min/max as double; string columns as strings; other types
    (timestamps, arrays, …) report cardinality/nulls only."""
    types = dict((f.name, f.dataType.typeName()) for f in df.schema.fields)
    names = sorted(columns if columns is not None else types)
    row = profile_agg(df, names, approx).first().asDict()

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


def quantile_profile(df: DataFrame, cols: list[str],
                     probs: list[float] | None = None,
                     approx: bool = False) -> DataFrame:
    """Column quantiles in ONE aggregation over one scan: one row per
    column, one value per requested probability — the distribution
    summary a pipeline health report pins next to min/max/nulls.

    Exact by default (Spark's sort-based ``percentile``, linear
    interpolation — the same percentile_cont definition DuckDB's
    ``quantile_cont`` implements, so an external oracle verifies
    bit-for-bit after e4 quantization). Exact percentile buffers a
    value->count map per column per partition — fine for the numeric
    measure columns it's meant for; for huge-cardinality columns at full
    scale pass ``approx=True`` and each quantile becomes a fixed-memory
    ``percentile_approx`` sketch (no oracle — the sketch is
    Spark-specific).

    Values are e4-quantized longs (floor(v * 10000 + 0.5)) — integer
    end to end, hash-oracle-safe."""
    probs = probs if probs is not None else [0.25, 0.5, 0.75, 0.95, 0.99]
    parr = F.array(*[F.lit(float(p)) for p in probs])
    fn = ((lambda c: F.percentile_approx(c, parr, 10000)) if approx
          else (lambda c: F.percentile(c, parr)))
    agg = df.agg(*[fn(F.col(c)).alias(f"{c}__q") for c in cols])
    # reshape the single wide row -> one row per column WITHOUT
    # re-executing the aggregate per column (explode of literal structs)
    return (agg.select(F.explode(F.array(*[
        F.struct(
            F.lit(c).alias("col_name"),
            *[F.floor(F.element_at(F.col(f"{c}__q"), i + 1) * 10000
                      + F.lit(0.5)).cast("long")
              .alias(f"p{int(p * 1000)}_e4")
              for i, p in enumerate(probs)])
        for c in cols])).alias("r"))
        .select("r.*"))


def quantile_profile_grouped(df: DataFrame, group_col: str, col: str,
                             probs: list[float] | None = None,
                             approx: bool = False) -> DataFrame:
    """Per-GROUP exact quantiles of one numeric column — the stratified
    twin of :func:`quantile_profile` (length distribution per source /
    language before mixing). One grouped aggregation over one scan; the
    same exact-vs-approx trade and e4 quantization."""
    probs = probs if probs is not None else [0.25, 0.5, 0.75, 0.95, 0.99]
    parr = F.array(*[F.lit(float(p)) for p in probs])
    fn = (F.percentile_approx(F.col(col), parr, 10000) if approx
          else F.percentile(F.col(col), parr))
    agg = df.groupBy(group_col).agg(fn.alias("_q"))
    return agg.select(
        F.col(group_col),
        *[F.floor(F.element_at("_q", i + 1) * 10000 + F.lit(0.5))
          .cast("long").alias(f"p{int(p * 1000)}_e4")
          for i, p in enumerate(probs)])


def psi_drift(ref: DataFrame, cur: DataFrame, col: str,
              lo: float, hi: float, bins: int = 10) -> DataFrame:
    """Population Stability Index between a reference snapshot's column
    distribution and the current one — the standard drift monitor a
    pipeline runs between ingest batches (PSI < 0.1 stable, 0.1-0.25
    shifting, > 0.25 drifted).

    Fixed-width bins over [lo, hi) with the edge bins absorbing
    out-of-range values, so binning is a pure projection (no quantile
    pass); each side is one scan + one tiny (``bins``-row) aggregation.
    Proportions use Laplace 0.5 smoothing so empty bins stay finite, and
    each bin's PSI term (p - q) * ln(p / q) is emitted nano-quantized —
    integer output an external SQL engine reproduces bit-for-bit (the
    same ln+floor trick the BM25 oracle uses). Sum psi_nano over the
    result for the headline PSI.

    Returns one row per bin: (bin, n_ref, n_cur, psi_nano)."""
    if not (hi > lo) or bins < 1:
        raise ValueError(f"psi_drift: need hi > lo and bins >= 1 "
                         f"(got lo={lo}, hi={hi}, bins={bins})")
    span = float(hi) - float(lo)

    def binned(df: DataFrame, out: str) -> DataFrame:
        # non-values are EXCLUDED from the distribution: greatest()/
        # least() skip NULLs, so a NULL would otherwise silently count
        # into bin 0 (and NaN would clamp into the top bin), distorting
        # the proportions PSI compares
        from pyspark.sql import types as T
        pred = F.col(col).isNotNull()
        if isinstance(df.schema[col].dataType, (T.FloatType, T.DoubleType)):
            pred = pred & ~F.isnan(F.col(col))
        b = F.least(F.lit(bins - 1), F.greatest(F.lit(0), F.floor(
            (F.col(col) - F.lit(float(lo))) / F.lit(span) * bins)))
        return (df.filter(pred)
                .select(b.cast("long").alias("bin"))
                .groupBy("bin").agg(F.count("*").alias(out)))

    all_bins = ref.sparkSession.range(bins).select(F.col("id").alias("bin"))
    r = binned(ref, "n_ref")
    c = binned(cur, "n_cur")
    joined = (all_bins.join(F.broadcast(r), "bin", "left")
              .join(F.broadcast(c), "bin", "left")
              .select("bin",
                      F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
                      F.coalesce("n_cur", F.lit(0)).alias("n_cur")))
    # totals via an unpartitioned window over the bins-row frame — an
    # aggregate-then-join-back would execute the binned(ref)/binned(cur)
    # subplans twice (once for the broadcast total, once for the output),
    # doubling both full-table scans; the single window partition holds
    # exactly `bins` rows by construction
    from pyspark.sql.window import Window as W
    wall = W.partitionBy()
    tr = F.sum("n_ref").over(wall)
    tc = F.sum("n_cur").over(wall)
    p = (F.col("n_ref") + 0.5) / (tr + 0.5 * bins)
    q = (F.col("n_cur") + 0.5) / (tc + 0.5 * bins)
    return (joined.select("bin", "n_ref", "n_cur",
                          F.floor((p - q) * F.log(p / q) * 1e9 + 0.5)
                          .cast("long").alias("psi_nano"))
            .orderBy("bin"))
