"""Scale techniques as first-class operators: skew salting and bucketed
co-located joins.

These exist because at 100 TB the default plans for skewed keys and repeated
fact-fact joins are the bottleneck:

- **Salting**: a groupBy/join where one key holds a large fraction of rows
  serializes that key's work onto one task. AQE's skew-join splitting covers
  the join case at runtime; explicit salting additionally covers skewed
  *aggregations* and makes the fan-out deterministic. Two phases: partial
  aggregate on (key, salt) — spreading the hot key over `salt_n` tasks —
  then final aggregate on key. Results are exactly equal to the unsalted
  plan (oracle-checked), only the shuffle distribution changes.

- **Bucketing**: pre-partitioning both join sides into the same bucket
  layout on the join key turns every future equi-join/aggregation on that
  key into a zero-shuffle operation (asserted via plan: no Exchange). This
  is the Spark analog of the reference's persistent ordered indexes
  (`packages/protonode/src/lib/db.ts:546-582` — it pre-sorts once to avoid
  per-query sorting; we pre-shuffle once to avoid per-query shuffling).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window as W


def _reserve(df: DataFrame, name: str, op: str) -> None:
    """Fail loudly when an internal temp column would clobber a user
    column of the same name — the silent alternative is corrupted output
    (the temp value replaces the user's data and is then dropped)."""
    if name in df.columns:
        raise ValueError(
            f"{op}: input already has a column named '{name}' "
            f"(reserved as an internal temp column) — rename it first")


def with_salt(df: DataFrame, salt_n: int, from_col: str) -> DataFrame:
    """Deterministic salt in [0, salt_n): hash of a secondary column (NOT
    rand() — re-runs and retried tasks must produce identical rows)."""
    if salt_n < 1:
        raise ValueError(f"with_salt: salt_n must be >= 1, got {salt_n} "
                         "(pmod by 0 yields NULL salts and silently empty "
                         "joins)")
    _reserve(df, "_salt", "with_salt")
    return df.withColumn("_salt", F.pmod(F.hash(F.col(from_col)), F.lit(salt_n)))


def salted_group_agg(df: DataFrame, key: str, salt_from: str, salt_n: int,
                     **aggs: tuple[str, str]) -> DataFrame:
    """Skew-safe groupBy: partial agg on (key, salt), final agg on key.

    ``aggs`` maps output column -> (function, input column) with function in
    {count, sum, min, max}; each is re-associated across the two phases
    (count -> sum of partial counts, etc.). avg = sum/count downstream.
    ``("count", "*")`` counts rows (count(*)); ``("count", col)`` counts
    non-null values of col — the two differ on nullable columns."""
    partial_exprs, final_exprs = [], []
    for out, (fn, col) in aggs.items():
        p = f"_p_{out}"
        if fn == "count":
            cnt = F.count(F.lit(1)) if col == "*" else F.count(col)
            partial_exprs.append(cnt.alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"non-reassociable aggregate: {fn}")
    salted = with_salt(df, salt_n, salt_from)
    partial = salted.groupBy(key, "_salt").agg(*partial_exprs)
    return partial.groupBy(key).agg(*final_exprs)


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                salt_n: int, salt_from: str) -> DataFrame:
    """Skew-safe equi-join: salt the (large, skewed) fact side, replicate
    the dim side across all salt values (explode of a salt_n-element
    sequence — dim grows salt_n-fold, so use for small-to-medium dims when
    broadcast is too big but one fact key floods a task). Output equals the
    plain join exactly."""
    f = with_salt(fact, salt_n, salt_from)   # validates salt_n + _salt
    _reserve(dim, "_salt", "salted_join")
    d = (dim.withColumn("_salt", F.explode(
        F.sequence(F.lit(0), F.lit(salt_n - 1)))))
    out = f.join(d, [key, "_salt"]).drop("_salt")
    return out


def write_bucketed(df: DataFrame, name: str, path: str, key: str,
                   n_buckets: int = 8) -> None:
    """Persist a table bucketed (and sorted) by the join key. Subsequent
    equi-joins/groupBys on ``key`` between tables sharing this layout plan
    with ZERO Exchange (asserted in tests)."""
    (df.write.mode("overwrite")
     .bucketBy(n_buckets, key).sortBy(key)
     .option("path", path)
     .saveAsTable(name))


def global_row_numbers(df: DataFrame, order_col: str,
                       tiebreaks: list[str] | None = None,
                       out_col: str = "rn",
                       buckets: int | None = None) -> DataFrame:
    """Contiguous global row numbers 1..N in (order_col, *tiebreaks) order
    WITHOUT the single-partition global window (``row_number() OVER
    (ORDER BY ...)`` plans an Exchange SinglePartition — one task sorts
    the world, the classic 100 TB non-starter).

    Plan: approxQuantile boundaries on order_col -> explicit range bucket
    per row (a codegen'd comparison chain, no shuffle) -> per-bucket
    row_number window (ONE hash shuffle, all buckets in parallel) ->
    add broadcast per-bucket offsets. Three passes over the input (two
    narrow aggregations + the window) instead of one serialized sort.

    The result is EXACTLY row_number() over the total order regardless of
    where the approximate boundaries land: equal order_col values always
    share a bucket, so local rank + bucket offset == global rank.
    (order_col, *tiebreaks) should be a total order for a deterministic
    assignment; order_col must be numeric for approxQuantile.

    Cache note: the bucketed input stays persisted (MEMORY_AND_DISK) for
    the life of the returned plan — the offsets were counted from that
    exact materialization, and an unpersist before the caller's final
    action would re-evaluate the input and break the count/number
    consistency the pin exists for. Release it when done with
    ``spark.catalog.clearCache()`` or by discarding the session; in a
    loop over many tables, checkpoint the result and clear between
    iterations."""
    n = buckets or df.sparkSession.sparkContext.defaultParallelism
    bounds = sorted(set(df.stat.approxQuantile(
        order_col, [i / n for i in range(1, n)], 0.001)))
    bucket = None
    for b in bounds:
        term = (F.col(order_col) > F.lit(b)).cast("int")
        bucket = term if bucket is None else bucket + term
    # NULL order_col rows get a dedicated bucket BELOW all boundaries:
    # approxQuantile ignores nulls and `col > bound` is NULL for them, so
    # without this the comparison chain yields a NULL bucket and the
    # offsets join silently DROPS those rows. row_number() keeps nulls and
    # Spark's default asc ordering is NULLS FIRST — bucket -1 plus the
    # window's own null placement reproduces that exactly.
    bucket = F.when(F.col(order_col).isNull(), F.lit(-1)).otherwise(
        bucket if bucket is not None else F.lit(0))
    _reserve(df, "_b", "global_row_numbers")
    _reserve(df, "_off", "global_row_numbers")
    if out_col in df.columns:
        raise ValueError(
            f"global_row_numbers: output column {out_col!r} already exists "
            "on the input (withColumn would silently clobber it); pass a "
            "different out_col")
    # persist BEFORE the counts collect: the offsets job and the final
    # window job must see the SAME rows — an input with any
    # non-deterministic stage (sampling, rand-derived columns, a source
    # that changed between jobs) would otherwise be counted under one
    # evaluation and numbered under another, breaking contiguity
    part = df.withColumn("_b", bucket).persist()
    counts = part.groupBy("_b").count().collect()
    offsets, acc = [], 0
    for r in sorted(counts, key=lambda r: r["_b"]):
        offsets.append((r["_b"], acc))
        acc += r["count"]
    off_df = df.sparkSession.createDataFrame(offsets, "_b int, _off long")
    w = (W.partitionBy("_b")
         .orderBy(order_col, *(tiebreaks or [])))
    return (part.join(F.broadcast(off_df), "_b")
            .withColumn(out_col,
                        (F.row_number().over(w) + F.col("_off")))
            .drop("_b", "_off"))


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton/Z-order interleaved key for two non-negative int columns:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.

    Sorting/range-partitioning a table by this key clusters BOTH dimensions
    simultaneously, so per-file min/max stats stay tight on each column and
    a predicate on either dimension prunes files — the standard multi-column
    data-skipping layout (Delta/Iceberg OPTIMIZE ZORDER), built here from
    pure integer expressions (shift/mask/sum — codegen'd, zero shuffle to
    compute; one range exchange to lay out).
    """
    from functools import reduce
    ca = a.cast("long")
    cb = b.cast("long")
    terms = [
        F.shiftleft(F.shiftright(ca, i).bitwiseAND(1), i * 2)
        + F.shiftleft(F.shiftright(cb, i).bitwiseAND(1), i * 2 + 1)
        for i in range(bits)]
    return reduce(lambda x, y: x + y, terms)


def zorder_layout(df: DataFrame, col_a: str, col_b: str,
                  n_partitions: int | None = None,
                  bits: int = 16) -> DataFrame:
    """Cluster ``df`` for two-dimensional data skipping: range-partition +
    sort by the interleaved :func:`zorder_key`. Write the result with
    ``df.write`` and both columns' per-file min/max ranges shrink by
    ~sqrt(n_files) versus sorting on either column alone."""
    _reserve(df, "_zkey", "zorder_layout")
    zk = zorder_key(F.col(col_a), F.col(col_b), bits=bits).alias("_zkey")
    out = df.withColumn("_zkey", zk)
    if n_partitions:
        out = out.repartitionByRange(n_partitions, "_zkey")
    else:
        out = out.repartitionByRange("_zkey")
    return out.sortWithinPartitions("_zkey").drop("_zkey")


def compact_to_target(df: DataFrame, path: str, target_mb: int = 128,
                      fmt: str = "parquet") -> int:
    """Small-files compaction: rewrite ``df`` into files of roughly
    ``target_mb`` each (the 100 TB hygiene op that keeps scan parallelism
    aligned with ``maxPartitionBytes`` instead of drowning the driver in
    footer reads). File count comes from the Catalyst size estimate —
    driver-side metadata only, no extra pass over the data; AQE-coalesced
    plans then write one file per partition. Returns the file count."""
    est_bytes = int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    # Catalyst's sizeInBytes is an UNCOMPRESSED in-memory estimate, and a
    # plan without source statistics reports defaultSizeInBytes
    # (Long.MaxValue) or a product of child guesses — clamp so a
    # stats-free join can never request billions of partitions, and treat
    # target_mb as the in-memory slice size (on-disk snappy parquet lands
    # smaller; callers wanting exact file sizes should measure a sample)
    if est_bytes >= (1 << 60):
        # stats-free fallback: defaultParallelism, NOT df.rdd — touching
        # .rdd forces eager materialization of the upstream AQE stages
        # just to read a partition count, and the write below would then
        # re-execute the same plan (doubling a 100 TB compaction)
        n = df.sparkSession.sparkContext.defaultParallelism
    else:
        n = max(1, int((est_bytes + target_mb * 1024 * 1024 - 1)
                       // (target_mb * 1024 * 1024)))
    n = min(n, 1 << 20)
    df.repartition(n).write.mode("overwrite").format(fmt).save(path)
    return n


# -- Bloom-filter semi-join pre-filter ----------------------------------------


def _splitmix_positions(h, n_hashes: int, n_bits: int):
    """Bit positions for one hash batch: ``n_hashes`` splitmix64 mixing
    rounds of the xxhash64 keys, each yielding an index array in
    [0, n_bits). ONE shared implementation for the build and probe sides
    — their positions must stay bit-identical or the prefilter's
    no-false-negatives guarantee silently breaks."""
    import numpy as np

    x = h.copy()
    for _ in range(n_hashes):
        x = x + np.uint64(0x9E3779B97F4A7C15)
        z = x.copy()
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
        yield z % np.uint64(n_bits)


def bloom_bitmap(keys: DataFrame, key_col: str, n_bits: int = 1 << 20,
                 n_hashes: int = 3):
    """Build a Bloom bitset (numpy uint64 array, n_bits/64 words) from a
    key column: per-partition partial bitmaps OR-merged on the driver —
    the build side streams once, only ceil(n_bits/64)*8 bytes per
    partition travel. Hash family: splitmix64-style integer mixing of
    xxhash64(key), fully engine-deterministic. ``n_bits`` must be a
    multiple of 64: the probe side re-derives it as bitmap_words * 64,
    and a truncated tail would make build and probe disagree on
    positions (out-of-bounds writes or false negatives)."""
    import numpy as np
    import pandas as pd

    if n_bits % 64:
        raise ValueError(f"bloom_bitmap: n_bits={n_bits} must be a "
                         "multiple of 64")
    words = n_bits // 64

    def partial(batches):
        bm = np.zeros(words, dtype=np.uint64)
        for pdf in batches:
            h = pdf["_h"].to_numpy(dtype=np.uint64)
            for idx in _splitmix_positions(h, n_hashes, n_bits):
                np.bitwise_or.at(bm, (idx // np.uint64(64)).astype(np.int64),
                                 np.uint64(1) << (idx % np.uint64(64)))
        yield pd.DataFrame({"w": [bm.tobytes()]})

    parts = (keys.select(F.xxhash64(F.col(key_col).cast("string"))
                         .cast("long").alias("_h"))
             .mapInPandas(partial, schema="w binary").collect())
    out = np.zeros(words, dtype=np.uint64)
    for r in parts:
        out |= np.frombuffer(r["w"], dtype=np.uint64)
    return out


def bloom_prefilter(probe: DataFrame, bitmap, key_col: str,
                    n_hashes: int = 3) -> DataFrame:
    """Drop probe rows whose key is DEFINITELY absent from the bitmap
    (no false negatives — every true match survives). The 100 TB use:
    the build side is too large to broadcast as a join hash map, but its
    Bloom fits in every task closure, so the probe side thins BEFORE the
    shuffle join — shuffle volume drops by the miss rate at ~1.2 bytes/
    build-key. Vectorized membership test per Arrow batch."""
    import numpy as np
    import pandas as pd

    bm = np.asarray(bitmap, dtype=np.uint64)
    n_bits = bm.size * 64

    def keep(batches):
        for pdf in batches:
            h = pdf.pop("_h").to_numpy(dtype=np.uint64)
            ok = np.ones(len(h), dtype=bool)
            for idx in _splitmix_positions(h, n_hashes, n_bits):
                ok &= (bm[(idx // np.uint64(64)).astype(np.int64)]
                       >> (idx % np.uint64(64))) & np.uint64(1) > 0
            yield pdf[ok]

    _reserve(probe, "_h", "bloom_prefilter")
    with_h = probe.withColumn(
        "_h", F.xxhash64(F.col(key_col).cast("string")).cast("long"))
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in probe.schema.fields)
    return with_h.mapInPandas(keep, schema=schema)


def skew_report(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Key-skew diagnostic — what you inspect BEFORE choosing salting /
    AQE skew-join settings: the ``top`` hottest keys with their row
    counts, permille share of the table, and the multiple of a perfectly
    uniform key's load. One aggregation + a 1-row total broadcast; at
    100 TB this is the cheap pre-flight that tells you whether the big
    join needs `salted_join` at all."""
    counts = df.groupBy(key).agg(F.count("*").alias("n_rows"))
    stats = counts.agg(F.sum("n_rows").alias("_total"),
                       F.count("*").alias("_n_keys"))
    # decimal(38,0) intermediates: n_rows * n_keys * 100 wraps a LONG
    # right at the scales this diagnostic targets (1e10-row hot key x
    # 1e8 keys = 1e20 > 2^63), and non-ANSI Spark would return garbage
    # silently; decimal multiply/divide is exact so the floored result
    # (and the SQL oracle) are unchanged in range
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    return (counts.join(F.broadcast(stats))
            .select(F.col(key), "n_rows",
                    F.floor(dec(F.col("n_rows")) * 1000 / F.col("_total"))
                    .cast("long").alias("share_permille"),
                    F.floor(dec(F.col("n_rows")) * F.col("_n_keys") * 100
                            / F.col("_total"))
                    .cast("long").alias("x_uniform_pct"))
            .orderBy(F.col("n_rows").desc(), key)
            .limit(top))


def _mg_candidates(items: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries (k counters), emitted as the
    union of surviving candidate items. Bounded memory: each task holds at
    most ``k`` counters regardless of partition size, and the output is at
    most ``k`` rows per partition.

    Guarantee (the classical MG bound): an item whose count within a
    partition exceeds n_p/(k+1) always survives that partition's summary,
    so any item with GLOBAL count > n/(k+1) survives in at least one
    partition — the union is a guaranteed superset of the true heavy
    hitters at threshold n/(k+1)."""
    from pyspark.sql.types import StructField, StructType

    field = items.schema[col]
    out_schema = StructType([StructField("item", field.dataType, True)])

    def summarize(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            # vectorized per batch: value_counts, then MG-merge the batch
            # histogram into the running summary and decrement-prune
            vc = pdf[col].value_counts(dropna=True)
            for item, cnt in vc.items():
                counters[item] = counters.get(item, 0) + int(cnt)
            if len(counters) > k:
                # subtract the (k+1)-th largest count from everyone and
                # drop non-positives — the batched form of MG's decrement
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {i: c - cut for i, c in counters.items()
                            if c - cut > 0}
        yield pd.DataFrame({"item": list(counters.keys())})

    return items.select(col).mapInPandas(summarize, schema=out_schema)


def heavy_hitters(items: DataFrame, col: str, k: int = 50) -> DataFrame:
    """EXACT heavy hitters at threshold n/(k+1) in two bounded passes —
    the scalable replacement for a full groupBy+count when the domain is
    huge (e.g. every token of a 100 TB corpus) but only the frequent items
    matter.

    Pass 1 streams each partition once through a Misra-Gries summary of
    ``k`` counters (``_mg_candidates``) — no shuffle, O(k) memory/task,
    <= k rows out per partition. Pass 2 re-counts ONLY the candidate set
    (broadcast semi-join thins the scan before any shuffle; the groupBy
    then carries at most k x partitions distinct keys) and keeps items
    with exact count * (k+1) > n. Because the candidate union provably
    contains every such item, the result equals the exact full-histogram
    answer — SQL-oracle-checkable despite never building the histogram.

    Returns (item, cnt) ordered by cnt desc, item."""
    if k < 1:
        raise ValueError(f"heavy_hitters: k must be >= 1, got {k}")
    cands = _mg_candidates(items, col, k).distinct()
    total = items.agg(F.count(col).alias("_n"))
    exact = (items.join(F.broadcast(cands.withColumnRenamed("item", col)),
                        col, "left_semi")
             .groupBy(col).agg(F.count("*").alias("cnt")))
    return (exact.join(F.broadcast(total))
            .filter(F.col("cnt") * (k + 1) > F.col("_n"))
            .select(F.col(col).alias("item"), "cnt")
            .orderBy(F.col("cnt").desc(), "item"))


# -- count-min sketch ---------------------------------------------------------


def cms_sketch(items: DataFrame, col: str, d: int = 4,
               w: int = 512) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of an item stream
    as a d x w counter table: row r counts items at column
    md5-hash_r(item) % w. The sketch is (a) FIXED-SIZE regardless of
    domain cardinality — d*w rows out of one aggregation with map-side
    partials, the full-domain histogram shuffle never happens — and (b)
    MERGEABLE: sketches of two shards/snapshots/stream windows add
    cell-wise, so per-partition partials, per-day sketches, and
    cross-release merges all compose. Estimates overcount only (never
    under), by <= e*N/w with probability 1 - (1/2)^d.

    Deterministic md5-derived hash rows, so an external SQL oracle
    builds the bit-identical sketch. Returns (r, c, cnt) — absent cells
    are zero. NULL items are EXCLUDED (kmv_sketch's convention):
    _hash32(NULL) is NULL, and letting it through would emit d junk
    (r, NULL, cnt) cells that break cell-wise sketch merges and never
    match any probe."""
    from ..operators.dedup import _hash32
    rows = F.explode(F.array(*[
        F.struct(F.lit(r).alias("r"),
                 (_hash32(F.col(col), seed=r) % w).alias("c"))
        for r in range(d)]))
    return (items.filter(F.col(col).isNotNull())
            .select(rows.alias("_rc"))
            .select("_rc.r", "_rc.c")
            .groupBy("r", "c").agg(F.count("*").alias("cnt")))


def cms_estimate(sketch: DataFrame, probes: DataFrame, col: str = "item",
                 d: int = 4, w: int = 512) -> DataFrame:
    """Point-frequency estimates from a count-min sketch: per probe item
    the MIN over its d cells (0 when a cell is absent). The probe table
    is tiny by nature (you ask about specific items), so the d-cell
    lookup is a broadcast equi-join against the d*w-row sketch.

    Returns (item, est) — an upper bound on the true count."""
    from ..operators.dedup import _hash32
    cells = F.explode(F.array(*[
        F.struct(F.lit(r).alias("r"),
                 (_hash32(F.col(col), seed=r) % w).alias("c"))
        for r in range(d)]))
    probe_cells = (probes.select(F.col(col), cells.alias("_rc"))
                   .select(col, "_rc.r", "_rc.c"))
    return (probe_cells.join(F.broadcast(sketch), ["r", "c"], "left")
            .groupBy(col)
            .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est")))


# -- hyperloglog register table ----------------------------------------------


def hll_registers(items: DataFrame, col: str, b: int = 8) -> DataFrame:
    """HyperLogLog register TABLE (Flajolet et al. 2007): each item's
    32-bit md5 hash splits into a ``b``-bit bucket and a rank = leading-
    zero count of the remainder + 1; registers are max(rank) per bucket
    — at most 2^b rows out of one map-side-partial aggregation.

    Spark's `approx_count_distinct` gives the estimate but hides the
    sketch; the TABLE is the mergeable artifact you persist per
    shard/snapshot/day (merge = unionByName + groupBy max) so
    "distinct tokens this month" never re-reads a day. Deterministic
    md5 hashing — the oracle rebuilds registers bit-identically.

    Returns (bucket, rank). NULLs are excluded (count-DISTINCT
    semantics, same as kmv_sketch); the cast-to-string matches the
    sibling sketches so numeric key domains — HLL's usual target —
    don't fail md5's string-input analysis."""
    from ..operators.dedup import _hash32
    h = _hash32(F.col(col).cast("string"))
    rest_bits = 32 - b
    rest = F.pmod(h, F.lit(1 << rest_bits))
    # rank = leading zeros of `rest` within rest_bits, + 1; rest == 0
    # means all zeros -> rank = rest_bits + 1. The highest-set-bit
    # position comes from the BINARY-STRING length (conv base 2), which
    # is integer-exact in every engine — floor(log2(x)) is one libm ulp
    # away from flipping at exact powers of two
    hibit = F.when(rest > 0,
                   F.length(F.conv(rest, 10, 2))).otherwise(F.lit(0))
    rank = (F.lit(rest_bits) + 1 - hibit).cast("int")
    return (items.filter(F.col(col).isNotNull())
            .select(F.shiftright(h, rest_bits).alias("bucket"),
                    rank.alias("rank"))
            .groupBy("bucket").agg(F.max("rank").alias("rank")))


def hll_estimate(registers: DataFrame, b: int = 8) -> DataFrame:
    """Cardinality estimate from an HLL register table: the standard
    alpha_m * m^2 / sum(2^-M_j) harmonic form with the small-range
    linear-counting correction (empty buckets counted via the fixed
    2^b spine). 1-row output (n_buckets_used, est) with the estimate
    floored to an integer — deterministic, so even the approximation is
    SQL-oracle-checkable."""
    m = 1 << b
    alpha = 0.7213 / (1 + 1.079 / m)
    max_rank = 32 - b + 1
    spine = registers.sparkSession.range(m).select(
        F.col("id").cast("int").alias("bucket"))
    full = (spine.join(registers, "bucket", "left")
            .select(F.coalesce("rank", F.lit(0)).alias("rank")))
    # the harmonic sum scaled by 2^max_rank is an INTEGER (rank <=
    # max_rank), so the register fold is fold-order-free and both
    # engines divide the identical double constant by the identical
    # integer — no float-sum hashing hazard
    agg = full.agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {max_rank} - rank)"))
        .alias("_zs"),
        F.sum((F.col("rank") == 0).cast("int")).alias("_v"))
    raw = F.lit(float(alpha * m * m * (1 << max_rank))) / F.col("_zs")
    # linear counting below the 2.5m threshold when empty buckets exist;
    # above 2^32/30 the standard LARGE-RANGE correction for a 32-bit
    # hash (-2^32 * ln(1 - E/2^32), Flajolet et al. 2007 Fig. 3) — the
    # 32-bit hash space starts colliding near a billion distincts and
    # the uncorrected harmonic estimate saturates hundreds of millions
    # low with no warning (the documented 100 TB use case exceeds this)
    two32 = float(1 << 32)
    est = F.when((raw <= F.lit(2.5 * m)) & (F.col("_v") > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("_v"))) \
        .when(raw > F.lit(two32 / 30.0),
              F.lit(-two32) * F.log(F.lit(1.0) - raw / F.lit(two32))) \
        .otherwise(raw)
    return agg.select((F.lit(m) - F.col("_v")).alias("n_buckets_used"),
                      F.floor(est).cast("long").alias("est"))


# -- KMV bottom-k sketch ------------------------------------------------------


def kmv_sketch(items: DataFrame, col: str, k: int = 256) -> DataFrame:
    """K-minimum-values sketch (Bar-Yossef et al. 2002): the k smallest
    md5 hashes over the DISTINCT values of a column. Mergeable —
    bottomk(A + B) == bottomk(bottomk(A) + bottomk(B)) — and doubles as
    (a) a distinct-cardinality estimator ((k-1) * 2^32 / h_k) and (b) a
    uniform without-replacement sample of the distinct values (hash
    order is a random permutation).

    Shape: the same two-phase discipline as :func:`heavy_hitters` — a
    shuffle-free per-partition pass emits each partition's own bottom-k
    of its LOCAL distinct values (<= k rows per task, pandas dedup +
    nsmallest), and the tiny union of partials reduces with one
    TakeOrdered. The distinct-domain-wide shuffle a `distinct()` would
    pay never happens; per-partition bottom-k loses nothing because the
    global bottom-k is a subset of the union of local bottom-ks.

    Returns (value, h) — the sketch rows, h ascending order not
    guaranteed (order on read)."""
    import pandas as pd

    from ..operators.dedup import _hash32

    # NULLs are excluded, matching count(DISTINCT col) semantics: md5 of
    # NULL hashes to NULL, which the pandas partial sorts LAST but the
    # final orderBy sorts FIRST — a partition-layout-dependent sketch
    # slot (and an inflated estimate) if allowed through
    hashed = (items.filter(F.col(col).isNotNull())
              .select(F.col(col).cast("string").alias("value"),
                      _hash32(F.col(col).cast("string")).alias("h")))

    def partial(batches):
        best: pd.DataFrame | None = None
        for pdf in batches:
            cur = pdf.drop_duplicates("value")
            best = cur if best is None else pd.concat([best, cur])
            # sort by (h, value) — the GLOBAL tie-break order — before
            # cutting to k: nsmallest(keep='first') breaks 32-bit hash
            # ties by arrival order, which could keep a value locally
            # that the global ORDER BY h, value LIMIT k would drop
            best = (best.drop_duplicates("value")
                    .sort_values(["h", "value"]).head(k))
        if best is not None:
            yield best

    partials = hashed.mapInPandas(partial, schema="value string, h long")
    return partials.distinct().orderBy("h", "value").limit(k)


def kmv_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: (k-1) * 2^32 / h_k
    with h_k the k-th smallest hash; when fewer than k distinct values
    exist the sketch IS the distinct set and the count is exact.
    Integer arithmetic end to end — hash-oracle-safe."""
    agg = sketch.agg(F.count("*").alias("n_sketch"),
                     F.max("h").alias("_hk"))
    est = F.when(F.col("n_sketch") < k, F.col("n_sketch")) \
        .otherwise(F.floor((F.col("n_sketch") - 1) * F.lit(1 << 32)
                           / F.col("_hk")).cast("long"))
    return agg.select("n_sketch", est.cast("long").alias("est"))


def topk_per_group(df: DataFrame, group_col: str, order_col: str,
                   id_col: str, k: int = 3) -> DataFrame:
    """Top-k rows per group WITHOUT shuffling the full table: each
    partition first reduces to its own per-group top-k (shuffle-free
    mapInPandas partial, the same two-phase discipline as
    :func:`heavy_hitters` / :func:`kmv_sketch`), and only the
    <= k * n_partitions survivors per group enter the ranking-window
    shuffle. Exact: the global top-k is a subset of the union of
    partition top-ks, and the deterministic (order desc, id asc) order
    makes partial and final agree on ties.

    The ranking-window formulation shuffles EVERY row to its group's
    reducer — at 100 TB that is the whole table through the wire for a
    3-row-per-group answer; here the shuffle input is bounded by
    k * partitions * groups rows.

    Returns the same (group, order, id, rnk) rows as the window form —
    both satisfy the identical SQL oracle.

    NaN/NULL order values: Spark's desc window ranks NaN FIRST (greatest
    double) and NULL LAST, but a bare pandas sort puts both at one end —
    and the Arrow transfer conflates float NULL with NaN, so the partial
    cannot reconstruct the distinction. The order CLASS (0 = NaN,
    1 = real, 2 = NULL) is therefore computed Spark-side, where the two
    are still distinguishable, and the partial sorts (class asc, value
    desc, id asc) — exactly the final window's order."""
    import pandas as pd

    proj = df.select(group_col, order_col, id_col)
    _reserve(proj, "_ocls", "topk_per_group")
    dt = dict(proj.dtypes)[order_col]
    cls = F.when(F.col(order_col).isNull(), F.lit(2))
    if dt in ("double", "float"):
        cls = cls.when(F.isnan(F.col(order_col)), F.lit(0))
    proj = proj.withColumn("_ocls", cls.otherwise(F.lit(1)).cast("int"))

    def partial(batches):
        best: pd.DataFrame | None = None
        for pdf in batches:
            cur = pdf if best is None else pd.concat([best, pdf])
            # within class 0/2 every order value is NaN after the Arrow
            # round-trip (ties -> id asc); class 1 holds no NaN, so the
            # desc value sort inside it is unambiguous
            cur = cur.sort_values([group_col, "_ocls", order_col, id_col],
                                  ascending=[True, True, False, True])
            # dropna=False: the window form ranks the NULL group as its
            # own partition, so the partial must keep it too
            best = cur.groupby(group_col, sort=False, dropna=False).head(k)
        if best is not None:
            yield best

    partials = proj.mapInPandas(partial, schema=proj.schema)
    if dt in ("double", "float"):
        # the Arrow RETURN path converts pandas NaN to NULL (pyarrow
        # from_pandas semantics), which would demote NaN rows from
        # rank-first to rank-last; _ocls survived the round-trip, so
        # restore the NaN (all NaNs are equal to Spark — payload bits
        # don't matter)
        partials = partials.withColumn(
            order_col,
            F.when(F.col("_ocls") == 0,
                   F.lit(float("nan")).cast(dt))
            .otherwise(F.col(order_col)))
    # Spark's own desc ordering = NaN first, reals desc, NULL last —
    # the same class order the partial used
    w = W.partitionBy(group_col).orderBy(F.col(order_col).desc(), id_col)
    return (partials
            .select(group_col, id_col, order_col,
                    F.row_number().over(w).alias("rnk"))
            .filter(F.col("rnk") <= k))
