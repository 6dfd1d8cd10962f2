"""Scale-technique tests: salting equivalence + bucketed zero-shuffle joins."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from servihabitat_etl_spyke_spark.catalog import load_table
from servihabitat_etl_spyke_spark.operators import scale as SC


def test_salted_group_agg_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {r["l_returnflag"]: (r["n"], r["s"], r["mn"], r["mx"]) for r in
             li.groupBy("l_returnflag")
             .agg(F.count("l_quantity").alias("n"),
                  F.sum("l_quantity").alias("s"),
                  F.min("l_quantity").alias("mn"),
                  F.max("l_quantity").alias("mx")).collect()}
    salted = {r["l_returnflag"]: (r["n"], r["s"], r["mn"], r["mx"]) for r in
              SC.salted_group_agg(
                  li, "l_returnflag", salt_from="l_orderkey", salt_n=16,
                  n=("count", "l_quantity"), s=("sum", "l_quantity"),
                  mn=("min", "l_quantity"), mx=("max", "l_quantity")).collect()}
    assert plain == salted


def test_salted_join_equals_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_quantity")
    plain = li.join(orders, "k").groupBy("o_orderpriority").count()
    salted = (SC.salted_join(li, orders, "k", salt_n=8,
                             salt_from="l_quantity")
              .groupBy("o_orderpriority").count())
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salt_is_deterministic(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    a = SC.with_salt(li, 16, "l_orderkey").select("l_orderkey", "_salt")
    b = SC.with_salt(li, 16, "l_orderkey").select("l_orderkey", "_salt")
    assert a.exceptAll(b).count() == 0


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    run = uuid.uuid4().hex[:8]
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    SC.write_bucketed(orders, f"b_orders_{run}", str(tmp_path / "o"),
                      "o_orderkey")
    SC.write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        f"b_lineitem_{run}", str(tmp_path / "l"), "o_orderkey")
    # disable auto-broadcast so the planner must use the bucket layout
    # (at real scale neither side broadcasts; this simulates that)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (spark.table(f"b_lineitem_{run}")
                  .join(spark.table(f"b_orders_{run}"), "o_orderkey"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]  # no shuffle, no broadcast
        assert "SortMergeJoin" in plan
        # and the join still returns every lineitem row
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_global_row_numbers_match_global_window(spark, sf_dir):
    from pyspark.sql.window import Window
    from servihabitat_etl_spyke_spark.catalog import load_table
    from servihabitat_etl_spyke_spark.operators.scale import (
        global_row_numbers)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber")
    fast = global_row_numbers(li, "l_orderkey", tiebreaks=["l_linenumber"])
    slow = li.withColumn("rn", F.row_number().over(
        Window.orderBy("l_orderkey", "l_linenumber")))
    assert fast.count() == slow.count()
    diff = (fast.join(slow, ["l_orderkey", "l_linenumber", "rn"],
                      "left_anti").count())
    assert diff == 0


def test_global_row_numbers_avoids_single_partition_window(spark, sf_dir):
    from servihabitat_etl_spyke_spark.catalog import load_table
    from servihabitat_etl_spyke_spark.operators.scale import (
        global_row_numbers)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber")
    out = global_row_numbers(li, "l_orderkey", tiebreaks=["l_linenumber"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the window must run on hash-partitioned buckets, never one partition
    assert "SinglePartition" not in plan


def test_approx_percentiles_within_sketch_error(spark, sf_dir):
    from servihabitat_etl_spyke_spark.catalog import load_table
    from servihabitat_etl_spyke_spark.queries_analytics import (
        agg_approx_percentiles)
    li = load_table(spark, sf_dir, "lineitem")
    approx = {r["l_returnflag"]: [r["p50"], r["p95"], r["p99"]] for r in
              agg_approx_percentiles(spark, sf_dir).collect()}
    exact = {r["l_returnflag"]: r["pcts"] for r in
             li.groupBy("l_returnflag")
             .agg(F.expr("percentile(l_extendedprice, "
                         "array(0.5D, 0.95D, 0.99D))").alias("pcts"))
             .collect()}
    for flag, aps in approx.items():
        for a, e in zip(aps, exact[flag]):
            assert abs(a - e) / max(abs(e), 1e-9) < 0.02, (flag, a, e)


def test_global_row_numbers_keeps_null_order_keys(spark):
    """NULL order_col rows must be kept and ranked first (row_number()
    semantics: asc NULLS FIRST) — the bucket chain used to evaluate to
    NULL for them and the offsets join silently dropped the rows."""
    df = spark.createDataFrame(
        [(None, 1), (5, 2), (None, 3), (2, 4)], "k int, t int")
    out = SC.global_row_numbers(df, "k", tiebreaks=["t"], buckets=2).collect()
    assert len(out) == 4
    rn = {(r["k"], r["t"]): r["rn"] for r in out}
    assert rn == {(None, 1): 1, (None, 3): 2, (2, 4): 3, (5, 2): 4}


def test_zorder_layout_clusters_both_dimensions(spark, tmp_path):
    """Z-order layout keeps per-partition min/max tight on BOTH columns;
    a single-column sort leaves the other column's range at full width."""
    from servihabitat_etl_spyke_spark.operators.scale import zorder_layout
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long")

    def mean_spans(laid):
        stats = (laid.withColumn("pid", F.spark_partition_id())
                 .groupBy("pid")
                 .agg((F.max("x") - F.min("x")).alias("sx"),
                      (F.max("y") - F.min("y")).alias("sy"))
                 .agg(F.avg("sx"), F.avg("sy")).first())
        return stats[0], stats[1]

    zx, zy = mean_spans(zorder_layout(df, "x", "y", n_partitions=16, bits=6))
    nx, ny = mean_spans(df.repartitionByRange(16, "x")
                        .sortWithinPartitions("x"))
    # x-only sort: x clusters (span ~4/partition) but y stays full-width 63
    assert ny > 55
    # z-order: BOTH dims stay tight (ideal 16x16 tiles -> span 15; allow
    # slack for repartitionByRange's sampled boundaries)
    assert zx < 28 and zy < 28


def test_compact_to_target_writes_expected_file_count(spark, tmp_path):
    from servihabitat_etl_spyke_spark.operators.scale import compact_to_target
    # compaction reads files (that's the op): many tiny input files in,
    # few target-sized files out; Catalyst's size estimate is the real
    # on-disk byte count for a file scan
    (spark.range(200_000)
     .select(F.col("id"), F.md5(F.col("id").cast("string")).alias("payload"))
     .repartition(64)
     .write.parquet(str(tmp_path / "tiny_files")))
    df = spark.read.parquet(str(tmp_path / "tiny_files"))
    n = compact_to_target(df, str(tmp_path / "compacted"), target_mb=4)
    assert 2 <= n < 64
    import glob
    files = glob.glob(str(tmp_path / "compacted" / "part-*.parquet"))
    assert len(files) == n
    assert spark.read.parquet(str(tmp_path / "compacted")).count() == 200_000


def test_profile_table_nulls_and_types(spark):
    from servihabitat_etl_spyke_spark.operators.profile import profile_table
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, None), (2, "b", 2.5), (None, "a", 0.5)],
        "k long, s string, x double")
    got = {r["col_name"]: r for r in profile_table(df).collect()}
    assert got["k"]["n_rows"] == 4 and got["k"]["n_nulls"] == 1
    assert got["k"]["n_distinct"] == 2
    assert got["k"]["min_num"] == 1.0 and got["k"]["max_num"] == 2.0
    assert got["k"]["min_str"] is None
    assert got["s"]["n_nulls"] == 1 and got["s"]["n_distinct"] == 2
    assert got["s"]["min_str"] == "a" and got["s"]["max_str"] == "b"
    assert got["s"]["min_num"] is None
    assert got["x"]["min_num"] == 0.5 and got["x"]["max_num"] == 2.5
    # approx path: same shape, HLL cardinalities within sketch error
    ap = {r["col_name"]: r for r in
          profile_table(df, approx=True).collect()}
    assert ap["k"]["n_distinct"] in (1, 2, 3)
    # column subset + unknown column guard
    import pytest as _pt
    assert [r["col_name"] for r in profile_table(df, ["x"]).collect()] == ["x"]
    with _pt.raises(ValueError):
        profile_table(df, ["nope"])


def test_bloom_prefilter_no_false_negatives_and_thins(spark, sf_dir):
    """Bloom pre-filter: every true join key survives (no false
    negatives), misses are mostly dropped, and the filtered join equals
    the plain join exactly."""
    from servihabitat_etl_spyke_spark.catalog import load_table
    from servihabitat_etl_spyke_spark.operators.scale import (
        bloom_bitmap, bloom_prefilter)

    orders = load_table(spark, sf_dir, "orders")
    build = orders.filter(F.col("o_orderkey") % 7 == 0) \
                  .select("o_orderkey", "o_orderpriority")
    probe = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity")

    bm = bloom_bitmap(build, "o_orderkey", n_bits=1 << 16)
    thinned = bloom_prefilter(probe, bm, "o_orderkey")

    plain = probe.join(build, "o_orderkey")
    filtered = thinned.join(build, "o_orderkey")
    assert sorted(map(tuple, filtered.collect())) == \
        sorted(map(tuple, plain.collect()))

    n_probe, n_thin = probe.count(), thinned.count()
    n_match = probe.join(build.select("o_orderkey"), "o_orderkey",
                         "left_semi").count()
    assert n_thin >= n_match                  # no false negatives
    # ~1/7 of keys match; the bloom should drop the bulk of the misses
    assert n_thin < n_probe * 0.5, (n_thin, n_probe)


def test_heavy_hitters_exact_vs_full_histogram(spark):
    """The two-pass MG+recount answer equals the full groupBy histogram
    filtered at the same threshold — on a skewed domain where most items
    are below it (the case where the candidate pass earns its keep)."""
    from servihabitat_etl_spyke_spark.operators.scale import heavy_hitters

    # zipf-ish: item i appears 1000 // (i + 1) times, i in [0, 200)
    rows = [(f"item_{i}",) for i in range(200) for _ in range(1000 // (i + 1))]
    df = spark.createDataFrame(rows, "item string").repartition(8)
    k = 10
    got = [(r["item"], r["cnt"]) for r in heavy_hitters(df, "item", k=k).collect()]

    n = len(rows)
    from collections import Counter
    exact = Counter(r[0] for r in rows)
    want = sorted(((i, c) for i, c in exact.items() if c * (k + 1) > n),
                  key=lambda t: (-t[1], t[0]))
    assert got == want
    assert len(got) > 0                      # the threshold is attainable


def test_mg_candidate_pass_is_bounded_and_superset(spark):
    from servihabitat_etl_spyke_spark.operators.scale import _mg_candidates

    rows = [("hot",)] * 500 + [(f"cold_{i}",) for i in range(500)]
    df = spark.createDataFrame(rows, "item string").repartition(4)
    k = 5
    cands = [r["item"] for r in _mg_candidates(df, "item", k).collect()]
    # <= k rows per partition out of the summary pass
    assert len(cands) <= k * df.rdd.getNumPartitions()
    # any item with global count > n/(k+1) must survive
    assert "hot" in cands


def test_psi_drift_zero_on_identical_and_positive_on_shift(spark):
    from servihabitat_etl_spyke_spark.operators.profile import psi_drift

    base = spark.range(2000).select((F.col("id") % 100).cast("double")
                                    .alias("v"))
    same = psi_drift(base, base, "v", lo=0.0, hi=100.0, bins=10).collect()
    assert len(same) == 10
    assert all(r["psi_nano"] == 0 for r in same)      # p == q exactly
    assert [r["bin"] for r in same] == list(range(10))

    shifted = base.select((F.col("v") + 50.0).alias("v"))
    drift = psi_drift(base, shifted, "v", lo=0.0, hi=100.0, bins=10).collect()
    total = sum(r["psi_nano"] for r in drift) / 1e9
    assert total > 0.25, total               # half the mass moved: drifted

    # out-of-range values land in the edge bins, never vanish
    assert sum(r["n_cur"] for r in drift) == 2000


def test_psi_drift_counts_match_exact_binning(spark):
    from servihabitat_etl_spyke_spark.operators.profile import psi_drift

    vals = [0.0, 9.99, 10.0, 55.5, 99.9, 120.0, -5.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = psi_drift(df, df, "v", lo=0.0, hi=100.0, bins=10).collect()
    got = {r["bin"]: r["n_ref"] for r in rows}
    # manual fixed-width binning with edge clamping
    import math
    want: dict[int, int] = {b: 0 for b in range(10)}
    for v in vals:
        want[min(9, max(0, math.floor(v / 100.0 * 10)))] += 1
    assert got == want


def test_new_operator_arg_guards(spark):
    import pytest as _pt

    from servihabitat_etl_spyke_spark.operators.profile import psi_drift
    from servihabitat_etl_spyke_spark.operators.scale import heavy_hitters
    from servihabitat_etl_spyke_spark.operators.similarity import rrf_fuse

    df = spark.createDataFrame([(1.0,)], "v double")
    with _pt.raises(ValueError, match="hi > lo"):
        psi_drift(df, df, "v", lo=5.0, hi=5.0)
    with _pt.raises(ValueError, match="k must be"):
        heavy_hitters(df, "v", k=0)
    with _pt.raises(ValueError, match="at least one"):
        rrf_fuse([])


def test_cms_never_undercounts_and_merges(spark):
    from servihabitat_etl_spyke_spark.operators import scale as SC
    from pyspark.sql import functions as F
    rows = [(f"tok{i % 17}",) for i in range(400)] + [("rare",)]
    df = spark.createDataFrame(rows, "tok string")
    sk = SC.cms_sketch(df, "tok", d=4, w=64)
    probes = spark.createDataFrame(
        [("tok3",), ("rare",), ("absent",)], "item string")
    est = {r["item"]: r["est"]
           for r in SC.cms_estimate(sk, probes, d=4, w=64).collect()}
    true = {r["tok"]: r["cnt"] for r in
            df.groupBy("tok").agg(F.count("*").alias("cnt")).collect()}
    assert est["tok3"] >= true["tok3"]
    assert est["rare"] >= 1
    assert est["absent"] >= 0
    # mergeability: sketch(a) + sketch(b) cell-wise == sketch(a union b)
    half1 = SC.cms_sketch(df.filter(F.col("tok") < "tok5"), "tok", d=4, w=64)
    half2 = SC.cms_sketch(df.filter(~(F.col("tok") < "tok5")), "tok",
                          d=4, w=64)
    merged = (half1.unionByName(half2).groupBy("r", "c")
              .agg(F.sum("cnt").alias("cnt")))
    whole = SC.cms_sketch(df, "tok", d=4, w=64)
    assert (sorted(map(tuple, merged.collect()))
            == sorted(map(tuple, whole.collect())))


def test_hll_registers_merge_and_estimate_accuracy(spark):
    from pyspark.sql import functions as F
    from servihabitat_etl_spyke_spark.operators import scale as SC
    rows = [(f"item{i}",) for i in range(5000)] * 3   # heavy duplication
    df = spark.createDataFrame(rows, "tok string")
    regs = SC.hll_registers(df, "tok", b=8)
    est = SC.hll_estimate(regs, b=8).collect()[0]["est"]
    # b=8 -> ~6.5% standard error; allow 3 sigma
    assert abs(est - 5000) / 5000 < 0.20
    # mergeability: max-merge of two halves == whole
    h1 = SC.hll_registers(df.filter(F.col("tok") < "item3"), "tok", b=8)
    h2 = SC.hll_registers(df.filter(~(F.col("tok") < "item3")), "tok", b=8)
    merged = (h1.unionByName(h2).groupBy("bucket")
              .agg(F.max("rank").alias("rank")))
    assert (sorted(map(tuple, merged.collect()))
            == sorted(map(tuple, regs.collect())))


def test_kmv_sketch_merges_and_estimates(spark):
    from pyspark.sql import functions as F
    from servihabitat_etl_spyke_spark.operators import scale as SC
    rows = [(f"v{i}",) for i in range(4000)] * 2
    df = spark.createDataFrame(rows, "tok string")
    sk = SC.kmv_sketch(df, "tok", k=128)
    assert sk.count() == 128
    est = SC.kmv_estimate(sk, k=128).collect()[0]["est"]
    # k=128 -> ~9% std error; 3 sigma bound
    assert abs(est - 4000) / 4000 < 0.30
    # mergeability: bottomk(bottomk(A) + bottomk(B)) == bottomk(A + B)
    a = SC.kmv_sketch(df.filter(F.col("tok") < "v3"), "tok", k=128)
    b = SC.kmv_sketch(df.filter(~(F.col("tok") < "v3")), "tok", k=128)
    merged = (a.unionByName(b).distinct()
              .orderBy("h", "value").limit(128))
    assert (sorted(map(tuple, merged.collect()))
            == sorted(map(tuple, sk.collect())))
    # under-k domain: the sketch IS the distinct set, estimate exact
    small = spark.createDataFrame([("x",), ("y",), ("x",)], "tok string")
    got = SC.kmv_estimate(SC.kmv_sketch(small, "tok", k=128),
                          k=128).collect()[0]
    assert got["n_sketch"] == 2 and got["est"] == 2


def test_topk_per_group_matches_window_form(spark, sf_dir):
    """Two-phase partial top-k must equal the plain ranking window row for
    row (same ties, same ranks), and the window stage's input must be
    bounded by k * partitions per group."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W
    from servihabitat_etl_spyke_spark.catalog import load_table
    from servihabitat_etl_spyke_spark.operators.scale import topk_per_group
    ev = load_table(spark, sf_dir, "events")
    got = sorted(map(tuple, topk_per_group(
        ev, "event_type", "value", "event_id", k=3)
        .select("event_type", "event_id", "value", "rnk").collect()))
    w = W.partitionBy("event_type").orderBy(F.col("value").desc(),
                                            "event_id")
    ref = sorted(map(tuple, ev.select(
        "event_type", "event_id", "value",
        F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3).collect()))
    assert got == ref


def test_topk_per_group_keeps_null_group(spark):
    """Rows with a NULL group key must rank as their own group, exactly
    as the window form does (regression: pandas groupby dropna default
    silently dropped them from the partials)."""
    from servihabitat_etl_spyke_spark.operators.scale import topk_per_group
    rows = [("a", 5.0, 1), ("a", 4.0, 2), (None, 9.0, 3), (None, 8.0, 4),
            (None, 7.0, 5)]
    df = spark.createDataFrame(rows, "g string, v double, id long")
    got = {(r["g"], r["id"]) for r in
           topk_per_group(df, "g", "v", "id", k=2).collect()}
    assert got == {("a", 1), ("a", 2), (None, 3), (None, 4)}


def test_bloom_bitmap_rejects_unaligned_n_bits(spark):
    """n_bits not divisible by 64 would make build and probe disagree on
    bit positions — must raise, not corrupt."""
    import pytest
    from servihabitat_etl_spyke_spark.operators.scale import bloom_bitmap
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_bitmap(df, "k", n_bits=(1 << 20) + 1)


def test_kmv_sketch_excludes_nulls(spark):
    """NULL values must not occupy sketch slots (count-distinct
    semantics; a NULL hash also sorts differently between the pandas
    partial and the final orderBy, making the sketch layout-dependent)."""
    from servihabitat_etl_spyke_spark.operators.scale import (
        kmv_estimate, kmv_sketch)
    rows = [(str(i),) for i in range(5)] + [(None,)] * 3
    df = spark.createDataFrame(rows, "v string")
    sk = kmv_sketch(df, "v", k=8)
    vals = [r["value"] for r in sk.collect()]
    assert None not in vals and len(vals) == 5
    est = kmv_estimate(sk, k=8).collect()[0]
    assert est["n_sketch"] == 5 and est["est"] == 5


def test_reserved_temp_columns_raise_instead_of_clobbering(spark):
    import pytest
    from servihabitat_etl_spyke_spark.operators.scale import (
        bloom_bitmap, bloom_prefilter, with_salt)
    df = spark.createDataFrame([(1, 2)], "k long, _salt long")
    with pytest.raises(ValueError, match="_salt"):
        with_salt(df, 4, "k")
    with pytest.raises(ValueError, match="salt_n"):
        with_salt(spark.createDataFrame([(1,)], "k long"), 0, "k")
    clean = spark.createDataFrame([(1,)], "k long")
    bm = bloom_bitmap(clean, "k")
    probe = spark.createDataFrame([(1, 9)], "k long, _h long")
    with pytest.raises(ValueError, match="_h"):
        bloom_prefilter(probe, bm, "k")


def test_r5_review_guards_scale(spark):
    """Round-5 review fixes: topk_per_group NaN/NULL window parity,
    NULL exclusion in cms/hll sketches, hll on numeric columns, and
    global_row_numbers' out_col collision guard."""
    import pytest
    from pyspark.sql.window import Window as W

    # topk_per_group: NaN ranks first, NULL last — identical to the
    # plain ranking window, values included
    rows = [("g", float("nan"), 1), ("g", 5.0, 2), ("g", 4.0, 3),
            ("g", 3.0, 4), ("g", None, 5), ("g", float("nan"), 6),
            ("h", None, 7), ("h", None, 8), ("h", 1.0, 9)]
    df = (spark.createDataFrame(rows, "grp string, val double, id long")
          .repartition(4))
    out = SC.topk_per_group(df, "grp", "val", "id", k=3)
    w = W.partitionBy("grp").orderBy(F.col("val").desc(), "id")
    ref = (df.select("grp", "id", "val",
                     F.row_number().over(w).alias("rnk"))
           .filter(F.col("rnk") <= 3))
    key = lambda r: (r.grp, r.id, r.rnk, str(r.val))
    assert sorted(map(key, out.collect())) == sorted(map(key, ref.collect()))

    # cms_sketch: NULL items contribute no (r, NULL) junk cells
    items = spark.createDataFrame([("a",), (None,), ("a",)], "item string")
    cells = SC.cms_sketch(items, "item", d=2, w=8).collect()
    assert all(r.c is not None for r in cells)
    assert sum(r.cnt for r in cells) == 4            # 2 rows x d=2

    # hll_registers: numeric column works (cast-to-string), NULLs out
    nums = spark.createDataFrame([(10,), (20,), (None,)], "user_id bigint")
    regs = SC.hll_registers(nums, "user_id", b=4)
    est = SC.hll_estimate(regs, b=4).collect()[0]
    assert est["est"] >= 1 and est["n_buckets_used"] <= 2

    # global_row_numbers: refuses to clobber an existing out_col
    with pytest.raises(ValueError, match="already exists"):
        SC.global_row_numbers(
            spark.createDataFrame([(1, 2)], "ts long, rn long"), "ts")
