"""Standard-aggregate extension queries (SURVEY.md §2.4 note: the reference
has only counts — `packages/protonode/src/lib/db.ts:136-154` — so sums/avgs/
percentiles/grouping-sets are north-star surface, expressed as pure Spark
built-ins over the TPC-H-ish tables).

Scale notes per query live in docstrings; everything here is a single
scan + one shuffle (partial aggregation map-side), no UDFs, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from .catalog import load_table
from .queries import query, round2, roundn

# ---------------------------------------------------------------------------
# TPC-H-shaped single-pass aggregations
# ---------------------------------------------------------------------------


@query("q6_revenue_delta", oracle="""
SELECT floor(sum(l_extendedprice * l_discount) * 100 + 0.5) / 100 AS revenue_delta,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""")
def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight conjunctive filter + single global sum.

    The whole predicate set (timestamp range, discount band, quantity cap)
    reaches the parquet scan as PushedFilters — at 100 TB this is the
    pattern where row-group min/max stats skip most of the file; the
    aggregate is map-side partial + a 1-row final reduce (no real shuffle).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (li.filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1996-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24))
        .agg(round2(F.sum(F.col("l_extendedprice") * F.col("l_discount")))
             .alias("revenue_delta"),
             F.count("*").alias("n_rows")))


@query("q4_priority_semi", oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
GROUP BY o_orderpriority ORDER BY o_orderpriority
""")
def q4_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS -> left-semi join, then group-count.

    The semi-join build side is lineitem pre-filtered and reduced to
    distinct orderkeys BEFORE the join — the shuffle carries keys only.
    At scale both sides hash-partition on orderkey; AQE picks
    broadcast when the filtered key set is small."""
    orders = load_table(spark, sf_dir, "orders")
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_quantity") >= 45)
          .select(F.col("l_orderkey").alias("o_orderkey"))
          .distinct())
    return (orders.join(li, "o_orderkey", "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count")))


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube
# ---------------------------------------------------------------------------


@query("agg_rollup", oracle="""
SELECT l_returnflag, l_linestatus,
       floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""")
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals in one pass: (flag, status), (flag), ().
    Spark plans rollup as a single Expand + one shuffle — strictly better
    than N separate groupBys unioned (N scans, N shuffles)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(round2(F.sum("l_quantity")).alias("sum_qty"),
                 F.count("*").alias("n")))


@query("agg_cube", oracle="""
SELECT l_returnflag, l_linestatus,
       floor(avg(l_extendedprice) * 100 + 0.5) / 100 AS avg_price,
       count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""")
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 2^d grouping combinations in one Expand pass (adds the
    status-only marginal over :func:`agg_rollup`)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.cube("l_returnflag", "l_linestatus")
            .agg(round2(F.avg("l_extendedprice")).alias("avg_price"),
                 F.count("*").alias("n")))


# ---------------------------------------------------------------------------
# Percentiles / dispersion / distincts
# ---------------------------------------------------------------------------


@query("agg_percentiles", oracle="""
SELECT l_returnflag,
       floor(quantile_cont(l_extendedprice, 0.25) * 100 + 0.5) / 100 AS p25,
       floor(quantile_cont(l_extendedprice, 0.50) * 100 + 0.5) / 100 AS p50,
       floor(quantile_cont(l_extendedprice, 0.90) * 100 + 0.5) / 100 AS p90
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""")
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group (Spark `percentile`
    == DuckDB `quantile_cont`). Exact percentile sorts per group — fine
    per-key; the 100 TB path for global percentiles is
    `approx_percentile` (t-digest, mergeable, single pass)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(round2(F.expr("percentile(l_extendedprice, 0.25)")).alias("p25"),
                 round2(F.expr("percentile(l_extendedprice, 0.50)")).alias("p50"),
                 round2(F.expr("percentile(l_extendedprice, 0.90)")).alias("p90")))


@query("agg_stats", oracle="""
SELECT l_linestatus,
       floor(min(l_extendedprice) * 100 + 0.5) / 100 AS min_price,
       floor(max(l_extendedprice) * 100 + 0.5) / 100 AS max_price,
       floor(avg(l_extendedprice) * 100 + 0.5) / 100 AS avg_price,
       floor(stddev_samp(l_extendedprice) * 100 + 0.5) / 100 AS sd_price,
       count(DISTINCT l_partkey) AS n_parts
FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
""")
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dispersion summary per group: min/max/avg/sample-stddev/distinct.
    COUNT(DISTINCT) plans as a two-stage partial-distinct aggregate (no
    per-group set materialization); everything else is mergeable partials.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_linestatus")
            .agg(round2(F.min("l_extendedprice")).alias("min_price"),
                 round2(F.max("l_extendedprice")).alias("max_price"),
                 round2(F.avg("l_extendedprice")).alias("avg_price"),
                 round2(F.stddev_samp("l_extendedprice")).alias("sd_price"),
                 F.countDistinct("l_partkey").alias("n_parts")))


@query("agg_approx_distinct")  # HLL sketch != oracle-exact -> rows-only
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB path for distinct
    counts — constant memory, mergeable sketches, one pass. Relative error
    vs the exact count asserted in pytest (rsd=0.01 here)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.approx_count_distinct("l_partkey", rsd=0.01)
                 .alias("approx_parts")))


@query("q14_promo_ratio", oracle="""
SELECT floor(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)) * 10000 + 0.5) / 10000
       AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01'
  AND l_shipdate <  TIMESTAMP '1995-10-01'
""")
def q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation (CASE inside sum) over a
    fact-dim join; the month filter is pushed to the fact scan, so the
    join input is a sliver of lineitem."""
    li = (load_table(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= "1995-09-01")
                  & (F.col("l_shipdate") < "1995-10-01")))
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0.0)
    # part scales with data volume -> no forced broadcast; stats/AQE decide
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return joined.agg(
        roundn(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_pct"))


@query("q17_small_qty_avg", oracle="""
WITH pa AS (
  SELECT l_partkey AS pk, 0.5 * avg(l_quantity) AS half_avg
  FROM lineitem GROUP BY l_partkey
)
SELECT floor(sum(l_extendedprice) / 7.0 * 100 + 0.5) / 100 AS avg_yearly,
       count(*) AS n
FROM lineitem JOIN pa ON l_partkey = pk
WHERE l_quantity < half_avg
""")
def q17_small_qty_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average)
    decorrelated into an aggregate + self-join — the plan Catalyst would
    produce from the subquery form, written explicitly."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = (li.groupBy(F.col("l_partkey").alias("pk"))
          .agg((0.5 * F.avg("l_quantity")).alias("half_avg")))
    # pa has one row per part — scales with data; no forced broadcast
    return (li.join(pa, li.l_partkey == pa.pk)
            .filter(F.col("l_quantity") < F.col("half_avg"))
            .agg(round2(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"),
                 F.count("*").alias("n")))


@query("q18_large_orders", oracle="""
WITH big AS (
  SELECT l_orderkey AS k, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 180
)
SELECT c_name, o_orderkey,
       floor(o_totalprice * 100 + 0.5) / 100 AS o_totalprice,
       floor(total_qty * 100 + 0.5) / 100 AS total_qty
FROM big
JOIN orders   ON o_orderkey = k
JOIN customer ON c_custkey = o_custkey
ORDER BY o_orderkey
""")
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate driving a join chain.
    The qty rollup shrinks lineitem to one row per order and the HAVING
    prunes to the rare big orders BEFORE any join — the join inputs are
    tiny, so both hops broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (li.groupBy(F.col("l_orderkey").alias("k"))
           .agg(F.sum("l_quantity").alias("total_qty"))
           .filter(F.col("total_qty") > 180))
    return (big.join(orders, big.k == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .select("c_name", "o_orderkey",
                    round2(F.col("o_totalprice")).alias("o_totalprice"),
                    round2(F.col("total_qty")).alias("total_qty")))


@query("q10_return_revenue", oracle="""
SELECT c_custkey, c_name,
       floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
         AS revenue,
       n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""")
def q10_return_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most — multi-join, group, top-20
    by revenue. The returnflag filter pushes to the fact scan; customer and
    nation broadcast; the final top-k is a TakeOrdered (no full sort)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_returnflag") == "R"))
    nat = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # customer scales with data (no hint); nation is a fixed 25-row dim
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(round2(F.sum(rev)).alias("revenue"))
            .select("c_custkey", "c_name", "revenue", "n_name")
            .orderBy(F.col("revenue").desc(), "c_custkey")
            .limit(20))


@query("skew_salted_agg", oracle="""
SELECT l_returnflag,
       count(*) AS n,
       floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty,
       floor(max(l_extendedprice) * 100 + 0.5) / 100 AS max_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""")
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation (operators/scale.py): partial agg on
    (key, salt) spreads a hot key over 16 tasks, final agg re-associates.
    The oracle is the PLAIN group-by — proving salting changes only the
    shuffle distribution, never the result."""
    from .operators.scale import salted_group_agg
    li = load_table(spark, sf_dir, "lineitem")
    out = salted_group_agg(
        li, "l_returnflag", salt_from="l_orderkey", salt_n=16,
        n=("count", "*"), sum_qty_raw=("sum", "l_quantity"),
        max_price_raw=("max", "l_extendedprice"))
    return (out.select(
        "l_returnflag", "n",
        round2(F.col("sum_qty_raw")).alias("sum_qty"),
        round2(F.col("max_price_raw")).alias("max_price")))


# ---------------------------------------------------------------------------
# Queue drain orders (T7 fifo/lifo twins of queue_priority_drain)
# ---------------------------------------------------------------------------


@query("queue_fifo_lifo", oracle="""
SELECT event_type, event_id, fifo_pos, lifo_pos FROM (
  SELECT event_type, event_id,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS fifo_pos,
         row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS lifo_pos
  FROM events
) WHERE fifo_pos <= 5 OR lifo_pos <= 5
ORDER BY event_type, event_id
""")
def queue_fifo_lifo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7 fifo/lifo drain order per queue (= event_type): enqueue order is
    event time; the first 5 dequeued under each discipline. One sort per
    partition key serves both directions: (ts, event_id) is a total order
    (event_id unique), so the lifo position is the mirror of the fifo one
    — n_in_queue - fifo_pos + 1 — computed from an unordered count window
    that shares the fifo sort instead of paying a second descending
    sort."""
    ev = load_table(spark, sf_dir, "events")
    wf = W.partitionBy("event_type").orderBy("ts", "event_id")
    fifo = F.row_number().over(wf)
    lifo = (F.count("*").over(W.partitionBy("event_type")) - fifo + 1)
    return (ev.select("event_type", "event_id",
                      fifo.alias("fifo_pos"),
                      lifo.cast("int").alias("lifo_pos"))
            .filter((F.col("fifo_pos") <= 5) | (F.col("lifo_pos") <= 5)))


# ---------------------------------------------------------------------------
# Scale techniques: global sequence ids, mergeable sketch percentiles
# ---------------------------------------------------------------------------


@query("scale_topk_per_group", oracle="""
SELECT event_type, event_id, value, rnk FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rnk
  FROM events
) WHERE rnk <= 3 ORDER BY event_type, rnk
""")
def scale_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase top-k per group (operators/scale.py::topk_per_group):
    shuffle-free per-partition top-k partials, then the ranking window
    over only the <= k * partitions survivors per group — the window
    formulation's full-table shuffle never happens. The oracle is the
    PLAIN ranking window (same as `window_topk_per_group`) — proving the
    partial pass changes only the shuffle volume, never the result."""
    from .operators.scale import topk_per_group
    ev = load_table(spark, sf_dir, "events")
    return (topk_per_group(ev, "event_type", "value", "event_id", k=3)
            .select("event_type", "event_id", "value", "rnk"))


@query("scale_global_rownum", oracle="""
SELECT l_orderkey, l_linenumber,
       row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
FROM lineitem ORDER BY rn
""")
def scale_global_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous global row numbers over the full fact table — computed
    with quantile buckets + per-bucket windows + broadcast offsets
    (operators/scale.py::global_row_numbers), NEVER the oracle's
    single-partition global window. Identical output, parallel plan; the
    plan gate asserts no Exchange SinglePartition feeds the window."""
    from .operators.scale import global_row_numbers
    li = load_table(spark, sf_dir, "lineitem")
    out = global_row_numbers(li.select("l_orderkey", "l_linenumber"),
                             "l_orderkey", tiebreaks=["l_linenumber"])
    return out.select("l_orderkey", "l_linenumber", "rn")


@query("agg_approx_percentiles")  # sketch-based != oracle-exact -> rows-only
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile: the single-pass mergeable-sketch path for
    quantiles at 100 TB (exact percentile needs a per-group sort; the
    sketch merges map-side). Accuracy against the exact form is asserted
    in tests/test_scale.py, not by the hash oracle.

    Output is one scalar column per percentile (never an array column:
    the driver harness canonicalizes results via pandas sort_values,
    which cannot hash list cells)."""
    li = load_table(spark, sf_dir, "lineitem")
    pct = F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000)
    return (li.groupBy("l_returnflag")
            .agg(pct.getItem(0).alias("p50"),
                 pct.getItem(1).alias("p95"),
                 pct.getItem(2).alias("p99")))


@query("scale_zorder_key", oracle="""
-- Same bit interleave: bit i of user lane -> position 2i, event lane ->
-- 2i+1 (DuckDB list_sum returns HUGEINT; cast back to BIGINT).
SELECT event_id, user_id,
       CAST(list_sum(list_transform(range(0, 16), i ->
         (((user_id % 1024) >> CAST(i AS INT)) & 1) * (1::BIGINT << CAST(2 * i AS INT))
         + (((event_id % 1024) >> CAST(i AS INT)) & 1) * (1::BIGINT << CAST(2 * i + 1 AS INT))))
         AS BIGINT) AS zkey
FROM events ORDER BY event_id
""")
def scale_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-order interleaved sort key over two dimensions — the
    multi-column data-skipping layout (Delta/Iceberg OPTIMIZE ZORDER
    analog) as pure integer shift/mask expressions. zorder_layout()
    range-partitions + sorts on this key so per-file min/max stats stay
    tight on BOTH columns; tests/test_scale.py measures the clustering
    win against a single-column sort."""
    from .operators.scale import zorder_key
    ev = load_table(spark, sf_dir, "events")
    return (ev.select(
        "event_id", "user_id",
        zorder_key(F.col("user_id") % 1024, F.col("event_id") % 1024,
                   bits=16).alias("zkey")))


@query("agg_pivot", oracle="""
SELECT source,
       CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
       CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
       CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
       CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
       CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
FROM documents GROUP BY source ORDER BY source
""")
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): per-source doc counts spread across one
    column per language. Pivot values are EXPLICIT — without them Spark
    runs an extra distinct-scan job to discover the columns, and the
    output schema becomes data-dependent (a schema-drift hazard at
    scale). One aggregation shuffle; Catalyst compiles the pivot to the
    same conditional-sum expressions the oracle spells out."""
    docs = load_table(spark, sf_dir, "documents")
    langs = ["de", "en", "es", "fr", "zh"]
    out = (docs.groupBy("source").pivot("lang", langs).count()
           .na.fill(0, langs))
    return out.select("source",
                      *[F.col(c).alias(c) for c in langs])


@query("agg_unpivot", oracle="""
WITH wide AS (
  SELECT source,
         CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
         CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
         CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
         CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
  FROM documents GROUP BY source
)
SELECT source, lang, n_docs
FROM wide UNPIVOT (n_docs FOR lang IN (de, en, es, fr, zh))
ORDER BY source, lang
""")
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long): the inverse reshape via the built-in
    ``unpivot`` (STACK expression — row-local, zero extra shuffle beyond
    the pivot's aggregation). Round-trips the pivot above, zero-count
    cells included."""
    docs = load_table(spark, sf_dir, "documents")
    langs = ["de", "en", "es", "fr", "zh"]
    wide = (docs.groupBy("source").pivot("lang", langs).count()
            .na.fill(0, langs))
    return (wide.unpivot("source", langs, "lang", "n_docs"))


@query("window_distribution", oracle="""
SELECT doc_id, lang,
       ntile(4) OVER w AS quartile,
       floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000 AS pct_rank,
       floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000 AS cume
FROM documents
WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id)
ORDER BY doc_id
""")
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions per language over doc length:
    ntile quartiles, percent_rank, cume_dist — the ranking family beyond
    row_number. The window order includes doc_id so ntile's row split is
    deterministic (ntile on a tied order is engine-arbitrary); the float
    ranks are 1e-6-quantized for engine-stable hashing."""
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy("n_chars", "doc_id")
    return (docs.select(
        "doc_id", "lang",
        F.ntile(4).over(w).alias("quartile"),
        roundn(F.percent_rank().over(w), 6).alias("pct_rank"),
        roundn(F.cume_dist().over(w), 6).alias("cume")))


@query("scale_bucketed_join", oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
""")
def scale_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-layout co-located join, driver-visible: both sides are
    persisted bucketBy(8)+sortBy on the join key, then joined through the
    bucketed tables — the layout that makes repeated big-big joins plan
    with ZERO Exchange (asserted with broadcast disabled in
    tests/test_scale.py::test_bucketed_join_has_no_exchange; at this SF
    the optimizer may still choose broadcast, which is also shuffle-free).
    The timing deliberately INCLUDES the one-time layout build — that is
    the real cost a pipeline amortizes across every later join."""
    from .operators.scale import write_bucketed
    from .queries import fixture_base

    # Per-PROCESS location (+ fixed table names — the catalog is already
    # per-session): repeated invocations (bench best-of-N) rebuild in
    # place — still paying the layout-build cost every run — without
    # accumulating temp dirs or uuid-named catalog entries, and without
    # two concurrent Spark processes on one host overwriting each
    # other's live fixture mid-read.
    base = fixture_base("bucketed_join_fixture")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity")
    write_bucketed(orders, "b_orders", f"{base}/o", "o_orderkey")
    write_bucketed(li, "b_lineitem", f"{base}/l", "o_orderkey")
    return (spark.table("b_lineitem")
            .join(spark.table("b_orders"), "o_orderkey")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_lines"),
                 F.sum("l_quantity").cast("long").alias("sum_qty")))


def _profile_oracle() -> str:
    cols = [("o_custkey", "long", "num"), ("o_orderkey", "long", "num"),
            ("o_orderpriority", "string", "str"),
            ("o_orderstatus", "string", "str"),
            ("o_totalprice", "double", "num")]
    parts = []
    for name, dtype, kind in cols:
        mn = (f"CAST(min({name}) AS DOUBLE)" if kind == "num"
              else "CAST(NULL AS DOUBLE)")
        mx = (f"CAST(max({name}) AS DOUBLE)" if kind == "num"
              else "CAST(NULL AS DOUBLE)")
        mns = f"min({name})" if kind == "str" else "CAST(NULL AS VARCHAR)"
        mxs = f"max({name})" if kind == "str" else "CAST(NULL AS VARCHAR)"
        parts.append(f"""SELECT '{name}' AS col_name, '{dtype}' AS dtype,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(count(*) - count({name}) AS BIGINT) AS n_nulls,
  CAST(count(DISTINCT {name}) AS BIGINT) AS n_distinct,
  {mn} AS min_num, {mx} AS max_num, {mns} AS min_str, {mxs} AS max_str
FROM orders""")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY col_name"


@query("profile_columns", oracle=_profile_oracle())
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of the orders table from ONE read of the
    source: per-column null counts, exact distinct cardinality, and
    typed min/max. The exact path materializes the profiled projection
    once and aggregates it twice (r12 — Spark's mixed distinct/plain
    Expand plan measured 2.1x slower; approx=True keeps the single
    mixed HLL aggregate for very wide tables at full scale). The single
    aggregated row is driver-reshaped long (O(#columns) — it IS the
    profile)."""
    from .operators.profile import profile_table
    orders = load_table(spark, sf_dir, "orders")
    # no presentational global orderBy (r8 sweep): hashes are
    # order-insensitive, and the range-sample pass re-executes the
    # whole profile child plan
    return profile_table(orders,
                         ["o_orderkey", "o_custkey", "o_orderstatus",
                          "o_totalprice", "o_orderpriority"])


def _quantile_oracle() -> str:
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    probs = [0.25, 0.5, 0.75, 0.95, 0.99]
    parts = []
    for c in cols:
        qs = ", ".join(
            f"CAST(floor(quantile_cont({c}, {p}) * 10000 + 0.5) AS BIGINT)"
            f" AS p{int(p * 1000)}_e4" for p in probs)
        parts.append(f"SELECT '{c}' AS col_name, {qs} FROM lineitem")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY col_name"


@query("profile_quantiles", oracle=_quantile_oracle())
def profile_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact column quantiles (p25/p50/p75/p95/p99) of the lineitem
    measure columns in ONE aggregation over one scan — Spark's
    sort-based percentile is the same percentile_cont interpolation
    DuckDB's quantile_cont computes, so the e4-quantized values match
    bit-for-bit. approx=True (percentile_approx) is the fixed-memory
    path for huge-cardinality columns at full scale."""
    from .operators.profile import quantile_profile
    li = load_table(spark, sf_dir, "lineitem")
    # no presentational global orderBy (r8 sweep) — see profile_columns
    return quantile_profile(
        li, ["l_quantity", "l_extendedprice", "l_discount"])


@query("profile_quantiles_by_group", oracle="""
SELECT source,
       CAST(floor(quantile_cont(n_chars, 0.25) * 10000 + 0.5) AS BIGINT)
         AS p250_e4,
       CAST(floor(quantile_cont(n_chars, 0.5) * 10000 + 0.5) AS BIGINT)
         AS p500_e4,
       CAST(floor(quantile_cont(n_chars, 0.75) * 10000 + 0.5) AS BIGINT)
         AS p750_e4,
       CAST(floor(quantile_cont(n_chars, 0.95) * 10000 + 0.5) AS BIGINT)
         AS p950_e4,
       CAST(floor(quantile_cont(n_chars, 0.99) * 10000 + 0.5) AS BIGINT)
         AS p990_e4
FROM documents GROUP BY source ORDER BY source
""")
def profile_quantiles_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length quantiles — the stratified
    distribution check a mixing recipe consults (a source whose p99
    dwarfs its p50 needs chunking before packing). One grouped
    aggregation over one scan; same percentile_cont/e4 contract as
    `profile_quantiles`."""
    from .operators.profile import quantile_profile_grouped
    docs = load_table(spark, sf_dir, "documents")
    return (quantile_profile_grouped(docs, "source", "n_chars"))


@query("scale_skew_report", oracle="""
WITH counts AS (
  SELECT o_custkey, count(*) AS n_rows FROM orders GROUP BY o_custkey
), stats AS (
  SELECT sum(n_rows) AS total, count(*) AS n_keys FROM counts
)
SELECT o_custkey, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(floor(n_rows * 1000 / total) AS BIGINT) AS share_permille,
       CAST(floor(n_rows * n_keys * 100 / total) AS BIGINT) AS x_uniform_pct
FROM counts, stats
ORDER BY n_rows DESC, o_custkey LIMIT 10
""")
def scale_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew pre-flight: the 10 hottest order customers with row
    share and uniform-load multiple — the diagnostic that decides
    whether a join/agg needs salting before it runs. One aggregation +
    a 1-row broadcast."""
    from .operators.scale import skew_report
    orders = load_table(spark, sf_dir, "orders")
    return skew_report(orders, "o_custkey", top=10)


@query("profile_drift_psi", oracle="""
WITH refs AS (
  SELECT least(9, greatest(0, CAST(floor((value - 0.0) / 500.0 * 10)
                                   AS BIGINT))) AS bin
  FROM events WHERE ts < TIMESTAMP '2024-01-16'),
curs AS (
  SELECT least(9, greatest(0, CAST(floor((value - 0.0) / 500.0 * 10)
                                   AS BIGINT))) AS bin
  FROM events WHERE ts >= TIMESTAMP '2024-01-16'),
rb AS (SELECT bin, count(*) AS n_ref FROM refs GROUP BY bin),
cb AS (SELECT bin, count(*) AS n_cur FROM curs GROUP BY bin),
allb AS (SELECT unnest(range(0, 10)) AS bin),
j AS (SELECT allb.bin, coalesce(n_ref, 0) AS n_ref,
             coalesce(n_cur, 0) AS n_cur
      FROM allb LEFT JOIN rb ON allb.bin = rb.bin
                LEFT JOIN cb ON allb.bin = cb.bin),
t AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM j)
SELECT bin, n_ref, n_cur,
       CAST(floor(((n_ref + 0.5) / (tr + 5.0) - (n_cur + 0.5) / (tc + 5.0))
            * ln(((n_ref + 0.5) / (tr + 5.0)) / ((n_cur + 0.5) / (tc + 5.0)))
            * 1000000000.0 + 0.5) AS BIGINT) AS psi_nano
FROM j, t ORDER BY bin
""")
def profile_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-Stability-Index drift between the first and second half
    of the event stream's `value` distribution — the between-batches
    drift monitor run before a new crawl is admitted into training data.
    Fixed-width bins keep binning a pure projection (one scan per side,
    10-row aggregations); Laplace-smoothed per-bin PSI terms are
    nano-quantized so the oracle reproduces them bit-for-bit. Sum
    psi_nano for the headline PSI."""
    from .operators.profile import psi_drift
    events = load_table(spark, sf_dir, "events")
    ref = events.filter(F.col("ts") < "2024-01-16")
    cur = events.filter(F.col("ts") >= "2024-01-16")
    return psi_drift(ref, cur, "value", lo=0.0, hi=500.0, bins=10)
