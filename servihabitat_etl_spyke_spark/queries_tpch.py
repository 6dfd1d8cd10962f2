"""Remaining TPC-H-shaped analytic queries + temporal-join extensions.

The reference's aggregate surface is counts only
(`packages/protonode/src/lib/db.ts:136-154`), so — like
``queries_analytics.py`` — everything here is north-star extension surface
over the driver's TPC-H-ish tables. This module completes the classic query
shapes that were still missing: bidirectional-filter multi-joins (Q7),
share-of-total (Q8), computed-profit rollups (Q9, adapted — the testdata has
no partsupp table, so the cost model uses ``p_retailprice``), conditional
counts over a date-arithmetic join (Q12, adapted — no commit/receipt dates,
lateness is ``l_shipdate`` vs ``o_orderdate``), outer-join histograms (Q13),
argmax-join (Q15), disjunctive pushdown (Q19), correlated min-per-group
(Q2, adapted — supplier↔part relation comes via lineitem), nested
semi/anti-join existence chains (Q21, adapted lateness), and anti-join with
scalar-subquery threshold (Q22, adapted — dormancy is "no orders since
cutoff" because every sf0.01 customer has at least one order).

Every query keeps the shuffle story explicit in its docstring; floats follow
the ``round2`` convention (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .catalog import load_table
from .functions.core import epoch_micros
from .operators.temporal import asof_join, interval_join
from .queries import query, round2, roundn

HIGH_PRI = ("1-URGENT", "2-HIGH")


@query("q7_nation_volume", oracle="""
SELECT supp_nation, cust_nation, l_year,
       floor(sum(volume) * 100 + 0.5) / 100 AS revenue
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01')
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""")
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between two nations by direction+year.

    The two nation dims broadcast (25 rows each); their equality filters
    reach supplier/customer *before* the fact joins, so the orders/lineitem
    shuffle carries only the ~8% of rows touching the two nations. The
    disjunctive pair filter applies post-join on broadcast columns — no
    extra shuffle."""
    li = (load_table(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= "1996-01-01")
                  & (F.col("l_shipdate") < "1998-01-01")))
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation")
    n1 = nat.select(F.col("n_nationkey").alias("sn_key"),
                    F.col("n_name").alias("supp_nation"))
    n2 = nat.select(F.col("n_nationkey").alias("cn_key"),
                    F.col("n_name").alias("cust_nation"))
    pair = ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")) | \
           ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
            .filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
            .filter(pair)
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").alias("l_year"))
            .agg(round2(F.sum(vol)).alias("revenue"))
            .orderBy("supp_nation", "cust_nation", "l_year"))


@query("q8_market_share", oracle="""
SELECT o_year,
       floor(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume) * 10000 + 0.5) / 10000 AS mkt_share
FROM (SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01')
GROUP BY o_year ORDER BY o_year
""")
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional revenue per year.

    Share-of-total folds into a single grouped aggregate (conditional sum /
    total sum) — no second pass over the data. The part-type filter prunes
    the fact scan through the partkey join; region/nation broadcast."""
    part = (load_table(spark, sf_dir, "part")
            .filter(F.col("p_type") == "ECONOMY").select("p_partkey"))
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = (load_table(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate") >= "1995-01-01")
                      & (F.col("o_orderdate") < "1997-01-01"))
              .select("o_orderkey", "o_custkey", "o_orderdate"))
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation")
    reg = (load_table(spark, sf_dir, "region")
           .filter(F.col("r_name") == "EUROPE").select("r_regionkey"))
    n1 = (nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
          .select(F.col("n_nationkey").alias("cn_key")))
    n2 = nat.select(F.col("n_nationkey").alias("sn_key"),
                    F.col("n_name").alias("nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    share_num = F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0))
    return (li
            .join(part, li.l_partkey == part.p_partkey)
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key"))
            .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
            .groupBy(F.year("o_orderdate").alias("o_year"))
            .agg(roundn(share_num / F.sum(vol), 4).alias("mkt_share"))
            .orderBy("o_year"))


@query("q9_product_profit", oracle="""
SELECT nation, o_year, floor(sum(amount) * 100 + 0.5) / 100 AS sum_profit
FROM (SELECT n_name AS nation, year(o_orderdate) AS o_year,
             floor((l_extendedprice * (1 - l_discount)
               - 0.6 * p_retailprice * l_quantity) * 100 + 0.5) / 100 AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%gear%')
GROUP BY nation, o_year ORDER BY nation, o_year
""")
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted): profit by supplier nation × order year.

    No partsupp table in the testdata, so supply cost is modeled as
    ``0.6 * p_retailprice`` per unit — the *shape* (substring part filter →
    4-way join → computed measure → two-level rollup) is what's exercised.
    The `%gear%` LIKE cannot push to a dictionary filter but does prune
    before the join; part/supplier/nation broadcast, one fact shuffle.
    The per-row amount is rounded to cents BEFORE summing (identically in
    the oracle): engine sum order differs, and a raw-double sum can land on
    opposite sides of a half-cent boundary (seen at sf0.01); cent-exact
    addends keep the total ~0.005 away from any rounding edge."""
    part = (load_table(spark, sf_dir, "part")
            .filter(F.col("p_name").contains("gear"))
            .select("p_partkey", "p_retailprice"))
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation"))
    amount = round2(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - 0.6 * F.col("p_retailprice") * F.col("l_quantity"))
    return (li
            .join(part, li.l_partkey == part.p_partkey)
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy("nation", F.year("o_orderdate").alias("o_year"))
            .agg(round2(F.sum(amount)).alias("sum_profit"))
            .orderBy("nation", "o_year"))


@query("q12_late_priority", oracle="""
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_linestatus ORDER BY l_linestatus
""")
def q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted): priority mix of late shipments.

    No commit/receipt dates in the testdata — "late" is shipped >90 days
    after order date, a cross-table date comparison that only resolves
    post-join; the conditional counts fold into one aggregate pass."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate")
    is_high = F.col("o_orderpriority").isin(*HIGH_PRI)
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .filter(F.col("l_shipdate") >
                    F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
            .groupBy("l_linestatus")
            # low counts via NOT(is_high), not otherwise(1): a NULL priority
            # must count as NEITHER high nor low (CASE WHEN x NOT IN ...
            # THEN 1 ELSE 0 yields 0 for NULL), and when(is_high, 0)
            # .otherwise(1) would count it as low
            .agg(F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"))
            .orderBy("l_linestatus"))


@query("q13_customer_distribution", oracle="""
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
""")
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: orders-per-customer histogram including zeros.

    The left join keeps order-less customers (count 0 bucket); the join
    condition's priority filter belongs in the ON clause, not WHERE — a
    WHERE would silently drop the zero bucket. Two aggregations, but the
    second groups the already-tiny per-customer counts."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey",
                                                        "o_orderpriority")
    per_cust = (cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey)
        & (orders.o_orderpriority != "4-NOT SPECIFIED"),
        "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))
            .orderBy(F.col("custdist").desc(), F.col("c_count").desc()))


@query("q15_top_supplier", oracle="""
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         sum(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name,
       floor(total_revenue * 100 + 0.5) / 100 AS total_revenue
FROM supplier JOIN rev ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
""")
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: argmax over a derived aggregate (top supplier by
    quarterly revenue, keeping ties).

    The revenue rollup shrinks lineitem to one row per supplier; the scalar
    max comes back via a 1-row broadcast cross join — no second scan of the
    fact, no single-partition global window.

    The rollup is persisted + materialized BEFORE the max: it feeds both
    the scalar and the equality probe, and without the pin each consumer
    re-runs the final aggregation, merging shuffle partials in its own
    fetch order — the recomputed double can differ from the one that
    produced __max_rev in the last ulp and the float-equality join then
    drops the argmax row (same dual-consumer hazard q11 pins against;
    this also halves the fact scans)."""
    li = (load_table(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= "1996-01-01")
                  & (F.col("l_shipdate") < "1996-04-01")))
    rev = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
           .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .alias("total_revenue"))
           .persist())
    rev.count()
    top = rev.agg(F.max("total_revenue").alias("__max_rev"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (rev.join(F.broadcast(top),
                     rev.total_revenue == F.col("__max_rev"))
            .join(supp, F.col("supplier_no") == supp.s_suppkey)
            .select("s_suppkey", "s_name",
                    round2(F.col("total_revenue")).alias("total_revenue"))
            .orderBy("s_suppkey"))


@query("q19_disjunctive_bands", oracle="""
SELECT floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
         AS revenue,
       count(*) AS n
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""")
def q19_disjunctive_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR of conjunctive band predicates across the join.

    The single-side disjuncts are still prunable: Catalyst derives
    ``p_brand IN (...)`` / ``l_quantity <= 30`` residuals pushed to each
    scan, so both join inputs shrink before the shuffle even though the
    full predicate spans both tables."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand",
                                                    "p_size")
    def band(brand: str, size_hi: int, q_lo: int, q_hi: int):
        return ((F.col("p_brand") == brand)
                & F.col("p_size").between(1, size_hi)
                & F.col("l_quantity").between(q_lo, q_hi))
    pred = (band("Brand#12", 5, 1, 11)
            | band("Brand#23", 10, 10, 20)
            | band("Brand#3", 15, 20, 30))
    return (li.join(part, li.l_partkey == part.p_partkey)
            .filter(pred)
            .agg(round2(F.sum(F.col("l_extendedprice")
                              * (1 - F.col("l_discount")))).alias("revenue"),
                 F.count("*").alias("n")))


@query("q2_min_acctbal_supplier", oracle="""
WITH cand AS (
  SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  JOIN region   ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE' AND p_type = 'LARGE' AND p_size <= 10)
SELECT floor(s_acctbal * 100 + 0.5) / 100 AS s_acctbal,
       s_name, n_name, p_partkey, p_name
FROM cand
WHERE s_acctbal = (SELECT min(s_acctbal) FROM cand c2
                   WHERE c2.p_partkey = cand.p_partkey)
ORDER BY s_acctbal DESC, p_partkey, s_name
LIMIT 100
""")
def q2_min_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted): per-part minimum over a correlated group.

    No partsupp table — the part↔supplier relation is derived from shipped
    lineitems, and the minimized measure is ``s_acctbal`` (stands in for
    ``ps_supplycost``). The correlated min decorrelates into a per-part
    aggregate joined back on equality, keeping ties — same plan Catalyst
    produces for the subquery form. Distinct runs on the already-pruned
    candidate set (one shuffle on the composite key).

    The candidate set is persisted + materialized before the per-part min:
    it feeds both the aggregate and the join-back probe, and without the
    pin the whole lineitem-join-part-join-supplier subplan executes twice
    (a doubled fact scan at scale). Correctness would survive — min() over
    stored column values is fold-order-free — but the float-equality
    join-back on s_acctbal deserves the same identical-bits guarantee q15
    pins for its argmax."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = (load_table(spark, sf_dir, "part")
            .filter((F.col("p_type") == "LARGE") & (F.col("p_size") <= 10))
            .select("p_partkey", "p_name"))
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = (load_table(spark, sf_dir, "region")
           .filter(F.col("r_name") == "EUROPE").select("r_regionkey"))
    eu_supp = (supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
               .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
               .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    cand = (li.join(part, li.l_partkey == part.p_partkey)
            .join(F.broadcast(eu_supp), li.l_suppkey == eu_supp.s_suppkey)
            .select("p_partkey", "p_name", "s_suppkey", "s_name",
                    "s_acctbal", "n_name")
            .distinct()
            .persist())
    cand.count()
    mins = cand.groupBy(F.col("p_partkey").alias("mk")) \
               .agg(F.min("s_acctbal").alias("min_bal"))
    return (cand.join(mins, (cand.p_partkey == mins.mk)
                      & (cand.s_acctbal == mins.min_bal))
            .select(round2(F.col("s_acctbal")).alias("s_acctbal"),
                    "s_name", "n_name", "p_partkey", "p_name")
            .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_name")
            .limit(100))


@query("q21_sole_late_supplier", oracle="""
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND s_nationkey = n_nationkey
  AND n_name = 'NATION_5'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name ORDER BY numwait DESC, s_name
""")
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted): suppliers who were the *only* late
    supplier on a multi-supplier finished order.

    Lateness is shipdate >60 days after order date (no receipt/commit dates
    in the testdata). The existence chain compiles to one left-semi and one
    left-anti join, both on orderkey — co-partitioned with the base join, so
    AQE fuses the three shuffles onto one exchange of the filtered fact.
    The nation filter broadcasts and prunes suppliers first."""
    ordF = (load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_orderdate"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    nat = (load_table(spark, sf_dir, "nation")
           .filter(F.col("n_name") == "NATION_5").select("n_nationkey"))
    supp = (load_table(spark, sf_dir, "supplier")
            .join(F.broadcast(nat),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "s_name"))
    l1 = (li.join(ordF, li.l_orderkey == ordF.o_orderkey)
          .filter(late)
          .select(F.col("l_orderkey").alias("k"),
                  F.col("l_suppkey").alias("sk")))
    other = li.select(F.col("l_orderkey").alias("k"),
                      F.col("l_suppkey").alias("o_sk"))
    other_late = (li.join(ordF, li.l_orderkey == ordF.o_orderkey)
                  .filter(late)
                  .select(F.col("l_orderkey").alias("k"),
                          F.col("l_suppkey").alias("o_sk")))
    waiting = (l1
               .join(other, (l1.k == other.k) & (F.col("sk") != F.col("o_sk")),
                     "left_semi")
               .join(other_late,
                     (l1.k == other_late.k) & (F.col("sk") != F.col("o_sk")),
                     "left_anti"))
    return (waiting.join(F.broadcast(supp), waiting.sk == supp.s_suppkey)
            .groupBy("s_name").agg(F.count("*").alias("numwait"))
            .orderBy(F.col("numwait").desc(), "s_name"))


@query("q22_dormant_customers", oracle="""
SELECT c_nationkey, count(*) AS numcust,
       floor(sum(c_acctbal) * 100 + 0.5) / 100 AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_nationkey ORDER BY c_nationkey
""")
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted): well-funded customers gone dormant.

    Every sf0.01 customer has at least one order, so dormancy is "no order
    since 1999-01-01" (keeps the anti-join non-trivial); grouping is by
    nationkey (no phone column). The scalar average broadcasts as a 1-row
    cross join; the anti-join's build side is orders pre-filtered by the
    cutoff and reduced to distinct custkeys — keys only on the wire."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal")
    avg_bal = (cust.filter(F.col("c_acctbal") > 0.0)
               .agg(F.avg("c_acctbal").alias("__avg_bal")))
    recent = (load_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate") >= "1999-01-01")
              .select(F.col("o_custkey").alias("c_custkey")).distinct())
    return (cust.join(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("__avg_bal"))
            .join(recent, "c_custkey", "left_anti")
            .groupBy("c_nationkey")
            .agg(F.count("*").alias("numcust"),
                 round2(F.sum("c_acctbal")).alias("totacctbal"))
            .orderBy("c_nationkey"))


# ---------------------------------------------------------------------------
# Temporal joins (operators/temporal.py) over the events table
# ---------------------------------------------------------------------------


@query("asof_join_events", oracle="""
SELECT p.user_id, p.event_id AS purchase_id, c.click_id, c.gap_us
FROM events p
LEFT JOIN LATERAL (
  SELECT cc.event_id AS click_id,
         epoch_us(p.ts) - epoch_us(cc.ts) AS gap_us
  FROM events cc
  WHERE cc.user_id = p.user_id AND cc.event_type = 'click' AND cc.ts <= p.ts
  ORDER BY cc.ts DESC, cc.event_id DESC LIMIT 1) AS c ON TRUE
WHERE p.event_type = 'purchase'
ORDER BY purchase_id
""")
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase gets the user's latest click at or
    before it (id + microsecond gap; NULL when the purchase precedes every
    click).

    The oracle is the O(n·m) correlated-LATERAL form; the engine runs the
    union-marker window plan from operators/temporal.py — one shuffle on
    user_id, no per-key materialization (see module docstring for why that
    survives 100 TB)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", F.col("event_id").alias("purchase_id"),
                         "ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", F.col("event_id").alias("click_id"),
                      F.col("ts").alias("cts")))
    out = asof_join(purchases, clicks, on=["user_id"],
                    left_ts="ts", right_ts="cts", right_cols=["click_id"])
    return (out.select(
        "user_id", "purchase_id", "click_id",
        (epoch_micros(out, "ts") - epoch_micros(out, "cts_asof"))
        .alias("gap_us"))
        .orderBy("purchase_id"))


@query("range_join_events", oracle="""
SELECT e.event_id AS err_id, count(c.event_id) AS n_clicks
FROM events e
LEFT JOIN events c
  ON c.user_id = e.user_id AND c.event_type = 'click'
 AND c.ts >= e.ts - INTERVAL 10 MINUTE AND c.ts < e.ts
WHERE e.event_type = 'error'
GROUP BY e.event_id ORDER BY e.event_id
""")
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-interval join: clicks in the 10 minutes before each error,
    counted per error (zeros kept).

    The oracle's inequality join is quadratic per user; the engine buckets
    clicks into 10-minute bins and each error probes its ≤2 overlapping
    bins (operators/temporal.py) — an equi-join Catalyst shuffles once on
    (user_id, bin). Unmatched errors come back via a left join against the
    tiny per-error count table."""
    ev = load_table(spark, sf_dir, "events")
    errors = (ev.filter(F.col("event_type") == "error")
              .select("user_id", F.col("event_id").alias("err_id"), "ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", F.col("event_id").alias("click_id"),
                      F.col("ts").alias("cts")))
    pairs = interval_join(errors, clicks, on=["user_id"],
                          left_ts="ts", right_ts="cts",
                          lower_sec=-600, upper_sec=0)
    counts = pairs.groupBy("err_id").agg(F.count("*").alias("__n"))
    return (errors.join(counts, "err_id", "left")
            .select("err_id",
                    F.coalesce(F.col("__n"), F.lit(0)).alias("n_clicks"))
            .orderBy("err_id"))


@query("q11_important_parts", oracle="""
WITH supplied AS (
  SELECT l_partkey, l_extendedprice * (1 - l_discount) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'),
per_part AS (
  SELECT l_partkey AS p_key, sum(value) AS v
  FROM supplied GROUP BY l_partkey)
SELECT p_key, floor(v * 100 + 0.5) / 100 AS part_value
FROM per_part
WHERE v > (SELECT sum(v) * 0.0012 FROM per_part)
ORDER BY p_key
""")
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted): parts whose supplied value from one
    nation's suppliers exceeds a fraction of that nation's total. No
    partsupp table, so "supplied value" is revenue from lineitem.

    Shape: grouped agg + global scalar threshold. The scalar is a second
    aggregation over the SAME grouped result (sum of per-part sums — exact
    same addends), broadcast back as a 1-row cross join: the fact table is
    scanned and shuffled ONCE, and because both sides of the HAVING
    comparison are sums of identical per-part doubles, the engine/oracle
    margin is the per-part spacing (~1e2), never a fold-order ulp.
    Output ordered by key, not by the float measure.

    The per-part aggregate is persisted eagerly: it feeds BOTH the scalar
    threshold and the output rows, and without the cache Spark re-derives
    it from the fact table — a doubled 100 TB scan (observed as 6 parquet
    scans in the uncached plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = (load_table(spark, sf_dir, "nation")
           .filter(F.col("n_name") == "NATION_3").select("n_nationkey"))
    value = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = (li
                .join(F.broadcast(
                    supp.join(F.broadcast(nat),
                              supp.s_nationkey == nat.n_nationkey)
                    .select("s_suppkey")),
                    li.l_suppkey == F.col("s_suppkey"))
                .groupBy(F.col("l_partkey").alias("p_key"))
                .agg(F.sum(value).alias("_v"))
                .persist())
    per_part.count()
    total = per_part.agg((F.sum("_v") * 0.0012).alias("_thr"))
    return (per_part.join(F.broadcast(total))
            .filter(F.col("_v") > F.col("_thr"))
            .select("p_key", round2(F.col("_v")).alias("part_value"))
            .orderBy("p_key"))


@query("q16_supplier_part_counts", oracle="""
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM part
JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""")
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted): distinct suppliers per part group,
    excluding a brand, a type, and "complaint" suppliers (no s_comment in
    the testdata — negative account balance stands in).

    The part filters (two <> plus an IN-list on size) prune ~93% of parts
    BEFORE the fact join; the excluded-supplier list is a broadcast
    anti-join (tiny by construction). countDistinct plans as two-phase
    partial aggregation — one shuffle on the group key. Integer-only
    output; the count is the sort leader with the full group key as
    tiebreak."""
    part = (load_table(spark, sf_dir, "part")
            .filter((F.col("p_brand") != "Brand#3")
                    & (F.col("p_type") != "PROMO")
                    & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
            .select("p_partkey", "p_brand", "p_type", "p_size"))
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = (load_table(spark, sf_dir, "supplier")
           .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    return (li
            .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
            .join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"))


@query("q20_concentrated_suppliers", oracle="""
SELECT s_name FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'small%'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                     AND l_shipdate <  TIMESTAMP '1998-01-01'
                    THEN l_quantity ELSE 0 END) > 0.5 * sum(l_quantity))
ORDER BY s_name
""")
def q20_concentrated_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted): suppliers in one nation who shipped more
    than half their all-time volume of some 'small%' part during 1997 (the
    partsupp availqty comparison becomes a within-group share-of-total).

    Shape: conditional-sum HAVING over a (supplier, part) grouping, then a
    semi-join back to the supplier dim. Quantities are integer-valued
    doubles, so both sides of the 0.5x comparison are exact in either
    engine — no fold-order risk. The part prefix filter prunes before the
    fact join; the qualifying-supplier list semi-joins broadcast."""
    part = (load_table(spark, sf_dir, "part")
            .filter(F.col("p_name").startswith("small")).select("p_partkey"))
    li = load_table(spark, sf_dir, "lineitem")
    in97 = ((F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01"))
    qualifying = (li
                  .join(F.broadcast(part), li.l_partkey == part.p_partkey)
                  .groupBy("l_suppkey", "l_partkey")
                  .agg(F.sum(F.when(in97, F.col("l_quantity")).otherwise(0.0))
                       .alias("_q97"),
                       F.sum("l_quantity").alias("_qall"))
                  .filter(F.col("_q97") > 0.5 * F.col("_qall"))
                  .select("l_suppkey").distinct())
    nat = (load_table(spark, sf_dir, "nation")
           .filter(F.col("n_name") == "NATION_3").select("n_nationkey"))
    supp = load_table(spark, sf_dir, "supplier")
    return (supp
            .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
            .join(F.broadcast(qualifying),
                  supp.s_suppkey == F.col("l_suppkey"), "left_semi")
            .select("s_name").orderBy("s_name"))


@query("asof_forward_events", oracle="""
SELECT e.user_id, e.event_id AS err_id, c.click_id, c.gap_us
FROM events e
LEFT JOIN LATERAL (
  SELECT cc.event_id AS click_id,
         epoch_us(cc.ts) - epoch_us(e.ts) AS gap_us
  FROM events cc
  WHERE cc.user_id = e.user_id AND cc.event_type = 'click' AND cc.ts >= e.ts
  ORDER BY cc.ts ASC, cc.event_id DESC LIMIT 1) AS c ON TRUE
WHERE e.event_type = 'error'
ORDER BY err_id
""")
def asof_forward_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each error gets the user's first click at or
    after it (the "did the user recover" probe; NULL when nothing
    follows). Same union-marker single-window plan as the backward form,
    scanned descending — the oracle is the quadratic correlated-LATERAL
    twin."""
    ev = load_table(spark, sf_dir, "events")
    errors = (ev.filter(F.col("event_type") == "error")
              .select("user_id", F.col("event_id").alias("err_id"), "ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", F.col("event_id").alias("click_id"),
                      F.col("ts").alias("cts")))
    out = asof_join(errors, clicks, on=["user_id"],
                    left_ts="ts", right_ts="cts", right_cols=["click_id"],
                    direction="forward")
    return (out.select(
        "user_id", "err_id", "click_id",
        (epoch_micros(out, "cts_asof") - epoch_micros(out, "ts"))
        .alias("gap_us"))
        .orderBy("err_id"))


@query("q3_unshipped_topk", oracle="""
SELECT l_orderkey,
       floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
         AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate  > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""")
def q3_unshipped_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (adapted): top-10 highest-revenue orders placed
    before the cutoff but not yet fully shipped, for one market segment.
    (The testdata has no ``o_shippriority``; ``o_orderpriority`` rides
    along in its place — same carried-dimension shape.)

    The segment filter reduces customer to ~1/5 before it joins (still
    broadcast-sized relative to the fact side); both date filters push
    into the orders/lineitem parquet scans, so the single fact shuffle
    joins only pre-cutoff orders against post-cutoff lines. The final
    top-10 is a TakeOrdered over the grouped result — no global sort.
    ``l_orderkey`` closes the ORDER BY for hash-stable ties."""
    cust = (load_table(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey"))
    orders = (load_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate") < "1998-06-01")
              .select("o_orderkey", "o_custkey", "o_orderdate",
                      "o_orderpriority"))
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_shipdate") > "1998-06-01")
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey,
                  "left_semi")
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(round2(F.sum(rev)).alias("revenue"))
            .select("l_orderkey", "revenue", "o_orderdate",
                    "o_orderpriority")
            .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
            .limit(10))


@query("q5_local_supplier_volume", oracle="""
SELECT n_name,
       floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
         AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
            AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name ORDER BY revenue DESC, n_name
""")
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where customer and supplier are
    LOCAL to each other (same nation), one region, one year. This is the
    classic cyclic-join query — the c_nationkey = s_nationkey equality
    closes the customer→orders→lineitem→supplier chain into a cycle.

    Region prunes nation to 1/5 on the driver side of a broadcast;
    supplier (with its nation filter applied through the broadcast join)
    also broadcasts, so the only shuffle joins the date-pruned orders to
    lineitem. The nation-equality filter evaluates post-join on two
    broadcast-carried columns — no extra exchange. ``n_name`` closes the
    ORDER BY (revenue ties across nations are possible in principle)."""
    reg = (load_table(spark, sf_dir, "region")
           .filter(F.col("r_name") == "ASIA").select("r_regionkey"))
    nat = (load_table(spark, sf_dir, "nation")
           .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
           .select("n_nationkey", "n_name"))
    supp = (load_table(spark, sf_dir, "supplier")
            .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "s_nationkey", "n_name"))
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (load_table(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate") >= "1997-01-01")
                      & (F.col("o_orderdate") < "1998-01-01"))
              .select("o_orderkey", "o_custkey"))
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(supp), (li.l_suppkey == supp.s_suppkey)
                  & (cust.c_nationkey == supp.s_nationkey))
            .groupBy("n_name")
            .agg(round2(F.sum(rev)).alias("revenue"))
            .orderBy(F.col("revenue").desc(), "n_name"))
