"""Named query catalog: every implemented operator from SURVEY.md §2 exposed
as a (spark, sf_dir) -> DataFrame callable, with a matching DuckDB oracle SQL
string where the semantics are ANSI-SQL-expressible.

Registration: decorate with ``@query(name, oracle=...)``. ``__spark_entry__``
re-exports ``QUERIES`` / ``ORACLES`` verbatim.

Determinism rules (driver hashes values with columns sorted by name):
- every computed column aliased identically in Spark and SQL;
- float aggregates rounded to a fixed scale on both sides;
- timestamps emitted as formatted strings (Spark session TZ is UTC; DuckDB is
  UTC-naive);
- top-k / pagination always ordered with a unique tiebreak column.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from .catalog import load_table
from .model import FieldSpec, model
from .plans.listquery import ListParams, group_options, list_query

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


# ---------------------------------------------------------------------------
# Models (annotation metadata for the planner; SURVEY.md §1.2)
# ---------------------------------------------------------------------------

ORDERS = model(
    "orders",
    FieldSpec("o_orderkey", is_id=True, indexed=True),
    FieldSpec("o_custkey", link_to=("customer", "c_custkey")),
    FieldSpec("o_orderstatus", group_index=True),
    FieldSpec("o_totalprice", indexed=True),
    FieldSpec("o_orderdate", indexed=True),
    FieldSpec("o_orderpriority", group_index=True),
    default_order_by="o_orderkey",
)

CUSTOMER = model(
    "customer",
    FieldSpec("c_custkey", is_id=True, indexed=True),
    FieldSpec("c_name"),
    FieldSpec("c_nationkey", link_to=("nation", "n_nationkey")),
    FieldSpec("c_acctbal", secret=True),          # projection-masking demo
    FieldSpec("c_mktsegment", group_index=True),
    default_order_by="c_custkey",
)

DOCUMENTS = model(
    "documents",
    FieldSpec("doc_id", is_id=True, indexed=True),
    FieldSpec("text"),
    FieldSpec("lang", group_index=True),
    FieldSpec("source", group_index=True),
    FieldSpec("n_chars", searchable=False),       # search(false) parity
    default_order_by="doc_id",
)

EVENTS = model(
    "events",
    FieldSpec("event_id", is_id=True, indexed=True),
    FieldSpec("ts", indexed=True),
    FieldSpec("user_id"),
    FieldSpec("event_type", group_index=True),
    FieldSpec("value"),
    FieldSpec("props"),
    default_order_by="ts",
    default_order_direction="desc",               # events newest-first (O4)
)


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary (the north-star standard-aggregate
# surface; reference itself has only counts — SURVEY.md §2.4)
# ---------------------------------------------------------------------------

@query("q1_pricing_summary", oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 4)                                        AS avg_qty,
       round(avg(l_extendedprice), 4)                                   AS avg_price,
       round(avg(l_discount), 6)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""")
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# List-query family (P1-P6, O1-O3, A5) — the AutoAPI list endpoint semantics
# ---------------------------------------------------------------------------

@query("list_eq_filter", oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders
WHERE CAST(o_orderstatus AS VARCHAR) = 'F'
ORDER BY o_orderkey
LIMIT 25
""")
def list_eq_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: string-coerced equality filter + default order + first page."""
    df = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    return list_query(df, ORDERS, ListParams(filter={"o_orderstatus": "F"}))


@query("list_range_filter", oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice >= 100000 AND o_totalprice <= 150000
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 50
""")
def list_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: inclusive {from,to} range filter, desc order, page size 50."""
    df = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return list_query(df, ORDERS, ListParams(
        filter={"o_totalprice": {"from": 100000, "to": 150000}},
        order_by="o_totalprice", order_direction="desc", items_per_page=50))


@query("list_tag_search", oracle="""
SELECT o_orderkey, o_orderstatus, o_orderpriority
FROM orders
WHERE lower(CAST(o_orderpriority AS VARCHAR)) = '1-urgent'
  AND lower(CAST(o_orderstatus AS VARCHAR)) = 'f'
ORDER BY o_orderkey
LIMIT 25
""")
def list_tag_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: tagged search `key:value` -> conjunctive case-insensitive equality."""
    df = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority")
    return list_query(df, ORDERS, ListParams(
        search='o_orderpriority:"1-URGENT" o_orderstatus:f'))


@query("list_free_text", oracle="""
SELECT doc_id, lang, source
FROM documents
WHERE contains(lower(CAST(text AS VARCHAR)), 'vector')
   OR contains(lower(CAST(lang AS VARCHAR)), 'vector')
   OR contains(lower(CAST(source AS VARCHAR)), 'vector')
   OR contains(lower(CAST(doc_id AS VARCHAR)), 'vector')
ORDER BY doc_id
LIMIT 100
""")
def list_free_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: free-text substring over searchable columns (n_chars is
    search(false) and must NOT participate)."""
    df = load_table(spark, sf_dir, "documents")
    out = list_query(df, DOCUMENTS, ListParams(search="vector", items_per_page=100))
    return out.select("doc_id", "lang", "source")


@query("list_path_prefix", oracle="""
SELECT doc_id, source
FROM documents
WHERE starts_with(source, 'src1')
ORDER BY doc_id
LIMIT 100
""")
def list_path_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: hierarchical path-prefix filter (events path startswith)."""
    df = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return list_query(df, DOCUMENTS, ListParams(
        path_prefix="src1", path_column="source", items_per_page=100))


@query("projection_masking", oracle="""
SELECT c_custkey, c_name, c_nationkey, c_mktsegment
FROM customer
ORDER BY c_custkey
LIMIT 25
""")
def projection_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: secret column (c_acctbal) masked out of the list view."""
    df = load_table(spark, sf_dir, "customer")
    return list_query(df, CUSTOMER, ListParams())


@query("pagination_deep_page", oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25 OFFSET 75
""")
def pagination_deep_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O2/O3: ordered page fetch, page=3 at 25/page (offset 75)."""
    df = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return list_query(df, ORDERS, ListParams(
        order_by="o_totalprice", order_direction="desc", page=3))


@query("group_options", oracle="""
SELECT option FROM (
  SELECT DISTINCT o_orderpriority AS option FROM orders
) WHERE lower(CAST(option AS VARCHAR)) LIKE '1%'
ORDER BY option
LIMIT 100
""")
def group_options_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/P12: distinct group values with prefix search, limit 100."""
    df = load_table(spark, sf_dir, "orders")
    return group_options(df, "o_orderpriority", search="1")


# ---------------------------------------------------------------------------
# Aggregation family (A1-A4, A7)
# ---------------------------------------------------------------------------

@query("total_count", oracle="SELECT count(*) AS total FROM lineitem")
def total_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: materialized total count (parquet metadata-fast in Spark)."""
    return load_table(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("total"))


@query("group_count", oracle="""
SELECT c_mktsegment, count(*) AS cnt
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
""")
def group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: per-group counts (the group-index counters)."""
    return (load_table(spark, sf_dir, "customer")
            .groupBy("c_mktsegment").agg(F.count("*").alias("cnt"))
            .orderBy("c_mktsegment"))


@query("group_index_build", oracle="""
SELECT c_mktsegment,
       count(*) AS cnt,
       array_to_string(list(CAST(c_custkey AS VARCHAR) ORDER BY c_custkey), ',') AS ids
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
""")
def group_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: group-by index = per-group ordered id list + count
    (db.ts:476-545). Ordered id list via sort_array(collect_list)."""
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("cnt"),
            F.array_join(
                F.transform(F.array_sort(F.collect_list("c_custkey")),
                            lambda k: k.cast("string")),
                ",").alias("ids"),
        )
        .orderBy("c_mktsegment")
    )


@query("pages_envelope", oracle="""
SELECT count(*) AS total,
       CAST(ceil(count(*) / 25.0) AS BIGINT) AS pages,
       25 AS items_per_page
FROM orders WHERE CAST(o_orderstatus AS VARCHAR) = 'O'
""")
def pages_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/O3: the pagination envelope math (pages = ceil(total/n))."""
    df = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus").cast("string") == "O")
    return df.agg(
        F.count("*").alias("total"),
        F.ceil(F.count("*") / 25.0).alias("pages"),
        F.lit(25).alias("items_per_page"),
    )


@query("multi_prefix_group", oracle="""
WITH paths AS (
  SELECT event_type || '/u' || CAST(user_id % 10 AS VARCHAR)
         || '/' || CAST(event_id % 7 AS VARCHAR) AS path
  FROM events
), exploded AS (
  SELECT unnest(list_transform(
           range(1, len(string_split(path, '/')) + 1),
           i -> array_to_string(string_split(path, '/')[1:i], '/'))) AS prefix
  FROM paths
)
SELECT prefix, count(*) AS cnt FROM exploded GROUP BY prefix ORDER BY prefix
""")
def multi_prefix_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/F15: multi-membership grouping — every path indexed under ALL its
    prefixes ("a/b/c" -> ["a","a/b","a/b/c"], eventsSchemas.ts:6), then
    per-prefix counts. Pure JVM-side array ops (no UDF): transform(sequence)
    + slice + array_join, then explode + groupBy."""
    ev = load_table(spark, sf_dir, "events")
    path = F.concat(
        F.col("event_type"), F.lit("/u"), (F.col("user_id") % 10).cast("string"),
        F.lit("/"), (F.col("event_id") % 7).cast("string"))
    df = ev.select(path.alias("path"))
    parts = F.split(F.col("path"), "/")
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(F.slice(parts, F.lit(1), i), "/"))
    return (df.select(F.explode(prefixes).alias("prefix"))
            .groupBy("prefix").agg(F.count("*").alias("cnt"))
            .orderBy("prefix"))


# ---------------------------------------------------------------------------
# Join family (J1-J3, A6)
# ---------------------------------------------------------------------------

@query("link_join", oracle="""
SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
ORDER BY o_orderkey
LIMIT 100
""")
def link_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: linkTo FK resolution = broadcast left join to the dimension
    (generateApi.ts:166-177 recoverLinks). The dim side is broadcast —
    at 100 TB the fact side never shuffles."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment")
    return (
        orders.join(F.broadcast(cust),
                    orders.o_custkey == cust.c_custkey, "left")
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
        .orderBy("o_orderkey").limit(100)
    )


@query("read_multiple", oracle="""
SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 997 = 0)
ORDER BY l_orderkey, l_linenumber
""")
def read_multiple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: batched point-read = LEFT SEMI join against the requested id set,
    silently skipping missing ids (generateApi.ts:309-327)."""
    li = load_table(spark, sf_dir, "lineitem")
    ids = (load_table(spark, sf_dir, "orders")
           .filter(F.col("o_orderkey") % 997 == 0).select("o_orderkey"))
    return (li.join(F.broadcast(ids), li.l_orderkey == ids.o_orderkey, "left_semi")
            .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
            .orderBy("l_orderkey", "l_linenumber"))


@query("dedup_merge_first_wins", oracle="""
SELECT l_orderkey,
       arg_min(l_returnflag, printf('%04d-%06d-%06d', l_linenumber, l_partkey, l_suppkey)) AS first_flag,
       arg_min(l_quantity,   printf('%04d-%06d-%06d', l_linenumber, l_partkey, l_suppkey)) AS first_qty,
       array_to_string(list(CAST(l_partkey AS VARCHAR)
                            ORDER BY l_linenumber, l_partkey), ',') AS merged_parts
FROM lineitem
GROUP BY l_orderkey
ORDER BY l_orderkey
""")
def dedup_merge_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/U3: the promotions dedup-merge — first occurrence wins the scalar
    fields, duplicate rows' array fields are concatenated IN ROW ORDER with
    no dedup inside the array (models/ETL.ts:13-28). Row order here is the
    ingestion-order analog (l_linenumber, l_partkey, l_suppkey) — the
    synthetic data has duplicate linenumbers, so determinism needs the full
    unique composite (SURVEY.md §4.3.2).

    min_by on a formatted sort key gives first-wins scalars; the ordered
    merge is array_sort(collect_list(struct(order..., value))) -> transform
    — all JVM-side, one shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    ordkey = F.format_string("%04d-%06d-%06d", "l_linenumber", "l_partkey",
                             "l_suppkey")
    ordered_parts = F.transform(
        F.array_sort(F.collect_list(F.struct(
            F.col("l_linenumber").alias("o1"),
            F.col("l_partkey").alias("o2"),
            F.col("l_partkey").cast("string").alias("v")))),
        lambda s: s["v"])
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.min_by("l_returnflag", ordkey).alias("first_flag"),
            F.min_by("l_quantity", ordkey).alias("first_qty"),
            F.array_join(ordered_parts, ",").alias("merged_parts"),
        )
        .orderBy("l_orderkey")
    )


@query("dedup_first_wins", oracle="""
SELECT l_orderkey,
       arg_min(l_linenumber, printf('%04d-%06d-%06d', l_linenumber, l_partkey, l_suppkey)) AS l_linenumber,
       arg_min(l_partkey,    printf('%04d-%06d-%06d', l_linenumber, l_partkey, l_suppkey)) AS l_partkey,
       arg_min(l_quantity,   printf('%04d-%06d-%06d', l_linenumber, l_partkey, l_suppkey)) AS l_quantity
FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey
""")
def dedup_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: dedup by id keeping the FIRST row (ETL.ts:16-20 findIndex
    semantics) — min_by on the ingestion-order key, not dropDuplicates
    (which is nondeterministic under shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    ordkey = F.format_string("%04d-%06d-%06d", "l_linenumber", "l_partkey",
                             "l_suppkey")
    return (li.groupBy("l_orderkey")
            .agg(*[F.min_by(c, ordkey).alias(c)
                   for c in ("l_linenumber", "l_partkey", "l_quantity")])
            .orderBy("l_orderkey"))
