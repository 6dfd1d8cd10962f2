"""Source-layer + flow-predicate query registrations (SURVEY.md §2.1
S8/S10, §2.2 P9/P11).

Sheet fixtures are literal in both engines (VALUES oracle) — the operator
under test is the header-zip / keyed-upsert semantics, not the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .catalog import TABLES, load_table
from .queries import query, round2
from .sources import catalog_table, sheet_from_rows, sheet_upsert

# ---------------------------------------------------------------------------
# S8/S9: sheets
# ---------------------------------------------------------------------------

#: header + rows, including a short row (pads to '') and an over-long row
#: (extra cell dropped) — the exact zip semantics of getSpreadSheetElements
_SHEET = [
    ["id", "name", " region "],
    ["1", "acme", "emea"],
    ["2", "globex"],                      # short -> region ''
    ["3", "initech", "apac", "EXTRA"],    # long -> extra cell dropped
]

_UPDATES = [
    ("2", "globex-2", "amer"),            # existing key -> replaced
    ("4", "umbrella", "emea"),            # new key -> appended
]


@query("sheets_ingest", oracle="""
SELECT * FROM (VALUES ('1', 'acme', 'emea'),
                      ('2', 'globex', ''),
                      ('3', 'initech', 'apac'))
       AS t(id, name, region)
ORDER BY id
""")
def sheets_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: header-zip ingest — short rows pad, long rows truncate, header
    names sanitize (' region ' -> 'region'), everything stays string."""
    return sheet_from_rows(spark, _SHEET)


@query("sheets_keyed_upsert", oracle="""
SELECT * FROM (VALUES ('1', 'acme', 'emea'),
                      ('2', 'globex-2', 'amer'),
                      ('3', 'initech', 'apac'),
                      ('4', 'umbrella', 'emea'))
       AS t(id, name, region)
ORDER BY id
""")
def sheets_keyed_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: keyed put = update-in-place else append (batched as one
    anti-join union — MERGE INTO shape)."""
    sheet = sheet_from_rows(spark, _SHEET)
    updates = spark.createDataFrame(
        _UPDATES, "id string, name string, region string")
    return sheet_upsert(sheet, updates, "id")


# ---------------------------------------------------------------------------
# S10: catalog introspection (virtual `databases` table)
# ---------------------------------------------------------------------------

@query("catalog_introspect", oracle="""
SELECT table_name, CAST(count(*) AS INT) AS n_columns
FROM information_schema.columns
GROUP BY table_name ORDER BY table_name
""")
def catalog_introspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10: datasets-as-rows — every registered table with its column
    count, from parquet footers only (no data scan); the oracle asks
    DuckDB's information_schema the same question."""
    return catalog_table(spark, sf_dir, TABLES)


# ---------------------------------------------------------------------------
# P9/P10/P11: flow predicates
# ---------------------------------------------------------------------------

@query("switch_route", oracle="""
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_returnflag = 'R' THEN 'then' ELSE 'else' END AS eq_route,
       CASE WHEN l_quantity > 25 THEN 'then' ELSE 'else' END AS gt_route,
       CASE WHEN contains(l_returnflag || l_linestatus, 'N')
            THEN 'then' ELSE 'else' END AS includes_route
FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey
LIMIT 1000
""")
def switch_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9/P10: the comparison-switch router — equals / greater / includes
    predicates each route rows to a then/else branch
    (flowSwitch.ts:8-67). One CASE per predicate, pure codegen."""
    li = load_table(spark, sf_dir, "lineitem")
    route = lambda c: F.when(c, "then").otherwise("else")  # noqa: E731
    return (li.select(
        "l_orderkey", "l_linenumber",
        route(F.col("l_returnflag") == "R").alias("eq_route"),
        route(F.col("l_quantity") > 25).alias("gt_route"),
        route(F.concat("l_returnflag", "l_linestatus").contains("N"))
        .alias("includes_route"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        .limit(1000))


@query("range_banding", oracle="""
SELECT event_id, floor(value * 100 + 0.5) / 100 AS value,
       CASE WHEN value > 60 + 15 THEN 'above'
            WHEN value < 60 - 15 THEN 'below' ELSE 'in-range' END AS band,
       floor(CASE WHEN value > 60 + 15 THEN value - (60 + 15)
                  WHEN value < 60 - 15 THEN (60 - 15) - value
                  ELSE 0 END * 100 + 0.5) / 100 AS delta
FROM events ORDER BY event_id
""")
def range_banding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11: value vs desired±threshold -> above/below/in-range band plus
    the distance to the band edge (flowInRange.ts:5-38)."""
    desired, threshold = 60.0, 15.0
    ev = load_table(spark, sf_dir, "events")
    hi, lo = desired + threshold, desired - threshold
    v = F.col("value")
    band = (F.when(v > hi, "above").when(v < lo, "below")
            .otherwise("in-range"))
    delta = (F.when(v > hi, v - hi).when(v < lo, lo - v)
             .otherwise(F.lit(0.0)))
    # round2, not F.round: the two engines disagree on half-cent edges
    # (queries.round2 docstring) — identical on current data, but the
    # parity gate must not depend on that data property
    return (ev.select("event_id", round2(v).alias("value"),
                      band.alias("band"),
                      round2(delta).alias("delta")))


# ---------------------------------------------------------------------------
# Runtime model DDL (the `objects` bundle: models declared from a JSON
# description at runtime — reference objectsAPI.ts:133-193,
# objectsSchemas.ts:11-20,63-78)
# ---------------------------------------------------------------------------

@query("runtime_model_ddl", oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE CAST(c_mktsegment AS VARCHAR) = 'BUILDING'
ORDER BY c_custkey
LIMIT 25 OFFSET 25
""")
def runtime_model_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declare a model from a reference-style JSON description (id / indexed /
    groupIndex / secret modifiers), bind it to existing parquet, and run a
    list query THROUGH the declared metadata: the secret key (acct bal) is
    masked out of the list view, the filter hits the groupIndex key, paging
    orders by the id key. Whitespace in the model name and a key name is
    stripped exactly as the reference's put handler does."""
    from .engine import Engine
    eng = Engine(spark, sf_dir)
    eng.create_model({
        "name": "client book",           # -> "clientbook"
        "keys": {
            "c_custkey": {"type": "number", "params": ["int"],
                          "modifiers": [{"name": "id"}]},
            "c_name ":   {"type": "string"},   # -> "c_name"
            "c_acctbal": {"type": "number",
                          "modifiers": [{"name": "secret"}]},
            "c_mktsegment": {"type": "string",
                             "modifiers": [{"name": "groupIndex"}]},
        },
        "defaultOrderBy": "c_custkey",
    }, bind_to="customer")
    return eng.list("clientbook", filter={"c_mktsegment": "BUILDING"}, page=1)


@query("runtime_model_bootstrap", oracle="""
SELECT o_orderpriority AS priority,
       count(*) AS n_orders,
       floor(sum(o_totalprice) * 100 + 0.5) / 100 AS revenue
FROM orders
GROUP BY priority
ORDER BY priority
""")
def runtime_model_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full runtime-table lifecycle: declare a NEW model from a JSON
    description, bootstrap it with initial data (S12), and read it back via
    engine SQL — proving runtime-declared tables are immediately SQL-visible
    alongside the parquet catalog (the reference provisions a fresh CRUD
    store per object; here the store is the registered DataFrame view)."""
    from .engine import Engine
    eng = Engine(spark, sf_dir)
    stats = (load_table(spark, sf_dir, "orders")
             .groupBy(F.col("o_orderpriority").alias("priority"))
             .agg(F.count("*").alias("n_orders"),
                  (F.floor(F.sum("o_totalprice") * 100 + F.lit(0.5)) / 100
                   ).alias("revenue")))
    eng.create_model({
        "name": "order_stats",
        "keys": {
            "priority": {"type": "string", "modifiers": [{"name": "id"}]},
            "n_orders": {"type": "number", "params": ["int"]},
            "revenue":  {"type": "number"},
        },
    }, data=stats)
    return eng.sql(
        "SELECT priority, n_orders, revenue FROM order_stats ORDER BY priority")


@query("runtime_model_sheet", oracle="""
WITH sheet AS (
  SELECT CAST(n_nationkey AS VARCHAR) AS n_nationkey,
         CAST(n_name AS VARCHAR) AS n_name,
         CAST(n_regionkey AS VARCHAR) AS n_regionkey
  FROM nation WHERE n_nationkey <> 3
  UNION ALL SELECT '3', 'CANADA-EAST', '9'
  UNION ALL SELECT '99', 'ATLANTIS', '9'
)
SELECT n_nationkey, n_name, n_regionkey FROM sheet ORDER BY n_nationkey
""")
def runtime_model_sheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime model bound to a SHEET store (the reference's objects
    bundle lets a dynamically created object pick Google Sheets as its
    backend, objectsAPI.ts:169): every column is string-typed (sheets
    have no types), a keyed put updates one existing row in place and
    appends one new row (googleSheetClient.ts:198-238 semantics via
    sheet_upsert), and the result is served through the STANDARD
    list-query path — string-typed ordering and all (sheet rows sort
    lexicographically: 0 < 1 < 10 < 2). The oracle replays bootstrap +
    upsert with VARCHAR casts + UNION ALL."""
    from .engine import Engine
    eng = Engine(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey")
    eng.create_model({
        "name": "partner_sheet",
        "keys": {
            "n_nationkey": {"type": "string", "modifiers": [{"name": "id"}]},
            "n_name": {"type": "string"},
            "n_regionkey": {"type": "string"},
        },
        "defaultOrderBy": "n_nationkey",
    }, data=nation, storage="sheet")
    eng.put("partner_sheet", [
        {"n_nationkey": 3, "n_name": "CANADA-EAST", "n_regionkey": 9},
        {"n_nationkey": 99, "n_name": "ATLANTIS", "n_regionkey": 9},
    ])
    return eng.list("partner_sheet", order_by="n_nationkey", all_rows=True)


@query("sheet_model_list_page", oracle="""
WITH sheet AS (
  SELECT CAST(c_custkey AS VARCHAR) AS c_custkey,
         CAST(c_name AS VARCHAR) AS c_name,
         CAST(c_mktsegment AS VARCHAR) AS c_mktsegment,
         CAST(c_nationkey AS VARCHAR) AS c_nationkey
  FROM customer
)
SELECT c_custkey, c_name, c_mktsegment, c_nationkey FROM sheet
WHERE c_mktsegment = 'BUILDING'
ORDER BY c_custkey
LIMIT 20 OFFSET 40
""")
def sheet_model_list_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 + O1/O2/O3 over a SHEET-backed runtime model — the loose-typing
    parity trap (SURVEY §4.3.1): every column is string (sheets have no
    types), so the equality filter compares strings and the default
    ordering on the id column is LEXICOGRAPHIC ('1' < '10' < '100' <
    '2'), which reshuffles page boundaries vs a typed store. Deep page
    fetch (page=2 at 20/page) through the standard list path
    (objectsAPI.ts:169 list endpoint over googleSheetClient.ts rows);
    the oracle replays the bootstrap with VARCHAR casts."""
    from .engine import Engine
    eng = Engine(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_nationkey")
    eng.create_model({
        "name": "customer_sheet",
        "keys": {
            "c_custkey": {"type": "string", "modifiers": [{"name": "id"}]},
            "c_name": {"type": "string"},
            "c_mktsegment": {"type": "string"},
            "c_nationkey": {"type": "string"},
        },
        # without a declared ordering, pagination would window over scan
        # order — the lexicographic id default is the whole point here
        "defaultOrderBy": "c_custkey",
    }, data=cust, storage="sheet")
    return eng.list("customer_sheet",
                    filter={"c_mktsegment": "BUILDING"},
                    page=2, items_per_page=20)


@query("sheet_model_range_filter", oracle="""
WITH sheet AS (
  SELECT CAST(c_custkey AS VARCHAR) AS c_custkey,
         CAST(c_name AS VARCHAR) AS c_name,
         CAST(c_mktsegment AS VARCHAR) AS c_mktsegment,
         CAST(c_nationkey AS VARCHAR) AS c_nationkey
  FROM customer
)
SELECT c_custkey, c_name, c_mktsegment, c_nationkey FROM sheet
WHERE c_nationkey >= '1' AND c_nationkey <= '2'
ORDER BY c_nationkey DESC, c_custkey
LIMIT 50
""")
def sheet_model_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 over a sheet-backed model: the {from,to} range filter runs on
    STRING values, so '1'..'2' means LEXICOGRAPHIC — nation keys 1,
    10-19, 2 qualify while 20-24 don't, exactly how a sheet-backed
    store (all cells text) behaves in the reference. Desc ordering on
    the string column with the string id as tiebreak."""
    from .engine import Engine
    eng = Engine(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_nationkey")
    eng.create_model({
        "name": "customer_sheet_r",
        "keys": {
            "c_custkey": {"type": "string", "modifiers": [{"name": "id"}]},
            "c_name": {"type": "string"},
            "c_mktsegment": {"type": "string"},
            "c_nationkey": {"type": "string"},
        },
    }, data=cust, storage="sheet")
    return eng.list("customer_sheet_r",
                    filter={"c_nationkey": {"from": "1", "to": "2"}},
                    order_by="c_nationkey", order_direction="desc",
                    items_per_page=50)


# ---------------------------------------------------------------------------
# Snapshot-versioned storage (time travel / reproducible dataset versions)
# ---------------------------------------------------------------------------

@query("snapshot_time_travel", oracle="""
SELECT event_id, event_type FROM events
WHERE event_id < 1000 ORDER BY event_id
""")
def snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible dataset versions: three commits land (two appends,
    one overwrite), then the query TIME-TRAVELS back to snapshot 1 —
    whose read must be byte-identical to the first commit no matter what
    landed later (the oracle is simply that first slice). Data files are
    immutable; the manifest maps snapshot id -> visible directories, so
    old training runs stay exactly reproducible."""
    from .queries import fixture_base
    from .sources.snapshots import SnapshotStore

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    # per-process fixture rebuilt in place (fixture_base: no per-call
    # tree leak, no cross-process rmtree race)
    base = fixture_base("snapshot_tt_fixture")
    st = SnapshotStore(base)
    st.commit(ev.filter(F.col("event_id") < 1000))
    st.commit(ev.filter((F.col("event_id") >= 1000)
                        & (F.col("event_id") < 2000)))
    st.commit(ev.filter(F.col("event_id") >= 5000), mode="overwrite")
    return st.read(spark, snapshot=1)
