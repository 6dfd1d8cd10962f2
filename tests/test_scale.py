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
