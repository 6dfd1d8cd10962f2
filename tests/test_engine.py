"""Engine facade tests: the one-object user surface."""

from __future__ import annotations

import pytest

from servihabitat_etl_spyke_spark.engine import Engine
from servihabitat_etl_spyke_spark.model import FieldSpec, model


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    e = Engine(spark, sf_dir)
    e.register_default_models()
    return e


def test_list_filter_order_page(eng):
    rows = eng.list("orders", filter={"o_orderstatus": "F"},
                    order_by="o_totalprice", order_direction="desc",
                    items_per_page=5, page=0).collect()
    assert 0 < len(rows) <= 5
    prices = [r["o_totalprice"] for r in rows]
    assert prices == sorted(prices, reverse=True)
    assert all(r["o_orderstatus"] == "F" for r in rows)


def test_page_envelope_shape(eng):
    env = eng.page("orders", items_per_page=10, page=1)
    assert set(env) >= {"itemsPerPage", "items", "total", "page", "pages"}
    assert env["itemsPerPage"] == 10 and env["page"] == 1
    assert env["pages"] == -(-env["total"] // 10)
    assert len(env["items"].collect()) <= 10


def test_group_options_mode(eng):
    opts = [r[0] for r in eng.list("orders", group="o_orderpriority").collect()]
    assert opts == sorted(opts) and len(opts) <= 100


def test_sql_over_registered_views(eng):
    n = eng.sql("SELECT count(*) AS n FROM lineitem").first()["n"]
    assert n == eng.table("lineitem").count() > 0


def test_run_named_query(eng):
    out = eng.run("total_count").first()
    assert out["total"] == eng.table("lineitem").count()
    assert "dedup_minhash_lsh" in eng.queries()


def test_runtime_model_registration(eng):
    eng.register_model(model(
        "part",
        FieldSpec("p_partkey", is_id=True, indexed=True),
        FieldSpec("p_brand", group_index=True),
        default_order_by="p_partkey"))
    rows = eng.list("part", order_by="p_retailprice",
                    order_direction="desc", items_per_page=3).collect()
    assert len(rows) == 3
    vals = [r["p_retailprice"] for r in rows]
    assert vals == sorted(vals, reverse=True)
