"""Runtime model creation from a JSON schema description (the reference's
`objects` bundle: objectsAPI.ts:133-193 accepts {name, keys: {field: {type,
params, modifiers}}}; objectsSchemas.ts:11-20 lists the legal types,
transformData at :63-78 strips whitespace and defaults type to string)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from servihabitat_etl_spyke_spark.engine import Engine
from servihabitat_etl_spyke_spark.model import (
    Model, model_from_json_description, model_to_json_description,
    spark_type_for)

from conftest import SF_DIR


FULL_SPEC = {
    "name": "inventory item",
    "keys": {
        "sku": {"type": "string", "modifiers": [{"name": "id"}]},
        "label name": {"type": "string"},
        "qty": {"type": "number", "params": ["int"],
                "modifiers": [{"name": "indexed"}]},
        "price": {"type": "number"},
        "active": {"type": "boolean"},
        "tags": {"type": "array"},
        "scores": {"type": "array", "params": ["number"]},
        "meta": {"type": "object"},
        "added": {"type": "date"},
        "secret_note": {"type": "string", "modifiers": [{"name": "secret"}]},
        "warehouse": {"type": "string",
                      "modifiers": [{"name": "groupIndex"}]},
        "owner": {"type": "string",
                  "modifiers": [{"name": "linkTo",
                                 "params": ["customer", "c_custkey"]}]},
        "notype": {},
        "cosmetic": {"type": "string",
                     "modifiers": [{"name": "label", "params": ["'X'"]},
                                   {"name": "textArea"}]},
    },
    "defaultOrderBy": "sku",
}


class TestFromJsonDescription:
    def test_name_and_key_whitespace_stripped(self):
        m = model_from_json_description(FULL_SPEC)
        assert m.name == "inventoryitem"
        assert "labelname" in m.fields and "label name" not in m.fields

    def test_type_mapping(self):
        m = model_from_json_description(FULL_SPEC)
        by_name = {f.name: f.dataType for f in m.schema.fields}
        assert by_name["sku"] == T.StringType()
        assert by_name["qty"] == T.LongType()            # number + int param
        assert by_name["price"] == T.DoubleType()
        assert by_name["active"] == T.BooleanType()
        assert by_name["tags"] == T.ArrayType(T.StringType())
        assert by_name["scores"] == T.ArrayType(T.DoubleType())
        assert by_name["meta"] == T.StringType()          # object -> JSON text
        assert by_name["added"] == T.TimestampType()
        assert by_name["notype"] == T.StringType()        # default type

    def test_modifier_semantics(self):
        m = model_from_json_description(FULL_SPEC)
        assert m.id_field == "sku"
        assert m.fields["sku"].indexed                    # id implies indexed
        assert m.fields["qty"].indexed
        assert m.fields["secret_note"].secret
        assert not m.fields["secret_note"].searchable
        assert m.fields["warehouse"].group_index
        assert m.fields["owner"].link_to == ("customer", "c_custkey")
        # UI-only modifiers accepted, no semantic effect
        c = m.fields["cosmetic"]
        assert not (c.is_id or c.indexed or c.secret or c.group_index)

    def test_id_column_non_nullable(self):
        m = model_from_json_description(FULL_SPEC)
        nullable = {f.name: f.nullable for f in m.schema.fields}
        assert nullable["sku"] is False
        assert nullable["price"] is True

    def test_json_string_accepted(self):
        import json
        m = Model.from_json_description(json.dumps(FULL_SPEC))
        assert m.name == "inventoryitem"

    def test_unknown_type_raises(self):
        with pytest.raises(ValueError, match="unknown key type"):
            model_from_json_description(
                {"name": "x", "keys": {"a": {"type": "float"}}})

    def test_bad_linkto_raises(self):
        with pytest.raises(ValueError, match="linkTo"):
            model_from_json_description(
                {"name": "x", "keys": {"a": {"type": "string", "modifiers": [
                    {"name": "linkTo", "params": ["customer"]}]}}})

    def test_missing_name_raises(self):
        with pytest.raises(ValueError, match="name"):
            model_from_json_description({"keys": {}})

    def test_bad_default_order_raises(self):
        with pytest.raises(ValueError, match="defaultOrderBy"):
            model_from_json_description(
                {"name": "x", "keys": {"a": {}}, "defaultOrderBy": "zz"})

    def test_round_trip(self):
        m1 = model_from_json_description(FULL_SPEC)
        desc = model_to_json_description(m1)
        m2 = model_from_json_description(desc)
        assert m2.name == m1.name
        assert m2.schema == m1.schema
        assert set(m2.fields) == set(m1.fields)
        for k in m1.fields:
            a, b = m1.fields[k], m2.fields[k]
            assert (a.is_id, a.indexed, a.secret, a.group_index, a.link_to,
                    a.searchable) == \
                   (b.is_id, b.indexed, b.secret, b.group_index, b.link_to,
                    b.searchable), k

    def test_to_json_from_handmade_model(self):
        from servihabitat_etl_spyke_spark.queries import ORDERS
        desc = model_to_json_description(ORDERS)
        m2 = model_from_json_description(desc)
        assert m2.id_field == ORDERS.id_field
        assert m2.fields["o_custkey"].link_to == ("customer", "c_custkey")

    def test_spark_type_for_nested_array_default(self):
        assert spark_type_for("array", []) == T.ArrayType(T.StringType())


class TestEngineCreateModel:
    def test_empty_table_then_sql(self, spark):
        eng = Engine(spark, SF_DIR)
        eng.create_model({"name": "fresh", "keys": {
            "id": {"type": "string", "modifiers": [{"name": "id"}]},
            "v": {"type": "number"}}})
        assert eng.sql("SELECT count(*) AS n FROM fresh").first().n == 0
        assert eng.table("fresh").schema["v"].dataType == T.DoubleType()

    def test_bootstrap_rows_and_list(self, spark):
        eng = Engine(spark, SF_DIR)
        eng.create_model({"name": "pets", "keys": {
            "pid": {"type": "string", "modifiers": [{"name": "id"}]},
            "kind": {"type": "string",
                     "modifiers": [{"name": "groupIndex"}]},
            "age": {"type": "number", "params": ["int"],
                    "modifiers": [{"name": "indexed"}]}}},
            data=[("p1", "cat", 3), ("p2", "dog", 5), ("p3", "cat", 1)])
        out = eng.list("pets", filter={"kind": "cat"}, order_by="age",
                       order_direction="desc")
        assert [r.pid for r in out.collect()] == ["p1", "p3"]

    def test_bind_to_parquet_masks_secret(self, spark):
        eng = Engine(spark, SF_DIR)
        eng.create_model({"name": "cust", "keys": {
            "c_custkey": {"type": "number", "params": ["int"],
                          "modifiers": [{"name": "id"}]},
            "c_name": {"type": "string"},
            "c_acctbal": {"type": "number",
                          "modifiers": [{"name": "secret"}]}}},
            bind_to="customer")
        out = eng.list("cust", items_per_page=5)
        assert "c_acctbal" not in out.columns
        assert out.count() == 5

    def test_bind_to_missing_key_raises(self, spark):
        eng = Engine(spark, SF_DIR)
        with pytest.raises(ValueError, match="lacks declared keys"):
            eng.create_model({"name": "bad", "keys": {"nope": {}}},
                             bind_to="customer")

    def test_bootstrap_df_column_mismatch_raises(self, spark):
        eng = Engine(spark, SF_DIR)
        df = spark.range(3).select(F.col("id").cast("string").alias("wrong"))
        with pytest.raises(ValueError, match="columns"):
            eng.create_model({"name": "bad2", "keys": {"right": {}}}, data=df)

    def test_redeclare_replaces(self, spark):
        eng = Engine(spark, SF_DIR)
        eng.create_model({"name": "redo", "keys": {
            "id": {"modifiers": [{"name": "id"}]}}}, data=[("a",)])
        eng.create_model({"name": "redo", "keys": {
            "id": {"modifiers": [{"name": "id"}]}, "extra": {}}},
            data=[("a", "x"), ("b", "y")])
        assert eng.sql("SELECT count(*) AS n FROM redo").first().n == 2
        assert "extra" in eng.table("redo").columns
