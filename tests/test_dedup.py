

def test_signature_ops_drop_null_text(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, None), (3, None)],
        "doc_id long, text string")
    from servihabitat_etl_spyke_spark.operators.dedup import (
        minhash_signatures, simhash)
    assert minhash_signatures(docs).count() == 1
    assert simhash(docs).count() == 1


def test_connected_components_chain_and_island(spark):
    from servihabitat_etl_spyke_spark.operators.dedup import (
        connected_components)
    # chain 1-2-3-4 (diameter 3, needs >1 propagation round) + island 10-11
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long")
    out = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_path_converges(spark):
    from servihabitat_etl_spyke_spark.operators.dedup import (
        connected_components)
    # path 0-1-2-...-12: min label must travel the full diameter
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long")
    out = connected_components(pairs).collect()
    assert {r["cluster_id"] for r in out} == {0}
    assert len(out) == 13
