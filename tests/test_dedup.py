

def test_signature_ops_drop_null_text(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, None), (3, None)],
        "doc_id long, text string")
    from servihabitat_etl_spyke_spark.operators.dedup import (
        minhash_signatures, simhash)
    assert minhash_signatures(docs).count() == 1
    assert simhash(docs).count() == 1
