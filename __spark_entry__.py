"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``servihabitat_etl_spyke_spark/`` — this module is a
thin re-export of its query catalog.

Rotation: the driver's correctness harness checks the FIRST 50 entries of
``queries()`` each round, while the full registry holds 200+ (the
test-enforced count lives in README's coverage line).  Every oracled
query is verified every round by the identical local mirror
(``tests/test_oracle_parity.py``); the dict order below exists only to
choose which 50 get *driver-side* evidence this round:

- r1–r6: never-driver-checked names first (``_WINDOW`` pinned the current
  round's tier), auto-retiring green names via ``_DRIVER_VERIFIED``.  The
  registry CLOSED in r6: every name has green driver evidence, zero
  failures ever recorded.
- r7+ (this file): ROLLING RE-VERIFICATION.  With every name verified,
  ordering verified names by registration order would re-check the same
  first-50 forever and let a regression in an old operator hide behind
  stale r1 evidence.  Verified names are therefore ordered by evidence
  AGE — oldest CORRECTNESS round first — so driver evidence refreshes on
  a ~5-round cycle (50 per round).  Names whose LATEST evidence is
  a failure, and new never-checked names, still jump the queue.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from servihabitat_etl_spyke_spark import queries as _catalog


def _evidence() -> dict[str, tuple[int, bool]]:
    """name -> (latest round with driver evidence, was that evidence
    green).  Green = full hash match, or a clean rows-only run
    (err == 'no_oracle' with rows > 0 — a zero-row rows-only run is a
    broken approx query and must NOT count as green).  Reading the
    LATEST round per name (files sorted by round number) means a name
    that was green in r3 but failed in r5 correctly re-enters the
    front of the window instead of hiding behind the old green row."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    ev: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, r in rows.items():
            if not isinstance(r, dict):
                continue
            green = bool(
                (r.get("rows_match") and r.get("schema_match")
                 and r.get("hash_match"))
                or (r.get("err") == "no_oracle"
                    and (r.get("spark_rows") or 0) > 0))
            prev = ev.get(name)
            if prev is None or rnd >= prev[0]:
                ev[name] = (rnd, green)
    return ev


_EVIDENCE = _evidence()
_DRIVER_VERIFIED = frozenset(n for n, (_, green) in _EVIDENCE.items()
                             if green)

# Names pinned to the FRONT of this round's window (new operators built
# this round, or names needing urgent re-verification).  The rolling
# age-ordered tier below fills the remaining driver-window slots with
# the oldest-evidence names.
_WINDOW: list[str] = [
    # r8-built: the persisted IVF index table (assignment + probe list
    # in one UDF pass — the stored_sig pattern for the ANN leg;
    # rows-only by nature, k-means codebook not SQL-expressible)
    "ann_ivf_index_build",
]

# Names whose REGISTERED IMPLEMENTATION changed (the query body itself,
# not just internals), mapped to the round the change shipped in: they
# jump the queue like new builds so the change gets fresh driver
# evidence instead of riding an older green.  SELF-EXPIRING: once the
# name's evidence round reaches the changed-in round (the driver
# re-verified the new implementation), it returns to the age-ordered
# tier — no manual cleanup next round.
_REVERIFY: dict[str, int] = {
    # r9 (VERDICT r8 #4): the IVF consumers now read the persisted
    # ivf_index table instead of re-running assignment per consumer —
    # byte-equal output (pytest-pinned), but the registered bodies
    # changed, so they jump for fresh driver evidence. Ordered by
    # bench cost.
    "ann_hard_negatives_ivf": 9,
    "ann_knn_classify_ivf": 9,
    "graph_pagerank_knn_ivf": 9,
    "ann_knn_graph_ivf": 9,
    "graph_knn_degrees_ivf": 9,
    "ann_recall_report": 9,
    # r9 second sweep: the r8 presentational-sort lesson extended INTO
    # the similarity operators — the query-file sweep could not reach
    # the trailing orderBys inside cosine_topk/knn_graph/pq/mmr etc.,
    # where the range-sample re-executes the GEMM child (measured ~2x
    # at sf0.1: knn_graph 2.5 s sorted vs 1.2 unsorted). All registered
    # consumers are hash-gated or aggregate the edges, so the sort was
    # pure waste; rank columns carry the order.
    "ann_knn_graph_incremental": 9,
    "ann_hard_negatives": 9,
    "ann_knn_classify": 9,
    "graph_pagerank_knn": 9,
    "ann_knn_graph": 9,
    "ann_cosine_topk": 9,
    "graph_knn_degrees": 9,
    "retrieval_mmr_topk": 9,
    "ann_ivfpq_topk": 9,
    "ann_pq_topk": 9,
    "ann_ivf_kmeans_topk": 9,
    "retrieval_hybrid_rrf": 9,
    "ann_jl_rerank_topk": 9,
    "ann_filtered_topk": 9,
    "ann_lsh_topk": 9,
    "ann_ivf_topk": 9,
    "multimodal_embed_ann": 9,
    # r8: ann_knn_graph_incremental now runs the persisted-index path
    # (no old-corpus rescan) with the touched-query merge window
    # (ann_knn_graph_incremental re-listed in the r9 block above —
    # dict literals keep the LAST duplicate, so the stale entry must go)
    # r8: trailing presentational orderBys dropped (hashes are
    # order-insensitive; each sort cost a range-sampling job + sort —
    # and the range-sample pass RE-EXECUTES the whole child plan, so
    # the sort cost 30-55% of these queries measured A/B at sf0.1).
    # First the three top-cost dedup queries, then the full sweep.
    "dedup_clusters_incremental": 8,
    "dedup_prefix_filter": 8,
    "multimodal_audio_dedup": 8,
    "dedup_clusters_star": 8,
    "text_repetition_signals": 8,
    "dedup_semantic_lsh": 8,
    "dedup_canonical": 8,
    "dedup_incremental": 8,
    "dedup_snapshot_incremental": 8,
    "dedup_cluster_sample": 8,
    "dedup_sorted_neighborhood": 8,
    "dedup_minhash_lsh": 8,
    "dedup_minhash_windowed": 8,
    "dedup_simhash_pairs": 8,
    "dedup_exact_substring": 8,
    "dedup_semantic": 8,
    "dedup_simhash": 8,
    "dedup_containment": 8,
    "dedup_boilerplate_lines": 8,
    # (ann_hard_negatives moved to the r9 block above)
    "multimodal_audio_features": 8,
    "multimodal_audio_neardup": 8,
    "multimodal_video_scenes": 8,
    "profile_columns": 8,
    "profile_quantiles": 8,
    "curate_dsir_weights": 8,
    "curate_decontaminate_bloom": 8,
    "text_lm_score": 8,
    "text_bigram_lm_score": 8,
    # r8 sweep completion: the remaining trailing presentational
    # orderBys registry-wide (every file except queries_tpch.py,
    # whose ORDER BYs are part of the published TPC-H query spec) +
    # ann_hard_negatives_ivf, whose shared _hard_negatives_from
    # helper changed in the first sweep pass. Ordered by bench cost
    # so the expensive names refresh driver evidence first; the
    # 50-slot window rolls the rest through the next rounds.
    # (ann_hard_negatives_ivf moved to the r9 block above — its body
    # changed again for the index-fed path)
    "text_cms_estimate": 8,
    "multimodal_image_dhash": 8,
    "multimodal_image_phash": 8,
    "multimodal_video_dedup": 8,
    "dedup_overlap_matrix": 8,
    "neardup_jaccard": 8,
    "text_classifier_pr_sweep": 8,
    "text_distinct_ngrams": 8,
    "curate_gopher_filter": 8,
    "state_machine_entries": 8,
    # (ann_jl_rerank_topk moved to the r9 block above)
    "dedup_exact_normalized": 8,
    "snapshot_diff": 8,
    "embed_pca": 8,
    "text_normalize": 8,
    "text_line_filter": 8,
    "curate_decontaminate": 8,
    "text_token_entropy": 8,
    "session_window_batch": 8,
    "curate_passage_dedup": 8,
    "late_data_watermark": 8,
    "state_machine_fold": 8,
    "text_quality": 8,
    "embed_jl_project": 8,
    "curate_domain_blocklist": 8,
    "text_classifier_score": 8,
    "curate_temperature_mix": 8,
    "text_compression_ratio": 8,
    "agg_rollup": 8,
    "text_ctfidf_terms": 8,
    "stream_dedup_batch": 8,
    "scale_topk_per_group": 8,
    "curate_domain_cap": 8,
    "window_sliding": 8,
    "curate_mad_outliers": 8,
    "curate_shard_assign": 8,
    "window_distribution": 8,
    "agg_pivot": 8,
    "curate_sample_exact_k": 8,
    "profile_quantiles_by_group": 8,
    "curate_token_budget_mix": 8,
    "curate_pack_greedy": 8,
    "fn_to_json": 8,
    "agg_approx_distinct": 8,
    "curate_contamination_score": 8,
    "scale_global_rownum": 8,
    "agg_percentiles": 8,
    "multimodal_video_meta": 8,
    "text_fingerprint": 8,
    "curate_pipeline": 8,
    "skew_salted_agg": 8,
    "agg_stats": 8,
    "q4_priority_semi": 8,
    "dedup_cluster_sizes": 8,
    "embed_quantize": 8,
    "dedup_cdc_chunks": 8,
    "flow_map_filter": 8,
    "curate_grouped_split": 8,
    "multimodal_meta": 8,
    "curate_domain_stats": 8,
    "sub_on_change": 8,
    "multimodal_audio_windows": 8,
    "multimodal_audio_fingerprint": 8,
    "scale_zorder_key": 8,
    "text_repetition_stats": 8,
    "curate_split_leakage": 8,
    "dedup_embedding_lsh": 8,
    "text_winnowing": 8,
    "queue_priority_drain": 8,
    "agg_unpivot": 8,
    "multimodal_audio_meta": 8,
    "curate_chunk_tokens": 8,
    "curate_url_normalize": 8,
    "queue_delayed_release": 8,
    "sheets_ingest": 8,
    "llm_enrich_stub": 8,
    "multimodal_image_neardup": 8,
    "catalog_introspect": 8,
    "curate_stratified_sample": 8,
    "curate_pii_redact": 8,
    "queue_fifo_lifo": 8,
    "text_lang_id": 8,
    "agg_cube": 8,
    "dedup_clusters": 8,
    "sheets_keyed_upsert": 8,
    "text_winnowing_pairs": 8,
    "text_token_count": 8,
    "range_banding": 8,
    "text_cluster_topics": 8,
    "env_fanout": 8,
    "multimodal_video_frames": 8,
    "dedup_embedding": 8,
    "topic_wildcard_match": 8,
    # (ann_recall_report moved to the r9 block above)
    "multimodal_frames": 8,
    "agg_approx_percentiles": 8,
    "dedup_exact": 8,
    "q18_large_orders": 8,
    "snapshot_time_travel": 8,
    "scale_bucketed_join": 8,
    "corpus_profile": 8,
    "text_bpe_tokenize": 8,
}


def _rotated(d: dict) -> dict:
    """Stable reorder for the driver's first-50 correctness window:

    tier 0   — ``_WINDOW`` names without green evidence (listed
               order): this round's new builds;
    tier 0.5 — ``_REVERIFY`` names whose evidence predates the round
               their implementation changed in (listed order);
               self-expires once the driver re-records them at or
               after that round;
    tier 1   — never-driver-checked names and names whose LATEST
               driver evidence is a failure (registration order):
               regressions and stragglers re-enter here automatically;
    tier 2   — verified names, OLDEST evidence round first
               (registration order as tie-break): rolling
               re-verification, ~5-round refresh cycle at 50/round.
    """
    pos = {n: i for i, n in enumerate(_WINDOW)}
    rev = {n: i for i, n in enumerate(_REVERIFY)}
    reg = {n: i for i, n in enumerate(d)}

    def tier(name: str) -> tuple[float, int, int]:
        if name in pos and name not in _DRIVER_VERIFIED:
            return (0, pos[name], 0)
        if name in rev and \
                _EVIDENCE.get(name, (0, False))[0] < _REVERIFY[name]:
            return (0.5, rev[name], 0)
        if name not in _DRIVER_VERIFIED:
            return (1, reg.get(name, 0), 0)
        return (2, _EVIDENCE[name][0], reg.get(name, 0))

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
