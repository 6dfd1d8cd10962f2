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
  CORRECTNESS_r01/r02).
- r3 window (``_WINDOW``): the dedup, ANN, text, curation, multimodal and
  TPC-H-completion suites — never driver-checked before.
- r4+: AUTOMATIC — ``_DRIVER_VERIFIED`` is derived from the
  ``CORRECTNESS_r*.json`` files at import time, so each round's green rows
  retire their names and the window advances to the next unverified tier
  (failed rows stay in the window for re-verification).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from servihabitat_etl_spyke_spark import queries as _catalog

def _driver_verified() -> frozenset:
    """Names already driver-verified: every query with a green row (or a
    clean rows-only run, err == 'no_oracle') in ANY CORRECTNESS_r*.json
    in the repo root. Self-maintaining — each round's results
    automatically retire their names from the next round's window, and a
    FAILED row keeps its name in the window for re-verification."""
    import glob
    import json
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    done: set[str] = set()
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, r in rows.items():
            if not isinstance(r, dict):
                continue
            green = (r.get("rows_match") and r.get("schema_match")
                     and r.get("hash_match"))
            rows_only = (r.get("err") == "no_oracle"
                         and (r.get("spark_rows") or 0) >= 0)
            if green or rows_only:
                done.add(name)
    return frozenset(done)


_DRIVER_VERIFIED = _driver_verified()

# This round's 50-slot driver window, highest-value never-checked suites.
# (r3's window — dedup/ANN/text/curation/multimodal/TPC-H-completion — went
# 50/50 green in CORRECTNESS_r03.json and auto-retired via _DRIVER_VERIFIED;
# r4 prioritizes the ORACLED never-checked names: streaming, flow/source,
# scale-kit, profile/sketch, snapshot, remaining curation, and the new
# connected-components variants. Rows-only twins queue behind these.)
_WINDOW = [
    # streaming suite (batch twins of the stateful/windowed sinks)
    "topic_wildcard_match", "cdc_notifications", "ephemeral_split",
    "env_fanout", "state_machine_fold", "state_machine_entries",
    "queue_priority_drain", "queue_delayed_release", "window_sliding",
    "session_window_batch", "late_data_watermark",
    # flow / source / engine suite
    "flow_map_filter", "sub_on_change", "fn_to_json", "llm_enrich_stub",
    "sheets_ingest", "sheets_keyed_upsert", "catalog_introspect",
    "switch_route", "range_banding", "runtime_model_ddl",
    "runtime_model_bootstrap", "runtime_model_sheet",
    # scale-kit / profile / snapshot suite
    "scale_zorder_key", "scale_bucketed_join", "scale_skew_report",
    "profile_columns", "profile_drift_psi", "corpus_profile",
    "profile_hll_distinct", "profile_kmv_distinct",
    "snapshot_time_travel", "snapshot_diff",
    # agg / window completions
    "agg_pivot", "agg_unpivot", "window_distribution",
    # curation completions
    "curate_url_normalize", "curate_domain_cap", "curate_domain_stats",
    "curate_contamination_score", "curate_dsir_weights", "curate_dsir_sample",
    "curate_sample_exact_k", "curate_token_budget_mix", "curate_gopher_filter",
    "curate_weighted_sample",
    # new dedup variants (star CC at scale, incremental CC, prefix filter)
    "dedup_clusters_star", "dedup_clusters_incremental",
    "dedup_prefix_filter", "dedup_simhash_pairs",
]


def _rotated(d: dict) -> dict:
    """Stable reorder: unverified window names (listed order) → other
    never-driver-checked names (registration order) → already-verified
    names. Because _DRIVER_VERIFIED is read from the CORRECTNESS files,
    each round's green rows automatically advance the window to the
    next unverified tier — no manual re-rotation needed."""
    pos = {n: i for i, n in enumerate(_WINDOW)}

    def tier(name: str) -> tuple[int, int]:
        if name in _DRIVER_VERIFIED:
            return (2, 0)
        return (0, pos[name]) if name in pos else (1, 0)

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
