"""Query registrations for the dataflow (P8/UD4), subscription-mode (T10)
and enrichment (UD5) operators. The Python-path operators (mapInPandas)
get DuckDB oracles anyway — their transforms are deterministic arithmetic /
md5, so the oracle proves the Arrow round-trip preserves values exactly.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from .catalog import load_table
from .operators import enrich as EN
from .operators import flow as FL
from .queries import query
from .streaming.topics import changes_only


@query("flow_map_filter", oracle="""
SELECT event_id, user_id,
       floor((value * 2 + 1) * 100 + 0.5) / 100 AS boosted
FROM events
WHERE value >= 100
ORDER BY event_id
""")
def flow_map_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 + UD4: vectorized pandas filter then map over Arrow batches.
    The oracle is plain SQL — proving the Python path computes exactly
    what the JVM expression would (no Arrow precision loss)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    kept = FL.flow_filter(ev, lambda pdf: pdf["value"] >= 100)

    def boost(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        out = pdf[["event_id", "user_id"]].copy()
        out["boosted"] = np.floor((pdf["value"] * 2 + 1) * 100 + 0.5) / 100
        return out
    return (FL.flow_map(kept, boost,
                        "event_id long, user_id long, boosted double"))


@query("sub_on_change", oracle="""
WITH seq AS (
  SELECT user_id, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
)
-- null-SAFE, mirroring changes_only: `prev IS NULL` cannot tell "first
-- message" from "previous value was NULL", and <> is NULL (dropped) for
-- a change TO null
SELECT user_id, event_id, event_type FROM seq
WHERE rn = 1 OR event_type IS DISTINCT FROM prev
ORDER BY user_id, event_id
""")
def sub_on_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10 'change' subscription mode: emit only when the per-user
    event_type differs from the previous message (first message always
    emits). One shuffle on the key; streaming twin = last-value state."""
    ev = load_table(spark, sf_dir, "events")
    return (changes_only(ev, ["user_id"], "event_type", ["ts", "event_id"])
            .select("user_id", "event_id", "event_type"))


@query("fn_to_json", oracle="""
SELECT event_id,
       to_json(struct_pack(event_type := event_type,
                           user_id := user_id))::VARCHAR AS js
FROM events ORDER BY event_id
""")
def fn_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 toJson: row struct -> canonical compact JSON string (JVM-side
    StructsToJson — both engines emit identical key order + number
    formatting for string/int fields)."""
    from .functions.core import to_json_pretty
    ev = load_table(spark, sf_dir, "events")
    return (ev.select("event_id",
                      to_json_pretty(F.struct("event_type", "user_id"))
                      .alias("js")))


@query("llm_enrich_stub", oracle="""
SELECT doc_id, 'llm:' || substr(md5(text), 1, 12) AS completion
FROM documents ORDER BY doc_id
""")
def llm_enrich_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD5 plumbing check: batched mapInPandas enrichment with the
    deterministic offline client (md5-derived) — the oracle recomputes the
    fake, proving batching/schema/ordering are lossless. Swap the client
    for `http_llm_client` in a connected deployment."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (EN.llm_enrich(docs, "text")
            .select("doc_id", "completion"))
