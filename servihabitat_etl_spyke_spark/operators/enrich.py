"""External-service enrichment (SURVEY.md §2.9 UD5/UD6): LLM completion and
generic HTTP fetch as batched, Arrow-vectorized column transforms.

Reference semantics:
- UD5 (`packages/protolib/src/bundles/chatgpt/context/index.ts:7-60`):
  chatGPTPrompt/chatGPTSession post one message list to the OpenAI chat
  completions API (model gpt-4o, max_tokens 4096), key injected from the
  keys store, and return ``response.choices[0].message.content``.
- UD6 (`packages/protolib/src/bundles/apis/context/index.ts:47-67`):
  generic GET/POST with a service token header.

Spark mapping: a per-row network call is the canonical "slow path done
right" case — mapInPandas batches rows per Python worker, the client is
called once per batch (amortizing connections), and the operator never
touches the driver. The network itself is STUBBED here (this environment is
offline): the default client is a deterministic fake so tests and oracles
are reproducible; `http_llm_client` shows the real wiring and raises
NotImplementedError until an endpoint/key is configured. The Spark-side
plumbing — schema, batching, partition parallelism — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

# client contract: list of input strings -> list of output strings (1:1)
Client = Callable[[list[str]], list[str]]


def deterministic_fake_client(kind: str = "llm") -> Client:
    """Offline stand-in: output derives from md5(input) — stable across
    runs/engines, so downstream tests can assert exact values."""
    def call(batch: list[str]) -> list[str]:
        return [f"{kind}:{hashlib.md5(s.encode()).hexdigest()[:12]}"
                for s in batch]
    return call


def http_llm_client(endpoint: str, api_key: str,
                    model: str = "gpt-4o", max_tokens: int = 4096) -> Client:
    """The real UD5 client shape (one POST per batch of prompts). Network
    is unavailable in this environment — wire a real HTTP library here
    when deploying."""
    def call(batch: list[str]) -> list[str]:
        raise NotImplementedError(
            "offline environment: plug an HTTP client for "
            f"{endpoint} (model={model}, max_tokens={max_tokens})")
    return call


def _enrich(df: DataFrame, in_col: str, out_col: str, client: Client,
            batch_size: int) -> DataFrame:
    if out_col in df.columns:
        # fail at PLAN-build time: the output schema appends out_col
        # unconditionally, so an existing column of that name crashes the
        # executor mid-job with RESULT_COLUMN_SCHEMA_MISMATCH (N+1
        # declared vs N produced) — e.g. re-enriching an already-enriched
        # stored table
        raise ValueError(
            f"enrich: output column {out_col!r} already exists on the "
            "input — drop/rename it first (re-enriching a previously "
            "enriched table?)")
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"`{out_col}` string"])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start:start + batch_size].copy()
                # NULL in -> NULL out: astype(str) would turn a None/NaN
                # prompt into the literal text 'None'/'nan' and bill a
                # garbage request for it; SQL functions (and the DuckDB
                # oracle's md5) propagate NULL instead
                mask = chunk[in_col].notna()
                vals = pd.Series([None] * len(chunk), index=chunk.index,
                                 dtype=object)
                if mask.any():
                    vals[mask] = client(
                        chunk.loc[mask, in_col].astype(str).tolist())
                chunk[out_col] = vals
                yield chunk
    return df.mapInPandas(run, schema=out_schema)


def llm_enrich(df: DataFrame, prompt_col: str, *,
               out_col: str = "completion", client: Client | None = None,
               batch_size: int = 64) -> DataFrame:
    """UD5: append a completion column computed by the (batched) LLM
    client. At scale, tune batch_size to the endpoint's token budget and
    repartition the input so request parallelism == executor slots."""
    return _enrich(df, prompt_col, out_col,
                   client or deterministic_fake_client("llm"), batch_size)


def http_enrich(df: DataFrame, url_col: str, *,
                out_col: str = "response", client: Client | None = None,
                batch_size: int = 64) -> DataFrame:
    """UD6: append a fetched-response column (GET per url, batched)."""
    return _enrich(df, url_col, out_col,
                   client or deterministic_fake_client("http"), batch_size)
