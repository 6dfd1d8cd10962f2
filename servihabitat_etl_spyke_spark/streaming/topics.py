"""T1/T2: topic pub/sub with MQTT-style wildcards.

The reference keeps a per-topic callback registry and matches incoming
topics segment-wise — ``+`` matches exactly one path segment, ``#`` matches
the rest (``apps/api/src/api.ts:56-84``). Here a *subscription* is a
predicate over a (batch or streaming) DataFrame with a ``topic`` column:
the wildcard pattern compiles to one anchored regex evaluated JVM-side
(``rlike``), so a million-subscriber fan-out is just N filters over one
shared stream — no per-message Python.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

# [^/]* not [^/]+: MQTT topic levels CAN be empty ('sensors//temp' has
# an empty middle level) and both the spec and the reference's
# split-and-compare loop ('+' passes whatever topicParts[i] holds) match
# '+' against an empty segment — [^/]+ silently dropped such topics
_SEGMENT = "[^/]*"


def mqtt_to_regex(pattern: str) -> str:
    """Compile an MQTT topic pattern to an anchored regex.

    ``+`` -> one segment (INCLUDING an empty one — 'a/+/c' matches
    'a//c', per spec and per the reference loop), ``#`` (only valid as
    the final segment) -> the remainder including ``/``; everything else
    is matched literally. A trailing ``/#`` also matches the parent
    topic itself, mirroring the reference's
    ``if (topicParts[i] == '#') return true`` short-circuit.

    Deliberate deviation: the reference's loop iterates only over the
    PATTERN's segments, so a literal pattern 'a/b' also matches any
    longer topic 'a/b/c' (accidental prefix semantics, non-MQTT). Here
    literal patterns are exact — the pinned behavior in
    tests/test_streaming.py::MATCH_CASES."""
    parts = pattern.split("/")
    out: list[str] = []
    for i, part in enumerate(parts):
        if part == "#":
            if i != len(parts) - 1:
                raise ValueError("'#' is only valid as the last segment")
            if out:
                # parent itself OR parent/anything
                return "^" + "/".join(out) + "(/.*)?$"
            return "^.*$"
        out.append(_SEGMENT if part == "+" else re.escape(part))
    return "^" + "/".join(out) + "$"


def topic_matches(col: Column | str, pattern: str) -> Column:
    """Boolean column: does ``col`` match the MQTT ``pattern``."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(mqtt_to_regex(pattern))


def topic_filter(df: DataFrame, pattern: str,
                 topic_col: str = "topic") -> DataFrame:
    """T1: the subscription as a filter — works on batch and streaming."""
    return df.filter(topic_matches(topic_col, pattern))


def subscribe(df: DataFrame, pattern: str, *,
              path: str | None = None, from_: str | None = None,
              topic_col: str = "topic") -> DataFrame:
    """T2: ``onEvent``-style subscription — wildcard topic match plus
    optional equality filters on ``path`` / ``from`` payload fields
    (``packages/protolib/src/bundles/events/api/index.ts:4-20``)."""
    out = topic_filter(df, pattern, topic_col)
    if path is not None:
        out = out.filter(F.col("path") == path)
    if from_ is not None:
        out = out.filter(F.col("from") == from_)
    return out


def changes_only(df: DataFrame, key_cols: list[str], value_col: str,
                 order_cols: list[str]) -> DataFrame:
    """T10 'change' subscription mode (``apps/api/src/api.ts:18`` comment
    contract: "all = continuous, single = just one, change = first
    change"): emit a message only when its value differs from the previous
    message on the same key.

    Batch form: lag() over (key, order) — one shuffle on the key, no
    state. The streaming twin holds last-value per key in
    applyInPandasWithState (see streaming/stateful.py edge detector, which
    is this operator specialized to a threshold crossing). The first
    message per key always emits (prev is null)."""
    from pyspark.sql.window import Window as W
    w = W.partitionBy(*key_cols).orderBy(*order_cols)
    # null-SAFE comparison with an explicit first-row marker: a bare
    # `value != prev` is NULL (dropped) for a change TO null, and
    # `prev IS NULL` can't tell "first message" from "previous value was
    # null" — [10, NULL, 10] would both miss the real change and re-emit
    # the unchanged 10
    from ..operators.scale import _reserve
    _reserve(df, "_prev", "changes_only")
    _reserve(df, "_rn", "changes_only")
    prev = F.lag(F.col(value_col)).over(w)
    rn = F.row_number().over(w)
    return (df.withColumn("_prev", prev).withColumn("_rn", rn)
            .filter((F.col("_rn") == 1)
                    | ~F.col(value_col).eqNullSafe(F.col("_prev")))
            .drop("_prev", "_rn"))


def subscribe_single(df: DataFrame, pattern: str, *, order_cols: list[str],
                     topic_col: str = "topic") -> DataFrame:
    """T10 'single' mode: just the first matching message (deterministic
    under ``order_cols``; the reference's arrival-order head)."""
    return (topic_filter(df, pattern, topic_col)
            .orderBy(*order_cols).limit(1))
