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

_SEGMENT = "[^/]+"


def mqtt_to_regex(pattern: str) -> str:
    """Compile an MQTT topic pattern to an anchored regex.

    ``+`` -> one segment, ``#`` (only valid as the final segment) -> the
    remainder including ``/``; everything else is matched literally.
    A trailing ``/#`` also matches the parent topic itself, mirroring the
    reference's ``if (topicParts[i] == '#') return true`` short-circuit.
    """
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
