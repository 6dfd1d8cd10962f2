"""Watermarked stream-stream joins (Spark-native extension; the reference
has no stream-join concept — its event fan-out is per-row callbacks,
``apps/api/src/api.ts:56-84``).

Structured Streaming executes an inner equi-join between two streams when
BOTH sides carry watermarks and the join condition bounds their event-time
distance — that bound is what lets the state store evict rows once the
watermark passes, so state is O(watermark window), not O(stream length).

The semantics are exactly ``operators/temporal.interval_join`` (right_ts in
[left_ts + lower, left_ts + upper)): the batch operator is the oracle-checked
twin, and ``tests/test_streaming.py`` proves the streaming pairs match it.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def stream_interval_join(left: DataFrame, right: DataFrame, on: list[str],
                         left_ts: str, right_ts: str,
                         lower_sec: int, upper_sec: int,
                         watermark: str = "30 minutes") -> DataFrame:
    """Inner stream-stream join: pairs with ``right_ts`` in
    ``[left_ts + lower, left_ts + upper)`` per join key.

    Both inputs must be streaming DataFrames with event-time columns (LTZ;
    ``read_event_stream`` normalizes). ``right_ts`` must differ from
    ``left_ts`` by name (rename upstream); key columns are equi-joined and
    deduplicated in the output. The watermark bounds BOTH sides' state:
    Spark derives the allowed lateness window from the time-range predicate
    and drops buffered rows beyond it.
    """
    if left_ts == right_ts:
        raise ValueError("rename one side: left_ts and right_ts must differ")
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    keys = reduce(lambda a, b: a & b, [l[k] == r[k] for k in on])
    cond = (keys
            & (r[right_ts] >= l[left_ts]
               + F.expr(f"INTERVAL {lower_sec} SECONDS"))
            & (r[right_ts] < l[left_ts]
               + F.expr(f"INTERVAL {upper_sec} SECONDS")))
    joined = l.join(r, cond)
    # drop the duplicated right-side key columns
    return joined.drop(*[r[k] for k in on])
