"""Watermarked event-time windows (the Spark-native extension the
reference lacks — SURVEY.md §2.8 'absent in the reference' note).

``window()`` / ``session_window()`` work identically on batch and
streaming DataFrames, so every streaming aggregation here has an exact
batch twin that the DuckDB oracle can check; the streaming form only adds
the watermark (state eviction policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.core import round2


def tumbling_counts_stream(events: DataFrame, duration: str = "1 hour",
                           watermark: str = "10 minutes") -> DataFrame:
    """Streaming tumbling-window counts with a late-data watermark; state
    for windows older than max(event time) - watermark is evicted."""
    return (events.withWatermark("ts", watermark)
            .groupBy(F.window("ts", duration), "event_type")
            .agg(F.count("*").alias("cnt"),
                 # shared round2 (functions/core), matching the batch
                 # twin queries.window_tumbling_hourly exactly
                 round2(F.sum("value")).alias("sum_value")))


def sliding_counts(events: DataFrame, duration: str = "1 hour",
                   slide: str = "30 minutes") -> DataFrame:
    """Sliding (hopping) windows: each event contributes to
    duration/slide overlapping windows — Spark expands the assignment
    JVM-side; works on batch and streaming inputs alike."""
    return (events.groupBy(F.window("ts", duration, slide), "event_type")
            .agg(F.count("*").alias("cnt")))


def session_window_agg(events: DataFrame, gap: str = "30 minutes",
                       key_col: str = "user_id") -> DataFrame:
    """Per-key session windows (gap-based): dynamic-width windows that
    close after ``gap`` of inactivity. Batch twin of the streaming
    session_window + watermark pattern."""
    return (events.groupBy(F.session_window("ts", gap), key_col)
            .agg(F.count("*").alias("n_events")))
