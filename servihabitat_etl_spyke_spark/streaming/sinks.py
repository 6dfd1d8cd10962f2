"""Streaming sinks: keyed upsert via foreachBatch, and exact streaming
dedup with watermark-bounded state.

The reference's event path writes each row into a keyed store as it
arrives (`packages/protonode/src/lib/generateApi.ts:343-350` db.put loop).
The Spark twin is a micro-batched MERGE: every trigger applies the batch's
rows to the table with last-writer-wins-per-key semantics — the same
`keyed_upsert` used by the batch ETL (operators/etl.py), so batch and
streaming ingestion share one code path and one semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.etl import overwrite_via_tmp as _overwrite_via_tmp
from ..operators.etl import upsert_into_path


def stream_keyed_upsert(stream: DataFrame, path: str, key: str,
                        checkpoint: str, *, order_col: str | None = None,
                        available_now: bool = True) -> StreamingQuery:
    """S6 streaming twin: MERGE each micro-batch into the parquet snapshot
    at ``path`` (foreachBatch -> the batch keyed_upsert). Exactly-once per
    batch via the checkpoint; at scale the sink is a transactional table
    format and this becomes ``MERGE INTO`` inside foreachBatch.

    Within one micro-batch, ``order_col`` (e.g. an event-time or sequence
    column) decides which duplicate of a key wins — last per order wins,
    matching the reference's sequential db.put loop. Without it, micro-
    batch frames carry no row order, so the within-batch winner is
    arbitrary (documented dropDuplicates fallback)."""
    def apply_batch(batch: DataFrame, _batch_id: int) -> None:
        from pyspark.sql import functions as F

        from ..functions.core import epoch_micros
        if order_col is not None:
            dt = batch.schema[order_col].dataType.typeName()
            order = (epoch_micros(batch, order_col)
                     if dt.startswith("timestamp")
                     else F.col(order_col).cast("long"))
            batch = batch.withColumn("_ingest_order", order)
        upsert_into_path(batch.sparkSession, batch, path, key=key)

    writer = (stream.writeStream
              .foreachBatch(apply_batch)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup(stream: DataFrame, keys: list[str], *,
                 event_time_col: str, delay: str = "1 hour") -> DataFrame:
    """Exact streaming dedup (north-star dedup family, streaming form):
    dropDuplicatesWithinWatermark — a duplicate arriving within ``delay``
    of the original's event time is suppressed, and state older than the
    watermark is EVICTED, so memory is O(keys per watermark window), not
    O(total distinct keys). (Plain dropDuplicates(keys) would keep one
    state row per key forever when the event-time column isn't part of the
    key set.) The batch twin is ``dropDuplicates(keys)``."""
    return (stream.withWatermark(event_time_col, delay)
            .dropDuplicatesWithinWatermark(keys))


def stream_rollup_upsert(stream: DataFrame, path: str, checkpoint: str, *,
                         window_duration: str = "1 hour",
                         event_time_col: str = "ts",
                         group_col: str = "event_type",
                         value_col: str = "value",
                         available_now: bool = True):
    """Continuous-aggregate maintenance (the hypertable/materialized-rollup
    shape): each micro-batch is aggregated to per-(window, group) partial
    counts/sums, then MERGED into the stored rollup by summing with the
    existing row — incremental work is O(batch), never a recompute of the
    full history. count and sum are mergeable; avg derives as sum/count at
    read time (the standard partial-aggregate discipline; percentiles would
    store a mergeable sketch the same way).

    At scale the store is a transactional table and the merge is one
    ``MERGE INTO``; the parquet read-union-overwrite here is the local
    emulation, same as ``upsert_into_path``."""
    import os

    from pyspark.sql import functions as F

    def apply_batch(batch: DataFrame, _bid: int) -> None:
        spark = batch.sparkSession
        part = (batch
                .groupBy(F.window(event_time_col, window_duration)
                         .alias("_w"), group_col)
                .agg(F.count("*").alias("cnt"),
                     F.sum(value_col).alias("sum_value"))
                .select(F.col("_w.start").alias("win_start"), group_col,
                        "cnt", "sum_value"))
        if os.path.exists(path):
            existing = spark.read.parquet(path)
            merged = (existing.unionByName(part)
                      .groupBy("win_start", group_col)
                      .agg(F.sum("cnt").alias("cnt"),
                           F.sum("sum_value").alias("sum_value")))
            _overwrite_via_tmp(merged, path)
        else:
            part.write.mode("overwrite").parquet(path)

    writer = (stream.writeStream
              .foreachBatch(apply_batch)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_cms_upsert(stream: DataFrame, path: str, checkpoint: str, *,
                      item_col: str = "item", d: int = 4, w: int = 512,
                      available_now: bool = True):
    """Streaming count-min sketch maintenance: each micro-batch folds to
    its own d x w partial sketch (``scale.cms_sketch``) and MERGES into
    the stored sketch by cell-wise addition — the mergeability that makes
    CMS the right frequency monitor for an endless stream: state is a
    FIXED 2048-cell table no matter how many distinct items flow
    through, and the stored sketch equals the batch sketch of everything
    seen (stream == batch twin test asserts cell equality).

    Same MERGE-into-parquet emulation as ``stream_rollup_upsert``; at
    scale the sink is a transactional table and this is one MERGE INTO
    keyed by (r, c)."""
    import os

    from pyspark.sql import functions as F

    from ..operators.scale import cms_sketch

    def apply_batch(batch: DataFrame, _bid: int) -> None:
        spark = batch.sparkSession
        part = cms_sketch(batch, item_col, d=d, w=w)
        if os.path.exists(path):
            existing = spark.read.parquet(path)
            merged = (existing.unionByName(part)
                      .groupBy("r", "c")
                      .agg(F.sum("cnt").alias("cnt")))
            _overwrite_via_tmp(merged, path)
        else:
            part.write.mode("overwrite").parquet(path)

    writer = (stream.writeStream
              .foreachBatch(apply_batch)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_hll_upsert(stream: DataFrame, path: str, checkpoint: str, *,
                      item_col: str = "item", b: int = 8,
                      available_now: bool = True):
    """Streaming HyperLogLog maintenance: each micro-batch folds to its
    own register table (``scale.hll_registers``) and MERGEs into the
    stored sketch by per-bucket max — "distinct items ever seen" over an
    endless stream with 2^b rows of state, and the stored table equals
    the batch sketch of everything seen (twin test asserts register
    equality). Same MERGE-into-parquet emulation as the CMS sink."""
    import os

    from pyspark.sql import functions as F

    from ..operators.scale import hll_registers

    def apply_batch(batch: DataFrame, _bid: int) -> None:
        spark = batch.sparkSession
        part = hll_registers(batch, item_col, b=b)
        if os.path.exists(path):
            existing = spark.read.parquet(path)
            merged = (existing.unionByName(part)
                      .groupBy("bucket")
                      .agg(F.max("rank").alias("rank")))
            _overwrite_via_tmp(merged, path)
        else:
            part.write.mode("overwrite").parquet(path)

    writer = (stream.writeStream
              .foreachBatch(apply_batch)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_topk_upsert(stream: DataFrame, path: str, checkpoint: str, *,
                       group_col: str = "event_type",
                       order_col: str = "value",
                       id_col: str = "event_id", k: int = 3,
                       available_now: bool = True):
    """Continuous per-group top-k maintenance (the live leaderboard
    sink): each micro-batch reduces to ITS OWN per-group top-k, merges
    with the stored top-k, and re-cuts to k — valid because top-k is
    mergeable exactly the way partial aggregates are: topk(A ∪ B) ==
    topk(topk(A) ∪ topk(B)). Stored state is k rows per group forever,
    no matter how many events flow through; the deterministic
    (order desc, id asc) cut makes the stored result equal the batch
    top-k of everything seen (stream == batch twin test).

    Same MERGE-into-parquet emulation as ``stream_rollup_upsert``; at
    scale the sink is a transactional table and this is one MERGE INTO
    keyed by (group, rank)."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    def _cut(df: DataFrame) -> DataFrame:
        # id-dedup BEFORE the cut: a replayed micro-batch re-merges the
        # same rows, and without this two copies of one event would
        # occupy two rank slots — with it the merge is IDEMPOTENT
        # (re-delivery is a no-op), a strictly stronger property than
        # the additive sketches can offer. The dedup keeps max(order_col)
        # per (group, id) — dropDuplicates would keep an ARBITRARY copy
        # when the same id re-arrives with a different value (an update,
        # not an exact re-delivery), making the stored top-k
        # nondeterministic; max-wins is the monotone leaderboard rule
        w = (W.partitionBy(group_col)
             .orderBy(F.col(order_col).desc(), id_col))
        return (df.groupBy(group_col, id_col)
                .agg(F.max(order_col).alias(order_col))
                .select(group_col, id_col, order_col,
                        F.row_number().over(w).alias("rnk"))
                .filter(F.col("rnk") <= k)
                .drop("rnk"))

    def apply_batch(batch: DataFrame, _bid: int) -> None:
        spark = batch.sparkSession
        part = _cut(batch.select(group_col, id_col, order_col))
        if os.path.exists(path):
            existing = spark.read.parquet(path)
            merged = _cut(existing.unionByName(part))
            _overwrite_via_tmp(merged, path)
        else:
            part.write.mode("overwrite").parquet(path)

    writer = (stream.writeStream
              .foreachBatch(apply_batch)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_funnel_upsert(stream: DataFrame, path: str, checkpoint: str, *,
                         gates, available_now: bool = True):
    """Continuously-maintained quality-gate FUNNEL (the streaming twin of
    ``curation.gate_funnel``): each micro-batch evaluates the gate chain
    row-locally, reduces to its own per-stage first-fail kill counts,
    and MERGES into the stored funnel by per-stage addition — valid
    because every document is charged to exactly one stage exactly once,
    so kill counts are additive across batches and the stored table
    equals the batch funnel of everything seen (twin test). State is
    stages+1 rows forever; survivor columns (n_in/n_out) derive from the
    stored kills + total at read time, the standard
    partial-aggregate-store / derive-on-read discipline.

    Same MERGE-into-parquet emulation as the other sinks; at scale the
    sink is a transactional table and this is one MERGE INTO keyed by
    stage."""
    import os

    from pyspark.sql import functions as F

    from ..operators.curation import gate_kill_counts

    def apply_batch(batch: DataFrame, _bid: int) -> None:
        spark = batch.sparkSession
        part = gate_kill_counts(batch, gates)
        if os.path.exists(path):
            existing = spark.read.parquet(path)
            merged = (existing.unionByName(part)
                      .groupBy("stage").agg(F.sum("n").alias("n")))
            _overwrite_via_tmp(merged, path)
        else:
            part.write.mode("overwrite").parquet(path)

    writer = (stream.writeStream
              .foreachBatch(apply_batch)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_funnel(spark, path: str, gates) -> DataFrame:
    """Materialize the stored streaming funnel as the full report shape
    (stage, gate, n_in, n_killed, n_out) — the SAME derivation the batch
    operator uses (`curation.funnel_report`), so the stream and batch
    reports can never diverge."""
    from ..operators.curation import funnel_report

    return funnel_report(spark.read.parquet(path), gates)
