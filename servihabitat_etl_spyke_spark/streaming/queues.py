"""T7: queue semantics (fifo / lifo / priority / delayed).

The reference's ProtoQueue is an in-memory array with mode-dependent
insert/remove order and a ``setTimeout`` for delayed items
(``utils/context/protoQueue.ts:12-77``). Distributed twin: a queue is a
keyed table of pending items; *drain order* is a ranking window per queue,
and *delayed* items carry a release timestamp (event-time + delay) that a
streaming consumer enforces with a watermark hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window as W

MODES = ("fifo", "lifo", "priority", "delayed")


def drain_order(items: DataFrame, mode: str = "fifo", *,
                queue_col: str = "queue_id", ts_col: str = "enqueued_at",
                priority_col: str = "priority",
                release_col: str = "release_at",
                tiebreak_col: str = "item_id") -> DataFrame:
    """Assign each pending item its dequeue position within its queue.

    fifo: oldest first; lifo: newest first; priority: highest priority
    first (ties FIFO, protoQueue.ts:44-52's ordered insert); delayed:
    by release time (enqueue time + per-item delay, protoQueue.ts:57-66).
    One ranking window per queue key — queues shard across executors.
    """
    if mode == "fifo":
        order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    elif mode == "lifo":
        order = [F.col(ts_col).desc(), F.col(tiebreak_col).desc()]
    elif mode == "priority":
        order = [F.col(priority_col).desc(), F.col(ts_col).asc(),
                 F.col(tiebreak_col).asc()]
    elif mode == "delayed":
        order = [F.col(release_col).asc(), F.col(tiebreak_col).asc()]
    else:
        raise ValueError(f"unknown queue mode {mode!r} (one of {MODES})")
    from ..operators.scale import _reserve
    _reserve(items, "drain_pos", "drain_order")
    w = W.partitionBy(queue_col).orderBy(*order)
    return items.withColumn("drain_pos", F.row_number().over(w))
