"""Temporal join operators: backward as-of join and bounded-interval join.

The reference has no temporal joins at all — its only relational joins are
FK link resolution and batched point-reads (SURVEY.md §2.3, J1/J2 from
`packages/protonode/src/lib/generateApi.ts:166-177,309-327`) — so these are
north-star extensions, built the way a 100 TB Spark pipeline needs them:

- **As-of join** (`asof_join`): for each left row, the latest right row with
  ``right_ts <= left_ts`` per key. The naive plan (theta-join on
  ``r.ts <= l.ts`` + per-left max) is a cartesian-per-key explosion; the
  scalable plan used here is the *union-marker* form: union both sides,
  single window sort per key, ``last(payload, ignorenulls=True)`` carries
  the most recent right payload forward into each left row. One shuffle on
  the key, no per-key materialization, state bounded by a sort buffer —
  survives 1000 executors because it is exactly one repartition + sorted
  scan per partition.

- **Interval join** (`interval_join`): pairs ``(l, r)`` with
  ``r_ts ∈ [l_ts + lower, l_ts + upper)``. The naive inequality join is
  O(n·m) per key; here the right side is bucketed by
  ``width = upper - lower`` and each left row probes the (at most two)
  buckets its window can overlap — an equi-join on (key, bucket) that
  Catalyst executes as a plain shuffled hash join, followed by the exact
  range predicate. This is the standard stream-stream interval-join
  bucketing, applied to batch.

Both operators take/return DataFrames and compose with everything else;
timestamps are compared as native TimestampType (microsecond-exact), bucket
arithmetic is integer (``unix_micros``), so results carry no float risk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window as W

from ..functions.core import epoch_micros


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str, right_ts: str, right_cols: list[str],
              tolerance_sec: float | None = None,
              direction: str = "backward") -> DataFrame:
    """As-of join. ``direction='backward'`` (default): latest right row
    with ``right_ts <= left_ts``. ``'forward'``: EARLIEST right row with
    ``right_ts >= left_ts`` — the "next event after" form (next
    maintenance after a failure, next quote after an order). Same
    union-marker single-window plan either way; forward just sorts the
    union descending so the carried-forward payload is the nearest
    following row.

    Ties on ``right_ts`` resolve to the largest ``right_cols`` tuple (struct
    comparison; put a unique id first for determinism). Right payload columns
    come back NULL where no right row qualifies (left-outer semantics);
    ``tolerance_sec`` additionally nulls matches farther than the tolerance.

    NULL handling, matching SQL comparison (and interval_join) semantics:
    right rows with a NULL ``right_ts`` never match (``NULL <= t`` is
    NULL — but the ascending window scan would otherwise sort them FIRST
    and carry their payload into every left row), and NULL join keys
    match nothing (``Window.partitionBy`` groups NULLs together, unlike
    an equi-join — both sides filter NULL keys up front).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    # same shared-column precondition interval_join enforces: a
    # right_cols name colliding with a left column would emit a frame
    # with duplicate column names (__lrow.* + the alias), failing with
    # AMBIGUOUS_REFERENCE far from this call site
    shared = set(right_cols) & set(left.columns)
    if shared:
        raise ValueError(
            f"asof_join: right_cols {sorted(shared)} also exist on the "
            "left side — rename/select before joining so the output has "
            "unique column names")
    # right side only: left rows with NULL keys still come back (left-
    # outer contract) — with no right rows in their NULL partition they
    # simply match nothing, exactly the equi-join outcome
    for k in on:
        right = right.filter(F.col(k).isNotNull())
    right = right.filter(F.col(right_ts).isNotNull())
    payload = F.struct(F.col(right_ts).alias("__rts"),
                       *[F.col(c) for c in right_cols])
    r = right.select(*[F.col(k) for k in on],
                     F.col(right_ts).alias("__t"),
                     F.lit(0).alias("__side"),
                     payload.alias("__payload"))
    payload_type = r.schema["__payload"].dataType
    l = left.select(*[F.col(k) for k in on],
                    F.col(left_ts).alias("__t"),
                    F.lit(1).alias("__side"),
                    F.lit(None).cast(payload_type).alias("__payload"),
                    F.struct(*[F.col(c) for c in left.columns])
                    .alias("__lrow"))
    u = r.withColumn("__lrow", F.lit(None).cast(l.schema["__lrow"].dataType)) \
         .unionByName(l)
    # rights sort before lefts at equal ts (__side 0 < 1), so the frame up to
    # the current row realizes ts <= left_ts (backward) / ts >= left_ts
    # (forward, descending scan); left rows contribute NULL payloads which
    # last(ignorenulls) skips.
    ts_key = F.col("__t") if direction == "backward" else F.col("__t").desc()
    w = (W.partitionBy(*on).orderBy(ts_key, "__side", "__payload")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    matched = u.withColumn("__m", F.last("__payload", ignorenulls=True).over(w))
    out = matched.filter(F.col("__side") == 1)
    if tolerance_sec is not None:
        tol = F.expr(f"INTERVAL {tolerance_sec} SECONDS")
        cond = (F.col("__m.__rts") >= F.col("__t") - tol
                if direction == "backward"
                else F.col("__m.__rts") <= F.col("__t") + tol)
        out = out.withColumn("__m", F.when(cond, F.col("__m")))
    return out.select(
        "__lrow.*",
        F.col("__m.__rts").alias(f"{right_ts}_asof"),
        *[F.col(f"__m.{c}").alias(c) for c in right_cols])


def interval_join(left: DataFrame, right: DataFrame, on: list[str],
                  left_ts: str, right_ts: str,
                  lower_sec: int, upper_sec: int) -> DataFrame:
    """Inner pairs with ``right_ts ∈ [left_ts + lower, left_ts + upper)``.

    ``upper_sec > lower_sec`` required. Each left row expands to the ≤2
    right-side buckets of width ``upper - lower`` its window overlaps; the
    bucket equi-join prunes candidates, the exact timestamp predicate (native
    interval arithmetic, mirrored verbatim in oracles) decides membership.
    """
    if upper_sec <= lower_sec:
        raise ValueError("interval_join requires upper_sec > lower_sec")
    # same precondition the streaming twin (streaming/joins.py) enforces:
    # shared non-key columns make the post-join F.col() references
    # ambiguous — fail with a clear message instead of an analysis error
    shared = (set(left.columns) & set(right.columns)) - set(on)
    if shared:
        raise ValueError(
            f"interval_join: columns {sorted(shared)} exist on both sides "
            "(including the timestamps) — rename/select before joining so "
            f"{left_ts!r}/{right_ts!r} and payload references are "
            "unambiguous")
    width_us = (upper_sec - lower_sec) * 1_000_000
    lo_us, up_us = lower_sec * 1_000_000, upper_sec * 1_000_000
    lb = (left.withColumn("__us", epoch_micros(left, left_ts))
          .withColumn(
              "__bin",
              F.explode(F.sequence(
                  F.expr(f"(__us + {lo_us}) div {width_us}"),
                  F.expr(f"(__us + {up_us} - 1) div {width_us}"))))
          .drop("__us"))
    rb = (right.withColumn("__us", epoch_micros(right, right_ts))
          .withColumn("__bin", F.expr(f"__us div {width_us}"))
          .drop("__us"))
    cond = ((F.col(right_ts) >= F.col(left_ts)
             + F.expr(f"INTERVAL {lower_sec} SECONDS"))
            & (F.col(right_ts) < F.col(left_ts)
               + F.expr(f"INTERVAL {upper_sec} SECONDS")))
    return lb.join(rb, on=[*on, "__bin"]).filter(cond).drop("__bin")
