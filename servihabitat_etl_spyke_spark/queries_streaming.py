"""Streaming-layer query registrations (SURVEY.md §2.8 T1-T7 + windows).

Every streaming operator here has a batch twin registered as an
oracle-checked query — ``window()``/``session_window()``/ranking windows
run identically on batch DataFrames, and the fold/lag state semantics are
encoded as JVM expressions — so the driver's DuckDB gate checks the exact
semantics the streaming forms execute. The true ``readStream`` paths are
exercised in tests/test_streaming.py with availableNow triggers against
these same twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .catalog import load_table
from .functions.core import epoch_micros
from .queries import query, round2
from .streaming import events as EV
from .streaming import queues as Q
from .streaming import windows as WIN
from .streaming.stateful import (USER_LIFECYCLE, state_machine_entry_events,
                                 state_machine_fold)
from .streaming.topics import mqtt_to_regex, topic_filter

# ---------------------------------------------------------------------------
# topic/event plumbing twins
# ---------------------------------------------------------------------------

# synthesized topic: notifications/event/create/<event_type>/u<user_id%10>
_TOPIC_SQL = ("'notifications/event/create/' || event_type || '/u' || "
              "CAST(user_id % 10 AS VARCHAR)")
_PATTERN = "notifications/+/create/click/#"


def _event_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    topic = F.concat(F.lit("notifications/event/create/"),
                     F.col("event_type"), F.lit("/u"),
                     (F.col("user_id") % 10).cast("string"))
    return ev.withColumn("topic", topic)


@query("topic_wildcard_match", oracle=f"""
SELECT topic, count(*) AS n_msgs FROM (
  SELECT {_TOPIC_SQL} AS topic FROM events
) WHERE regexp_matches(topic, '{mqtt_to_regex(_PATTERN)}')
GROUP BY topic ORDER BY topic
""")
def topic_wildcard_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: MQTT wildcard subscription ('+' one segment, '#' rest) compiled
    to one anchored rlike over the shared topic stream."""
    subs = topic_filter(_event_topics(spark, sf_dir), _PATTERN)
    return (subs.groupBy("topic").agg(F.count("*").alias("n_msgs")))


@query("cdc_notifications", oracle="""
SELECT 'notifications/order/' ||
       CASE CAST(o_orderstatus AS VARCHAR) WHEN 'F' THEN 'create'
            WHEN 'O' THEN 'update' ELSE 'delete' END ||
       '/' || CAST(o_orderkey AS VARCHAR) AS topic,
       o_orderkey, floor(o_totalprice * 100 + 0.5) / 100 AS payload_total
FROM orders ORDER BY o_orderkey LIMIT 100
""")
def cdc_notifications(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: every mutation publishes notifications/<model>/<action>/<id>;
    the notification stream is a derived topic column over the changes."""
    orders = load_table(spark, sf_dir, "orders")
    action = (F.when(F.col("o_orderstatus").cast("string") == "F", "create")
              .when(F.col("o_orderstatus").cast("string") == "O", "update")
              .otherwise("delete"))
    changes = orders.withColumn("action", action)
    return (EV.cdc_topics(changes, "order", key_col="o_orderkey")
            .select("topic", "o_orderkey",
                    round2(F.col("o_totalprice")).alias("payload_total"))
            .orderBy("o_orderkey").limit(100))


@query("ephemeral_split", oracle="""
SELECT count(*) FILTER (WHERE NOT event_id % 10 = 0) AS stored,
       count(*) AS published
FROM events
""")
def ephemeral_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: ephemeral events are published but skip storage — storage sees
    the filtered stream, publish sees everything."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ephemeral", F.col("event_id") % 10 == 0)
    to_store, to_publish = EV.split_ephemeral(ev)
    return to_store.agg(F.count("*").alias("stored")).crossJoin(
        to_publish.agg(F.count("*").alias("published")))


@query("env_fanout", oracle="""
SELECT env, count(*) AS n_rows FROM (
  SELECT unnest(CASE WHEN event_id % 3 = 2 THEN ['dev', 'prod']
                WHEN event_id % 3 = 0 THEN ['dev'] ELSE ['prod'] END) AS env
  FROM events
) GROUP BY env ORDER BY env
""")
def env_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: environment '*' fan-out — the row lands in BOTH env partitions;
    readers filter one. Explode models the reference's dbPath loop."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "environment",
        F.when(F.col("event_id") % 3 == 2, "*")
        .when(F.col("event_id") % 3 == 0, "dev").otherwise("prod"))
    routed = EV.route_envs(ev)
    return (routed.groupBy("env").agg(F.count("*").alias("n_rows")))


# ---------------------------------------------------------------------------
# T6: state machine fold
# ---------------------------------------------------------------------------

_SM_CASE = USER_LIFECYCLE.transition_sql("state", "seq[i]")

# NOTE: the oracle folds via a recursive CTE rather than list_reduce —
# DuckDB 1.0's list_reduce gives wrong answers under vectorized (multi-row)
# evaluation (verified: batch fold != single-row fold != Python fold on 6 of
# 150 keys; the recursive form matches the Python simulation on all keys).
@query("state_machine_fold", oracle=f"""
WITH RECURSIVE seqs AS (
  SELECT user_id, list(event_type ORDER BY ts, event_id) AS seq,
         count(*) AS n_events
  FROM events GROUP BY user_id
),
fold AS (
  SELECT user_id, seq, n_events, 1 AS i,
         '{USER_LIFECYCLE.initial}' AS state
  FROM seqs
  UNION ALL
  SELECT user_id, seq, n_events, i + 1, {_SM_CASE}
  FROM fold WHERE i <= len(seq)
)
SELECT user_id, state AS final_state, n_events
FROM fold WHERE i = len(seq) + 1 ORDER BY user_id
""")
def state_machine_fold_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 batch twin: fold each user's time-ordered events through the
    lifecycle transition table (aggregate() = codegen fold, no Python).
    Streaming form keeps one state-store row per instance
    (streaming/stateful.py::state_machine_stream)."""
    ev = load_table(spark, sf_dir, "events")
    return state_machine_fold(ev, USER_LIFECYCLE)


@query("state_machine_entries", oracle=f"""
WITH RECURSIVE seqs AS (
  SELECT user_id, list(event_type ORDER BY ts, event_id) AS seq,
         list(event_id ORDER BY ts, event_id) AS ids
  FROM events GROUP BY user_id
),
fold AS (
  SELECT user_id, seq, ids, 1 AS i,
         '{USER_LIFECYCLE.initial}' AS state, CAST(NULL AS VARCHAR) AS prev
  FROM seqs
  UNION ALL
  SELECT user_id, seq, ids, i + 1, {_SM_CASE}, state
  FROM fold WHERE i <= len(seq)
),
entries AS (
  SELECT user_id, i, state,
         CASE WHEN i = 1 THEN NULL ELSE ids[i - 1] END AS event_id
  FROM fold WHERE i = 1 OR state <> prev
)
SELECT user_id,
       row_number() OVER (PARTITION BY user_id ORDER BY i) AS entry_seq,
       event_id,
       'stateMachines/state/entry' AS path,
       'state-machine' AS emitted_from,
       'machine-' || CAST(user_id AS VARCHAR) AS machine,
       'userLifecycle' AS definition,
       state AS current_state
FROM entries
ORDER BY user_id, entry_seq
""")
def state_machine_entries_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 entry actions: every state entry emits an event row with the
    reference's event shape (sampleMachine.ts:16-29 — path
    'stateMachines/state/entry', from 'state-machine', payload machine/
    definition/currentState). Initial entry fires on spawn (event_id NULL);
    unhandled events fire nothing. Streaming twin:
    streaming/stateful.py::state_machine_entries_stream (equivalence
    asserted in tests/test_streaming.py)."""
    ev = load_table(spark, sf_dir, "events")
    return (state_machine_entry_events(ev, USER_LIFECYCLE))


# ---------------------------------------------------------------------------
# T7: queues
# ---------------------------------------------------------------------------

@query("queue_priority_drain", oracle="""
SELECT queue_id, item_id, priority, drain_pos FROM (
  SELECT user_id % 5 AS queue_id, event_id AS item_id,
         event_id % 3 AS priority,
         row_number() OVER (PARTITION BY user_id % 5
                            ORDER BY event_id % 3 DESC, ts, event_id)
           AS drain_pos
  FROM events
) ORDER BY queue_id, drain_pos
""")
def queue_priority_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7 priority queue: drain position = rank by (priority desc, FIFO
    tiebreak) within each queue shard."""
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 5).alias("queue_id"),
        F.col("event_id").alias("item_id"),
        (F.col("event_id") % 3).alias("priority"),
        F.col("ts").alias("enqueued_at"))
    out = Q.drain_order(ev, "priority", tiebreak_col="item_id")
    return (out.select("queue_id", "item_id", "priority", "drain_pos"))


@query("queue_delayed_release", oracle="""
SELECT queue_id, item_id, epoch_us(release_at) AS release_us, drain_pos
FROM (
  SELECT *, row_number() OVER (PARTITION BY queue_id
                               ORDER BY release_at, item_id) AS drain_pos
  FROM (
    SELECT user_id % 5 AS queue_id, event_id AS item_id,
           ts + to_minutes(event_id % 7) AS release_at
    FROM events)
) ORDER BY queue_id, drain_pos
""")
def queue_delayed_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7 delayed queue: release time = enqueue time + per-item delay;
    a streaming consumer holds items via event-time watermark instead of
    the reference's setTimeout."""
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 5).alias("queue_id"),
        F.col("event_id").alias("item_id"),
        (F.col("ts") + F.make_interval(mins=(F.col("event_id") % 7)
                                       .cast("int"))).alias("release_at"))
    out = Q.drain_order(ev, "delayed", tiebreak_col="item_id")
    return (out.select("queue_id", "item_id",
                       epoch_micros(out, "release_at").alias("release_us"),
                       "drain_pos"))


# ---------------------------------------------------------------------------
# watermarked windows (batch twins)
# ---------------------------------------------------------------------------

@query("window_sliding", oracle="""
SELECT epoch_us(win_start) AS window_start_us, event_type, count(*) AS cnt
FROM (
  SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                 time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE])
           AS win_start,
         event_type
  FROM events
) GROUP BY 1, 2 ORDER BY 1, 2
""")
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h/30m windows: each event lands in 2 overlapping windows
    (JVM-side window assignment; same operator streams with a watermark)."""
    ev = load_table(spark, sf_dir, "events")
    out = WIN.sliding_counts(ev, "1 hour", "30 minutes")
    return (out.select(epoch_micros(out, "window.start")
                       .alias("window_start_us"), "event_type", "cnt"))


@query("session_window_batch", oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE
              THEN 0 ELSE 1 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts,
         -- event_id tiebreak keeps tied-ts peers in the SAME order the
         -- flagged CTE computed new_session in (an untied ROWS frame
         -- could sum a ns=0 row before its ns=1 twin, shifting sessions)
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id, epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts) + INTERVAL 30 MINUTE) AS session_end_us,
       count(*) AS n_events
FROM sessions GROUP BY user_id, sid ORDER BY user_id, session_start_us
""")
def session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows via the native session_window operator
    (window end = last event + gap); oracle reconstructs the same
    sessions with a lag/running-sum CTE."""
    ev = load_table(spark, sf_dir, "events")
    out = WIN.session_window_agg(ev, "30 minutes")
    return (out.select(
        "user_id",
        epoch_micros(out, "session_window.start").alias("session_start_us"),
        epoch_micros(out, "session_window.end").alias("session_end_us"),
        "n_events"))


@query("late_data_watermark", oracle="""
SELECT user_id, event_id FROM (
  SELECT user_id, event_id, ts,
         max(ts) OVER (PARTITION BY user_id
                       ORDER BY md5(CAST(event_id AS VARCHAR))
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS high_water
  FROM events
) WHERE ts < high_water - INTERVAL 10 MINUTE
ORDER BY user_id, event_id
""")
def late_data_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics, batch twin: an event is *late* if it arrives
    with event time more than 10 minutes behind the per-key high-water
    mark — exactly the rows a streaming watermark would drop. The
    synthetic events are generated in time order, so arrival order is
    deterministically scrambled (md5 of the id) to surface real lateness."""
    from pyspark.sql.window import Window as W
    ev = load_table(spark, sf_dir, "events")
    arrival = F.md5(F.col("event_id").cast("string"))
    w = (W.partitionBy("user_id").orderBy(arrival)
         .rowsBetween(W.unboundedPreceding, -1))
    seq = ev.select("user_id", "event_id", "ts",
                    F.max("ts").over(w).alias("high_water"))
    late = seq.filter(
        F.col("ts") < F.col("high_water") - F.expr("INTERVAL 10 MINUTES"))
    return late.select("user_id", "event_id")


@query("stream_dedup_batch", oracle="""
SELECT event_id, user_id, event_type FROM (
  SELECT event_id, user_id, event_type FROM events
  UNION ALL
  SELECT event_id, user_id, event_type FROM events
) GROUP BY event_id, user_id, event_type
ORDER BY event_id
""")
def stream_dedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ``streaming.sinks.stream_dedup``
    (dropDuplicatesWithinWatermark): the exact-dedup semantics the
    streaming sink enforces — a re-delivered event suppressed, one
    survivor per key — run over a deterministically DOUBLED event feed
    (the table unioned with itself, the same re-delivery shape
    tests/test_streaming.py drives through the real readStream path).
    Key-only projection makes the survivor identity well-defined, so the
    oracle is a plain GROUP BY."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type")
    doubled = ev.unionAll(ev)
    return doubled.dropDuplicates(["event_id"])
