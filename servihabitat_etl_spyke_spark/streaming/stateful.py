"""T5/T6: per-key stateful streaming operators.

- Edge detection: the reference keeps a module-level ``memory`` map of the
  last value per id and fires only on threshold transitions
  (``context/flowEdgeDetector.ts:6-28``).
- State machines: named instances of declarative definitions — states +
  ``on`` transition tables — advanced by incoming events
  (``stateMachinesApi.ts:8-45``, sample at
  ``packages/app/bundles/custom/stateMachines/sampleMachine.ts:6-56``).

Spark-first: the streaming forms keep state in
``applyInPandasWithState`` (Arrow-batched, partitioned by key — state
shards across executors, nothing sits on the driver); the batch twins are
a ``lag()`` window (edge) and an ``aggregate()`` fold over an ordered
event array (machine), both whole-stage-codegen JVM expressions so the
100 TB path has no Python in it.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# ---------------------------------------------------------------------------
# T5: edge detection
# ---------------------------------------------------------------------------

_EDGE_STATE = "last DOUBLE"


def _whole_group(pdfs: Iterable[pd.DataFrame],
                 sort_cols: list[str]) -> pd.DataFrame | None:
    """Concatenate ALL of a group's Arrow chunks, then sort ONCE.

    A group larger than ``spark.sql.execution.arrow.maxRecordsPerBatch``
    arrives as several pdfs with NO cross-chunk event-time ordering —
    sorting each chunk independently would fold later events before
    earlier ones, diverging from the batch ``lag()``/``array_sort``
    twins. The price is holding one group's micro-batch in pandas at
    once, which is the stated memory model of every
    ``applyInPandasWithState`` operator here (bound micro-batch size /
    key cardinality accordingly at scale)."""
    frames = [p for p in pdfs if len(p)]
    if not frames:
        return None
    whole = frames[0] if len(frames) == 1 else pd.concat(
        frames, ignore_index=True)
    return whole.sort_values(sort_cols)


def edge_detect_stream(events: DataFrame, threshold: float = 100.0,
                       key_col: str = "user_id") -> DataFrame:
    """Streaming rising/falling edge detector.

    Per-key last-value state lives in the state store; each micro-batch
    is processed as one concatenated, time-sorted group (see
    :func:`_whole_group`), emitting only transition rows — identical
    semantics to the batch ``lag()`` twin (queries.edge_detection) when
    run over the same data with ``availableNow``. The key column must be
    integral (BIGINT), same contract as the state-machine twins.
    """
    out_schema = (f"{key_col} BIGINT, event_id BIGINT, value DOUBLE, "
                  "prev DOUBLE, edge STRING")

    def detect(key: tuple, pdfs: Iterable[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        (last,) = state.get if state.exists else (None,)
        pdf = _whole_group(pdfs, ["ts", "event_id"])
        if pdf is None:
            return
        prev = pdf["value"].shift(1)
        if last is not None:
            prev.iloc[0] = last
        rising = (prev < threshold) & (pdf["value"] >= threshold)
        falling = (prev >= threshold) & (pdf["value"] < threshold)
        mask = rising | falling
        last = float(pdf["value"].iloc[-1])
        state.update((last,))
        if mask.any():
            yield pd.DataFrame({
                key_col: pdf.loc[mask, key_col],
                "event_id": pdf.loc[mask, "event_id"],
                "value": pdf.loc[mask, "value"].round(2),
                "prev": prev[mask].round(2),
                "edge": rising[mask].map({True: "rising",
                                          False: "falling"}),
            })

    return events.groupBy(key_col).applyInPandasWithState(
        detect, out_schema, _EDGE_STATE, "append",
        GroupStateTimeout.NoTimeout)


# ---------------------------------------------------------------------------
# T6: state machines
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class StateMachine:
    """Declarative machine: initial state + (state, event) -> state table.

    Mirrors the reference's xstate-style definitions (states with ``on``
    transition maps); unknown (state, event) pairs stay put, matching
    xstate's ignore-unhandled-event behavior.
    """

    initial: str
    transitions: dict[tuple[str, str], str] = field(default_factory=dict)

    def step(self, state: str, event: str) -> str:
        return self.transitions.get((state, event), state)

    def transition_column(self, acc: Column, event: Column) -> Column:
        """The step function as one chained CASE expression (JVM-side)."""
        expr: Column | None = None
        for (src, ev), dst in self.transitions.items():
            cond = (acc == src) & (event == ev)
            expr = F.when(cond, dst) if expr is None else expr.when(cond, dst)
        return acc if expr is None else expr.otherwise(acc)

    def transition_sql(self, acc: str, event: str) -> str:
        """The same step function as ANSI SQL (for the DuckDB oracle)."""
        cases = " ".join(
            f"WHEN {acc} = '{src}' AND {event} = '{ev}' THEN '{dst}'"
            for (src, ev), dst in self.transitions.items())
        return f"CASE {cases} ELSE {acc} END"


#: demo machine over the synthetic events vocabulary
#: (click / view / signup / purchase / error)
USER_LIFECYCLE = StateMachine(
    initial="anon",
    transitions={
        ("anon", "signup"): "registered",
        ("registered", "click"): "browsing",
        ("registered", "view"): "browsing",
        ("browsing", "purchase"): "customer",
        ("browsing", "error"): "broken",
        ("broken", "click"): "browsing",
        ("customer", "purchase"): "vip",
    },
)


def state_machine_fold(events: DataFrame, machine: StateMachine,
                       key_col: str = "user_id",
                       event_col: str = "event_type") -> DataFrame:
    """Batch twin: fold each key's time-ordered event array through the
    transition table. ``array_sort`` on (ts, event_id) structs gives a
    deterministic order; ``aggregate`` keeps the fold inside codegen —
    per key the work is O(events) with no Python and no extra shuffle
    beyond the single groupBy."""
    ordered = F.array_sort(F.collect_list(
        F.struct("ts", "event_id", F.col(event_col).alias("ev"))))
    seq = F.transform(ordered, lambda s: s["ev"])
    final = F.aggregate(
        seq, F.lit(machine.initial),
        lambda acc, ev: machine.transition_column(acc, ev))
    return (events.groupBy(key_col)
            .agg(final.alias("final_state"),
                 F.count("*").alias("n_events")))


#: the reference's entry-action event shape (sampleMachine.ts:16-29: every
#: state entry fires generateEvent({path: 'stateMachines/state/entry',
#: from: 'state-machine', user: instanceName, payload: {machine, definition,
#: currentState}})). SURVEY §7: actions are EMITTED ROWS, not callbacks.
ENTRY_PATH = "stateMachines/state/entry"
ENTRY_FROM = "state-machine"


def state_machine_entry_events(events: DataFrame, machine: StateMachine,
                               definition: str = "userLifecycle",
                               key_col: str = "user_id",
                               event_col: str = "event_type") -> DataFrame:
    """Batch twin of entry actions: one emitted event row per state ENTRY.

    Mirrors the reference sample machine (sampleMachine.ts:6-56), where each
    state's ``entry`` hook fires an event into the events stream; here the
    fold computes the full state trajectory per instance and emits exactly
    the rows those hooks would have produced: one for the initial state on
    spawn (no triggering event) and one per state CHANGE (unhandled events
    keep the state and — like the reference's ignored INC/DEC/SET — fire no
    entry).

    Plan shape: single groupBy shuffle; the trajectory is an ``aggregate``
    fold (JVM codegen, no Python) whose accumulator is (current state,
    entries-so-far) — the array only grows on state CHANGES, so a key's
    fold copies O(n_events · n_changes) elements rather than the
    O(n_events²) of accumulating every visited state. For pathological
    keys feed through operators.scale.salted_group_agg-style splitting
    first.
    """
    ordered = F.array_sort(F.collect_list(
        F.struct("ts", "event_id", F.col(event_col).alias("ev"))))
    grouped = events.groupBy(key_col).agg(ordered.alias("evs"))

    # fold: acc.s = current state, acc.es = entry rows emitted so far
    def _step(acc, e):
        nxt = machine.transition_column(acc["s"], e["ev"])
        return F.struct(
            nxt.alias("s"),
            F.when(nxt != acc["s"],
                   F.concat(acc["es"], F.array(F.struct(
                       e["event_id"].alias("event_id"),
                       nxt.alias("state")))))
            .otherwise(acc["es"]).alias("es"))

    empty = F.array().cast("array<struct<event_id: bigint, state: string>>")
    folded = F.aggregate(
        F.col("evs"),
        F.struct(F.lit(machine.initial).alias("s"), empty.alias("es")),
        _step)
    entries = F.concat(
        # spawn: the initial state's entry action (event_id NULL)
        F.array(F.struct(F.lit(None).cast("bigint").alias("event_id"),
                         F.lit(machine.initial).alias("state"))),
        folded["es"])

    out = grouped.select(key_col, F.posexplode(entries).alias("pos", "entry"))
    return out.select(
        F.col(key_col),
        (F.col("pos") + 1).cast("bigint").alias("entry_seq"),
        F.col("entry.event_id").alias("event_id"),
        F.lit(ENTRY_PATH).alias("path"),
        F.lit(ENTRY_FROM).alias("emitted_from"),   # reference key: `from`
        F.concat(F.lit("machine-"), F.col(key_col).cast("string"))
         .alias("machine"),
        F.lit(definition).alias("definition"),
        F.col("entry.state").alias("current_state"))


_SM_ENTRY_STATE = "state STRING, entry_seq BIGINT"


def state_machine_entries_stream(events: DataFrame, machine: StateMachine,
                                 definition: str = "userLifecycle",
                                 key_col: str = "user_id",
                                 event_col: str = "event_type") -> DataFrame:
    """Streaming twin: entry-action rows emitted as transitions happen.

    Append-mode ``applyInPandasWithState``: the state store holds (current
    state, entry counter) per instance; a new instance first emits the
    initial state's entry (the reference fires it on spawn), then one row
    per state change across micro-batches. Over identical data this equals
    the batch fold (asserted in tests/test_streaming.py)."""
    out_schema = (f"{key_col} BIGINT, entry_seq BIGINT, event_id BIGINT, "
                  "path STRING, emitted_from STRING, machine STRING, "
                  "definition STRING, current_state STRING")

    def advance(key: tuple, pdfs: Iterable[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            cur, seq = state.get
            entries: list[tuple] = []
        else:
            cur, seq = machine.initial, 1
            entries = [(seq, None, cur)]
        pdf = _whole_group(pdfs, ["ts", "event_id"])
        if pdf is not None:
            for eid, ev in zip(pdf["event_id"], pdf[event_col]):
                nxt = machine.step(cur, ev)
                if nxt != cur:
                    seq += 1
                    entries.append((seq, int(eid), nxt))
                    cur = nxt
        state.update((cur, seq))
        if entries:
            yield pd.DataFrame({
                key_col: [key[0]] * len(entries),
                "entry_seq": [e[0] for e in entries],
                "event_id": [e[1] for e in entries],
                "path": ENTRY_PATH,
                "emitted_from": ENTRY_FROM,
                "machine": f"machine-{key[0]}",
                "definition": definition,
                "current_state": [e[2] for e in entries],
            })

    return events.groupBy(key_col).applyInPandasWithState(
        advance, out_schema, _SM_ENTRY_STATE, "append",
        GroupStateTimeout.NoTimeout)


_SM_STATE = "state STRING"


def state_machine_stream(events: DataFrame, machine: StateMachine,
                         key_col: str = "user_id",
                         event_col: str = "event_type") -> DataFrame:
    """Streaming form: one state-store row per machine instance; each
    micro-batch advances the machine and emits the post-batch state
    (update-mode friendly). Entry-action side effects are modeled as the
    emitted rows themselves (SURVEY.md §7 'model actions as emitted rows,
    not callbacks')."""
    out_schema = f"{key_col} BIGINT, state STRING, n_events BIGINT"

    def advance(key: tuple, pdfs: Iterable[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
        (cur,) = state.get if state.exists else (machine.initial,)
        n = 0
        pdf = _whole_group(pdfs, ["ts", "event_id"])
        if pdf is not None:
            for ev in pdf[event_col]:
                cur = machine.step(cur, ev)
            n = len(pdf)
        state.update((cur,))
        yield pd.DataFrame({key_col: [key[0]], "state": [cur],
                            "n_events": [n]})

    return events.groupBy(key_col).applyInPandasWithState(
        advance, out_schema, _SM_STATE, "update",
        GroupStateTimeout.NoTimeout)
