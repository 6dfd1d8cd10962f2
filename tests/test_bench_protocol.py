"""Guards on the bench stdout protocol and the README prose counts.

The round driver records a 2000-byte TAIL of bench.py's stdout; a
protocol line longer than that loses its head (and the opening brace),
so ``json.loads`` fails and BENCH_r{N}.json carries ``"parsed": null``
— which is exactly what happened every round from r02 through r06.
These tests pin the <=1900-byte budget against a realistic worst case
so the regression class cannot recur silently.

The README-counts test ends the "prose counts drift" class the r5 and
r6 verdicts both flagged: the canonical registry/oracle counts in
README.md are marked with ``<!-- counts:registry``, and this test
fails whenever the stated numbers diverge from ``len(QUERIES)`` /
``len(ORACLES)``.
"""

from __future__ import annotations

import json
import os
import re

import bench
from servihabitat_etl_spyke_spark.queries import ORACLES, QUERIES

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _worst_case_out() -> dict:
    """A protocol dict at least as large as any realistic round: every
    headline query in the top-5 pool with max-width timings, every
    bookkeeping field populated, and pathological regression/retry
    lists (every headline name at once)."""
    names = list(bench.HEADLINE)
    timings = {n: 123456.789 for n in names}
    top5 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    return {
        "metric": "headline_queries_total_runtime",
        "value": 123456789.123,
        "unit": "sec",
        "queries": top5,
        "queries_total": len(timings),
        "queries_full_in": "BENCH_DETAIL.json",
        "sf": 0.1,
        "gated_by_retry": names,
        "noise_factor": 12.34,
        "environment": {"loadavg_at_start": 123.45, "canary_sec": 123.456,
                        "canary_end_sec": 123.456,
                        "canary_pin_generation": 2},
        "baseline_round": "r06",
        "median_delta_vs_baseline": 123.45,
        "median_delta_vs_baseline_noise_adj": 123.45,
        "regressions_over_2x": names,
        "flag_canary_factors": {n: 123.45 for n in names},
        "median_delta_vs_prev_round": 123.45,
        "headline_missing_from_registry": names[:5],
        "window_waited_sec": 123456,
        "window_wait_exhausted": True,
        "noise_factor_end": 123.45,
        "window_degraded": True,
    }


def test_protocol_line_fits_driver_tail_worst_case():
    line = bench._protocol_line(_worst_case_out())
    assert len(line) <= bench.LINE_BUDGET, (
        f"protocol line {len(line)}B exceeds the {bench.LINE_BUDGET}B "
        "budget (driver tail is 2000B — the head would be cut and "
        "BENCH_r*.json would carry parsed:null again)")
    parsed = json.loads(line)
    # thinning must be explicit, never silent
    assert parsed["regressions_over_2x_count"] == len(bench.HEADLINE)
    assert parsed["regressions_truncated"] is True
    assert parsed["queries_total"] == len(bench.HEADLINE)


def test_protocol_line_pathological_missing_list_floors_to_core():
    """Even a round where EVERY headline name went missing from the
    registry (the largest possible optional field) must emit a line
    inside the budget — the last-resort core floor guarantees it."""
    out = _worst_case_out()
    out["headline_missing_from_registry"] = list(bench.HEADLINE)
    line = bench._protocol_line(out)
    assert len(line) <= bench.LINE_BUDGET
    parsed = json.loads(line)
    # either the truncated-lists form or the core floor — both carry
    # the headline metric and the truncation is explicit
    assert parsed["metric"] == "headline_queries_total_runtime"
    assert parsed["value"] == out["value"]
    if "thinned_to_core" not in parsed:
        assert parsed.get("headline_missing_count") == len(bench.HEADLINE)


def test_protocol_line_core_floor_is_always_under_budget():
    """The core floor itself (every field at max width) must fit with
    room to spare — it is the invariant the whole ladder rests on."""
    out = _worst_case_out()
    # force the floor by blowing every earlier thinning step
    out["some_future_giant_field"] = "x" * 5000
    line = bench._protocol_line(out)
    assert len(line) <= bench.LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["thinned_to_core"] is True
    assert parsed["queries_full_in"] == "BENCH_DETAIL.json"
    # the regression-gate signal survives the floor as a count
    assert parsed["regressions_over_2x_count"] == len(bench.HEADLINE)


def test_protocol_line_typical_round_not_thinned():
    out = _worst_case_out()
    out["regressions_over_2x"] = []
    # main() only attaches flag_canary_factors when flags survive
    out.pop("flag_canary_factors")
    out["gated_by_retry"] = ["text_line_filter"]
    out.pop("headline_missing_from_registry")
    line = bench._protocol_line(out)
    assert len(line) <= bench.LINE_BUDGET
    parsed = json.loads(line)
    # a quiet round keeps its top-5 dict and full (tiny) lists intact
    assert len(parsed["queries"]) == 5
    assert "regressions_truncated" not in parsed
    assert parsed["gated_by_retry"] == ["text_line_filter"]


def test_regression_gate_rule():
    """r8 gate rule (VERDICT r7 #6): flagged iff t > max(2*pin,
    pin+0.5s) — pure 2x for pins >= 0.5 s, absolute +0.5 s allowance
    below (r7 flagged two ~0.13 s sheet queries at 2.2-2.8x on
    scheduler hiccups alone). No pin -> never flagged here."""
    assert not bench._over_gate(0.39, 0.13)      # 3x a tiny pin: allowed
    assert bench._over_gate(0.64, 0.13)          # past pin+0.5: flagged
    assert bench._over_gate(2.1, 1.0)            # classic 2x breach
    assert not bench._over_gate(1.9, 1.0)
    assert not bench._over_gate(1.2, 0.61)       # <2x, pin >= 0.5
    assert not bench._over_gate(99.0, None)      # unpinned: no gate
    assert not bench._over_gate(99.0, 0.0)


def test_quiet_window_wait_contract():
    """The canary gate waits in 60 s steps only at the pin's SF, stamps
    how long it waited, and reports exhaustion instead of looping
    forever. Exercised against a stub canary so no Spark is needed."""
    readings = iter([2.0 * bench.CANARY_PIN_SEC,
                     1.5 * bench.CANARY_PIN_SEC,
                     1.05 * bench.CANARY_PIN_SEC])
    slept = []
    orig_canary, orig_sleep = bench._canary_seconds, bench.time.sleep
    bench._canary_seconds = lambda spark: next(readings)
    bench.time.sleep = lambda s: slept.append(s)
    try:
        canary, waited, exhausted = bench._wait_for_quiet_window(None)
    finally:
        bench._canary_seconds, bench.time.sleep = orig_canary, orig_sleep
    assert not exhausted and waited == sum(slept) == 120
    assert canary <= bench.WINDOW_GATE * bench.CANARY_PIN_SEC

    # budget exhaustion: the canary never quiets -> give up after the
    # budget, say so
    bench._canary_seconds = lambda spark: 3.0 * bench.CANARY_PIN_SEC
    bench.time.sleep = lambda s: slept.append(s)
    try:
        canary, waited, exhausted = bench._wait_for_quiet_window(None)
    finally:
        bench._canary_seconds, bench.time.sleep = orig_canary, orig_sleep
    assert exhausted and waited == bench.WINDOW_WAIT_BUDGET_SEC

    # a missing canary table (custom SF layout) skips the wait outright
    bench._canary_seconds = lambda spark: None
    try:
        canary, waited, exhausted = bench._wait_for_quiet_window(None)
    finally:
        bench._canary_seconds = orig_canary
    assert canary is None and waited == 0 and not exhausted


def test_headline_names_all_registered():
    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, (
        f"bench HEADLINE names absent from the registry: {missing} — "
        "a renamed query would silently shrink the suite total")


def test_every_headline_query_has_a_baseline_pin():
    """A headline query missing from BENCH_BASELINE.json silently
    escapes the 2x regression gate (its dvb is simply undefined) —
    etl_cascade_delete did exactly that between its r6 HEADLINE
    registration and the r7 pin. New headline names must be pinned in
    the same round they are added."""
    with open(os.path.join(_ROOT, "BENCH_BASELINE.json")) as fh:
        base = json.load(fh)
    unpinned = [n for n in bench.HEADLINE
                if n not in base.get("queries", {})]
    assert not unpinned, (
        f"headline queries without a baseline pin: {unpinned} — add a "
        "quiet-window pin to BENCH_BASELINE.json (see the bench-noise "
        "discipline notes)")


def test_readme_counts_match_registry():
    with open(os.path.join(_ROOT, "README.md")) as fh:
        readme = fh.read()
    m = re.search(
        r"counts:registry.*?Registry as of r\d+: (\d+) queries, "
        r"(\d+) oracled",
        readme, re.DOTALL)
    assert m, "README.md lost its <!-- counts:registry --> marker line"
    stated_q, stated_o = int(m.group(1)), int(m.group(2))
    assert stated_q == len(QUERIES), (
        f"README says {stated_q} registry queries; len(QUERIES) is "
        f"{len(QUERIES)} — update the marked line in README.md")
    assert stated_o == len(ORACLES), (
        f"README says {stated_o} oracled; len(ORACLES) is "
        f"{len(ORACLES)} — update the marked line in README.md")
    # second prose site (r8 verdict "What's wrong #3": this exact line
    # said 231 while the registry held 232 — the same drift class the
    # counts:registry marker killed, at a line the marker didn't cover)
    m2 = re.search(r"counts:rotation.*?the registry holds (\d+)\.",
                   readme, re.DOTALL)
    assert m2, "README.md lost its <!-- counts:rotation --> marker line"
    assert int(m2.group(1)) == len(QUERIES), (
        f"README rotation section says the registry holds "
        f"{int(m2.group(1))}; len(QUERIES) is {len(QUERIES)}")


def test_coverage_waiver_node_ids_exist():
    """Every pytest node-id cited in COVERAGE.md's rows-only waiver
    table must name a real test function in the cited file (r8 verdict
    #8: the waiver table is only verifiable in one grep if its node-ids
    resolve; a renamed test must fail THIS test, not silently orphan
    the waiver)."""
    with open(os.path.join(_ROOT, "COVERAGE.md")) as fh:
        text = fh.read()
    # anchor context so bare `::test_x` continuations resolve against
    # the most recent file mention
    cited = re.findall(r"(?:(test_\w+\.py))?::(test_\w+)", text)
    assert cited, "COVERAGE.md cites no test node-ids"
    current_file, missing = None, []
    for fname, func in cited:
        if fname:
            current_file = fname
        assert current_file, "node-id cited before any file name"
        fpath = os.path.join(_ROOT, "tests", current_file)
        if not os.path.exists(fpath):
            missing.append(f"{current_file} (file missing)")
            continue
        with open(fpath) as fh:
            src = fh.read()
        if not re.search(rf"^def {re.escape(func)}\(", src, re.M):
            missing.append(f"{current_file}::{func}")
    assert not missing, (
        f"COVERAGE.md cites nonexistent test node-ids: {missing}")
