"""Unit tests for the driver-window rotation in ``__spark_entry__``.

Round 7 switched the window from "never-checked first, registration
order among verified" to ROLLING RE-VERIFICATION: with the registry
closed (all 230 names green), verified names are ordered by evidence
AGE so the driver refreshes the oldest evidence each round instead of
re-checking the same first-50 forever (r6 verdict, next-round item 2).
"""

from __future__ import annotations

import __spark_entry__ as entry_mod


def _rotate(monkeypatch, d, evidence, window=(), reverify=None):
    monkeypatch.setattr(entry_mod, "_EVIDENCE", evidence)
    monkeypatch.setattr(
        entry_mod, "_DRIVER_VERIFIED",
        frozenset(n for n, (_, g) in evidence.items() if g))
    monkeypatch.setattr(entry_mod, "_WINDOW", list(window))
    monkeypatch.setattr(entry_mod, "_REVERIFY", dict(reverify or {}))
    return list(entry_mod._rotated(d))


def test_verified_names_age_ordered(monkeypatch):
    d = {"a": 1, "b": 2, "c": 3, "d": 4}
    ev = {"a": (5, True), "b": (1, True), "c": (3, True), "d": (1, True)}
    # oldest evidence first; registration order breaks the r1 tie (b
    # registered before d)
    assert _rotate(monkeypatch, d, ev) == ["b", "d", "c", "a"]


def test_latest_failure_reenters_front(monkeypatch):
    d = {"a": 1, "b": 2, "c": 3}
    # b was green in r2 but FAILED in r5 -> latest evidence is a
    # failure -> tier 1, ahead of every verified name
    ev = {"a": (1, True), "b": (5, False), "c": (2, True)}
    assert _rotate(monkeypatch, d, ev) == ["b", "a", "c"]


def test_never_checked_precede_verified(monkeypatch):
    d = {"a": 1, "new1": 2, "b": 3, "new2": 4}
    ev = {"a": (1, True), "b": (2, True)}
    assert _rotate(monkeypatch, d, ev) == ["new1", "new2", "a", "b"]


def test_window_pins_unverified_first(monkeypatch):
    d = {"a": 1, "x": 2, "y": 3}
    ev = {"a": (1, True)}
    # explicit window order (y before x) beats registration order
    assert _rotate(monkeypatch, d, ev, window=["y", "x"]) == ["y", "x", "a"]
    # a verified window name does NOT jump the queue — pins are for new
    # builds only
    ev2 = {"a": (1, True), "y": (2, True)}
    assert _rotate(monkeypatch, d, ev2, window=["y", "x"]) == \
        ["x", "a", "y"]


def test_reverify_jumps_queue_until_reverified(monkeypatch):
    """r8: a _REVERIFY name (implementation changed in the mapped
    round) jumps ahead of every verified name — but BEHIND new builds —
    while its evidence predates the changed-in round, and SELF-EXPIRES
    back into the age-ordered tier once the driver re-records it at or
    after that round (so a forgotten entry can never hog a window slot
    next round). The r7-green/changed-in-r8 case is exactly the live
    r8 state: evidence == newest round on record must STILL jump."""
    d = {"a": 1, "chg": 2, "b": 3, "new": 4}
    # chg verified r7 (the newest evidence anywhere), changed in r8 ->
    # jumps, after the unverified window pin
    ev = {"a": (7, True), "chg": (7, True), "b": (6, True)}
    assert _rotate(monkeypatch, d, ev, window=["new"],
                   reverify={"chg": 8}) == ["new", "chg", "b", "a"]
    # driver re-verified chg at the changed-in round -> expired, pure
    # age order again (new still unverified -> tier 1)
    ev2 = {"a": (7, True), "chg": (8, True), "b": (6, True)}
    assert _rotate(monkeypatch, d, ev2, window=["new"],
                   reverify={"chg": 8}) == ["new", "b", "a", "chg"]
    # a reverify name whose latest evidence is a FAILURE needs no lane:
    # the failure fast-lane (tier 1) already outranks it
    ev3 = {"a": (7, True), "chg": (7, False), "b": (6, True)}
    out = _rotate(monkeypatch, d, ev3, window=["new"],
                  reverify={"chg": 8})
    assert out.index("chg") < out.index("b")


def test_reverify_literal_has_no_duplicate_keys():
    """A Python dict literal silently keeps the LAST duplicate key —
    exactly how three r9-changed names kept their r8 lane round from
    stale entries lower in the ``_REVERIFY`` literal and would have
    expired out of the lane unverified. Parse the source and fail on
    any name listed twice."""
    import ast
    import os

    src = open(os.path.join(
        os.path.dirname(os.path.abspath(entry_mod.__file__)),
        "__spark_entry__.py")).read()
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.AnnAssign) and \
                getattr(node.target, "id", None) == "_REVERIFY":
            keys = [k.value for k in node.value.keys
                    if isinstance(k, ast.Constant)]
            dupes = sorted({k for k in keys if keys.count(k) > 1})
            assert not dupes, (
                f"_REVERIFY lists these names more than once (the last "
                f"entry silently wins): {dupes}")
            return
    raise AssertionError("_REVERIFY literal not found in source")


def test_evidence_latest_round_wins():
    """Against the real CORRECTNESS_r*.json files: every name's
    recorded (round, green) must equal an independent re-parse that
    keeps the HIGHEST round number mentioning the name — a mechanical
    check that stays valid even after a future round records a failure
    (the failure fast-lane is exercised in the synthetic tests above,
    never asserted against live data state)."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(entry_mod.__file__))
    want: dict[str, tuple[int, bool]] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        for name, r in json.load(open(path)).items():
            if not isinstance(r, dict):
                continue
            green = bool(
                (r.get("rows_match") and r.get("schema_match")
                 and r.get("hash_match"))
                or (r.get("err") == "no_oracle"
                    and (r.get("spark_rows") or 0) > 0))
            if name not in want or rnd >= want[name][0]:
                want[name] = (rnd, green)
    ev = entry_mod._evidence()
    assert ev, "no CORRECTNESS files parsed"
    assert ev == want
    # q1_pricing_summary has evidence in r1 AND r2 -> must record >= 2
    if "q1_pricing_summary" in ev:
        assert ev["q1_pricing_summary"][0] >= 2


def test_driver_window_is_oldest_evidence():
    """Integration: queries() ordering against the LIVE evidence state.

    Front of the queue, in order: (a) unverified names (new builds),
    (b) the partially-drained ``_REVERIFY`` lane — names whose
    implementation changed in round N but whose latest driver evidence
    predates N; these legitimately jump the age queue IN LANE ORDER
    until the driver re-records them (r8 verdict: the old version of
    this test asserted pure age order over the first 50 and broke the
    moment CORRECTNESS_r08.json partially drained the lane).  Pure
    oldest-evidence-first ordering is asserted only over the remainder.
    """
    q = list(entry_mod.queries())
    ev = entry_mod._EVIDENCE
    unverified = [n for n in q if n not in entry_mod._DRIVER_VERIFIED]
    if unverified:
        # new operators registered this round occupy the front instead
        assert q[:len(unverified)] == unverified[:len(unverified)]
        return
    # Active (undrained) _REVERIFY lane members: evidence predates the
    # changed-in round.  They occupy the front, in _REVERIFY listing
    # order; drained members (driver re-verified at/after the change)
    # have self-expired back into the age-ordered tier.
    lane = [n for n in entry_mod._REVERIFY
            if n in ev
            and ev[n][0] < entry_mod._REVERIFY[n]
            and n in entry_mod._DRIVER_VERIFIED]
    assert q[:len(lane)] == lane, (
        "active _REVERIFY lane members must lead the queue in lane "
        "order")
    rest = q[len(lane):]
    window = rest[:max(0, 50 - len(lane))]
    tail = rest[max(0, 50 - len(lane)):]
    if window and tail:
        assert max(ev[n][0] for n in window) <= \
            min(ev[n][0] for n in tail), (
            "driver window is not age-ordered over non-lane names: a "
            "fresher-evidence name sorted ahead of a staler one")
