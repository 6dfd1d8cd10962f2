"""End-to-end ETL pipeline tests over synthetic DynamoDB-JSON fixtures
(FIXTURES.md §A; reference semantics from models/ETL.ts + etl.ts)."""

from __future__ import annotations

import json

import pytest

from servihabitat_etl_spyke_spark.operators.etl import (
    ENTITY_ATTRS, decode_dynamodb_json, encode_dynamodb_json, keyed_upsert,
    read_jsonl, run_entity_pipeline, upsert_into_path)


def _write_jsonl(path, items):
    with open(path, "w") as f:
        for it in items:
            f.write(json.dumps(it) + "\n")


@pytest.fixture()
def promotions_file(tmp_path):
    """Duplicates, a triple-dup, overlapping products, a missing-id row."""
    items = [
        {"Item": {"id": {"S": "p1"}, "products": {"SS": ["a", "b"]},
                  "name": {"S": "first"}, "city": {"S": "madrid"}}},
        {"Item": {"products": {"SS": ["orphan"]}, "name": {"S": "no-id"},
                  "city": {"S": "x"}}},                      # dropped
        {"Item": {"id": {"S": "p2"}, "products": {"SS": ["c"]},
                  "name": {"S": "second"}, "city": {"S": "bcn"}}},
        {"Item": {"id": {"S": "p1"}, "products": {"SS": ["b", "d"]},
                  "name": {"S": "dup-ignored"}, "city": {"S": "sevilla"}}},
        {"Item": {"id": {"S": "p1"}, "products": {"SS": ["e"]},
                  "name": {"S": "tripledup"}, "city": {"S": "y"}}},
    ]
    p = tmp_path / "promotions.jsonl"
    _write_jsonl(p, items)
    return str(p)


def test_promotions_dedup_merge(spark, promotions_file):
    out = {r["id"]: r.asDict()
           for r in run_entity_pipeline(spark, "promotions", promotions_file).collect()}
    assert set(out) == {"p1", "p2"}                      # null-id dropped
    # first occurrence wins scalars
    assert out["p1"]["name"] == "first" and out["p1"]["city"] == "madrid"
    # arrays concatenated in row order, overlap NOT deduped
    assert out["p1"]["products"] == ["a", "b", "b", "d", "e"]
    assert out["p2"]["products"] == ["c"]


def test_checklists_empty_string_sanitize(spark, tmp_path):
    items = [
        {"Item": {"id": {"S": "c1"}, "status": {"L": ["s1", "s2"]},
                  "productId": {"S": "pr1"}}},
        {"Item": {"id": {"S": "c2"}, "status": {"L": ""},       # malformed
                  "productId": {"S": "pr2"}}},
        {"Item": {"id": {"S": "c3"}, "productId": {"S": "pr3"}}},  # absent
    ]
    p = tmp_path / "checklists.jsonl"
    _write_jsonl(p, items)
    out = {r["id"]: r.asDict()
           for r in run_entity_pipeline(spark, "checklists", str(p)).collect()}
    assert out["c1"]["status"] == ["s1", "s2"]
    assert out["c2"]["status"] == []
    assert out["c3"]["status"] == []


def test_managements_rename_and_enum(spark, tmp_path):
    rows = [("m1", "CL1", "PR1", "in-progress"), ("m2", "CL2", "PR2", "pending"),
            ("m3", "CL3", "PR3", "E0004"), ("m4", "CL4", "PR4", "E0001"),
            ("m5", "CL5", "PR5", "DONE")]
    items = [{"Item": {"id": {"S": i}, "clientid": {"S": c},
                       "productid": {"S": pr}, "status": {"S": s}}}
             for i, c, pr, s in rows]
    p = tmp_path / "managements.jsonl"
    _write_jsonl(p, items)
    df = run_entity_pipeline(spark, "managements", str(p))
    assert "clientId" in df.columns and "productId" in df.columns
    assert "clientid" not in df.columns
    out = {r["id"]: r["status"] for r in df.collect()}
    assert out == {"m1": "in-progress", "m2": "pending", "m3": "pending",
                   "m4": "in-progress", "m5": "in-progress"}


def test_identity_entities_and_numeric_decode(spark, tmp_path):
    items = [{"Item": {"id": {"S": "pr1"}, "name": {"S": "thing"},
                       "price": {"N": "12.50"}}}]
    p = tmp_path / "products.jsonl"
    _write_jsonl(p, items)
    out = run_entity_pipeline(spark, "products", str(p)).collect()
    assert out[0]["price"] == 12.5                        # N -> double


def test_encode_decode_roundtrip(spark):
    attrs = {"id": "S", "name": "S", "price": "N"}
    df = spark.createDataFrame(
        [("a", "x", 1.5), ("b", "y", 2.0)], ["id", "name", "price"])
    lines = encode_dynamodb_json(df, attrs)
    back = decode_dynamodb_json(lines, attrs)
    assert sorted(map(tuple, back.collect())) == [("a", "x", 1.5), ("b", "y", 2.0)]


def test_keyed_upsert_replaces_and_appends(spark):
    existing = spark.createDataFrame(
        [("1", "old1"), ("2", "old2")], ["id", "v"])
    incoming = spark.createDataFrame(
        [("2", "new2"), ("3", "new3")], ["id", "v"])
    out = {r["id"]: r["v"] for r in keyed_upsert(existing, incoming).collect()}
    assert out == {"1": "old1", "2": "new2", "3": "new3"}


def test_upsert_into_path_full_cycle(spark, tmp_path):
    path = str(tmp_path / "table")
    v1 = spark.createDataFrame([("1", "a"), ("2", "b")], ["id", "v"])
    upsert_into_path(spark, v1, path)
    v2 = spark.createDataFrame([("2", "B"), ("3", "c")], ["id", "v"])
    snap = upsert_into_path(spark, v2, path)
    out = {r["id"]: r["v"] for r in snap.collect()}
    assert out == {"1": "a", "2": "B", "3": "c"}


def test_read_jsonl_malformed_lines_survive(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    with open(p, "w") as f:
        f.write('{"Item": {"id": {"S": "ok"}, "name": {"S": "n"}}}\n')
        f.write("not json at all\n")
    df = read_jsonl(spark, str(p))
    decoded = decode_dynamodb_json(df, {"id": "S", "name": "S"})
    rows = decoded.collect()
    assert len(rows) == 2                 # malformed row -> nulls, not a crash
    assert {r["id"] for r in rows} == {"ok", None}


def test_keyed_upsert_tie_on_order_keeps_coherent_row(spark):
    """Two rows sharing key AND _ingest_order must resolve to ONE of the
    input rows — per-column max_by could interleave fields from different
    rows into a row that never existed."""
    from servihabitat_etl_spyke_spark.operators.etl import keyed_upsert
    incoming = spark.createDataFrame(
        [(1, "a1", "b1", 7), (1, "a2", "b2", 7)],
        "id long, x string, y string, _ingest_order long")
    rows = keyed_upsert(None, incoming, "id").collect()
    assert len(rows) == 1
    assert (rows[0]["x"], rows[0]["y"]) in {("a1", "b1"), ("a2", "b2")}


class _Row(dict):
    def asDict(self, recursive=False):
        return dict(self)


def test_batch_writer_chunks_in_25s_and_backs_off_exponentially():
    """The S4 transport contract (dynamo-connector.ts:145-185): 25-item
    chunks; throughput errors back off 2^attempt seconds; other errors
    retry immediately; a chunk failing all 5 attempts is skipped, not
    raised."""
    from servihabitat_etl_spyke_spark.operators.etl import make_batch_writer

    sent, sleeps, gave_up = [], [], []

    class Throughput(Exception):
        name = "ProvisionedThroughputExceededException"

    # script: first chunk fails with throughput twice then succeeds;
    # later chunks succeed immediately
    fails = {0: 2}
    attempts: dict[int, int] = {}

    def send(batch):
        key = len(sent)              # index of the chunk being flushed
        n = attempts.get(key, 0)
        attempts[key] = n + 1
        if n < fails.get(key, 0):
            raise Throughput()
        sent.append(list(batch))

    wp = make_batch_writer(send, sleep=sleeps.append,
                           on_give_up=lambda b, e: gave_up.append((b, e)))
    wp(iter([_Row(i=i) for i in range(60)]))
    assert [len(b) for b in sent] == [25, 25, 10]
    assert sleeps == [1, 2]          # 2^0, 2^1 before the two retries
    assert gave_up == []


def test_batch_writer_nonretryable_retries_without_wait_and_gives_up():
    from servihabitat_etl_spyke_spark.operators.etl import make_batch_writer

    sleeps, gave_up, attempts = [], [], {"n": 0}

    def send(batch):
        attempts["n"] += 1
        raise RuntimeError("boom")

    wp = make_batch_writer(send, sleep=sleeps.append,
                           on_give_up=lambda b, e: gave_up.append(type(e)))
    wp(iter([_Row(i=i) for i in range(3)]))   # one under-sized chunk
    assert attempts["n"] == 5                 # all 5 attempts consumed
    assert sleeps == []                       # non-retryable: no backoff
    assert gave_up == [RuntimeError]          # reported, NOT raised


def test_dynamo_batch_write_foreachpartition_end_to_end(spark, tmp_path):
    """Distributed path: every row reaches the transport exactly once in
    <=25-item chunks, with no driver-side collect (the fake client
    appends each chunk as a file from inside the executor)."""
    import glob
    import json
    import os
    import uuid

    from servihabitat_etl_spyke_spark.operators.etl import (
        dynamo_batch_write)

    out_dir = str(tmp_path / "sent")
    os.makedirs(out_dir)

    def send(batch):
        p = os.path.join(out_dir, uuid.uuid4().hex + ".json")
        with open(p, "w") as fh:
            json.dump(batch, fh)

    df = spark.range(0, 103).selectExpr("id", "concat('k', id) AS k") \
        .repartition(4)
    dynamo_batch_write(df, send)
    chunks = [json.load(open(p)) for p in glob.glob(out_dir + "/*.json")]
    assert all(len(c) <= 25 for c in chunks)
    got = sorted(r["id"] for c in chunks for r in c)
    assert got == list(range(103))


def test_keyed_upsert_last_write_wins_all_entities(spark, tmp_path):
    """Every entity (not just promotions) carries _ingest_order, so
    keyed_upsert resolves same-key collisions by LAST write (PutItem
    overwrite order = file line order) instead of an arbitrary
    dropDuplicates winner."""
    items = [
        {"Item": {"id": {"S": "p1"}, "name": {"S": "old"}, "price": {"N": "10"}}},
        {"Item": {"id": {"S": "p1"}, "name": {"S": "new"}, "price": {"N": "20"}}},
        {"Item": {"id": {"S": "p2"}, "name": {"S": "only"}, "price": {"N": "5"}}},
    ]
    p = tmp_path / "products.jsonl"
    _write_jsonl(p, items)
    df = run_entity_pipeline(spark, "products", str(p))
    assert "_ingest_order" in df.columns
    out = {r["id"]: (r["name"], r["price"])
           for r in keyed_upsert(None, df, "id").collect()}
    assert out == {"p1": ("new", 20.0), "p2": ("only", 5.0)}


def test_init_table_heals_torn_seed(spark, tmp_path):
    """A crash mid-seed leaves the directory without _SUCCESS; the next
    init_table call must REWRITE (mode 'ignore' would skip forever and
    report the torn partial table as freshly seeded)."""
    import os

    from servihabitat_etl_spyke_spark.sources.bootstrap import init_table

    path = str(tmp_path / "store")
    os.makedirs(path)                       # torn: dir exists, no marker
    with open(os.path.join(path, "junk"), "w") as fh:
        fh.write("partial")
    df, seeded = init_table(spark, path, [(1, "a"), (2, "b")],
                            "id long, v string")
    assert seeded is True
    assert sorted((r.id, r.v) for r in df.collect()) == [(1, "a"), (2, "b")]
    # second call: marker present now -> untouched no-op
    df2, seeded2 = init_table(spark, path, [(9, "z")], "id long, v string")
    assert seeded2 is False and df2.count() == 2


def test_cascade_delete_enforces_declared_option(spark):
    """J4 (r6): deleting parents removes FK-matching children; NULL-FK
    children survive (a NULL key matches nothing in an anti-join);
    literal id lists work; multi-hop composes by re-application."""
    from servihabitat_etl_spyke_spark.operators.etl import cascade_delete
    parents = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    children = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 2), (13, None), (14, 3)],
        "cid long, parent_id long")
    p2, c2 = cascade_delete(parents, children, "parent_id", [2])
    assert sorted(r.id for r in p2.collect()) == [1, 3]
    assert sorted(r.cid for r in c2.collect()) == [10, 13, 14]

    # second hop: the deleted children's ids cascade to grandchildren
    grand = spark.createDataFrame(
        [(100, 10), (101, 11), (102, 12), (103, 14)],
        "gid long, child_id long")
    deleted_children = (children.join(
        spark.createDataFrame([(2,)], "parent_id long"),
        "parent_id", "left_semi").select("cid"))
    _, g2 = cascade_delete(children, grand, "child_id", deleted_children,
                           parent_id_col="cid")
    assert sorted(r.gid for r in g2.collect()) == [100, 103]


def test_entity_pipeline_drops_itemless_lines(spark, tmp_path):
    """Round-6 review fix: a malformed / Item-less line decodes to an
    all-null row that the PIPELINE must drop for every entity (the
    reference's JSON.parse(line)?.Item falsy -> skip) — an undropped
    null-id row would accumulate one garbage copy per keyed upsert
    (NULL keys never match in the anti-join)."""
    from servihabitat_etl_spyke_spark.operators.etl import (
        keyed_upsert, run_entity_pipeline)
    p = tmp_path / "products.jsonl"
    with open(p, "w") as f:
        f.write('{"Item": {"id": {"S": "p1"}, "name": {"S": "n"}, '
                '"price": {"N": "3"}}}\n')
        f.write("not json at all\n")
        f.write('{"notItem": 1}\n')
    out = run_entity_pipeline(spark, "products", str(p))
    assert [r.id for r in out.collect()] == ["p1"]
    # two consecutive upserts stay at one row (no null-id accumulation)
    snap = keyed_upsert(None, out)
    snap = keyed_upsert(snap, run_entity_pipeline(spark, "products", str(p)))
    assert snap.count() == 1


def test_overwrite_via_tmp_rename_swap_and_recovery(spark, tmp_path):
    """r8 review: the snapshot overwrite is a single staged write plus a
    directory rename swap. The pre-r8 shape re-read the staged tmp and
    ran a SECOND full Spark write into the final path — double write
    I/O on every merge-sink micro-batch and every upsert_into_path
    call, and a crash DURING that second job deleted the last committed
    state (its docstring only covered a crash BETWEEN the writes).
    Witnessed here:

    - a merge whose plan READS the target lands the right content and
      leaks neither '._tmp' nor '._old';
    - the swap's one vulnerable window (between the two renames: path
      absent, '._old' holding the committed state) heals through
      recover_snapshot;
    - a completed swap whose '._old' cleanup died heals by dropping the
      stale '._old', keeping the NEW data;
    - a genuinely absent store reports absent (no false recovery);
    - a fresh path bootstraps through the same call (rename-into-place
      needs no pre-existing target).
    """
    import os
    import shutil

    from servihabitat_etl_spyke_spark.operators.etl import (
        overwrite_via_tmp, recover_snapshot)

    path = str(tmp_path / "snap")
    spark.createDataFrame([("1", "a")], ["id", "v"]).write.parquet(path)
    merged = spark.read.parquet(path).unionByName(
        spark.createDataFrame([("2", "b")], ["id", "v"]))
    overwrite_via_tmp(merged, path)
    want = [("1", "a"), ("2", "b")]
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == want
    assert not os.path.exists(path + "._tmp")
    assert not os.path.exists(path + "._old")

    # interrupted swap: path -> ._old happened, tmp -> path did not
    os.rename(path, path + "._old")
    assert recover_snapshot(path)
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == want
    assert not os.path.exists(path + "._old")

    # completed swap, stale ._old left behind: the NEW data must win
    shutil.copytree(path, path + "._old")
    overwrite_via_tmp(
        spark.read.parquet(path).filter("id = '2'"), path)
    assert sorted(map(tuple,
                      spark.read.parquet(path).collect())) == [("2", "b")]
    assert not os.path.exists(path + "._old")

    # genuinely absent store: no false recovery
    assert not recover_snapshot(str(tmp_path / "nope"))

    # fresh-path bootstrap through the same call
    fresh = str(tmp_path / "fresh")
    overwrite_via_tmp(
        spark.createDataFrame([("9", "z")], ["id", "v"]), fresh)
    assert sorted(map(tuple,
                      spark.read.parquet(fresh).collect())) == [("9", "z")]
    assert not os.path.exists(fresh + "._tmp")


def test_recover_snapshot_does_not_resurrect_stale_old(spark, tmp_path):
    """r8 review double-fault: a swap whose '._old' cleanup crashed
    leaves a STALE previous snapshot next to the committed one; if the
    committed path is then lost externally, recover must NOT revive the
    stale '._old' as if it were committed state (an N-1 snapshot revived
    that way silently diverges — the batch marker says N applied). A
    completed swap stamps '._old' stale before deleting it, so recover
    distinguishes mid-swap (restore) from post-swap garbage (drop,
    report absent)."""
    import os

    from servihabitat_etl_spyke_spark.operators.etl import (
        _STALE_MARK, overwrite_via_tmp, recover_snapshot)

    path = str(tmp_path / "snap")
    spark.createDataFrame([("1", "a")], ["id", "v"]).write.parquet(path)
    overwrite_via_tmp(
        spark.createDataFrame([("2", "b")], ["id", "v"]), path)

    # post-swap stale ._old (cleanup crashed after the stamp), then the
    # committed path is lost externally
    os.makedirs(path + "._old")
    open(os.path.join(path + "._old", _STALE_MARK), "w").close()
    os.rename(path, str(tmp_path / "gone"))
    assert not recover_snapshot(path)       # absent, NOT resurrected
    assert not os.path.exists(path + "._old")

    # contrast: an UNstamped ._old with path absent is the mid-swap
    # window and must restore
    os.rename(str(tmp_path / "gone"), path + "._old")
    assert recover_snapshot(path)
    assert sorted(map(tuple,
                      spark.read.parquet(path).collect())) == [("2", "b")]


def test_overwrite_via_tmp_stamps_before_swap_and_rolls_forward(
        spark, tmp_path, monkeypatch):
    """r9 ADVICE (etl.py #2): the gen-1 protocol stamped '._old' only
    AFTER the second rename — a crash between os.rename(tmp, path) and
    the stamp left an UNstamped '._old', and an external loss of path
    then resurrected N-1 as committed (the exact double-fault the stamp
    claims to prevent). Gen-2 stamps the outgoing snapshot BEFORE the
    first rename, so '._old' is born stale-marked in every window.
    Witnessed by crashing the swap between the two renames (the
    narrowest window): '._old' must already carry the stamp, and
    recover must roll the swap FORWARD to the complete staged successor
    — never revive the stamped N-1."""
    import os

    from servihabitat_etl_spyke_spark.operators import etl as etl_mod
    from servihabitat_etl_spyke_spark.operators.etl import (
        _STALE_MARK, overwrite_via_tmp, recover_snapshot)

    path = str(tmp_path / "snap")
    spark.createDataFrame([("1", "a")], ["id", "v"]).write.parquet(path)

    real_rename = os.rename

    def crash_on_second_rename(src, dst):
        if src.endswith("._tmp"):
            raise OSError("simulated crash between the two renames")
        return real_rename(src, dst)

    monkeypatch.setattr(etl_mod.os, "rename", crash_on_second_rename)
    with pytest.raises(OSError, match="simulated crash"):
        overwrite_via_tmp(
            spark.createDataFrame([("2", "b")], ["id", "v"]), path)
    monkeypatch.setattr(etl_mod.os, "rename", real_rename)

    # the crash state: path absent, ._old STAMPED (stamp rode the first
    # rename), ._tmp complete
    assert not os.path.exists(path)
    assert os.path.exists(os.path.join(path + "._old", _STALE_MARK))
    assert os.path.exists(path + "._tmp")

    # recover rolls FORWARD: the staged successor commits, the stamped
    # N-1 is dropped, nothing resurrects
    assert recover_snapshot(path)
    assert sorted(map(tuple,
                      spark.read.parquet(path).collect())) == [("2", "b")]
    assert not os.path.exists(path + "._old")
    assert not os.path.exists(path + "._tmp")


def test_gc_tree_crash_mid_delete_cannot_strip_the_stamp(tmp_path,
                                                         monkeypatch):
    """r10 ADVICE: a bare rmtree of a stamped '._old' is not atomic — a
    crash mid-delete can remove the _stale_snapshot mark before the
    data files, and the next recover would take the legacy gen-1
    branch and rename the partial, stamp-stripped N-1 over an absent
    path, resurrecting partial stale data as committed. Deletions now
    rename to '._old._gc' FIRST (atomic), so a crashed delete leaves
    only trash no heal path ever re-enters; the litter is swept by the
    next recover."""
    import os
    import shutil

    from servihabitat_etl_spyke_spark.operators.etl import (
        _STALE_MARK, recover_snapshot)

    path = str(tmp_path / "snap")
    # the double-fault state: path absent, stamped '._old' present
    os.makedirs(path + "._old")
    open(os.path.join(path + "._old", _STALE_MARK), "w").close()
    with open(os.path.join(path + "._old", "part-0.parquet"), "w") as fh:
        fh.write("stale N-1 data")

    real_rmtree = shutil.rmtree

    def crash_mid_delete(d, ignore_errors=False, **kw):
        if str(d).endswith("._gc"):
            # simulate the worst-ordered partial delete: the stamp
            # file dies, the data files survive
            mark = os.path.join(str(d), _STALE_MARK)
            if os.path.exists(mark):
                os.remove(mark)
            return None
        return real_rmtree(d, ignore_errors=ignore_errors, **kw)

    monkeypatch.setattr(shutil, "rmtree", crash_mid_delete)
    assert not recover_snapshot(path)      # absent, not resurrected
    monkeypatch.setattr(shutil, "rmtree", real_rmtree)

    # the crashed delete left TRASH, never a stamp-stripped '._old'
    # that the legacy gen-1 branch would restore as committed
    assert not os.path.exists(path + "._old")
    assert os.path.exists(
        os.path.join(path + "._old._gc", "part-0.parquet"))

    # the next recover sweeps the litter and still reports absent
    assert not recover_snapshot(path)
    assert not os.path.exists(path + "._old._gc")
    assert not os.path.exists(path)


def test_gc_tree_rename_refused_deletes_stamp_last(tmp_path, monkeypatch):
    """r10 review follow-up: when the trash rename itself is REFUSED
    (undeletable '._gc' litter, open handle) the fallback must not be
    a bare rmtree of the stamped dir — that reopens the exact
    stamp-stripping window _gc_tree closes. The in-place fallback
    deletes data files FIRST and the stamp last, so a crash mid-delete
    leaves the partial still marked stale and no heal path restores
    it."""
    import os
    import shutil

    from servihabitat_etl_spyke_spark.operators import etl as etl_mod
    from servihabitat_etl_spyke_spark.operators.etl import (
        _STALE_MARK, _gc_tree)

    d = str(tmp_path / "snap._old")
    os.makedirs(d)
    open(os.path.join(d, _STALE_MARK), "w").close()
    with open(os.path.join(d, "part-0.parquet"), "w") as fh:
        fh.write("stale data")

    real_rename = os.rename

    def refuse(src, dst):
        raise OSError("simulated ENOTEMPTY on the trash name")

    # crash the FINAL dir delete so the mid-fallback state is visible
    real_rmtree = shutil.rmtree
    calls = []

    def crash_final(p, ignore_errors=False, **kw):
        if str(p) == d:
            calls.append(p)
            return None                      # simulated crash
        return real_rmtree(p, ignore_errors=ignore_errors, **kw)

    monkeypatch.setattr(etl_mod.os, "rename", refuse)
    monkeypatch.setattr(shutil, "rmtree", crash_final)
    _gc_tree(d)
    monkeypatch.setattr(etl_mod.os, "rename", real_rename)
    monkeypatch.setattr(shutil, "rmtree", real_rmtree)

    # the data file died first; the stamp SURVIVED the simulated crash
    # — the partial is still marked stale, so recover_snapshot will
    # drop it, never restore it
    assert calls, "fallback never reached the final delete"
    assert not os.path.exists(os.path.join(d, "part-0.parquet"))
    assert os.path.exists(os.path.join(d, _STALE_MARK))


def test_gc_tree_survivor_entry_keeps_the_stamp(tmp_path, monkeypatch):
    """r11 (r10 ADVICE): in the rename-refused fallback, the final
    stamp+dir sweep may only run once the stamp is PROVABLY the last
    entry left. With any data entry surviving its own deletion (EBUSY,
    open handle), rmtree — which deletes children in arbitrary order —
    could strip the stamp while the undeletable entry lives on,
    leaving an UNstamped partial for recover_snapshot's legacy gen-1
    branch to resurrect. The stamp must stay standing instead."""
    import os
    import shutil

    from servihabitat_etl_spyke_spark.operators import etl as etl_mod
    from servihabitat_etl_spyke_spark.operators.etl import (
        _STALE_MARK, _gc_tree)

    d = str(tmp_path / "snap._old")
    os.makedirs(d)
    open(os.path.join(d, _STALE_MARK), "w").close()
    with open(os.path.join(d, "part-0.parquet"), "w") as fh:
        fh.write("stale data")
    with open(os.path.join(d, "part-1.parquet"), "w") as fh:
        fh.write("stale data too")

    def refuse_rename(src, dst):
        raise OSError("simulated ENOTEMPTY on the trash name")

    real_unlink = os.unlink

    def refuse_one(p, *a, **kw):
        if str(p).endswith("part-1.parquet"):
            raise OSError("simulated EBUSY")
        return real_unlink(p, *a, **kw)

    # any rmtree of the stamped dir itself would be the regression
    real_rmtree = shutil.rmtree
    swept = []

    def watch_sweep(p, ignore_errors=False, **kw):
        if str(p) == d:
            swept.append(p)
            return None
        return real_rmtree(p, ignore_errors=ignore_errors, **kw)

    monkeypatch.setattr(etl_mod.os, "rename", refuse_rename)
    monkeypatch.setattr(etl_mod.os, "unlink", refuse_one)
    monkeypatch.setattr(shutil, "rmtree", watch_sweep)
    _gc_tree(d)
    monkeypatch.setattr(etl_mod.os, "unlink", real_unlink)
    monkeypatch.setattr(shutil, "rmtree", real_rmtree)

    # the deletable entry died, the survivor lives — and the STAMP
    # stayed with it: the partial is still marked stale, and the final
    # sweep never ran against the stamped dir
    assert not swept, "final sweep ran despite a surviving data entry"
    assert not os.path.exists(os.path.join(d, "part-0.parquet"))
    assert os.path.exists(os.path.join(d, "part-1.parquet"))
    assert os.path.exists(os.path.join(d, _STALE_MARK))

    # once the entry becomes deletable, the next call finishes the job
    _gc_tree(d)
    assert not os.path.exists(d)


def test_recover_snapshot_drops_orphaned_tmp(spark, tmp_path):
    """r9 ADVICE (etl.py #4): a crash DURING the staging write leaves a
    '._tmp' holding a full snapshot's worth of uncommitted data; the
    old recover never touched it, so an abandoned store leaked it
    forever. recover now drops the orphan (committed state untouched),
    and a stale in-place stamp from the stamp-to-first-rename window is
    invisible to readers (underscore convention)."""
    import os

    from servihabitat_etl_spyke_spark.operators.etl import (
        _STALE_MARK, recover_snapshot)

    path = str(tmp_path / "snap")
    spark.createDataFrame([("1", "a")], ["id", "v"]).write.parquet(path)
    spark.createDataFrame([("9", "x")], ["id", "v"]).write.parquet(
        path + "._tmp")
    # crash between the stamp and the first rename also leaves the
    # live path stamped — vacuous, and readers must skip it
    open(os.path.join(path, _STALE_MARK), "w").close()

    assert recover_snapshot(path)
    assert not os.path.exists(path + "._tmp")     # orphan dropped
    assert sorted(map(tuple,
                      spark.read.parquet(path).collect())) == [("1", "a")]

    # an abandoned store (no committed path at all) also sheds its
    # orphan staging dir instead of holding it until a write that
    # never comes
    ghost = str(tmp_path / "ghost")
    spark.createDataFrame([("9", "x")], ["id", "v"]).write.parquet(
        ghost + "._tmp")
    assert not recover_snapshot(ghost)
    assert not os.path.exists(ghost + "._tmp")
