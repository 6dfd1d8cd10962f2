"""Snapshot-versioned table storage: commit / time travel / incremental
reads over plain parquet — the reproducibility layer a training pipeline
needs ("train on EXACTLY the corpus snapshot the last run saw", "give me
only what landed since my last consumption point").

The mini-Iceberg shape: data files are immutable (each commit writes its
own directory, nothing is ever rewritten in place), and a tiny JSON
manifest maps snapshot id -> the LIST of data directories visible in that
snapshot. Reads plan from the manifest, never from directory listing:

- append commit:    new snapshot = previous dirs + the new dir
- overwrite commit: new snapshot = just the new dir (old files REMAIN on
  disk, so every earlier snapshot still reads byte-identically)
- time travel:      read(snapshot=k) unions exactly snapshot k's dirs
- incremental:      read_incremental(since=k) unions only dirs added
  after k — the consumption pattern for downstream jobs that checkpoint
  a snapshot id instead of re-scanning the corpus

Scale: the manifest is O(commits) driver-side JSON (Iceberg holds the
same information in avro manifests); the data path is ordinary
multi-directory parquet scans, so partition pruning / predicate pushdown
work unchanged. No timestamps or randomness anywhere — snapshot ids are
a dense integer sequence and re-runs are bit-reproducible.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, types as T

_MANIFEST = "_snapshots.json"


class SnapshotStore:
    """Versioned parquet table rooted at ``path``."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    # -- manifest ------------------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.path, _MANIFEST)

    def _load(self) -> list[dict]:
        if not os.path.exists(self._manifest_path()):
            return []
        with open(self._manifest_path()) as fh:
            return json.load(fh)

    def _store(self, snapshots: list[dict]) -> None:
        # write-then-rename so a crashed commit never leaves a torn
        # manifest (readers see the old snapshot list until the rename)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(snapshots, fh, indent=1)
        os.replace(tmp, self._manifest_path())

    def snapshots(self) -> list[dict]:
        """[{id, mode, dirs}] — the full history, oldest first."""
        return self._load()

    def latest_id(self) -> int | None:
        snaps = self._load()
        return snaps[-1]["id"] if snaps else None

    # -- commits -------------------------------------------------------------

    def commit(self, df: DataFrame, mode: str = "append") -> int:
        """Write ``df`` as a new immutable data directory and register the
        next snapshot. ``mode='append'`` extends the previous snapshot's
        file set; ``'overwrite'`` starts a fresh one (earlier snapshots
        keep reading their own files)."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unknown commit mode: {mode}")
        snaps = self._load()
        sid = (snaps[-1]["id"] + 1) if snaps else 1
        data_dir = os.path.join(self.path, f"commit-{sid:06d}")
        # overwrite, not error: a crash between a past write and its
        # manifest store leaves an ORPHAN commit-<sid> dir that is
        # invisible to readers (only the manifest grants visibility) but
        # would make every retry of this sid fail forever under
        # mode('error') — clobbering the orphan is the healing action
        df.write.mode("overwrite").parquet(data_dir)
        prev = snaps[-1]["dirs"] if (snaps and mode == "append") else []
        snaps.append({"id": sid, "mode": mode,
                      "dirs": prev + [f"commit-{sid:06d}"]})
        self._store(snaps)
        return sid

    def compact(self, spark: SparkSession,
                target_files: int = 1) -> int:
        """Rewrite the LATEST snapshot's (possibly many) commit
        directories into one fresh directory and register it as a new
        overwrite snapshot — the small-files maintenance op (Iceberg's
        rewrite_data_files): a long append history degrades scan
        planning (one parquet footer per tiny commit), and compaction
        restores O(1) directories without touching history — every
        earlier snapshot still reads its own immutable files, and the
        compacted snapshot is row-identical to the one it replaces
        (asserted in tests). ``target_files`` controls the coalesce
        width of the rewrite."""
        # merge_schema: without it the rewrite takes ONE commit's footer
        # schema and silently drops columns added by later append commits
        df = self.read(spark, merge_schema=True).coalesce(target_files)
        sid = self.commit(df, mode="overwrite")
        # mark the manifest entry: a compaction snapshot contains the
        # WHOLE rewritten corpus in a fresh dir, so any incremental
        # checkpoint taken before it would re-receive everything as
        # 'new' — read_incremental refuses those reads loudly instead
        snaps = self._load()
        for s in snaps:
            if s["id"] == sid:
                s["compacted"] = True
        self._store(snaps)
        return sid

    # -- reads ---------------------------------------------------------------

    def _dirs_for(self, snapshot: int | None) -> list[str]:
        snaps = self._load()
        if not snaps:
            raise ValueError(f"snapshot store at {self.path} is empty")
        if snapshot is None:
            return snaps[-1]["dirs"]
        for s in snaps:
            if s["id"] == snapshot:
                return s["dirs"]
        raise ValueError(f"no snapshot {snapshot} in {self.path} "
                         f"(have {[s['id'] for s in snaps]})")

    def read(self, spark: SparkSession,
             snapshot: int | None = None,
             merge_schema: bool = False) -> DataFrame:
        """The table as of ``snapshot`` (default: latest).

        ``merge_schema=True`` unions the per-commit schemas (parquet
        mergeSchema): columns added by later commits come back NULL for
        earlier files — the additive schema-evolution contract (column
        DROPS still require an overwrite commit; parquet cannot subtract
        a column from old files)."""
        dirs = self._dirs_for(snapshot)
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*[os.path.join(self.path, d)
                                for d in dirs])

    def read_incremental(self, spark: SparkSession,
                         since: int) -> DataFrame:
        """Only the data ADDED after snapshot ``since`` (empty-safe: a
        fully-caught-up consumer gets an empty frame with the right
        schema). Overwrite commits count as additions — the consumer
        sees the replacement data.

        A COMPACTION after ``since`` raises: the compacted snapshot's
        fresh directory holds the entire rewritten corpus, so the dir
        diff would re-deliver every already-consumed row as 'new'
        (silent double-ingest after a routine maintenance op). The
        consumer must re-baseline — full read once, then continue
        incrementally from the compaction snapshot."""
        compactions = [s["id"] for s in self._load()
                       if s.get("compacted") and s["id"] > since]
        if compactions:
            raise ValueError(
                f"read_incremental(since={since}): compaction at "
                f"snapshot {min(compactions)} rewrote the corpus into a "
                "fresh directory — an incremental read from before it "
                "would re-deliver every row as new. Re-baseline (full "
                f"read at snapshot {min(compactions)}) and continue "
                "from there.")
        base = set(self._dirs_for(since))
        latest = self._dirs_for(None)
        new = [d for d in latest if d not in base]
        # mergeSchema on BOTH branches: incremental batches can span
        # commits with additively-evolved schemas (the compact() hazard),
        # and the empty caught-up frame must carry the same merged
        # schema a non-empty read would — not one arbitrary footer's
        if not new:
            return self.read(spark, merge_schema=True).limit(0)
        return (spark.read.option("mergeSchema", "true")
                .parquet(*[os.path.join(self.path, d) for d in new]))


def snapshot_diff(spark: SparkSession, store: "SnapshotStore",
                  key_col: str, from_snapshot: int,
                  to_snapshot: int | None = None,
                  compare_cols: list[str] | None = None) -> DataFrame:
    """Row-level diff between two snapshots of a store: one row per key
    that was ``added``, ``removed``, or ``changed`` between the two
    reads (unchanged keys are dropped). A key with several rows in one
    snapshot is treated as a MULTISET: its digest folds every row, so
    re-appended updates compare as one key and 'changed' means the
    key's row multiset changed. The audit/"what moved between
    releases" op next to time travel — feed it to CDC consumers or a
    release report.

    ``compare_cols`` limits change detection to those columns (default:
    every non-key column common to both sides, by name).

    Shape: ONE full-outer equi-join on the key, comparing md5 digests of
    the compared columns — no collect, no per-column join; digests are
    computed in each side's scan projection so the join carries
    (key, digest) only.

    COMPACTION-TRANSPARENT, unlike ``read_incremental``: both sides are
    FULL snapshot reads (never directory diffs), and ``compact()``
    registers a row-identical snapshot, so a diff spanning a
    ``compacted``-flagged snapshot reports exactly the genuine row
    changes — a compaction alone diffs EMPTY (pinned in tests). The
    re-baseline error belongs only to the dir-diff consumption path."""
    from pyspark.sql import functions as F

    old = store.read(spark, snapshot=from_snapshot, merge_schema=True)
    new = store.read(spark, snapshot=to_snapshot, merge_schema=True)
    if compare_cols is None:
        compare_cols = sorted(
            (set(old.columns) & set(new.columns)) - {key_col})

    def digested(df: DataFrame, tag: str) -> DataFrame:
        # hash each column INDIVIDUALLY, then hash the concatenation of
        # the fixed-width digests: a raw concat_ws('\x1f') digest lets a
        # value containing the separator (or a literal sentinel vs NULL)
        # alias column boundaries, reporting two different rows as equal.
        # Pieces are 32 lowercase-hex chars or the non-hex '-' NULL
        # marker, so the tokenization — hence the row encoding — is
        # unambiguous.
        # complex-typed columns (array/struct/map) hash their to_json
        # rendering, NOT cast('string'): the cast renders ["a","b"] and
        # ["a, b"] identically ('[a, b]'), so a real change inside a
        # collection would silently hash equal and vanish from the diff
        def piece(c: str):
            dt = df.schema[c].dataType
            if isinstance(dt, (T.ArrayType, T.StructType, T.MapType)):
                return F.coalesce(F.md5(F.to_json(F.col(c))), F.lit("-"))
            return F.coalesce(F.md5(F.col(c).cast("string")), F.lit("-"))

        pieces = [piece(c) for c in compare_cols]
        row_d = F.md5(F.concat(*pieces) if pieces else F.lit(""))
        # fold duplicate keys (the norm in an append store, where an
        # update is a re-append) into ONE order-free multiset digest per
        # key — otherwise the full-outer join multiplies them into
        # duplicate and contradictory change rows
        return (df.select(F.col(key_col), row_d.alias("_r"))
                .groupBy(key_col)
                .agg(F.md5(F.concat_ws(
                    "", F.sort_array(F.collect_list("_r"))))
                    .alias(f"_d_{tag}")))

    # NULL-SAFE key match: a plain equi-join never matches NULL keys, so
    # an identical NULL-key group on both sides would surface as a
    # spurious added+removed pair (and a changed one as added+removed
    # instead of 'changed')
    o = digested(old, "old").withColumnRenamed(key_col, "_k_old")
    n = digested(new, "new").withColumnRenamed(key_col, "_k_new")
    j = o.join(n, F.col("_k_old").eqNullSafe(F.col("_k_new")),
               "full_outer")
    return (j.select(
        F.coalesce("_k_old", "_k_new").alias(key_col),
        F.when(F.col("_d_old").isNull(), F.lit("added"))
         .when(F.col("_d_new").isNull(), F.lit("removed"))
         .when(F.col("_d_old") != F.col("_d_new"), F.lit("changed"))
         .otherwise(F.lit("unchanged")).alias("change"))
        .filter(F.col("change") != "unchanged"))
