"""Deduplication suite for large-scale training-data pipelines (north-star
extension, BASELINE.json): exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design:
- exact dedup: one hash-groupBy on the content digest — the digest is
  computed in the scan projection, so the shuffle carries (digest, id) only.
- n-gram Jaccard: shingle explode -> equi-join on shingle -> per-pair common
  counts. The shingle join is the classic "inverted index" plan: no O(n^2)
  cross product; hot shingles are the skew risk (AQE skew-join splits them;
  a stop-shingle filter caps the worst case).
- MinHash+LSH: k min-hashes per doc in ONE aggregation (k min() columns over
  the exploded shingles — a single shuffle), banded into b groups of r;
  candidate pairs join on (band, band_key) buckets, then exact-Jaccard
  verification runs ONLY on candidates.
- SimHash: per-shingle 32-bit hash -> per-bit ±1 votes -> sign vector packed
  to an int. One explode + one groupBy.

All hashing is md5-derived (first 8 hex chars -> 32-bit int) so results are
engine-reproducible — the DuckDB oracle computes the identical signatures.
(xxhash64 would be ~2x faster; swap `_hash32` for F.xxhash64 when oracle
portability is not required.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..catalog import spread as _spread

# -- shared helpers ----------------------------------------------------------


def _hash32(c: Column, seed: int | None = None) -> Column:
    """Deterministic 32-bit hash reproducible in any engine with md5:
    int(md5(seed ':' value)[:8], 16)."""
    if seed is not None:
        c = F.concat(F.lit(f"{seed}:"), c)
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (JVM array ops)."""
    toks = F.split(text, " ")
    # floor of 1: a shorter-than-n text yields one (truncated) shingle;
    # floor 0 would make sequence(1,0) DESCEND ([1,0]) and break slice()
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.array_distinct(grams)


def shingle_table(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingle) exploded distinct-shingle table (docs are
    hash-spread first — the CPU-heavy explode+hash must not serialize on
    a few input file partitions)."""
    return _spread(docs, id_col).select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"))


# -- exact dedup ---------------------------------------------------------------


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Exact dedup by content digest: one row per distinct text, keeping the
    smallest id (deterministic canonical representative) + duplicate count."""
    return (docs
            .select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
            .groupBy("digest")
            .agg(F.min(id_col).alias("keep_id"),
                 F.count("*").alias("n_copies"))
            )


# -- n-gram Jaccard near-dup -----------------------------------------------------


def jaccard_pairs(docs: DataFrame, threshold: float = 0.2,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 3) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing >=1 shingle,
    filtered to >= threshold. Returns (id_a, id_b, jaccard) with id_a < id_b.

    Inverted-index join: |pairs| is bounded by shingle co-occurrence, never
    materializing the n^2 cross product."""
    sh = shingle_table(docs, id_col, text_col, n).alias("s")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                 F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a").join(sb, "id_b")
        .withColumn("jaccard", F.round(
            F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# -- MinHash + LSH ------------------------------------------------------------------


def minhash_signatures(docs: DataFrame, k: int = 16, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 3) -> DataFrame:
    """k-permutation MinHash signature per doc: min of k 32-bit hashes
    over the shingle set — ONE aggregation, columns mh0..mh{k-1}.

    Cost shape: one md5 yields FOUR hash functions (128 bits = 4 x 32-bit
    hex chunks), so k=16 needs 4 digests per shingle, materialized in a
    projection BEFORE the aggregate (aggregate expressions don't CSE — 16
    min() exprs each embedding md5 would recompute it 16x). The hashes
    stay fixed-width hex strings: lexicographic min == numeric min, and
    dropping 16 conv() string->long parses per shingle is ~25% off the
    signature stage."""
    assert k % 4 == 0, "k must be a multiple of 4 (4 hashes per digest)"
    sh = shingle_table(docs, id_col, text_col, n)
    digests = sh.select(
        F.col(id_col),
        *[F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle"))).alias(f"d{j}")
          for j in range(k // 4)])
    chunks = digests.select(
        F.col(id_col),
        *[F.substring(F.col(f"d{i // 4}"), 1 + 8 * (i % 4), 8).alias(f"h{i}")
          for i in range(k)])
    return chunks.groupBy(id_col).agg(
        *[F.min(f"h{i}").alias(f"mh{i}") for i in range(k)])


def lsh_candidate_pairs(sig: DataFrame, bands: int = 4, rows: int = 4,
                        id_col: str = "doc_id") -> DataFrame:
    """Band the signature into ``bands`` groups of ``rows``; docs sharing any
    band key are candidates. Emits distinct (id_a, id_b), id_a < id_b."""
    banded = sig.select(
        F.col(id_col),
        F.explode(F.array(*[
            F.struct(
                F.lit(bi).alias("band"),
                F.md5(F.concat_ws(",", *[F.col(f"mh{bi * rows + ri}")
                                         for ri in range(rows)])).alias("key"))
            for bi in range(bands)])).alias("bk"),
    ).select(id_col, "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_lsh_neardup(docs: DataFrame, threshold: float = 0.5,
                        k: int = 16, bands: int = 4, rows: int = 4,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 3) -> DataFrame:
    """Full near-dup pipeline: MinHash -> LSH buckets -> candidate pairs ->
    exact-Jaccard verification on candidates only. Returns
    (id_a, id_b, jaccard >= threshold)."""
    sig = minhash_signatures(docs, k, id_col, text_col, n)
    cand = lsh_candidate_pairs(sig, bands, rows, id_col)
    sh = shingle_table(docs, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    common = (cand.join(a, "id_a").join(b, ["id_b", "shingle"])
              .groupBy("id_a", "id_b").agg(F.count("*").alias("common")))
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a").join(sb, "id_b")
        .withColumn("jaccard", F.round(
            F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# -- SimHash ---------------------------------------------------------------------------


def simhash(docs: DataFrame, bits: int = 32, id_col: str = "doc_id",
            text_col: str = "text", n: int = 3) -> DataFrame:
    """Per-doc SimHash: each shingle votes ±1 on every bit of its 32-bit
    hash; the sign vector packs into one integer fingerprint. Near-dup docs
    differ in few bits (Hamming distance)."""
    sh = shingle_table(docs, id_col, text_col, n)
    h = _hash32(F.col("shingle"))
    votes = sh.groupBy(id_col).agg(*[
        F.sum(F.when((h.bitwiseAND(F.lit(1 << j))) != 0, 1).otherwise(-1))
        .alias(f"v{j}") for j in range(bits)])
    packed = None
    for j in range(bits):
        term = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        packed = term if packed is None else packed + term
    return votes.select(F.col(id_col), packed.cast("long").alias("simhash"))


def simhash_buckets(fingerprints: DataFrame, half_bits: int = 16,
                    id_col: str = "doc_id") -> DataFrame:
    """Hamming-candidate buckets: docs agreeing on either 16-bit half are
    candidates (catches all pairs with Hamming distance <= 1 per half —
    the standard multi-index trick)."""
    mask = (1 << half_bits) - 1
    return fingerprints.select(
        F.col(id_col), F.col("simhash"),
        (F.col("simhash").bitwiseAND(F.lit(mask))).alias("lo"),
        F.shiftright("simhash", half_bits).bitwiseAND(F.lit(mask)).alias("hi"))
