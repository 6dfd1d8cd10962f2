"""Corpus-curation operators for training-data pipelines (north-star
extension, BASELINE.json): PII redaction, eval-set decontamination,
deterministic stratified sampling, token-window chunking, and sequence
packing.

These extend the reference's document surface (its ETL layer stops at
row-shaped transforms — `packages/app/bundles/custom/aws/s3/s3-connector.ts`
processes 25-line batches with per-row JS callbacks); a 100 TB pretraining
corpus additionally needs corpus-level hygiene ops, so they are first-class
here.

Scale design:
- pii_redact: a chain of regexp_replace/regexp_count expressions — pure
  projection, whole-stage codegen, zero shuffles. Patterns are RE2-safe
  (no lookaround) so the DuckDB oracle runs them verbatim.
- decontaminate: the eval set is tiny relative to the corpus BY DEFINITION,
  so its distinct n-grams broadcast; the training corpus is scanned once and
  never shuffled except the final per-doc count. Never an n^2 compare.
- stratified_sample: md5-derived per-row uniform in [0,1) compared against a
  per-stratum rate — projection + filter, no shuffle, reproducible across
  engines and runs (no rand()).
- chunk_tokens: per-row higher-order array ops (sequence/slice) + posexplode;
  output row count scales with corpus size but each input row expands
  locally — no shuffle.
- pack_greedy: contiguous cumulative-sum packing via a window per group —
  ONE shuffle on the group key. Sequential within a group, parallel across
  groups (sources/shards), which is how packing parallelizes at 100 TB:
  shard first, pack within shards.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window as W

from ..catalog import spread as _spread

# -- PII redaction -----------------------------------------------------------

# RE2-compatible (works in both Java regex and DuckDB/RE2): no lookaround.
# Order matters — specific before generic: SSNs and IPv4s both match the
# separator-tolerant phone pattern, so they must be masked first. The phone
# pattern requires 9-15 digits with at most two separator chars between
# consecutive digits, so 8-digit ISO dates ("2020-01-01") and spaced numeric
# ranges ("2010 - 2020") do NOT match; datetime strings with 9+ digits can
# still false-positive (inherent to regex phone detection).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d([ ().-]{0,2}\d){8,14}", "<PHONE>"),
]


def pii_redact(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Mask emails / SSNs / phone numbers / IPv4s in ``text_col``.

    Returns (id, redacted, n_pii) where n_pii counts all matches found.
    Pure projection (regexp_count + chained regexp_replace): zero shuffles,
    stays inside whole-stage codegen."""
    red = F.col(text_col)
    n = F.lit(0)
    for _, pat, token in PII_PATTERNS:
        n = n + F.regexp_count(red, F.lit(pat))
        red = F.regexp_replace(red, pat, token)
    return docs.select(F.col(id_col), red.alias("redacted"),
                       n.cast("long").alias("n_pii"))


# -- eval-set decontamination -------------------------------------------------


def decontaminate(train: DataFrame, evalset: DataFrame, n: int = 8,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Flag training docs sharing any word n-gram with the eval set:
    (train id, n_shared) for every contaminated doc — the standard
    test-set-decontamination pass before pretraining.

    The eval side reduces to its DISTINCT n-gram set and broadcasts (eval
    benchmarks are tiny vs. a 100 TB corpus — if this ever doesn't fit,
    the fallback is the same plan minus the broadcast hint). The train
    corpus explodes its shingles once and aggregates per doc id — shuffle
    is proportional to matched grams only, because the broadcast join
    filters before the groupBy."""
    # tokens bound in their own projection first: a split() captured in
    # the shingle lambda would re-tokenize per n-gram position (see
    # dedup.shingles_from_tokens)
    from .dedup import shingles_from_tokens, tokenized
    grams = shingles_from_tokens(F.col("_toks"), n)
    ev = (evalset.select(F.split(F.col(text_col), " ").alias("_toks"))
          .select(F.explode(grams).alias("gram"))
          .distinct())
    tr = (tokenized(train, id_col, text_col)
          .select(F.col(id_col), F.explode(grams).alias("gram")))
    return (tr.join(F.broadcast(ev), "gram")
            .groupBy(id_col)
            .agg(F.countDistinct("gram").alias("n_shared")))


# -- deterministic stratified sampling ---------------------------------------


def _unit_uniform(key: Column) -> Column:
    """Deterministic pseudo-uniform in [0, 10000) from a key column —
    dedup's engine-portable md5 hash mod 10000 (DuckDB:
    ('0x' || substr(md5(k), 1, 8))::UBIGINT % 10000). Stable across
    runs — no rand(), so a re-run samples the SAME rows."""
    from .dedup import _hash32
    return _hash32(key.cast("string")) % 10000


def _unit_uniform_nano(key: Column) -> Column:
    """Deterministic pseudo-uniform in [0, 1e9): 52 md5 bits (13 hex
    digits — exact in a long, modulo bias ~1e-7) for operators whose
    keep rates are COMPUTED rather than caller-supplied and can be far
    below one basis point (DuckDB:
    ('0x' || substr(md5(k), 1, 13))::UBIGINT % 1000000000)."""
    return (F.conv(F.substring(F.md5(key.cast("string")), 1, 13), 16, 10)
            .cast("long") % 1000000000)


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      strata_col: str, key_col: str,
                      default_rate: float = 0.0) -> DataFrame:
    """Keep each row with probability ``rates[stratum]`` (else
    ``default_rate``), decided by a deterministic hash of ``key_col`` —
    the dataset-mixing primitive (per-source / per-language rates).

    Projection + filter: no shuffle, no driver round-trip, reproducible.
    Rates are basis-point granular — round(), not int(): truncation would
    turn 0.57 * 10000 == 5699.999... into 5699 and disagree with any other
    engine computing the threshold as 5700."""
    u = _unit_uniform(F.col(key_col))
    # per-stratum threshold as a when-chain ending in the default
    expr = F.lit(round(default_rate * 10000))
    for stratum, rate in sorted(rates.items(), reverse=True):
        expr = F.when(F.col(strata_col) == stratum,
                      F.lit(round(rate * 10000))).otherwise(expr)
    return df.filter(u < expr)


# -- token-window chunking ----------------------------------------------------


def chunk_tokens(docs: DataFrame, max_tokens: int = 64, overlap: int = 0,
                 id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Split each doc into token windows of ``max_tokens`` with ``overlap``
    tokens shared between consecutive windows — the standard
    context-window shaping pass. Returns (id, chunk_idx, chunk, n_tokens).

    Row-local: window starts come from sequence(), windows from slice() —
    the expansion happens inside the task that read the row, so the op
    scales with input partitions and never shuffles.

    NULL-text docs are dropped (the dedup-module discipline): greatest(
    NULL, 1) = 1 defeats NULL propagation here, so an unfiltered NULL
    doc would emit a phantom (id, 0, NULL, NULL) chunk — and
    passage_dedup's md5(NULL) digests would then group every NULL-text
    doc together and DELETE all but the lowest id as 'duplicates' of
    unrelated rows."""
    assert 0 <= overlap < max_tokens
    docs = docs.filter(F.col(text_col).isNotNull())
    step = max_tokens - overlap
    toks = F.col("_toks")
    # starts: 0, step, 2*step, ... while start < len - overlap (and always
    # at least one window)
    n_starts = F.greatest(
        F.ceil((F.size(toks) - F.lit(overlap)) / F.lit(step)), F.lit(1))
    chunks = F.transform(
        F.sequence(F.lit(0), n_starts - 1),
        lambda i: F.slice(toks, i * step + 1, max_tokens))
    # tokens bound as an attribute first — an inline split captured in the
    # slice lambda would re-tokenize once per window (see
    # dedup.shingles_from_tokens)
    return (_spread(docs, id_col)
            .select(F.col(id_col), F.split(F.col(text_col), " ").alias("_toks"))
            .select(F.col(id_col),
                    F.posexplode(chunks).alias("chunk_idx", "_c"))
            .select(F.col(id_col), "chunk_idx",
                    F.array_join("_c", " ").alias("chunk"),
                    F.size("_c").alias("n_tokens")))


# -- sequence packing ---------------------------------------------------------


def pack_greedy(docs: DataFrame, max_tokens: int = 512,
                group_col: str = "source", id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Assign each doc to a training-sequence bin by CUMULATIVE-SPAN
    packing: docs are taken in id order within each group and doc d goes
    to bin floor(prefix_tokens(d) / max_tokens) — each bin covers one
    fixed ``max_tokens`` span of the group's token prefix line. Bins
    average ``max_tokens``; a doc that straddles a span boundary stays in
    the earlier bin, so the NEXT bin can close under capacity by up to
    one doc's tokens (the bounded under-fill this distributed,
    windows-only form trades against true first-fit, which is a
    sequential fold per group).

    Returns (id, group, n_tokens, bin). One shuffle (window partitioned by
    group, ordered by id); packing is sequential per group but parallel
    across groups, which is the scalable shape — shard first, pack within
    shards."""
    ntok = F.size(F.split(F.col(text_col), " "))
    w = (W.partitionBy(group_col).orderBy(id_col)
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return (docs
            .select(F.col(id_col), F.col(group_col),
                    ntok.alias("n_tokens"))
            .withColumn("bin", F.floor(before / max_tokens)))


# -- passage-level exact dedup ------------------------------------------------


def passage_dedup(docs: DataFrame, max_tokens: int = 64,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """C4-style passage-grain exact dedup, corpus-wide: split every doc
    into non-overlapping ``max_tokens`` windows (:func:`chunk_tokens`) and
    keep only the FIRST occurrence of each distinct window text — first =
    lowest (doc id, chunk index), the deterministic canonical copy. C4
    dedups at three-sentence spans; token windows are the same idea for
    unpunctuated corpora.

    Returns surviving (id, chunk_idx, n_tokens, chunk_digest) rows.

    Scale: the chunk text is digested and DROPPED before the exchange, so
    the one unavoidable shuffle (partition by digest to see all copies of
    a passage together) carries 16-byte digests + ints, never document
    bytes. At 100 TB the reassembly join (digest survivors back to chunk
    text) stays co-partitioned on the digest it just shuffled on."""
    chunks = chunk_tokens(docs, max_tokens=max_tokens, overlap=0,
                          id_col=id_col, text_col=text_col)
    slim = chunks.select(
        F.col(id_col), "chunk_idx", "n_tokens",
        F.md5("chunk").alias("chunk_digest"))
    w = W.partitionBy("chunk_digest").orderBy(id_col, "chunk_idx")
    return (slim
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn"))


# -- corpus boilerplate mining ------------------------------------------------


def boilerplate_ngrams(docs: DataFrame, n: int = 3,
                       min_doc_frac: float = 0.02, limit: int = 100,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Mine corpus-wide boilerplate: word n-grams appearing in at least
    ``min_doc_frac`` of all documents (headers, footers, licence blurbs,
    nav text). The output list feeds a removal/penalty pass; the same
    sweep doubles as a contamination detector against known eval strings.

    Returns the top ``limit`` (shingle, doc_freq, doc_frac) by document
    frequency (ties broken on the shingle for determinism).

    Scale: per-doc DISTINCT shingles (dedup's zero-shuffle signature
    machinery) -> explode -> one partial-aggregated count shuffle on the
    shingle -> top-k via orderBy+limit (TakeOrdered on partial top-ks,
    no global sort). The corpus-count side is a 1-row broadcast."""
    from .dedup import shingle_table
    sh = shingle_table(docs, id_col=id_col, text_col=text_col, n=n)
    total = docs.select(F.count(F.lit(1)).alias("_total"))
    return (sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("doc_freq"))
            .crossJoin(F.broadcast(total))
            .filter(F.col("doc_freq")
                    >= F.ceil(F.col("_total") * F.lit(min_doc_frac)))
            .select("shingle", "doc_freq",
                    (F.col("doc_freq") / F.col("_total")).alias("doc_frac"))
            .orderBy(F.desc("doc_freq"), "shingle")
            .limit(limit))


# -- URL / domain hygiene ------------------------------------------------------

#: tracking query params stripped by normalize_urls (RE2-safe alternation).
#: Anchored at a param BOUNDARY (start-of-query or '&') so a param merely
#: ending in a tracking name — 'href=...' contains 'ref=' — is untouched;
#: the separator repair downstream absorbs the consumed '&'.
TRACKING_PARAMS_RE = r"(^|&)(utm_[a-z]+|gclid|fbclid|ref)=[^&#]*"


def synth_url(id_col: Column, source_col: Column, lang_col: Column) -> Column:
    """Deterministic URL per document (the fixture has no url column; real
    crawls carry one). Variety is arithmetic so oracles replicate it:
    scheme/WWW/casing/tracking-params all vary by doc_id residues."""
    host = F.when(id_col % 3 == 0, F.upper(source_col)).otherwise(source_col)
    return F.concat(
        F.when(id_col % 2 == 0, F.lit("https://")).otherwise(F.lit("http://")),
        F.when(id_col % 5 == 0, F.lit("www.")).otherwise(F.lit("")),
        host, F.lit(".example.com/docs/"), (id_col % 50).cast("string"),
        F.lit("/page-"), id_col.cast("string"),
        F.when(id_col % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?id="), id_col.cast("string"),
        F.lit("&utm_source=feed"),
        F.when(id_col % 7 == 0, F.lit("&gclid=xyz")).otherwise(F.lit("")),
        F.lit("&ref="), lang_col, F.lit("#frag"))


def normalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Crawl-style URL canonicalization, pure regexp built-ins (projection
    only — zero shuffles, whole-stage codegen; the patterns avoid
    lookaround so an RE2 engine runs them verbatim):

    - fragment dropped;
    - tracking params (``utm_*``/``gclid``/``fbclid``/``ref``) stripped,
      separators repaired, param order otherwise preserved;
    - scheme + host lowercased, leading ``www.`` dropped (path case kept);
    - trailing path slash trimmed.

    Adds ``url_norm`` and ``domain``; dedup/caps/blocklists key on them.
    """
    u = F.col(url_col)
    no_frag = F.regexp_replace(u, r"#.*$", "")
    base = F.regexp_extract(no_frag, r"^[^?]*", 0)
    query = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    q = F.regexp_replace(query, TRACKING_PARAMS_RE, "")
    q = F.regexp_replace(q, r"&&+", "&")
    q = F.regexp_replace(q, r"^&+", "")
    q = F.regexp_replace(q, r"&+$", "")
    scheme = F.lower(F.regexp_extract(base, r"^([A-Za-z]+)://", 1))
    host = F.lower(F.regexp_extract(base, r"^[A-Za-z]+://([^/]+)", 1))
    domain = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_replace(
        F.regexp_extract(base, r"^[A-Za-z]+://[^/]+(/.*)?$", 1), r"/$", "")
    url_norm = F.concat(
        scheme, F.lit("://"), domain, path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")))
    return df.withColumn("url_norm", url_norm).withColumn("domain", domain)


def domain_filter(df: DataFrame, blocked: list[str] | DataFrame,
                  domain_col: str = "domain") -> DataFrame:
    """Drop rows whose domain is blocklisted. A literal list compiles to a
    row-local NOT IN (zero shuffle); a DataFrame blocklist (the production
    shape — blocklists are small) broadcasts into a left-anti hash join."""
    if isinstance(blocked, DataFrame):
        return df.join(F.broadcast(blocked.select(
            F.col(blocked.columns[0]).alias(domain_col))),
            on=domain_col, how="left_anti")
    # NULL domains are NOT blocked — the anti-join path keeps them (a
    # null key matches nothing), and ~isin alone would be NULL (dropped)
    return df.filter(F.col(domain_col).isNull()
                     | ~F.col(domain_col).isin(blocked))


def domain_suffix_blocklist(df: DataFrame, blocklist: DataFrame,
                            domain_col: str = "domain",
                            id_col: str = "doc_id") -> DataFrame:
    """SUFFIX-semantics domain blocklist: an entry ``spam.com`` blocks
    ``spam.com`` AND every subdomain (``cdn.spam.com``, ``a.b.spam.com``)
    — the real contract of crawl blocklists (UT1, adblock domain lists),
    which :func:`domain_filter`'s exact match cannot express.

    Shape: each domain expands ROW-LOCALLY into its <= ~6 label
    suffixes, one left-semi equi-join finds blocked ids, one left-anti
    join removes them — both plain hash joins, so a MILLION-entry
    blocklist works where a broadcast literal IN-list can't go (Spark
    broadcasts the blocklist side automatically while it stays small).
    NULL domains are kept, matching domain_filter's convention."""
    bl = blocklist.select(F.col(blocklist.columns[0]).alias("_sfx"))
    parts = F.split(F.col(domain_col), r"\.")
    suffixes = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(F.slice(parts, i, F.size(parts)), "."))
    blocked = (df.select(F.col(id_col),
                         F.explode(suffixes).alias("_sfx"))
               .join(bl, "_sfx", "left_semi")
               .select(id_col).distinct())
    return df.join(blocked, id_col, "left_anti")


def per_domain_cap(df: DataFrame, cap: int, domain_col: str = "domain",
                   order_col: str = "doc_id") -> DataFrame:
    """Keep at most ``cap`` documents per domain (deterministic: lowest
    ``order_col`` wins) — the standard anti-over-representation step in
    crawl curation. One shuffle on the domain key; rank + filter prunes
    before anything downstream, and AQE splits skewed domains."""
    w = W.partitionBy(domain_col).orderBy(order_col)
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap)
            .drop("_rn"))


def domain_stats(df: DataFrame, domain_col: str = "domain",
                 chars_col: str = "n_chars") -> DataFrame:
    """Per-domain corpus profile: doc count, total/mean chars (mean as one
    exact-int division). Single aggregation shuffle, domain-width output."""
    return (df.groupBy(domain_col)
            .agg(F.count("*").alias("n_docs"),
                 F.sum(chars_col).alias("total_chars"),
                 (F.sum(chars_col) / F.count("*")).alias("mean_chars")))


# -- group-aware dataset splitting --------------------------------------------


def grouped_split(df: DataFrame, group_col: str,
                  val_bp: int = 500, test_bp: int = 500) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split is decided by a
    deterministic hash of the GROUP (domain, source site, author…), so
    every document of a group lands in the same split — near-duplicate
    pages from one site can never straddle train and eval, which is the
    leakage a doc-level random split silently creates. Basis-point sizes
    (default 500/500 = 5%/5%/90%).

    Pure projection (hash + two comparisons), no shuffle, reproducible;
    the same group maps to the same split in every run and engine."""
    from .dedup import _hash32
    u = _hash32(F.col(group_col).cast("string")) % 10000
    return df.withColumn(
        "split",
        F.when(u < val_bp, F.lit("val"))
         .when(u < val_bp + test_bp, F.lit("test"))
         .otherwise(F.lit("train")))


# -- training-shard assignment ------------------------------------------------


def shard_assignment(df: DataFrame, n_shards: int, key_col: str,
                     token_col: str) -> DataFrame:
    """Deterministic global shuffle + shard layout — the last step before
    writing training shards: shard_id = md5-hash(key) % n_shards (uniform
    spread regardless of key clustering), within-shard order =
    (hash, key) so document order is decorrelated from crawl/ingest order
    (the "shuffle the corpus" requirement), and a re-run lays out
    byte-identical shards (no rand()).

    Adds shard_id, shard_pos (1-based within shard) and cum_tokens (the
    within-shard token prefix sum — what a pack-boundary planner reads).
    ONE shuffle: the window on shard_id; at 100 TB this is
    ``repartition(n_shards, shard_id) + sortWithinPartitions`` feeding the
    writer directly."""
    from .dedup import _hash32
    h = _hash32(F.col(key_col).cast("string"))
    w = (W.partitionBy("shard_id").orderBy("_h", key_col))
    return (df.withColumn("_h", h)
            .withColumn("shard_id", (F.col("_h") % n_shards).cast("int"))
            .withColumn("shard_pos", F.row_number().over(w))
            .withColumn("cum_tokens",
                        F.sum(token_col).over(w).cast("long"))
            .drop("_h"))


# -- temperature-weighted mixture sampling ------------------------------------


def temperature_mix(df: DataFrame, target_rows: int, strata_col: str,
                    key_col: str, alpha: float = 0.5) -> DataFrame:
    """Temperature-scaled mixture sampling — the multilingual/data-mix
    recipe: stratum d receives sampling mass proportional to n_d^alpha
    (alpha < 1 upweights small strata; alpha = 1 is natural proportions),
    scaled so the EXPECTED total kept is ~= ``target_rows``. Per-stratum
    keep rate::

        rate_d = min(1, target_rows * n_d^alpha / (sum_e n_e^alpha) / n_d)

    Shape: one tiny aggregation (|strata| rows) -> weight table broadcast
    back onto the corpus -> the same deterministic md5-hash keep decision
    as :func:`stratified_sample`. The corpus itself is scanned once and
    never shuffled; re-runs keep the SAME rows.

    Engine-portable determinism: weights are quantized to integers
    (floor(n^alpha * 1e6)) BEFORE the cross-stratum sum, so the total is
    an exact integer — float sums over strata would be addition-order
    dependent and could disagree across engines by an ulp right at a
    threshold boundary. alpha = 0.5 uses sqrt (IEEE correctly rounded,
    bit-identical everywhere); other alphas use pow (1-ulp engine
    variance possible, quantization makes a flip astronomically rare)."""
    root = (F.sqrt(F.col("_n")) if alpha == 0.5
            else F.pow(F.col("_n"), F.lit(float(alpha))))
    weights = (df.groupBy(strata_col)
               .agg(F.count("*").alias("_n"))
               .withColumn("_wq", F.floor(root * 1e6).cast("long")))
    total = weights.agg(F.sum("_wq").alias("_tw"))
    rates = (weights.crossJoin(F.broadcast(total))
             .select(strata_col,
                     F.least(F.lit(1.0),
                             F.lit(float(target_rows)) * F.col("_wq")
                             / F.col("_tw") / F.col("_n")).alias("_rate")))
    # NANO (1e-9) threshold resolution, not basis points: the rate is
    # computed internally and at 100 TB scale legitimately lands below
    # one basis point (target 10k rows over a 1e9-doc stratum = 1e-5) —
    # bp quantization floored such strata to EXACTLY ZERO kept rows
    thresh = F.floor(F.col("_rate") * 1e9 + F.lit(0.5)).cast("long")
    r = F.broadcast(rates.select(F.col(strata_col).alias("_sc"),
                                 thresh.alias("_thresh")))
    # null-SAFE stratum join: groupBy made NULL strata a real group whose
    # weight entered the total, but an equi-join would drop their rows —
    # silently losing docs AND diluting every other stratum's share
    return (df.join(r, df[strata_col].eqNullSafe(r["_sc"]))
            .filter(_unit_uniform_nano(F.col(key_col)) < F.col("_thresh"))
            .drop("_thresh", "_sc"))


def contamination_score(train: DataFrame, evalset: DataFrame, n: int = 8,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """GRADED eval-set contamination: per training doc the fraction of
    its distinct n-grams that appear anywhere in the eval set —
    (id, n_grams, n_shared, contam_permille). :func:`decontaminate` is
    the binary gate (any overlap); this is the score you threshold or
    stratify on when a hard drop is too blunt (e.g. boilerplate-heavy
    corpora where a single shared gram is noise but 30% overlap is a
    leak). Permille as an integer floor — engine-bit-identical, no
    float hashing hazards.

    Same scale shape as decontaminate: eval grams broadcast, the train
    side explodes once; the per-doc totals ride the same exploded table
    (one groupBy), zero-overlap docs survive via the left join."""
    from .dedup import shingles_from_tokens, tokenized
    grams = shingles_from_tokens(F.col("_toks"), n)
    ev = (evalset.select(F.split(F.col(text_col), " ").alias("_toks"))
          .select(F.explode(grams).alias("gram"))
          .distinct())
    tr = (tokenized(train, id_col, text_col)
          .select(F.col(id_col), F.explode(grams).alias("gram")))
    totals = tr.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    shared = (tr.join(F.broadcast(ev), "gram")
              .groupBy(id_col).agg(F.count("*").alias("n_shared")))
    return (totals.join(shared, id_col, "left")
            .select(F.col(id_col), "n_grams",
                    F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
                    F.floor(F.coalesce("n_shared", F.lit(0)) * 1000
                            / F.col("n_grams")).alias("contam_permille")))


# -- DSIR: importance resampling toward a target domain ----------------------


def _ngram_multiset(toks: Column, n: int = 2) -> Column:
    """Word n-grams WITH multiplicity (no dedup) — DSIR's features are
    counts, so a doc repeating a target-domain phrase weighs more than
    one mentioning it once. Floor of 1 gram for shorter-than-n docs
    (same convention as ``shingles_from_tokens``)."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "))


def dsir_weights(raw: DataFrame, target: DataFrame, buckets: int = 1024,
                 n: int = 2, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Hashed n-gram importance weights (DSIR, Xie et al. 2023,
    arXiv:2302.03169): score every raw-corpus doc by how much it looks
    like the target domain, log w(x) = sum over the doc's hashed n-grams
    of log p_target(b) - log q_raw(b), with Laplace-smoothed bucket
    unigram distributions. The standard cheap "select pretraining data
    that resembles Wikipedia/books" pass.

    Per-bucket log-ratio terms are nano-quantized to integers before the
    per-doc sum, so results are fold-order-free and an external SQL
    oracle reproduces them bit-for-bit.

    Returns (id, n_grams, logw_nano).

    Scale: the two distribution tables aggregate to ``buckets`` rows each
    (map-side partial counts); the per-doc sum is one broadcast join of a
    buckets-row table onto the exploded feature stream + one groupBy on
    the doc id. The raw corpus is scanned once; nothing n^2, nothing
    driver-side."""
    from .dedup import _hash32, tokenized

    def feats(docs: DataFrame) -> DataFrame:
        return (tokenized(docs, id_col, text_col)
                .select(F.col(id_col),
                        F.explode(_ngram_multiset(F.col("_toks"), n))
                        .alias("_g"))
                .select(F.col(id_col),
                        (_hash32(F.col("_g")) % buckets).alias("_b")))

    # materialized: raw_f feeds BOTH the q-distribution aggregate and
    # the final per-doc scoring join — two lazy consumers would re-run
    # the tokenize+explode pipeline (the dominant cost) twice
    raw_f = feats(raw).localCheckpoint()
    # bucket spine 0..buckets-1 so unseen buckets still get smoothed terms
    spine = raw.sparkSession.range(buckets).select(
        F.col("id").cast("long").alias("_b"))

    def dist(f: DataFrame, cnt: str, tot: str) -> DataFrame:
        per_b = f.groupBy("_b").agg(F.count("*").alias(cnt))
        # total from the buckets-row aggregate, NOT a second scan of f
        total = per_b.agg(
            F.coalesce(F.sum(cnt), F.lit(0)).cast("long").alias(tot))
        return (spine.join(per_b, "_b", "left")
                .select("_b", F.coalesce(cnt, F.lit(0)).alias(cnt))
                .join(F.broadcast(total)))

    p = dist(feats(target), "_tc", "_T")
    q = dist(raw_f, "_rc", "_R")
    terms = (p.join(q, "_b")
             .select("_b",
                     F.floor((F.log(F.col("_tc") + 1)
                              - F.log(F.col("_T") + F.lit(buckets))
                              - F.log(F.col("_rc") + 1)
                              + F.log(F.col("_R") + F.lit(buckets)))
                             * F.lit(1e9) + F.lit(0.5))
                     .cast("long").alias("_t")))
    return (raw_f.join(F.broadcast(terms), "_b")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_grams"),
                 F.sum("_t").alias("logw_nano")))


def dsir_resample(weights: DataFrame, n_keep: int, seed: int = 7,
                  id_col: str = "doc_id") -> DataFrame:
    """Gumbel-top-k resampling over DSIR log-weights: adding independent
    Gumbel noise to each log-weight and keeping the top k draws exactly
    k docs ~ softmax(log w) without replacement — the sampling step of
    the DSIR recipe. The per-doc uniform is md5-derived from (seed, id),
    so the draw is reproducible across runs AND engines; the noisy key is
    nano-quantized so ordering is integer-exact.

    Returns (id, n_grams, logw_nano, key_nano) — the k selected docs,
    highest key first. orderBy+limit compiles to TakeOrdered (per-
    partition top-k + driver merge of k-row heaps), never a global
    sort."""
    from .dedup import _hash32
    u = (_hash32(F.col(id_col).cast("string"), seed=seed) + F.lit(0.5)) \
        / F.lit(float(1 << 32))
    gumbel_nano = F.floor(-F.log(-F.log(u)) * F.lit(1e9) + F.lit(0.5)) \
        .cast("long")
    return (weights
            .withColumn("key_nano", F.col("logw_nano") + gumbel_nano)
            .orderBy(F.col("key_nano").desc(), id_col)
            .limit(n_keep))


def sample_exact_k(df: DataFrame, k: int, strata_col: str,
                   key_col: str) -> DataFrame:
    """EXACTLY k rows per stratum, uniform without replacement: rank rows
    within each stratum by their md5-derived hash (a random permutation
    that is identical on every run and engine) and keep the first k —
    the deterministic reservoir-sample used to build fixed-size eval /
    calibration sets per language or source. Strata smaller than k keep
    all their rows. Rate-based sampling (:func:`stratified_sample`) hits
    a target only in expectation; this is the exact-count variant.

    Adds ``sample_rank`` (1-based within the stratum's hash order).

    Shape: ONE shuffle on the stratum key for the per-stratum window;
    no global sort, no driver round-trip. Hash ties broken by the key
    itself so the permutation is total and reproducible."""
    # hash alone + key tiebreak: an additive cast('long') % 100000 term
    # (the previous form) is NULL for string keys, collapsing the
    # "random permutation" to plain key order; the key_col tiebreak
    # already totalizes the order deterministically
    h = _unit_uniform(F.col(key_col))
    w = W.partitionBy(strata_col).orderBy(h.asc(), F.col(key_col))
    return (df.withColumn("sample_rank", F.row_number().over(w))
            .filter(F.col("sample_rank") <= k))


def token_budget_mix(df: DataFrame, budget_per_stratum: int,
                     strata_col: str, key_col: str,
                     tokens_col: str) -> DataFrame:
    """Greedy per-stratum TOKEN-budget mixture: walk each stratum in the
    deterministic hash order and keep docs while the running token total
    stays under the budget (the first doc always fits) — how a training
    mix is assembled when the recipe says "20 B tokens of code, 5 B of
    wiki", where row counts are the wrong unit because doc lengths vary
    by orders of magnitude across sources.

    Keeps a doc iff the cumulative token count of all hash-earlier docs
    in its stratum is < ``budget_per_stratum``: integer cumulative sum,
    engine-bit-identical. Adds ``tokens_before`` (that prefix sum).

    Shape: one shuffle on the stratum key, one running-sum window within
    it — parallel across strata; at 100 TB strata are the mixture's
    sources, so the widest window is one source's docs ordered by an
    integer, exactly the shard-assignment shape already proven there."""
    h = _unit_uniform(F.col(key_col))   # see sample_exact_k's key note
    w = (W.partitionBy(strata_col).orderBy(h.asc(), F.col(key_col))
         .rowsBetween(W.unboundedPreceding, -1))
    return (df.withColumn(
        "tokens_before",
        F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long"))
        .filter(F.col("tokens_before") < budget_per_stratum))


def weighted_sample_k(df: DataFrame, k: int, weight_col: str,
                      key_col: str, seed: int = 11) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exactly k rows
    (Efraimidis-Spirakis 2006 A-ES): each row draws u from its
    md5-derived uniform and ranks by u^(1/w) — the top k are a sample
    where inclusion probability is proportional to weight, with no
    replacement and no sequential pass. Used to draw docs proportional
    to token mass (long docs count more) for eval panels / distillation
    pools.

    Ranking uses the monotone log form ln(u)/w (same order, no
    underflow for large weights), nano-quantized so the selection is
    integer-exact across engines. Weights must be positive integers.

    Adds ``es_key_nano``. orderBy+limit = TakeOrdered: per-partition
    k-row heaps, no global sort."""
    u = (_hash32_of(F.col(key_col), seed) + F.lit(0.5)) \
        / F.lit(float(1 << 32))
    key = F.floor(F.log(u) / F.col(weight_col) * F.lit(1e9) + F.lit(0.5)) \
        .cast("long")
    return (df.filter(F.col(weight_col) > 0)
            .withColumn("es_key_nano", key)
            .orderBy(F.col("es_key_nano").desc(), key_col)
            .limit(k))


def _hash32_of(key, seed: int):
    from .dedup import _hash32
    return _hash32(key.cast("string"), seed=seed)


def decontaminate_bloom(train: DataFrame, evalset: DataFrame, n: int = 8,
                        n_bits: int = 1 << 20, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """:func:`decontaminate` for eval sets TOO BIG to broadcast as an
    exact hash set: the eval gram set compresses to a Bloom bitset
    (~1.2 bytes/gram) carried in every task closure, the exploded train
    grams thin by the miss rate BEFORE any shuffle, and the surviving
    sliver verifies against the exact eval grams in an ordinary shuffle
    join. Bloom membership has NO false negatives, so the answer is
    byte-identical to the broadcast plan's — the two queries share one
    SQL oracle (the repo's two-plans-one-answer discipline).

    At 100 TB the win is shuffle volume: the unfiltered explode-join
    would shuffle every training gram; here only grams that might match
    (true matches + the false-positive rate) reach the wire."""
    from .dedup import shingles_from_tokens, tokenized
    from .scale import bloom_bitmap, bloom_prefilter
    grams = shingles_from_tokens(F.col("_toks"), n)
    # materialized ONCE: ev feeds both the bloom bitmap collect and the
    # verification join's build side — without the checkpoint the
    # tokenize+explode+distinct pipeline would execute twice (the two
    # consumers are separate subplans)
    ev = (evalset.select(F.split(F.col(text_col), " ").alias("_toks"))
          .select(F.explode(grams).alias("gram"))
          .distinct()
          .localCheckpoint())
    tr = (tokenized(train, id_col, text_col)
          .select(F.col(id_col), F.explode(grams).alias("gram")))
    bm = bloom_bitmap(ev, "gram", n_bits=n_bits)
    thinned = bloom_prefilter(tr, bm, "gram")
    return (thinned.join(ev, "gram")
            .groupBy(id_col)
            .agg(F.countDistinct("gram").alias("n_shared")))


def _median_of_counts(counts: DataFrame, val_col: str,
                      cnt_col: str) -> float | None:
    """Exact ``percentile_cont(0.5)`` of the distribution encoded by a
    (value, count) HISTOGRAM — the scale-safe replacement for Spark's
    ``percentile`` aggregate, which buffers a value→count map of the
    whole column in a single reducer (an OOM at 100 TB). Everything here
    runs over the histogram only: a cumulative-count window, then the
    two order-statistic picks v[floor(r)] / v[floor(r)+1] with
    r = (n-1)/2, interpolated exactly as percentile_cont defines — so a
    DuckDB ``quantile_cont`` oracle still matches bit-for-bit.

    Returns a driver scalar (a 1-row aggregate fetch, not a data
    collect). The single-partition window runs over DISTINCT values
    only; for a continuous high-cardinality column quantize first (the
    MAD gate's inputs are integer lengths and e4-quantized
    deviations)."""
    from pyspark.sql.window import Window as W

    w = W.orderBy(val_col).rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = counts.select(F.col(val_col).alias("_v"),
                        F.sum(cnt_col).over(w).alias("_cum"))
    n_row = cum.agg(F.max("_cum").alias("_nn"))
    cn = cum.join(F.broadcast(n_row))
    kth = F.floor((F.col("_nn") - 1) / 2)      # zero-indexed rank floor
    agg = cn.agg(
        F.min(F.when(F.col("_cum") >= kth + 1, F.col("_v"))).alias("_lo"),
        F.min(F.when(F.col("_cum") >= kth + 2, F.col("_v"))).alias("_hi"),
        F.max("_nn").alias("_nn"))
    frac = (F.col("_nn") - 1) / 2 - F.floor((F.col("_nn") - 1) / 2)
    row = agg.select(
        (F.col("_lo")
         + frac * (F.coalesce(F.col("_hi"), F.col("_lo")) - F.col("_lo")))
        .cast("double").alias("_m")).first()
    return None if row is None else row["_m"]


def _median_interp(vals, cnts) -> float:
    """percentile_cont(0.5) of a sorted-by-value numpy histogram."""
    import numpy as np

    cum = np.cumsum(cnts)
    n = int(cum[-1])
    r = (n - 1) / 2.0
    kth = int(r)
    lo = float(vals[int(np.searchsorted(cum, kth + 1))])
    hi = (float(vals[int(np.searchsorted(cum, kth + 2))])
          if kth + 1 <= n - 1 else lo)
    return lo + (r - kth) * (hi - lo)


def mad_outlier_filter(df: DataFrame, col: str, k: float = 3.0,
                       id_col: str = "doc_id",
                       max_hist_rows: int = 16_000_000) -> DataFrame:
    """Robust outlier gate on a numeric quality feature: flag rows more
    than ``k`` median-absolute-deviations from the median — the
    length/score sanity filter that, unlike mean±k·σ, is not dragged by
    the very outliers it is meant to catch (50% breakdown point).

    The corpus is aggregated ONCE to a (value, count) HISTOGRAM — the
    distributed map-side-combined groupBy that replaces Spark's
    ``percentile`` aggregate (which buffers a value→count map of the
    whole column in ONE reducer, an OOM at 100 TB). Both medians then
    compute from that tiny table: the deviation histogram derives from
    the value histogram by re-keying (dev is a pure function of value),
    so the MAD costs no second corpus pass; interpolation follows
    percentile_cont exactly, so a DuckDB ``quantile_cont`` oracle
    matches bit-for-bit. The flagging itself is one scan with the two
    medians inlined as literals.

    The histogram is a driver-side collect of DISTINCT values only —
    bounded for the integer/quantized quality features this gate is for
    (lengths, permille scores). The collect goes through
    ``limit(max_hist_rows + 1)`` so the driver NEVER holds more than the
    bound even on a contract-violating continuous column; past the bound
    the medians fall back to :func:`_median_of_counts` — the same
    percentile_cont math kept engine-side (grouped histogram +
    distinct-value window), slower per call but memory-bounded
    everywhere.

    Returns (id, value, dev_e4, keep)."""
    import math

    import numpy as np

    counts = (df.filter(F.col(col).isNotNull())
              .groupBy(col).agg(F.count(F.lit(1)).alias("_n")))
    # TakeOrdered fetch bounded at max_hist_rows + 1: the guard must fire
    # BEFORE the driver materializes an unbounded histogram, not after
    hist = counts.orderBy(col).limit(max_hist_rows + 1).collect()
    if len(hist) > max_hist_rows:
        # contract violated (continuous high-cardinality column):
        # stay engine-side — two histogram-median passes, no driver data
        counts = counts.localCheckpoint()
        med = _median_of_counts(counts, col, "_n")
        dev_col = F.floor(F.abs(F.col(col) - F.lit(med)) * 10000
                          + F.lit(0.5)).cast("long")
        dev_counts = (counts.select(
            F.floor(F.abs(F.col(col) - F.lit(med)) * 10000
                    + F.lit(0.5)).cast("long").alias("_dev"),
            "_n").groupBy("_dev").agg(F.sum("_n").alias("_n")))
        mad = _median_of_counts(dev_counts, "_dev", "_n")
        return (df.select(F.col(id_col), F.col(col),
                          dev_col.alias("dev_e4"),
                          (dev_col <= F.lit(None if mad is None
                                            else float(k) * mad)
                           .cast("double")).alias("keep")))
    if hist:
        vals = np.array([r[col] for r in hist], dtype="float64")
        cnts = np.array([r["_n"] for r in hist], dtype="int64")
        med = _median_interp(vals, cnts)
        # re-key the value histogram by e4-quantized |v - med| (same
        # floor(x*1e4 + 0.5) double math the column expression uses)
        dv = np.array([math.floor(abs(v - med) * 10000 + 0.5)
                       for v in vals], dtype="int64")
        order = np.argsort(dv, kind="stable")
        dev_vals, inv = np.unique(dv[order], return_inverse=True)
        dev_cnts = np.bincount(inv, weights=cnts[order]).astype("int64")
        mad = _median_interp(dev_vals, dev_cnts)
        cutoff = F.lit(float(k) * mad)
        dev = F.floor(F.abs(F.col(col) - F.lit(med)) * 10000
                      + F.lit(0.5)).cast("long")
    else:
        cutoff = F.lit(None).cast("double")
        dev = F.lit(None).cast("long")
    return (df.select(F.col(id_col), F.col(col),
                      dev.alias("dev_e4"),
                      (dev <= cutoff).alias("keep")))


# -- quality-gate funnel accounting -------------------------------------------


def first_fail_expr(gates: list[tuple[str, Column]]) -> Column:
    """First-failing-gate index for an ordered gate chain: stage i for a
    row whose earliest failed gate is g_i, len(gates) for a row passing
    all. A NULL gate value counts as a FAIL (the conservative funnel
    convention). Shared by the batch report and the streaming sink so
    both charge documents identically — one place to change the
    convention."""
    fails = [F.when(~F.coalesce(g.cast("boolean"), F.lit(False)), F.lit(i))
             for i, (_, g) in enumerate(gates)]
    return F.coalesce(*fails, F.lit(len(gates)))


def funnel_report(killed: DataFrame, gates: list[tuple[str, Column]],
                  ) -> DataFrame:
    """Derive the full (stage, gate, n_in, n_killed, n_out) funnel from
    per-stage kill counts ``killed`` = (stage, n) — stage len(gates)
    holding the survived-all bucket. All arithmetic runs over the
    stage-count-sized table (a k-row single-partition window — gate
    count, not data, bounds it) plus a 1-row total broadcast. Shared by
    :func:`gate_funnel` and the streaming sink's read path so the
    derivation can never diverge between them."""
    from pyspark.sql.window import Window as W

    stages = killed.sparkSession.createDataFrame(
        [(i, name) for i, (name, _) in enumerate(gates)],
        "stage int, gate string")
    per = (stages.join(killed, "stage", "left")
           .select("stage", "gate",
                   F.coalesce(F.col("n"), F.lit(0)).alias("n_killed")))
    w = W.orderBy("stage").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = per.withColumn("_cumk", F.sum("n_killed").over(w))
    total = killed.agg(F.sum("n").alias("_total"))
    return (cum.join(F.broadcast(total))
            .select("stage", "gate",
                    (F.coalesce(F.col("_total"), F.lit(0))
                     - F.col("_cumk") + F.col("n_killed")).alias("n_in"),
                    F.col("n_killed"),
                    (F.coalesce(F.col("_total"), F.lit(0))
                     - F.col("_cumk")).alias("n_out"))
            .orderBy("stage"))


def gate_kill_counts(df: DataFrame,
                     gates: list[tuple[str, Column]]) -> DataFrame:
    """Per-stage first-fail kill counts (stage, n) — ONE corpus scan
    (every gate boolean in a single projection) into a (gates+1)-row
    groupBy; the mergeable partial the streaming funnel sink stores."""
    return (df.select(first_fail_expr(gates).alias("stage"))
            .groupBy("stage").agg(F.count(F.lit(1)).alias("n")))


def gate_funnel(df: DataFrame, gates: list[tuple[str, Column]],
                ) -> DataFrame:
    """Sequential quality-gate FUNNEL with first-failing-gate attribution:
    the rollout dashboard behind every curation change. For an ordered
    gate chain g0..g(k-1), each document is charged to the FIRST gate it
    fails (a doc killed at stage i never counts against later gates), and
    the report is one row per stage: (stage, gate, n_in, n_killed,
    n_out) with n_in(0) = corpus size and n_out(i) = n_in(i+1) — the
    numbers that say which gate actually does the killing and what a
    threshold change would free up.

    Composition of :func:`gate_kill_counts` (one corpus scan, counts
    shuffle only) and :func:`funnel_report` (stage-table arithmetic);
    the streaming twin `streaming.sinks.stream_funnel_upsert` stores the
    same kill counts and reads through the same report derivation."""
    return funnel_report(gate_kill_counts(df, gates), gates)
