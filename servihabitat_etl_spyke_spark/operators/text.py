"""Text-analysis operators for training-data pipelines (north-star
extension): token counting, quality scoring, language ID, fingerprinting.

Everything is built-in-function expression trees (codegen'd, no UDFs) so the
hot path scans 100 TB without touching Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..catalog import spread

#: BPE-ish pre-tokenizer: word pieces OR single non-space punctuation —
#: the standard GPT-2-style pre-tokenization shape, minus unicode classes.
BPE_ISH_RE = r"\w+|[^\w\s]"

#: tiny per-language marker lexicons (n-gram heuristic; deterministic)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["的", "是", "了", "在", "我"],
}

STOPWORDS = ["the", "a", "of", "and", "is", "in", "to", "it"]


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish regex token count (word pieces + punctuation marks)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_RE), 0))


def _count_in(toks: Column, words: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def quality_features(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-doc quality signals: lengths, token stats, stopword ratio,
    punctuation ratio, all-caps ratio — the standard cheap filters applied
    before expensive model-based scoring."""
    docs = spread(docs, id_col)
    text = F.col(text_col)
    toks = tokens(text)
    n_tok = F.size(toks)
    return docs.select(
        F.col(id_col),
        F.length(text).alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.round(F.length(text) / n_tok, 4).alias("chars_per_token"),
        F.round(_count_in(toks, STOPWORDS) / n_tok, 6).alias("stopword_ratio"),
        F.round(F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0))
                / F.length(text), 6).alias("punct_ratio"),
        F.round(F.size(F.filter(toks, lambda t: t == F.upper(t)))
                / n_tok, 6).alias("uppercase_token_ratio"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Marker-lexicon language ID: count marker hits per language over the
    token set; argmax wins with a fixed priority order on ties; all-zero ->
    'und'. (The heuristic shape of fastText-style n-gram ID, expressible as
    a pure expression tree.)"""
    docs = spread(docs, id_col)
    toks = tokens(F.col(text_col))
    scores = {lang: _count_in(toks, words)
              for lang, words in LANG_MARKERS.items()}
    langs = sorted(LANG_MARKERS)              # deterministic tie order
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in langs:                        # strict > keeps earlier winner on tie
        s = scores[lang]
        cond = s > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    sel = [F.col(id_col), best.alias("lang_pred")]
    sel += [scores[lang].alias(f"score_{lang}") for lang in langs]
    return docs.select(*sel)


def fingerprint(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the whitespace-normalized lowercase
    text, plus a 32-bit integer bucket (for partitioned exact-dup joins)."""
    docs = spread(docs, id_col)
    normalized = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    digest = F.md5(normalized)
    return docs.select(
        F.col(id_col),
        digest.alias("fingerprint"),
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("long").alias("bucket32"),
    )
