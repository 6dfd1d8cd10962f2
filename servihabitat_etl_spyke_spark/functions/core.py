"""Scalar function library (SURVEY.md §2.7, F1-F16) — every function is a
Column->Column combinator over built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen'd). No Python UDFs anywhere in this module.

Reference sources (all TypeScript dataflow operators / schema hooks):
F1 split            contextV2/split.ts:5-25
F2 join             contextV2/join.ts:5-24
F3 jsonParse        contextV2/jsonParse.ts:5-22
F4 toJson           contextV2/toJson.ts:5-22
F5 addObjectKey     contextV2/addObjectKey.ts:5-31
F6 rewire           contextV2/rewire.ts (identity/alias)
F7 rename           models/ETL.ts:46-54
F10 time-sortable id  protobase/src/BaseSchema.ts:291
F11 uuid gen/validate/version  utils/context/uuid*.ts
F12 ISO now         events/eventsSchemas.ts:12
F13 password hash   users/usersAPI.ts:9-15
F14 generators      protobase/src/ProtoSchema.ts:21-33
F15 path prefixes   events/eventsSchemas.ts:6
F16 key sanitation  objects/objectsSchemas.ts:64-77
"""

from __future__ import annotations

from typing import Callable, Mapping

from pyspark.sql import Column, DataFrame, functions as F

# -- engine-stable rounding (the repo-wide determinism contract) --------------


def round2(c: Column) -> Column:
    """Engine-stable 2-decimal rounding of a computed double.

    ``F.round`` routes through Java BigDecimal.valueOf (shortest decimal
    string), DuckDB rounds the raw binary double — they disagree on
    half-cent edges (e.g. x*1.1 = 311582.53499999997 prints as .535: Spark
    .54, DuckDB .53). floor(x*100 + 0.5)/100 is pure IEEE arithmetic, so
    both engines compute bit-identical results; the oracle uses the same
    formula. Lives HERE (not queries.py) so the streaming modules can
    share the exact expression without an import cycle; queries.py
    re-exports it for the query modules."""
    return F.floor(c * 100 + F.lit(0.5)) / 100


def roundn(c: Column, n: int) -> Column:
    """:func:`round2` generalized to ``n`` decimals (same engine-stable
    floor(x*10^n + 0.5)/10^n form; oracles mirror it verbatim)."""
    s = 10 ** n
    return F.floor(c * s + F.lit(0.5)) / s


# -- F1/F2: split / join ----------------------------------------------------

_ESCAPES = {"\\n": "\n", "\\t": "\t"}


def _unescape(sep: str) -> str:
    # the reference unescapes literal "\n"/"\t" typed in the UI (split.ts)
    for lit, real in _ESCAPES.items():
        sep = sep.replace(lit, real)
    return sep


def split_column(col: Column | str, sep: str) -> Column:
    """F1: string -> array by literal separator."""
    c = F.col(col) if isinstance(col, str) else col
    # F.split takes a regex; quote the literal separator
    import re as _re
    return F.split(c, _re.escape(_unescape(sep)))


def join_array(col: Column | str, sep: str = "\n") -> Column:
    """F2: array -> string (default separator newline, join.ts:10)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(c, _unescape(sep))


# -- F3/F4: JSON ------------------------------------------------------------

def json_parse(col: Column | str, schema: str) -> Column:
    """F3: JSON string -> typed value (default '{}' on null, jsonParse.ts:12)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(F.coalesce(c, F.lit("{}")), schema)


def json_get(col: Column | str, path: str) -> Column:
    """F3 (point access): extract one JSON path as string, JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path)


def to_json_pretty(col: Column) -> Column:
    """F4: value -> JSON string (reference pretty-prints; we emit canonical
    compact JSON — a formatting, not semantic, difference).

    ``ignoreNullFields=false``: JSON.stringify keeps null fields
    ({"a":null}), and so does DuckDB's to_json — Spark's default of
    silently dropping them would diverge on the first NULL field."""
    return F.to_json(col, {"ignoreNullFields": "false"})


# -- F5/F6/F7: object shaping ------------------------------------------------

def add_object_key(df: DataFrame, key: str, value: Column) -> DataFrame:
    """F5: immutably add/overwrite one key (withColumn IS that operation)."""
    return df.withColumn(key, value)


def rename_columns(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """F6/F7: column renames (rewire is an alias; ETL renames are a dict).

    ONE-SHOT select, not sequential withColumnRenamed: cascading renames
    turn a swap mapping ({'a':'b','b':'a'}) into duplicate columns
    ([a,b]->[b,b]->[a,a]) because each step re-matches names the previous
    step just produced. The single select reads every source column under
    its ORIGINAL name exactly once.

    One-sided collisions follow the reference's JS overwrite
    (``obj[new] = obj[old]; delete obj[old]``): renaming clientid ->
    clientId when a clientId column ALREADY exists replaces the existing
    column with the renamed one — a bare alias pass would emit two
    clientId columns and every later reference would raise
    AMBIGUOUS_REFERENCE. (A swap mapping keeps both columns: each side
    is itself renamed away, so nothing is overwritten.)"""
    if not any(o in df.columns for o in mapping):
        return df
    # two SOURCE columns mapped to the same target would both be aliased
    # to it in the one-shot select — exactly the AMBIGUOUS_REFERENCE
    # failure mode this rewrite exists to prevent; fail loudly instead
    applicable = [o for o in mapping if o in df.columns]
    by_target: dict = {}
    for o in applicable:
        by_target.setdefault(mapping[o], []).append(o)
    dupes = {t: srcs for t, srcs in by_target.items() if len(srcs) > 1}
    if dupes:
        raise ValueError(
            "rename_columns: multiple source columns map to the same "
            "target name: " + "; ".join(
                f"{srcs} -> {t!r}" for t, srcs in sorted(dupes.items())))
    # columns another column is being renamed ONTO (and which are not
    # themselves renamed away) get overwritten, not duplicated
    targets = {mapping[o] for o in applicable if mapping[o] != o}
    return df.select(
        *[F.col(c).alias(mapping.get(c, c)) for c in df.columns
          if c in mapping or c not in targets])


# -- F10-F12: identity / time -----------------------------------------------

def gen_time_sortable_id() -> Column:
    """F10: ``YYYYMM-DDHHmm-ssSSS-<uuid8>`` — lexicographic order ==
    insertion time (BaseSchema.ts:291)."""
    return F.concat(
        F.date_format(F.current_timestamp(), "yyyyMM-ddHHmm-ss"),
        F.date_format(F.current_timestamp(), "SSS"),
        F.lit("-"),
        F.substring(F.uuid(), 1, 8),
    )


def uuid4_column() -> Column:
    """F11: uuid v4 generator."""
    return F.uuid()


UUID_RE = (
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
    "-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
)


def uuid_validate(col: Column | str) -> Column:
    """F11: regex validation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(UUID_RE)


def uuid_version(col: Column | str) -> Column:
    """F11: version nibble = char 15 (uuidVersion.ts). Parsed base-16 —
    a NIBBLE is hex by definition, and cast('int') would return NULL for
    the a-f versions (10-15) that uuid_validate's regex accepts."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(c, 15, 1), 16, 10).cast("int")


def iso_now() -> Column:
    """F12: ISO-8601 now() string (moment().toISOString() analog —
    always UTC). date_format renders in the SESSION timezone, so the
    instant is converted to UTC wall time first; a bare format with a
    literal 'Z' would stamp local time as UTC in non-UTC sessions.

    The session timezone is captured at COLUMN-BUILD time (and falls
    back to UTC when no session is active on this thread — active
    sessions are thread-local in PySpark); rebuild the column after
    changing spark.sql.session.timeZone."""
    from pyspark.sql import SparkSession

    sess = SparkSession.getActiveSession()
    tz = (sess.conf.get("spark.sql.session.timeZone")
          if sess is not None else "UTC")
    return F.date_format(F.to_utc_timestamp(F.current_timestamp(), tz),
                         "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")


# -- F13: column transformer hooks -------------------------------------------

def password_hash(col: Column | str) -> Column:
    """F13: the onCreate 'cypher' hook — one-way hash at write time."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c.cast("string"), 256)


def mask_secret(df: DataFrame, cols: list[str]) -> DataFrame:
    """Secret-column masking at read time (ProtoSchema.ts:89-99)."""
    return df.drop(*[c for c in cols if c in df.columns])


# -- F14: default generators --------------------------------------------------

def apply_generators(df: DataFrame,
                     generators: Mapping[str, Callable[[], Column]],
                     force: frozenset[str] = frozenset()) -> DataFrame:
    """F14: fill missing/null annotated columns from their generator
    (ProtoSchema.ts:21-33); ``force`` regenerates even when present."""
    for name, gen in generators.items():
        if name in force or name not in df.columns:
            df = df.withColumn(name, gen())
        else:
            df = df.withColumn(name, F.coalesce(F.col(name), gen()))
    return df


# -- F15: hierarchical path prefixes ------------------------------------------

def path_prefixes(col: Column | str, sep: str = "/") -> Column:
    """F15: ``"a/b/c" -> ["a","a/b","a/b/c"]`` — the events groupIndex fn
    (eventsSchemas.ts:6) as pure array ops: transform(sequence) + slice +
    array_join. Powers multi-membership grouping (A4)."""
    import re as _re

    c = F.col(col) if isinstance(col, str) else col
    # F.split takes a REGEX: escape the separator so sep='.' or '|'
    # splits literally (array_join below already treats it literally —
    # the two sides must agree); same discipline as split_column
    parts = F.split(c, _re.escape(sep))
    return F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(F.slice(parts, F.lit(1), i), sep))


# -- F16: key sanitation -------------------------------------------------------

def sanitize_key(name: str) -> str:
    """F16: strip whitespace from column/model names at ingest."""
    return "".join(name.split())


# -- timestamp → epoch micros (NTZ-safe) --------------------------------------

def epoch_micros(df: DataFrame, col: Column | str) -> Column:
    """Microseconds since the Unix epoch for a timestamp column/expression,
    treating naive (TIMESTAMP_NTZ) wall-clock values as UTC.

    Parquet written with ``isAdjustedToUTC=false`` loads as TIMESTAMP_NTZ,
    which ``unix_micros`` rejects — and casting NTZ→TIMESTAMP would shift by
    the (caller-controlled, unknown) session timezone. ``timestamp_diff``
    against an NTZ epoch literal is pure wall-clock arithmetic, so the result
    is session-timezone-independent and matches DuckDB ``epoch_us`` on the
    same naive values. LTZ columns keep the exact ``unix_micros`` fast path.

    ``df`` is only used to resolve the expression's data type (analysis-time,
    no job); nested fields like ``window.start`` resolve fine.
    """
    from pyspark.sql.types import TimestampNTZType
    c = F.col(col) if isinstance(col, str) else col
    if isinstance(df.select(c).schema[0].dataType, TimestampNTZType):
        return F.timestamp_diff(
            "MICROSECOND",
            F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), c)
    return F.unix_micros(c)
