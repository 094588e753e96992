"""Shared text expression helpers — the single definition of tokenization
and shingling used by the dedup queries, the text-analysis queries, and
the public operator facade. Pure ``pyspark.sql.functions`` expressions
(JVM-side, no Python in the hot path)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column) -> Column:
    """Whitespace tokens, empties dropped — the canonical tokenizer."""
    return F.filter(F.split(col, " "), lambda x: x != "")


def word_bigrams(col: Column) -> Column:
    """Word bigrams as strings (``w1 w2``), duplicates KEPT — the
    repetition-score operator needs the multiset. Same zipped-slice
    construction as :func:`word_shingles`; <2 tokens yields an empty
    array (no whole-text fallback: a 1-token doc has no bigrams)."""
    toks = tokens(col)
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    z = F.arrays_zip(F.slice(toks, 1, m), F.slice(toks, 2, m))
    return F.transform(z, lambda s: F.concat_ws(" ", s["0"], s["1"]))


def word_shingles(col: Column) -> Column:
    """Distinct word 3-shingles as strings (``w1 w2 w3``).

    Built by zipping three shifted slices of the token array — one pass,
    three array allocations total. The naive per-index ``slice``/
    ``element_at`` constructions are 3.5×/11× slower (higher-order
    functions run interpreted, so per-shingle allocations dominate).
    Documents with <3 tokens yield one whole-text shingle.
    """
    toks = tokens(col)
    n = F.size(toks)
    m = F.greatest(n - 2, F.lit(0))
    z = F.arrays_zip(F.slice(toks, 1, m), F.slice(toks, 2, m), F.slice(toks, 3, m))
    return F.when(
        n >= 3,
        F.array_distinct(
            F.transform(z, lambda s: F.concat_ws(" ", s["0"], s["1"], s["2"]))
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def hash60(col: Column) -> Column:
    """First 60 bits of ``md5(col)`` as a non-negative int64 — the span
    family's shuffle/grouping key (q107/q137/q185).

    ``conv(substring(md5(x), 1, 15), 16, 10)`` parses the first 15 hex
    chars big-endian, so the value fits int64 with a sign bit to spare
    and is identical to DuckDB's ``CAST('0x' || substring(md5(x), 1, 15)
    AS BIGINT)`` (``SQL_HASH60``) bit-for-bit. At 100 TB the window
    multiset is the corpus's largest exchange and the key is most of
    each row — 8-byte keys cut the exchange ~4× vs 32-hex-char md5
    strings and make every sort/compare in the downstream aggregate an
    int64 compare. Collision note: 60-bit space ⇒ ~n²/2⁶¹ expected
    collisions (≈0.07 for n = 10¹⁰ windows); both engines compute the
    SAME key, so oracles stay exact regardless.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


#: DuckDB fragment mirroring :func:`hash60`; format with the string expr.
SQL_HASH60 = "CAST(concat('0x', substring(md5({c}), 1, 15)) AS BIGINT)"


#: PII-style redaction patterns, applied in order (most specific first so a
#: digit-run inside an already-redacted email is not re-matched). Kept to
#: the regex subset with identical semantics in Java regex (Spark) and RE2
#: (DuckDB oracle): char classes, bounded repetition, \b word boundaries.
PII_PATTERNS: tuple = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("digits", r"[0-9]+"),
)


def redact(col: Column, token: str = "#") -> Column:
    """Chained redaction of every PII pattern, each match → ``token``.

    Spark's ``regexp_replace`` is replace-all by default, matching DuckDB's
    ``regexp_replace(..., 'g')``; one pass per pattern, all JVM-side.
    """
    out = col
    for _, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def normalize(col: Column) -> Column:
    """Canonical dedup-preprocessing normal form: lowercase, strip
    non-alphanumerics, collapse space runs, trim. The regex subset
    behaves identically in Java regex and RE2; ``SQL_NORMALIZE`` is the
    DuckDB twin for oracles."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(col), "[^a-z0-9 ]", ""), " +", " ")
    )


#: DuckDB fragment mirroring :func:`normalize`; format with the column name.
SQL_NORMALIZE = (
    "TRIM(regexp_replace(regexp_replace(LOWER({c}), '[^a-z0-9 ]', '', 'g'),"
    " ' +', ' ', 'g'))"
)
