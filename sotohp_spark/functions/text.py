"""Text-analysis functions for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure column expressions (JVM-side, whole-stage codegen, no UDFs),
each with an exact DuckDB-SQL oracle equivalent (__spark_entry__).
Rounding to 6 dp keeps float value-hashes engine-stable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny stopword list used by the quality heuristic (public knowledge)
STOPWORDS = (
    "the a an and or of to in is are was were be been on for with as at by it this that",
)


def token_count(text: Column) -> Column:
    """Whitespace token count (string_split parity with DuckDB)."""
    return F.size(F.filter(F.split(text, " "), lambda x: x != ""))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-like subword count: word chunks + digit runs + punctuation,
    approximated as regexp matches of `[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]`.
    Vectorized via regexp_count (Spark 3.5+ / DuckDB parity)."""
    return F.regexp_count(text, F.lit(r"[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]"))


def punct_ratio(text: Column) -> Column:
    n_punct = F.regexp_count(text, F.lit(r"[^\w\s]"))
    return F.round(n_punct / F.greatest(F.length(text), F.lit(1)), 6)


def stopword_ratio(text: Column) -> Column:
    words = F.filter(F.split(F.lower(text), " "), lambda x: x != "")
    stop = F.filter(
        words, lambda w: w.isin(*STOPWORDS[0].split(" "))
    )
    return F.round(
        F.size(stop) / F.greatest(F.size(words), F.lit(1)).cast("double"), 6
    )


def mean_word_len(text: Column) -> Column:
    words = F.filter(F.split(text, " "), lambda x: x != "")
    total = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    return F.round(total / F.greatest(F.size(words), F.lit(1)).cast("double"), 6)


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: favors medium length,
    low punctuation, and a sane mean word length.  Deterministic,
    SQL-expressible (oracle in __spark_entry__)."""
    length_term = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    wl = mean_word_len(text)
    wordlen_term = F.when((wl >= 3.0) & (wl <= 8.0), 1.0).otherwise(0.5)
    return F.round((length_term + punct_term + wordlen_term) / 3.0, 6)


def lang_id(text: Column) -> Column:
    """N-gram-heuristic language ID (en/fr/de/unknown) from marker-word
    hit counts — a deterministic stand-in for a real classifier with
    the same plan shape (scan -> regexp counts -> argmax)."""
    en = F.regexp_count(F.lower(text), F.lit(r"\b(the|and|of|to|is)\b"))
    fr = F.regexp_count(F.lower(text), F.lit(r"\b(le|la|les|et|est)\b"))
    de = F.regexp_count(F.lower(text), F.lit(r"\b(der|die|das|und|ist)\b"))
    return (
        F.when((en >= fr) & (en >= de) & (en > 0), "en")
        .when((fr >= de) & (fr > 0), "fr")
        .when(de > 0, "de")
        .otherwise("unknown")
    )


def fingerprint64(text: Column) -> Column:
    """Deterministic 60-bit document fingerprint: md5-derived (engine-
    agnostic, DuckDB-reproducible), analog of the reference's content
    hashing for duplicate detection (HashOperations.scala:18-60)."""
    return F.conv(F.substring(F.md5(text), 1, 15), 16, 10).cast("long")
