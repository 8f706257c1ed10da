"""Corpus-curation quality filters for training-data pipelines:
Gopher-style repetition metrics and benchmark-contamination checks.

Reference analog: the reference gates every item through per-item
state checks before it enters the synced corpus
(MediaServiceLive.scala:1351-1383); these are the text-corpus analogs
from the public corpus-curation literature — repetition filters after
Rae et al. 2021 ("Scaling Language Models", table A1: duplicate
n-gram / top-n-gram fractions) and benchmark-overlap contamination
checks after Brown et al. 2020 (GPT-3, appendix C: n-gram collision
against evaluation sets).

Scale notes (the 100 TB shapes):
- repetition_metrics: ONE explode + two-level groupBy for the
  top-bigram count (linear work, map-side partial aggregation), with
  the trigram-duplication and token counts as pure array expressions
  computed in the same scan — no quadratic per-document loops, no
  Python.  The join back to the per-doc base frame co-partitions on
  the id.
- contamination_overlap: the benchmark shingle set is DISTINCT-ed and
  broadcast (an eval suite is tiny next to a crawl corpus), so the
  corpus side is one scan + explode with a broadcast-hash semi probe —
  no shuffle of the corpus shingles at all.

All metrics are deterministic and DuckDB-expressible (oracled in
__spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sotohp_spark.operators.dedup import word_shingles
from sotohp_spark.operators.topk import simple_tokens


def _word_ngrams(col, n: int):
    """ALL word n-grams in order (duplicates kept — repetition is the
    signal, so multiplicity matters)."""
    return word_shingles(col, n, distinct=False)


def repetition_metrics(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_top_bigram_frac: float = 0.18,
    max_dup_trigram_frac: float = 0.30,
) -> DataFrame:
    """Per-document repetition signals (Rae et al. 2021 A1, adapted to
    token fractions):

      n_tokens          whitespace token count
      top_bigram_frac   tokens covered by the most frequent bigram
                        (2 * its count / n_tokens) — 0 unless that
                        bigram actually REPEATS (count >= 2; a bigram
                        seen once is not repetition, and without the
                        guard every two-token document scores 1.0)
      dup_trigram_frac  fraction of trigram occurrences that are
                        repeats (1 - distinct/total); 0 when < 3 tokens
      keep              both fractions under their thresholds

    Trigram duplication and token counts are pure array expressions
    (linear, whole-stage codegen).  The top-bigram count needs a
    per-(doc, bigram) aggregate — explode + groupBy with map-side
    partials, then a per-doc max; at 10^12 turns this is the same
    shuffle shape as the postings build (keyed by doc, combinable).
    """
    tri = _word_ngrams(F.col(text_col), 3)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(simple_tokens(F.col(text_col))).alias("n_tokens"),
        F.size(tri).alias("_tri_total"),
        F.size(F.array_distinct(tri)).alias("_tri_distinct"),
        _word_ngrams(F.col(text_col), 2).alias("_bg"),
    )
    top_bg = (
        base.select("doc_id", F.explode("_bg").alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("_top_bg"))
    )
    out = (
        base.drop("_bg")
        .join(top_bg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.when(
                    F.coalesce(F.col("_top_bg"), F.lit(0)) >= 2,
                    F.coalesce(F.col("_top_bg"), F.lit(0)) * 2
                    / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("top_bigram_frac"),
            F.round(
                (F.col("_tri_total") - F.col("_tri_distinct"))
                / F.greatest(F.col("_tri_total"), F.lit(1)).cast("double"),
                6,
            ).alias("dup_trigram_frac"),
        )
    )
    return out.withColumn(
        "keep",
        (F.col("top_bigram_frac") <= max_top_bigram_frac)
        & (F.col("dup_trigram_frac") <= max_dup_trigram_frac),
    )


def contamination_overlap(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.05,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-corpus-document overlap with a benchmark/eval set (Brown et
    al. 2020 appendix C): the fraction of the document's DISTINCT word
    ``shingle_n``-grams that appear anywhere in ``bench``.

      (doc_id, n_shingles, n_hit, overlap_frac, contaminated)

    Documents with fewer than ``shingle_n`` tokens have no shingles and
    report overlap 0 (nothing to collide).  The benchmark shingle set
    is globally distinct-ed and (by default) broadcast — eval suites
    are MBs against a 100 TB corpus, so the corpus side never
    shuffles: scan -> explode -> broadcast-semi probe -> per-doc agg
    with map-side partials.
    """
    doc_sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("sh"),
    )
    bench_sh = (
        bench.select(F.explode(word_shingles(F.col(text_col), shingle_n)).alias("sh"))
        .distinct()
    )
    bench_sh = bench_sh.withColumn("_hit", F.lit(1))
    if broadcast_bench:
        bench_sh = F.broadcast(bench_sh)
    # ONE pass over the corpus shingles: broadcast left join marks the
    # colliding shingles, a single per-doc aggregate counts both the
    # total and the hits (count(_hit) skips nulls) — the corpus is
    # never exploded or aggregated twice
    agg = (
        doc_sh.join(bench_sh, "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("_hit").alias("n_hit"),
        )
    )
    out = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce("n_hit", F.lit(0))
                / F.greatest(F.coalesce("n_shingles", F.lit(0)), F.lit(1)).cast(
                    "double"
                ),
                6,
            ).alias("overlap_frac"),
        )
    )
    return out.withColumn("contaminated", F.col("overlap_frac") >= threshold)


# PII scrubbing patterns: conservative, lookaround-free regexes that
# behave identically under Java regex (Spark) and RE2 (DuckDB) — the
# cross-engine contract the oracle depends on
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_LONGNUM = r"\b\d{7,}\b"


def scrub_pii(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Mask emails, IPv4 addresses, and long digit runs (phone/account
    numbers) — the standard pre-training scrub pass.  Pure column
    expressions (regexp_count + chained regexp_replace, whole-stage
    codegen, no UDF); masks applied longest-pattern-first so an email
    is counted as ONE email, not also as its embedded digits.

      (doc_id, n_emails, n_ips, n_longnums, text)  — text masked with
      <EMAIL> / <IP> / <NUM> placeholders.
    """
    t = F.col(text_col)
    n_emails = F.regexp_count(t, F.lit(PII_EMAIL))
    masked = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    n_ips = F.regexp_count(masked, F.lit(PII_IPV4))
    masked2 = F.regexp_replace(masked, PII_IPV4, "<IP>")
    n_nums = F.regexp_count(masked2, F.lit(PII_LONGNUM))
    masked3 = F.regexp_replace(masked2, PII_LONGNUM, "<NUM>")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_nums.alias("n_longnums"),
        masked3.alias(text_col),
    )


def corpus_health(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ONE-ROW corpus health report in ONE pass (the monitoring query a
    curation pipeline runs per ingest batch): doc count, exact-dup
    excess (count - countDistinct(md5)), mean whitespace-token count,
    mean quality score, and the count of docs carrying PII-shaped
    spans.  All plain aggregates with map-side partials — a single
    scan at any corpus size.
    """
    from sotohp_spark.functions.text import quality_score, token_count

    t = F.col(text_col)
    has_pii = (
        (F.regexp_count(t, F.lit(PII_EMAIL)) > 0)
        | (F.regexp_count(t, F.lit(PII_IPV4)) > 0)
        | (F.regexp_count(t, F.lit(PII_LONGNUM)) > 0)
    )
    return docs.agg(
        F.count("*").alias("n_docs"),
        (F.count("*") - F.countDistinct(F.md5(t))).alias("exact_dup_excess"),
        F.round(F.avg(token_count(t)), 6).alias("mean_tokens"),
        F.round(F.avg(quality_score(t)), 6).alias("mean_quality"),
        F.sum(has_pii.cast("long")).alias("pii_docs"),
    )
