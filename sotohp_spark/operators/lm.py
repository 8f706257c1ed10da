"""Corpus-statistics language-model scoring — the perplexity-style
quality filter of pretraining pipelines: score each document by the
mean log-probability of its tokens under a smoothed unigram model
TRAINED ON THE CORPUS ITSELF (boilerplate and gibberish score low,
typical prose scores high; filtering drops the tails).

Shape at 100 TB: one explode -> groupBy(token) builds the model (the
vocabulary is tiny next to the corpus and gets map-side partial
aggregation); scoring joins tokens to their counts — AQE picks a
broadcast join when the vocabulary fits an executor, and a shuffled
hash join when a web-scale vocabulary doesn't (never force-broadcast
an O(vocabulary) table) — and averages per doc.  All
JVM-side column arithmetic; the add-k smoothed probability

    P(w) = (count(w) + k) / (N + k * V)

uses only +,/,ln so the DuckDB oracle reproduces it bit-for-bit at the
6-dp rounding the cross-engine contract uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sotohp_spark.operators.topk import simple_tokens


def unigram_logprob_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.5,
) -> DataFrame:
    """(id, n_tokens, avg_logprob) per document with >= 1 token.

    N (total tokens) and V (vocabulary size) ride as a ONE-ROW
    broadcast cross join, not a driver collect: the whole function
    stays a lazy plan (no Spark job at construction time), an empty
    corpus yields an empty result instead of a crash, and the counts
    exchange is shared between the model and the totals branch
    (ReusedExchange).  Empty documents have no tokens to score and are
    omitted, exactly like the SQL mirror's join semantics."""
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(simple_tokens(F.col(text_col))).alias("w"),
    )
    counts = toks.groupBy("w").agg(F.count("*").alias("c"))
    totals = counts.agg(
        F.sum("c").cast("double").alias("_n"),
        F.count("*").cast("double").alias("_v"),
    )
    logp = F.log(
        (F.col("c") + F.lit(float(k)))
        / (F.col("_n") + F.lit(float(k)) * F.col("_v"))
    )
    return (
        toks.join(counts, "w")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(logp), 6).alias("avg_logprob"),
        )
        .select(F.col("doc").alias(id_col), "n_tokens", "avg_logprob")
    )
