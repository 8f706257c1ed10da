"""Streaming percolator alerting — the canonical ES percolator use:
watch a turns directory, and for every arriving conversation emit one
alert row per registered query it matches (the reference's
event-driven sync loop shape, `MediaServiceLive.scala` synchronize +
its ES tier, recast as Structured Streaming).

The per-batch work is exactly `QueryEngine.percolate_registered`'s
plan applied to the BATCH's documents before/without indexing them:
materialize conversations, one vectorized tokenize pass (the same
Arrow UDF the index build uses — alert tokenization can never skew
from index tokenization), explode distinct terms, broadcast-join the
persisted registry, partial-aggregated distinct-term count per
(conversation, query).  Cost tracks batch x matched terms — never
registry x corpus, never the index.

Exactly-once: source progress lives in the streaming checkpoint; the
alert sink appends one parquet batch per epoch with the epoch id in
the rows, so a replayed epoch is detectable/dedupable downstream
(idempotent consumers filter on max epoch per key — the standard
foreachBatch contract).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sotohp_spark.functions.tokenizer import KeywordRules, make_term_freq_udf
from sotohp_spark.operators.docs import materialize_documents

log = logging.getLogger(__name__)

ALERT_COLUMNS = ("conv_id", "query_id", "doc_ts", "epoch_id")


def percolate_turns_batch(
    spark: SparkSession,
    turns: DataFrame,
    registry_path: str,
    rules: KeywordRules | None = None,
) -> DataFrame:
    """Alert rows (conv_id, query_id, doc_ts) for ONE batch of turns
    against a persisted percolator registry
    (QueryEngine.register_percolator_queries wrote it).

    A registered query matches a conversation iff EVERY one of its
    analyzed terms appears in the conversation (the percolate()
    conjunctive contract).  Pure function of (batch, registry): no
    index access, safe to run before/without indexing the batch."""
    docs = materialize_documents(turns)
    tfs = make_term_freq_udf(rules)(F.col("doc_text"))
    qdf = spark.read.parquet(registry_path)
    return (
        docs.withColumn("tfs", tfs)
        .select(
            "conv_id", "doc_ts",
            F.explode(F.map_keys("tfs")).alias("term"),
        )
        .join(F.broadcast(qdf), "term")
        .groupBy("conv_id", "doc_ts", "query_id")
        .agg(
            F.count(F.lit(1)).alias("nt"),
            F.max("n_terms").alias("n_terms"),
        )
        .where(F.col("nt") == F.col("n_terms"))
        .select("conv_id", "query_id", "doc_ts")
    )


def stream_alerts_available_now(
    spark: SparkSession,
    turns_source_dir: str,
    registry_path: str,
    alerts_dir: str,
    checkpoint_dir: str,
    rules: KeywordRules | None = None,
    max_files_per_trigger: int | None = None,
):
    """AvailableNow alerting pass: drain the turns directory through
    percolate_turns_batch, appending alert parquet per micro-batch.

    Same data contract as stream_ingest_available_now under bounded
    triggers: source files must be conversation-aligned, or a
    conversation straddling micro-batches percolates on partial text.
    Returns the finished streaming query (``q.recentProgress`` holds
    per-batch row counts)."""
    from sotohp_spark.generator import TRANSCRIPT_SCHEMA

    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(turns_source_dir)

    def process(batch_df: DataFrame, epoch_id: int):
        alerts = percolate_turns_batch(
            spark, batch_df, registry_path, rules
        ).withColumn("epoch_id", F.lit(int(epoch_id)))
        alerts.write.mode("append").parquet(alerts_dir)

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
