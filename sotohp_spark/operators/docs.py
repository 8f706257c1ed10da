"""Document materialization: transcript turns -> conversation documents.

Semantics mirror the reference's Media-from-Original derivation
(modules/model/.../Media.scala:5-33): the document is a pure,
deterministic function of its immutable turns, materialized under
stable ``(conv_id, turn_idx)`` order.  Per-turn text equality is
preserved: ``doc_text = concat_ws(" ", texts sorted by turn_idx)``
with null/empty turns contributing nothing (concat_ws skips nulls).

Doc ids are the analog of the reference's MediaAccessKey
(modules/model/.../package.scala:36-100): a deterministic, dense,
time-ordered key.  docID = dense rank over (min(ts), conv_id).

Scale note: a naive ``dense_rank() OVER (ORDER BY ...)`` uses a single
unpartitioned window — a one-reducer bottleneck at 10^9 docs.
``assign_doc_ids`` instead range-partitions on the key, ranks within
partitions, and adds per-partition offsets computed from partition
counts (two jobs, all-distributed; the offsets table is tiny and
broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def materialize_documents(turns: DataFrame) -> DataFrame:
    """turns -> (conv_id, doc_text, doc_ts, n_turns).

    doc_ts = min(ts) over the conversation (orders the doc-id space by
    time, the reference's range-scannable key trick); one shuffle on
    conv_id; text concatenation is order-stable via sort_array on the
    (turn_idx, text) struct — turn_idx is unique per conv so the sort
    never compares text bytes.
    """
    aggs = [
        F.sort_array(
            F.collect_list(F.struct("turn_idx", "text"))
        ).alias("turns_sorted"),
        F.min("ts").alias("doc_ts"),
        F.count("*").alias("n_turns"),
    ]
    cols = [
        "conv_id",
        F.concat_ws(" ", F.col("turns_sorted.text")).alias("doc_text"),
        "doc_ts",
        "n_turns",
    ]
    if "source" in turns.columns:
        # a conversation belongs to one store; min() is a deterministic
        # pick that doubles as a guard if the invariant is violated
        aggs.append(F.min("source").alias("source"))
        cols.append("source")
    return turns.groupBy("conv_id").agg(*aggs).select(*cols)


def assign_doc_ids(docs: DataFrame, num_ranges: int = 32) -> DataFrame:
    """Add a dense 0-based ``doc_id`` ordered by (doc_ts, conv_id).

    Distributed dense rank: repartitionByRange on the ordering key,
    row_number within each range partition, plus an exclusive prefix
    sum of partition sizes (computed on a tiny per-partition count
    table, broadcast back).  No global single-partition window.
    """
    spark = docs.sparkSession
    ranged = docs.repartitionByRange(num_ranges, "doc_ts", "conv_id").withColumn(
        "_pid", F.spark_partition_id()
    )
    ranged = ranged.localCheckpoint(eager=False)

    counts = ranged.groupBy("_pid").count()
    w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("count").over(w), F.lit(0)).alias("_offset")
    )

    win = Window.partitionBy("_pid").orderBy("doc_ts", "conv_id")
    return (
        ranged.withColumn("_rn", F.row_number().over(win) - 1)
        .join(F.broadcast(offsets), "_pid")
        .withColumn("doc_id", (F.col("_offset") + F.col("_rn")).cast("long"))
        .drop("_pid", "_rn", "_offset")
    )


def build_documents(turns: DataFrame, num_ranges: int = 32) -> DataFrame:
    """Full docs table: doc_id, conv_id, doc_text, doc_ts, n_turns
    (+ source when the turns carry one — used for per-source rules)."""
    docs = assign_doc_ids(materialize_documents(turns), num_ranges)
    cols = ["doc_id", "conv_id", "doc_text", "doc_ts", "n_turns"]
    if "source" in docs.columns:
        cols.append("source")
    return docs.select(*cols)
