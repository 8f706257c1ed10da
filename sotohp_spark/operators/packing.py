"""Token-budget sequence packing for training-data pipelines.

Pretraining batches are built by CONCATENATING documents in a stable
order and slicing the stream every `budget` tokens (concat-then-chunk
packing).  The assignment each document needs — which chunk it starts
in and at what offset — is a pure function of the exclusive running
token total:

    pack_id     = floor(running_total / budget)
    pack_offset = running_total % budget

The running total is the distributed prefix sum from
operators/positional.py (range exchange + per-partition cumsum +
O(partitions) offsets), so the plan has NO single-partition window —
the classic scale-killer for `SUM() OVER (ORDER BY ...)` — and is
SQL-mirrorable 1:1 for the DuckDB oracle (which, at oracle scale, can
afford the naive global window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sotohp_spark.operators.positional import with_running_total
from sotohp_spark.operators.topk import simple_tokens


def pack_documents(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    num_ranges: int = 32,
    carry_cols: tuple = (),
) -> DataFrame:
    """(id[, carry...], n_tokens, pack_id, pack_offset) under
    concat-then-chunk packing in ``id_col`` order.

    ``token_col``: use a precomputed token-count column; default counts
    whitespace tokens of ``text_col`` (the same definition the text
    metrics and the oracle use).  ``carry_cols``: extra columns to keep
    through the scan — callers composing pipelines thread metadata here
    instead of re-joining (and thereby re-executing) their upstream
    subtree."""
    if token_col is None:
        docs = docs.withColumn(
            "n_tokens", F.size(simple_tokens(F.col(text_col))).cast("long")
        )
        token_col = "n_tokens"
    ranged = with_running_total(
        docs.select(id_col, token_col, *carry_cols),
        [id_col],
        token_col,
        num_ranges=num_ranges,
        total_col="_cum",
    )
    return ranged.select(
        id_col,
        *carry_cols,
        F.col(token_col).cast("long").alias("n_tokens"),
        # integer division (`div`), NOT double division cast to long:
        # doubles lose exactness past 2^53 and would contradict the
        # %-computed offset (pack_offset must equal cum - pack_id*budget)
        F.expr(f"_cum div {int(budget)}").alias("pack_id"),
        (F.col("_cum") % F.lit(budget)).alias("pack_offset"),
    )
