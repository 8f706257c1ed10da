"""Distributed global positional index (no single-partition sort).

The reference exposes O(1) positional access over a globally ordered
key space (originalIdByPosition / mediaGetAt, ApiApp.scala:780-814).
A naive ``row_number() OVER (ORDER BY key)`` funnels the whole table
through ONE task — the classic scale-killer.  This helper computes the
same dense 0-based position fully distributed:

1. ``repartitionByRange`` on the ordering key (range exchange, all
   tasks participate);
2. ``row_number`` within each range partition (partitioned window);
3. exclusive prefix sum of the per-partition counts — an
   O(num_ranges)-row table, collected once and broadcast-joined back.

The plan contains NO ``Exchange SinglePartition`` (test-asserted in
tests/test_plans.py): the only driver materialization is the tiny
count vector, which is O(partitions), not O(rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_running_total(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    num_ranges: int = 32,
    total_col: str = "running_total",
) -> DataFrame:
    """Add the EXCLUSIVE running total of ``value_col`` in
    ``order_cols`` order — `SUM(v) OVER (ORDER BY k ROWS UNBOUNDED
    PRECEDING AND 1 PRECEDING)` without its single-partition window.

    Distributed prefix scan: range exchange on the ordering key,
    per-partition windowed cumsum, plus an exclusive prefix sum of the
    per-partition totals — an O(partitions)-row table collected once
    and broadcast-joined back.  ``order_cols`` must be a total order.
    ``with_global_position`` is the value=1 case of this scan."""
    spark = df.sparkSession
    ranged = df.repartitionByRange(num_ranges, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    # pin partition ids: the totals job and the window job must see the
    # exact same partitioning
    ranged = ranged.localCheckpoint(eager=False)

    sums = sorted(
        (r["_pid"], r["s"] or 0)
        for r in ranged.groupBy("_pid")
        .agg(F.sum(value_col).alias("s"))
        .collect()
    )
    offsets, off = [], 0
    for pid, s in sums:
        offsets.append((pid, off))
        off += int(s)
    odf = spark.createDataFrame(offsets, "_pid int, _offset long")

    win = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ranged.withColumn(
            "_part_cum", F.coalesce(F.sum(value_col).over(win), F.lit(0))
        )
        .join(F.broadcast(odf), "_pid")
        .withColumn(
            total_col, (F.col("_offset") + F.col("_part_cum")).cast("long")
        )
        .drop("_pid", "_part_cum", "_offset")
    )


def with_global_position(
    df: DataFrame,
    order_cols: list,
    num_ranges: int = 32,
    pos_col: str = "pos",
) -> DataFrame:
    """Add a dense 0-based ``pos_col`` ordered by ``order_cols``: the
    exclusive running total of 1 (ONE prefix-scan implementation to
    maintain, not two).  ``order_cols`` must be a total order
    (unique key / tie-broken) for the position to be deterministic."""
    return with_running_total(
        df.withColumn("_one", F.lit(1)),
        order_cols,
        "_one",
        num_ranges=num_ranges,
        total_col=pos_col,
    ).drop("_one")
