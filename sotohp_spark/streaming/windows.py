"""Event-time streaming aggregation — beyond the reference (which has
no event-time engine, SURVEY §2.9): tumbling/sliding windowed counts
with watermarked late-data handling over a turns stream, the shape a
transcript-ingest pipeline needs for live monitoring at 10^12-turn
scale (per-tool error rates, turn throughput).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_turn_counts(
    turns_stream: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-window, per-role turn counts with a watermark bounding state.

    Works on both a readStream source and (for tests) a batch frame —
    the plan is identical; only the sink differs.
    """
    w = (
        F.window("ts", window, slide)
        if slide
        else F.window("ts", window)
    )
    src = turns_stream
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return src.groupBy(w.alias("win"), "role").agg(
        F.count("*").alias("n_turns"),
        F.approx_count_distinct("conv_id").alias("n_convs"),
    )


def session_windows_stream(turns_stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows (session_window) per conversation."""
    src = turns_stream
    if src.isStreaming:
        src = src.withWatermark("ts", gap)
    return src.groupBy(
        F.session_window("ts", gap).alias("sess"), "conv_id"
    ).agg(F.count("*").alias("n_turns"))
