"""Sources/sinks (NDJSON, binaryFile, scan masks) and event-time
streaming windows."""

import json
import os

import pytest

from pyspark.sql import functions as F

from sotohp_spark.generator import TRANSCRIPT_SCHEMA, transcripts_df
from sotohp_spark.sources.io import (
    read_binary_files,
    read_ndjson,
    to_json_lines,
    write_ndjson,
)
from sotohp_spark.streaming.windows import windowed_turn_counts


@pytest.fixture(scope="module")
def turns(spark):
    return transcripts_df(spark, 0.02).localCheckpoint()


def test_ndjson_roundtrip(spark, tmp_path, turns):
    path = str(tmp_path / "nd")
    write_ndjson(turns, path)
    back = read_ndjson(spark, path, TRANSCRIPT_SCHEMA)
    assert back.count() == turns.count()
    a = turns.orderBy("conv_id", "turn_idx").collect()
    b = back.orderBy("conv_id", "turn_idx").collect()
    assert [(r["conv_id"], r["turn_idx"], r["text"]) for r in a] == [
        (r["conv_id"], r["turn_idx"], r["text"]) for r in b
    ]


def test_json_lines_page(turns):
    lines = to_json_lines(turns.orderBy("conv_id", "turn_idx"), limit=5)
    assert len(lines) == 5
    parsed = [json.loads(line) for line in lines]
    assert all("conv_id" in p and "turn_idx" in p for p in parsed)


def test_binary_file_source_with_masks(spark, tmp_path):
    d = tmp_path / "blobs"
    d.mkdir()
    for name, content in [
        ("a.bin", b"\x01\x02\x03"),
        ("b.bin", b"\x04\x05"),
        ("skip.tmp", b"\x06"),
        ("locked.bin", b"\x07"),
    ]:
        (d / name).write_bytes(content)
    df = read_binary_files(
        spark, str(d), include_mask=r"\.bin$", ignore_mask=r"locked"
    )
    rows = {os.path.basename(r["path"]): r for r in df.collect()}
    assert set(rows) == {"a.bin", "b.bin"}
    assert bytes(rows["a.bin"]["content"]) == b"\x01\x02\x03"
    assert rows["b.bin"]["length"] == 2


def test_windowed_counts_batch_plan(spark, turns):
    out = windowed_turn_counts(turns, window="1 hour").collect()
    assert out
    total = sum(r["n_turns"] for r in out)
    assert total == turns.count()
    roles = {r["role"] for r in out}
    assert roles <= {"user", "assistant", "system", "tool"}


def test_windowed_counts_streaming(spark, tmp_path, turns):
    src = str(tmp_path / "stream_src")
    turns.coalesce(2).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    agg = windowed_turn_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "SELECT sum(n_turns) AS s FROM win_counts"
    ).collect()[0]["s"]
    assert got == turns.count()


def test_streaming_dedup_within_watermark(spark, tmp_path, turns):
    """At-least-once delivery: a source containing every turn TWICE
    must dedup to exactly one row per (conv_id, turn_idx), with state
    bounded by the watermark (dropDuplicatesWithinWatermark)."""
    from sotohp_spark.streaming.windows import deduped_turns_stream

    src = str(tmp_path / "dup_src")
    turns.coalesce(1).write.mode("overwrite").parquet(src)
    turns.coalesce(1).write.mode("append").parquet(src)  # re-delivery

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    q = (
        deduped_turns_stream(stream, watermark="2 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("deduped")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT conv_id || '#' || turn_idx) AS d "
        "FROM deduped"
    ).collect()[0]
    assert got["n"] == got["d"] == turns.count()

    # batch path: same semantics through the same helper
    dup_batch = spark.read.parquet(src)
    assert deduped_turns_stream(dup_batch).count() == turns.count()


def test_completed_conversations_stateful_stream(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState, event-time
    timeout): a conversation is emitted COMPLETE exactly once, after
    the stream's watermark passes its last turn + gap; still-active
    conversations are held in state."""
    import datetime

    import pandas as pd

    from sotohp_spark.generator import TRANSCRIPT_SCHEMA
    from sotohp_spark.streaming.windows import completed_conversations_stream

    src = str(tmp_path / "turns_src")
    ckpt = str(tmp_path / "ckpt")
    t0 = datetime.datetime(2025, 1, 1, 10, 0, 0)

    def turn(conv, idx, minutes):
        return (conv, idx, "user", f"text {idx}", None,
                t0 + datetime.timedelta(minutes=minutes))

    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    batch1 = pd.DataFrame(
        [turn("convA", 0, 0), turn("convA", 1, 5), turn("convB", 0, 2)],
        columns=cols,
    )
    spark.createDataFrame(batch1, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    emitted: list = []

    def run_once():
        stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
        q = (
            completed_conversations_stream(stream, gap_minutes=30)
            .writeStream.foreachBatch(
                lambda df, eid: emitted.extend(
                    (r["conv_id"], r["n_turns"]) for r in df.collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert emitted == []  # nothing complete yet: watermark at batch max

    # a much later turn for convC pushes the watermark past A/B's
    # last-turn + 30 min -> both complete; C stays in state
    batch2 = pd.DataFrame([turn("convC", 0, 180)], columns=cols)
    spark.createDataFrame(batch2, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    for _ in range(3):  # timeouts fire on a subsequent (no-data) batch
        run_once()
        if len(emitted) >= 2:
            break
    got = dict(emitted)
    assert got == {"convA": 2, "convB": 1}
    assert len(emitted) == 2  # exactly-once per conversation
