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
