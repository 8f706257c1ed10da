"""Resumability / idempotence — mirrors the reference's second-sync
test (MediaServiceSynchronizeTest.scala:40-68): an interrupted build
resumed must produce an index identical to an uninterrupted build; a
repeat build is a no-op except checkpoint timestamps."""

import glob
import os

import pytest

from sotohp_spark.config import EngineConfig
from sotohp_spark.generator import transcripts_df
from sotohp_spark.index.build import BuildInterrupted, IndexBuilder
from sotohp_spark.index.query import QueryEngine

CFG = EngineConfig(range_size=8, block_size=4, ranges_per_batch=2, shuffle_partitions=4)


def _index_signature(spark, path):
    """Logical content signature of an index (partition-layout-free)."""
    postings = (
        spark.read.option("basePath", f"{path}/postings")
        .parquet(f"{path}/postings")
        .selectExpr(
            "term",
            "range_id",
            "n_docs",
            "first_doc",
            "last_doc",
            "md5(string(payload)) AS payload_md5",
        )
        .orderBy("term", "range_id")
        .collect()
    )
    docs = (
        spark.read.parquet(f"{path}/docs")
        .orderBy("doc_id")
        .collect()
    )
    return [tuple(r) for r in postings], [tuple(r) for r in docs]


@pytest.fixture(scope="module")
def turns(spark):
    return transcripts_df(spark, 0.04).localCheckpoint()


def test_kill_and_resume_identical(spark, tmp_path, turns):
    p1 = str(tmp_path / "uninterrupted")
    p2 = str(tmp_path / "resumed")

    IndexBuilder(spark, p1, CFG).build(turns, input_fingerprint="fp")

    b2 = IndexBuilder(spark, p2, CFG)
    with pytest.raises(BuildInterrupted):
        b2.build(turns, stop_after_batches=1, input_fingerprint="fp")
    state_mid = b2.partition_state().collect()
    assert len(state_mid) == 1 and state_mid[0]["status"] == "built"

    b2.build(turns, input_fingerprint="fp")  # resume

    assert _index_signature(spark, p1) == _index_signature(spark, p2)

    # resumed index answers queries identically
    q1 = QueryEngine(spark, p1).top_k_pdf("error retry", 10)
    q2 = QueryEngine(spark, p2).top_k_pdf("error retry", 10)
    assert q1.equals(q2)


def test_second_build_is_noop_except_timestamps(spark, tmp_path, turns):
    p = str(tmp_path / "idempotent")
    b = IndexBuilder(spark, p, CFG)
    b.build(turns, input_fingerprint="fp")
    sig1 = _index_signature(spark, p)
    state1 = {r["partition_id"]: r for r in b.partition_state().collect()}
    mtimes = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{p}/postings/**/*.parquet", recursive=True)
    }

    b.build(turns, input_fingerprint="fp")  # no-op
    assert _index_signature(spark, p) == sig1
    state2 = {r["partition_id"]: r for r in b.partition_state().collect()}
    assert set(state1) == set(state2)
    # postings files untouched (nothing rebuilt)
    for f, m in mtimes.items():
        assert os.path.getmtime(f) == m

    # changed fingerprint -> full rebuild path still converges to same content
    b.build(turns, input_fingerprint="fp2")
    assert _index_signature(spark, p)[1] == sig1[1]  # docs identical


def test_fingerprint_change_clears_stale_buckets(spark, tmp_path, turns):
    """Rebuilding an existing index path with a SMALLER corpus (changed
    fingerprint) must not leave ghost postings from the old corpus in
    higher range buckets: term_stats df and every posting's doc_id must
    be consistent with the new docs table alone."""
    from pyspark.sql import functions as F

    from sotohp_spark.generator import transcripts_df

    path = str(tmp_path / "shrunk")
    b = IndexBuilder(spark, path, CFG)
    b.build(turns, input_fingerprint="big")
    big_meta = QueryEngine(spark, path).meta

    small = transcripts_df(spark, 0.01).localCheckpoint()
    meta = b.build(small, input_fingerprint="small")
    assert meta["n_docs"] < big_meta["n_docs"]

    postings = spark.read.option("basePath", f"{path}/postings").parquet(
        f"{path}/postings"
    )
    assert postings.agg(F.max("last_doc")).collect()[0][0] <= meta["max_doc"]

    # df in term_stats == recount from the docs table's stored tf maps
    stats = {
        r["term"]: r["df"]
        for r in spark.read.parquet(f"{path}/term_stats").collect()
    }
    truth = {
        r["term"]: r["df"]
        for r in spark.read.parquet(f"{path}/docs")
        .select(F.explode("tfs").alias("term", "tf"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .collect()
    }
    assert stats == truth

    # checkpoint state holds only the new fingerprint's rows
    fps = {r["input_fingerprint"] for r in b.partition_state().collect()}
    assert fps == {"small"}


def test_metrics_emitted_per_partition(spark, tmp_path, turns):
    p = str(tmp_path / "metrics")
    b = IndexBuilder(spark, p, CFG)
    b.build(turns, input_fingerprint="fp")
    rows = b.partition_state().collect()
    assert rows, "partition_state must not be empty"
    for r in rows:
        assert r["status"] == "built"
        assert r["postings_count"] > 0
        assert r["compressed_bytes"] > 0
        assert r["skew_ratio"] >= 1.0
        assert r["wall_share_sec"] > 0
        assert r["built_at"] is not None
