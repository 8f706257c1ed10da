"""Object-store readiness: the whole index lifecycle (build, kill-and-
resume, 2-phase append with crash rollback, tombstone delete, compact)
must run with the index path given as a ``file://`` URI — which forces
every control-plane operation (meta.json, pending markers, staged-file
moves, swaps) through the Hadoop FileSystem API code path in fsio.py
instead of os/shutil.  A plain-path twin index is built alongside and
the two must stay rank-identical at every step.
"""

import numpy as np
import pytest

from sotohp_spark import fsio
from sotohp_spark.config import EngineConfig
from sotohp_spark.generator import generate_transcripts_pdf
from sotohp_spark.index import IndexBuilder, QueryEngine
from sotohp_spark.index.build import BuildInterrupted
from sotohp_spark.streaming.incremental import (
    append_conversations,
    compact_index,
    delete_conversations,
)

CFG = EngineConfig(range_size=8, block_size=4, ranges_per_batch=2, shuffle_partitions=4)

QUERIES = ["error retry timeout", "search query", "tool call"]


def test_fsio_unit_ops_on_file_uri(spark, tmp_path):
    base = f"file://{tmp_path}/unit"
    assert fsio.is_remote(base)
    assert fsio.is_remote("file:/tmp/x")  # Hadoop Path.toString() form
    assert fsio.is_remote("s3a://bucket/key")
    assert not fsio.is_remote("/tmp/x")

    assert not fsio.exists(spark, f"{base}/a.json")
    fsio.write_text_atomic(spark, f"{base}/a.json", '{"x": 1}')
    assert fsio.exists(spark, f"{base}/a.json")
    assert fsio.read_text(spark, f"{base}/a.json") == '{"x": 1}'
    # overwrite through the same atomic path
    fsio.write_text_atomic(spark, f"{base}/a.json", '{"x": 2}')
    assert fsio.read_text(spark, f"{base}/a.json") == '{"x": 2}'

    fsio.write_text_atomic(spark, f"{base}/sub/b_1.json", "b1")
    fsio.write_text_atomic(spark, f"{base}/sub/b_2.json", "b2")
    hits = fsio.glob(spark, f"{base}/sub/b_*.json")
    assert len(hits) == 2 and all(fsio.is_remote(h) for h in hits)
    # glob results round-trip through read_text (single-slash URIs)
    assert fsio.read_text(spark, hits[0]) == "b1"

    fsio.rename_overwrite(spark, f"{base}/sub/b_1.json", f"{base}/sub/b_2.json")
    assert fsio.read_text(spark, f"{base}/sub/b_2.json") == "b1"
    assert not fsio.exists(spark, f"{base}/sub/b_1.json")

    fsio.move_dir(spark, f"{base}/sub", f"{base}/sub2")
    assert fsio.exists(spark, f"{base}/sub2/b_2.json")

    fsio.remove(spark, f"{base}/missing.json", missing_ok=True)
    with pytest.raises(FileNotFoundError):
        fsio.read_text(spark, f"{base}/missing.json")
    fsio.rmtree(spark, base)
    assert not fsio.exists(spark, base)


@pytest.fixture(scope="module")
def corpus():
    pdf = generate_transcripts_pdf(0.05)
    convs = sorted(pdf["conv_id"].unique())
    first, second = set(convs[:30]), set(convs[30:])
    return pdf[pdf["conv_id"].isin(first)], pdf[pdf["conv_id"].isin(second)]


def _assert_rank_identical(spark, uri_path, local_path):
    eng_u = QueryEngine(spark, uri_path)
    eng_l = QueryEngine(spark, local_path)
    for qt in QUERIES:
        got = eng_u.top_k_pdf(qt, 10)
        want = eng_l.top_k_pdf(qt, 10)
        assert list(got["doc_id"]) == list(want["doc_id"]), qt
        assert np.allclose(
            got["score"].to_numpy(np.float64),
            want["score"].to_numpy(np.float64),
            atol=1e-9, rtol=0,
        ), qt


def test_full_lifecycle_on_file_uri(spark, tmp_path, corpus):
    pdf_a, pdf_b = corpus
    uri = f"file://{tmp_path}/uri_idx"
    local = str(tmp_path / "local_idx")

    # --- build with kill-and-resume on the URI path ---
    with pytest.raises(BuildInterrupted):
        IndexBuilder(spark, uri, CFG).build(
            spark.createDataFrame(pdf_a), stop_after_batches=1,
            input_fingerprint="fp",
        )
    IndexBuilder(spark, uri, CFG).build(
        spark.createDataFrame(pdf_a), input_fingerprint="fp"
    )
    IndexBuilder(spark, local, CFG).build(
        spark.createDataFrame(pdf_a), input_fingerprint="fp"
    )
    _assert_rank_identical(spark, uri, local)

    # --- crashed 2-phase append rolls back via the marker (URI path) ---
    with pytest.raises(RuntimeError, match="kill-switch"):
        append_conversations(
            spark, uri, spark.createDataFrame(pdf_b), CFG,
            _fail_before_commit=True,
        )
    assert fsio.glob(spark, f"{uri}/_meta/pending_append_*.json")
    meta_u = append_conversations(spark, uri, spark.createDataFrame(pdf_b), CFG)
    assert not fsio.glob(spark, f"{uri}/_meta/pending_append_*.json")
    meta_l = append_conversations(spark, local, spark.createDataFrame(pdf_b), CFG)
    assert meta_u["n_docs"] == meta_l["n_docs"]
    _assert_rank_identical(spark, uri, local)

    # --- tombstone delete on both ---
    doomed = sorted(pdf_a["conv_id"].unique())[:5]
    assert delete_conversations(spark, uri, doomed) == 5
    assert delete_conversations(spark, local, doomed) == 5
    _assert_rank_identical(spark, uri, local)

    # --- BUCKET-LOCAL compaction through the FS API first: staged
    # survivors, marker, per-bucket swap — all on file:// paths ---
    from sotohp_spark.streaming.incremental import compact_buckets

    meta_u = compact_buckets(spark, uri, CFG)
    meta_l = compact_buckets(spark, local, CFG)
    assert meta_u["n_docs"] == meta_l["n_docs"]
    assert not fsio.exists(spark, f"{uri}/deletes")
    assert not fsio.exists(spark, f"{uri}/_staging/compact_buckets")
    _assert_rank_identical(spark, uri, local)

    # --- full compaction swap on the URI path (re-densify), with
    # fresh victims from the appended batch ---
    doomed2 = sorted(pdf_b["conv_id"].unique())[:2]
    assert delete_conversations(spark, uri, doomed2) == 2
    assert delete_conversations(spark, local, doomed2) == 2
    meta_u = compact_index(spark, uri, CFG)
    meta_l = compact_index(spark, local, CFG)
    assert meta_u["n_docs"] == meta_l["n_docs"]
    assert not fsio.exists(spark, f"{uri}/deletes")
    _assert_rank_identical(spark, uri, local)
