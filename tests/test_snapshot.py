"""Snapshot / restore (ES _snapshot analog, index/snapshot.py):
byte-identity of the restored tree, immutability under source
mutation, manifest-gated verify, staged atomic restore, and the
pending-marker refusal."""

import json
import os

import pytest

from sotohp_spark import fsio
from sotohp_spark.config import EngineConfig
from sotohp_spark.generator import generate_transcripts_pdf
from sotohp_spark.index import (
    IndexBuilder,
    QueryEngine,
    restore_index,
    snapshot_index,
    verify_snapshot,
)
from sotohp_spark.streaming.incremental import append_conversations

CFG = EngineConfig(range_size=8, block_size=4, ranges_per_batch=2,
                   shuffle_partitions=4)


def _tree(path):
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            full = os.path.join(root, f)
            rel = os.path.relpath(full, path)
            with open(full, "rb") as fh:
                out[rel] = fh.read()
    return out


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("snap")
    idx = str(base / "idx")
    pdf = generate_transcripts_pdf(0.05)
    IndexBuilder(spark, idx, CFG).build(
        spark.createDataFrame(pdf), input_fingerprint="snap"
    )
    return idx, pdf, str(base)


def test_snapshot_restore_byte_identity(spark, built):
    idx, _, base = built
    snap = base + "/s1"
    manifest = snapshot_index(spark, idx, snap)
    assert manifest["n_files"] == len(manifest["files"]) > 0
    verify_snapshot(spark, snap)
    dest = base + "/restored"
    restore_index(spark, snap, dest)
    src_tree = {
        k: v for k, v in _tree(idx).items()
        if not k.endswith("._recovery.lock")
    }
    assert _tree(dest) == src_tree
    # the restored index answers identically
    a = QueryEngine(spark, idx).top_k(
        "error retry", 5, with_docs=False).collect()
    b = QueryEngine(spark, dest).top_k(
        "error retry", 5, with_docs=False).collect()
    assert [(r.doc_id, r.score) for r in a] == [
        (r.doc_id, r.score) for r in b]
    # snapshots are immutable: same path refuses
    with pytest.raises(ValueError, match="immutable"):
        snapshot_index(spark, idx, snap)
    # restore refuses an existing destination without overwrite
    with pytest.raises(ValueError, match="overwrite"):
        restore_index(spark, snap, dest)
    restore_index(spark, snap, dest, overwrite=True)
    assert _tree(dest) == src_tree


def test_snapshot_survives_source_mutation(spark, built):
    idx, pdf, base = built
    work = base + "/mut_idx"
    snapshot_index(spark, idx, base + "/s2")
    restore_index(spark, base + "/s2", work)
    snap = base + "/s3"
    snapshot_index(spark, work, snap)
    before = QueryEngine(spark, work).top_k(
        "error retry", 5, with_docs=False).collect()
    extra = generate_transcripts_pdf(0.02)
    extra = extra.assign(conv_id="mut-" + extra["conv_id"])
    append_conversations(spark, work, spark.createDataFrame(extra), CFG)
    after = QueryEngine(spark, work).meta["n_docs"]
    verify_snapshot(spark, snap)  # untouched by the append
    dest = base + "/s3_restored"
    restore_index(spark, snap, dest)
    eng = QueryEngine(spark, dest)
    assert eng.meta["n_docs"] < after  # pre-append state
    got = eng.top_k("error retry", 5, with_docs=False).collect()
    assert [(r.doc_id, r.score) for r in got] == [
        (r.doc_id, r.score) for r in before]


def test_snapshot_refuses_pending_marker(spark, built):
    idx, _, base = built
    work = base + "/pend_idx"
    snapshot_index(spark, idx, base + "/s4")
    restore_index(spark, base + "/s4", work)
    marker = f"{work}/_meta/pending_append_test.json"
    fsio.write_text_atomic(spark, marker, json.dumps({"pre_max_doc": 0}))
    with pytest.raises(RuntimeError, match="in-flight"):
        snapshot_index(spark, work, base + "/s5")
    fsio.remove(spark, marker)
    snapshot_index(spark, work, base + "/s5")


def test_verify_catches_tampering(spark, built):
    idx, _, base = built
    snap = base + "/s6"
    snapshot_index(spark, idx, snap)
    manifest = verify_snapshot(spark, snap)
    rel, _ = manifest["files"][0]
    victim = os.path.join(snap, rel)
    with open(victim, "ab") as fh:
        fh.write(b"x")
    with pytest.raises(ValueError, match="size"):
        verify_snapshot(spark, snap)
    os.remove(victim)
    with pytest.raises(ValueError, match="missing"):
        verify_snapshot(spark, snap)
    # a torn snapshot (no manifest) is invisible
    with pytest.raises(ValueError, match="manifest"):
        verify_snapshot(spark, base)
