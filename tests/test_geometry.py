"""Automatic range geometry: cfg.range_size=None derives the doc-id
range size from the observed corpus at build time, fixes it in meta,
and every later open/append/compact adopts it from meta — a caller
cfg can never re-bucket an existing index (the sf100 one-serial-range
artifact, BENCH/p95_es_surfaces_sf100.md, closed by construction)."""

import numpy as np

from sotohp_spark.config import (
    RANGE_SIZE_MAX,
    RANGE_SIZE_MIN,
    EngineConfig,
    derive_range_size,
)
from sotohp_spark.generator import generate_transcripts_pdf
from sotohp_spark.index import IndexBuilder, QueryEngine
from sotohp_spark.oracle.bm25_oracle import Bm25Oracle
from sotohp_spark.streaming.incremental import append_conversations


def test_derive_range_size_pinned():
    # the hand-tuned sf100 value (100k docs) reproduces automatically
    assert derive_range_size(100_000, 32) == 4096
    # sf400-scale corpus: ~98 ranges at 4096
    assert derive_range_size(400_000, 32) == 4096
    # tiny corpora never fragment below the floor
    assert derive_range_size(0, 32) == RANGE_SIZE_MIN
    assert derive_range_size(500, 32) == RANGE_SIZE_MIN
    # huge corpora cap at the proven 2^17 layout (north-star 10^10
    # docs -> ~76k ranges)
    assert derive_range_size(10**9, 32) == RANGE_SIZE_MAX
    assert derive_range_size(10**10, 1000) == RANGE_SIZE_MAX
    # mid-size corpora land between: ~4 ranges/core target
    assert derive_range_size(2_000_000, 32) == 16384
    # monotone in corpus size, never outside the clamp
    prev = 0
    for n in [10, 10**4, 10**5, 10**6, 10**7, 10**8, 10**9]:
        rs = derive_range_size(n, 32)
        assert RANGE_SIZE_MIN <= rs <= RANGE_SIZE_MAX
        assert rs >= prev
        prev = rs
    # power of two (stable boundaries as corpora grow)
    for n in [123, 99_999, 1_234_567]:
        rs = derive_range_size(n, 32)
        assert rs & (rs - 1) == 0


def test_auto_geometry_build_and_query(spark, tmp_path):
    """A build with the DEFAULT cfg (range_size=None) derives geometry,
    records it (+ provenance) in meta, and matches the BM25 oracle."""
    pdf = generate_transcripts_pdf(0.05)
    path = str(tmp_path / "auto")
    cfg = EngineConfig(shuffle_partitions=4)
    assert cfg.range_size is None
    builder = IndexBuilder(spark, path, cfg)
    meta = builder.build(spark.createDataFrame(pdf), input_fingerprint="g")
    assert meta["range_size"] == RANGE_SIZE_MIN  # tiny corpus -> floor
    assert meta["range_size_source"] == "auto"
    # the builder's cfg was resolved in place (post-build maintenance
    # calls on the same object see the real geometry)
    assert builder.cfg.range_size == RANGE_SIZE_MIN

    engine = QueryEngine(spark, path)
    assert engine.cfg.range_size == RANGE_SIZE_MIN
    oracle = Bm25Oracle(pdf)
    got = engine.top_k_pdf("error retry timeout", 10)
    want = oracle.top_k("error retry timeout", 10)
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert np.allclose(
        got["score"].to_numpy(np.float64),
        want["score"].to_numpy(np.float64),
        atol=1e-9, rtol=0,
    )


def test_explicit_geometry_is_honored(spark, tmp_path):
    pdf = generate_transcripts_pdf(0.02)
    path = str(tmp_path / "explicit")
    cfg = EngineConfig(range_size=8, block_size=4, ranges_per_batch=2,
                       shuffle_partitions=4)
    meta = IndexBuilder(spark, path, cfg).build(
        spark.createDataFrame(pdf), input_fingerprint="g"
    )
    assert meta["range_size"] == 8
    assert meta["range_size_source"] == "explicit"


def test_append_adopts_meta_geometry(spark, tmp_path):
    """An append with a MISMATCHED caller cfg (the auto default) must
    bucket against the index's stored geometry — results stay
    rank-identical to the combined-corpus oracle."""
    pdf = generate_transcripts_pdf(0.05)
    convs = sorted(pdf["conv_id"].unique())
    half = len(convs) // 2
    pdf_a = pdf[pdf["conv_id"].isin(set(convs[:half]))]
    pdf_b = pdf[pdf["conv_id"].isin(set(convs[half:]))]
    path = str(tmp_path / "adopt")
    build_cfg = EngineConfig(range_size=8, block_size=4,
                             ranges_per_batch=2, shuffle_partitions=4)
    IndexBuilder(spark, path, build_cfg).build(
        spark.createDataFrame(pdf_a), input_fingerprint="base"
    )
    # caller passes the DEFAULT cfg (range_size=None): the append must
    # adopt range_size=8 from meta, not derive or default anything
    meta = append_conversations(
        spark, path, spark.createDataFrame(pdf_b),
        EngineConfig(shuffle_partitions=4),
    )
    assert meta["range_size"] == 8

    oa, ob = Bm25Oracle(pdf_a), Bm25Oracle(pdf_b)
    engine = QueryEngine(spark, path)
    got = engine.top_k_pdf("error retry timeout", 5)
    # every returned doc id must exist and carry the right score in
    # the combined id space (batch A ids first, then B offset by |A|)
    assert meta["n_docs"] == oa.n_docs + ob.n_docs
    assert len(got) == 5
