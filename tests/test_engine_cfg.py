"""QueryEngine geometry must come from META, never the caller's cfg.

A caller passes cfg to tune SCORING (k1/b); its (default) geometry
fields differ from the build's — honoring them would derive a bucket
span that mismatches the on-disk hive partition key and every query
would silently return zero rows (the compact_buckets guard class,
now applied to the engine)."""

import numpy as np

from sotohp_spark.config import EngineConfig
from sotohp_spark.generator import generate_transcripts_pdf
from sotohp_spark.index import IndexBuilder, QueryEngine

CFG = EngineConfig(range_size=8, block_size=4, ranges_per_batch=2,
                   shuffle_partitions=4)


def test_caller_cfg_cannot_override_bucket_geometry(spark, tmp_path):
    path = str(tmp_path / "geomidx")
    pdf = generate_transcripts_pdf(0.05)
    IndexBuilder(spark, path, CFG).build(
        spark.createDataFrame(pdf), input_fingerprint="base"
    )

    # caller cfg with DEFAULT geometry (range_size 2^17 != 8) but a
    # tuned k1 — the old code adopted the whole cfg and _attach_docs
    # joined on a bucket span that matches nothing on disk
    tuned = QueryEngine(spark, path, cfg=EngineConfig(k1=0.4))
    assert tuned.cfg.range_size == 8
    assert tuned.cfg.ranges_per_batch == 2
    assert tuned.cfg.block_size == 4
    assert tuned.cfg.k1 == 0.4  # scoring override IS honored

    got = tuned.top_k_pdf("error retry timeout", 10)
    assert len(got) == 10  # with_docs inner join found its partitions

    base = QueryEngine(spark, path).top_k_pdf("error retry timeout", 10)
    # k1 changes scores (so the override is live), geometry did not
    # break membership
    assert not np.allclose(
        got["score"].to_numpy(), base["score"].to_numpy()
    )

    # time-windowed path exercises _doc_bounds_for_ts bucket pruning
    # through the same meta-derived span
    lo = pdf["ts"].min()
    hi = pdf["ts"].max()
    win = tuned.top_k("error", 5, ts_min=lo, ts_max=hi)
    assert win.count() == 5
