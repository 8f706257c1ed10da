"""Index aliases (index/alias.py): atomic repointing, blue/green swap
with instant rollback, validation that an alias can never point at a
non-index, and composition with snapshot/restore."""

import pytest

from sotohp_spark.config import EngineConfig
from sotohp_spark.generator import generate_transcripts_pdf
from sotohp_spark.index import (
    IndexBuilder,
    open_alias,
    resolve_alias,
    restore_index,
    snapshot_index,
    swap_alias,
    write_alias,
)

CFG = EngineConfig(range_size=8, block_size=4, ranges_per_batch=2,
                   shuffle_partitions=4)


def test_alias_blue_green_swap_and_rollback(spark, tmp_path):
    base = str(tmp_path)
    blue, green = base + "/blue", base + "/green"
    pdf = generate_transcripts_pdf(0.05)
    IndexBuilder(spark, blue, CFG).build(
        spark.createDataFrame(pdf), input_fingerprint="b")
    bigger = generate_transcripts_pdf(0.08)
    IndexBuilder(spark, green, CFG).build(
        spark.createDataFrame(bigger), input_fingerprint="g")

    alias = base + "/live.alias"
    with pytest.raises(ValueError, match="no alias"):
        resolve_alias(spark, alias)
    with pytest.raises(ValueError, match="not a built index"):
        write_alias(spark, alias, base + "/nonsense")

    v0 = write_alias(spark, alias, blue)
    assert resolve_alias(spark, alias) == blue and v0["version"] == 0
    n_blue = open_alias(spark, alias).meta["n_docs"]

    old = swap_alias(spark, alias, green)
    assert old == blue and resolve_alias(spark, alias) == green
    n_green = open_alias(spark, alias).meta["n_docs"]
    assert n_green > n_blue  # the bigger corpus took traffic
    # a swap to garbage is refused and the alias keeps serving green
    with pytest.raises(ValueError, match="not a built index"):
        swap_alias(spark, alias, base + "/junk")
    assert resolve_alias(spark, alias) == green
    # instant rollback
    swap_alias(spark, alias, old)
    assert open_alias(spark, alias).meta["n_docs"] == n_blue


def test_alias_composes_with_snapshot_restore(spark, tmp_path):
    base = str(tmp_path)
    idx = base + "/idx"
    pdf = generate_transcripts_pdf(0.05)
    IndexBuilder(spark, idx, CFG).build(
        spark.createDataFrame(pdf), input_fingerprint="s")
    alias = base + "/live.alias"
    write_alias(spark, alias, idx)
    want = [(r.doc_id, r.score) for r in open_alias(spark, alias)
            .top_k("error retry", 5, with_docs=False).collect()]
    snapshot_index(spark, idx, base + "/snap")
    restore_index(spark, base + "/snap", base + "/restored")
    swap_alias(spark, alias, base + "/restored")
    got = [(r.doc_id, r.score) for r in open_alias(spark, alias)
           .top_k("error retry", 5, with_docs=False).collect()]
    assert got == want
