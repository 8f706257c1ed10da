"""Compaction swap crash safety: a kill at ANY point of the swap's
rename chain must leave a recoverable index — the next engine/builder
open finishes the swap, and the recovered index is rank-identical to a
compaction that never crashed.  (The old rmtree-then-move swap had a
window with NO live index at the expected path.)
"""

import numpy as np
import pytest

from sotohp_spark import fsio
from sotohp_spark.config import EngineConfig
from sotohp_spark.generator import generate_transcripts_pdf
from sotohp_spark.index import IndexBuilder, QueryEngine
from sotohp_spark.index.build import compact_marker_path
from sotohp_spark.streaming.incremental import compact_index, delete_conversations

CFG = EngineConfig(range_size=8, block_size=4, ranges_per_batch=2, shuffle_partitions=4)

QUERIES = ["error retry timeout", "search query"]


@pytest.fixture(scope="module")
def corpus():
    pdf = generate_transcripts_pdf(0.04)
    doomed = sorted(pdf["conv_id"].unique())[:4]
    return pdf, doomed


def _built_with_deletes(spark, path, pdf, doomed):
    IndexBuilder(spark, path, CFG).build(
        spark.createDataFrame(pdf), input_fingerprint="cc"
    )
    delete_conversations(spark, path, doomed)


@pytest.fixture(scope="module")
def clean_compacted(spark, tmp_path_factory, corpus):
    """Reference result: the same compaction with no crash."""
    pdf, doomed = corpus
    path = str(tmp_path_factory.mktemp("ccref") / "idx")
    _built_with_deletes(spark, path, pdf, doomed)
    meta = compact_index(spark, path, CFG)
    eng = QueryEngine(spark, path)
    return meta, {qt: eng.top_k_pdf(qt, 10) for qt in QUERIES}


@pytest.mark.parametrize("crash_point", ["retire", "promote"])
def test_swap_crash_recovers_on_open(
    spark, tmp_path, corpus, clean_compacted, crash_point
):
    pdf, doomed = corpus
    ref_meta, ref_results = clean_compacted
    path = str(tmp_path / f"idx_{crash_point}")
    _built_with_deletes(spark, path, pdf, doomed)

    with pytest.raises(RuntimeError, match="kill-switch"):
        compact_index(spark, path, CFG, _fail_during_swap=crash_point)
    assert fsio.exists(spark, compact_marker_path(path))
    if crash_point == "retire":
        # the dangerous window: no live index at the expected path
        assert not fsio.exists(spark, f"{path}/_meta/meta.json")

    # engine open = recovery point
    eng = QueryEngine(spark, path)
    assert eng.meta["n_docs"] == ref_meta["n_docs"]
    for qt in QUERIES:
        got = eng.top_k_pdf(qt, 10)
        want = ref_results[qt]
        assert list(got["doc_id"]) == list(want["doc_id"]), qt
        assert np.allclose(
            got["score"].to_numpy(np.float64),
            want["score"].to_numpy(np.float64),
            atol=1e-9, rtol=0,
        ), qt

    # swap debris fully cleaned up
    assert not fsio.exists(spark, compact_marker_path(path))
    assert not fsio.exists(spark, path + "_compact_tmp")
    assert not fsio.exists(spark, path + "_compact_old")
    assert not fsio.exists(spark, f"{path}/deletes")
