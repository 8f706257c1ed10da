"""Append visibility: a reader opened between phase 1 (postings moved
into the live tree) and phase 2 (docs-table commit) of a crashed
2-phase append must see EXACTLY the pre-append results — no ghost
doc_ids, no null-metadata rows.  The committed-snapshot guard
(postings first_doc <= meta.max_doc) is what enforces it; readers
never roll the pending append back (the writer's retry does that).
"""

import numpy as np
import pytest

from sotohp_spark import fsio
from sotohp_spark.config import EngineConfig
from sotohp_spark.generator import generate_transcripts_pdf
from sotohp_spark.index import IndexBuilder, QueryEngine
from sotohp_spark.streaming.incremental import append_conversations

CFG = EngineConfig(range_size=8, block_size=4, ranges_per_batch=2, shuffle_partitions=4)

QUERIES = ["error retry timeout", "search query", "tool call"]


def test_reader_between_append_phases_sees_committed_snapshot(spark, tmp_path):
    pdf = generate_transcripts_pdf(0.05)
    convs = sorted(pdf["conv_id"].unique())
    pdf_a = pdf[pdf["conv_id"].isin(set(convs[:30]))]
    pdf_b = pdf[pdf["conv_id"].isin(set(convs[30:]))]
    path = str(tmp_path / "vis")

    IndexBuilder(spark, path, CFG).build(
        spark.createDataFrame(pdf_a), input_fingerprint="vis"
    )
    before = {qt: QueryEngine(spark, path).top_k_pdf(qt, 20) for qt in QUERIES}

    # crash between phase 1 (postings moved) and phase 2 (docs commit)
    with pytest.raises(RuntimeError, match="kill-switch"):
        append_conversations(
            spark, path, spark.createDataFrame(pdf_b), CFG,
            _fail_before_commit=True,
        )
    assert fsio.glob(spark, f"{path}/_meta/pending_append_*.json")

    # a FRESH reader must not surface phase-1 ghost postings
    eng = QueryEngine(spark, path)
    for qt in QUERIES:
        got = eng.top_k_pdf(qt, 20)
        assert list(got["doc_id"]) == list(before[qt]["doc_id"]), qt
        assert np.allclose(
            got["score"].to_numpy(np.float64),
            before[qt]["score"].to_numpy(np.float64),
            atol=0, rtol=0,
        ), qt
        rich = eng.top_k(qt, 20, with_docs=True).toPandas()
        assert rich["conv_id"].notna().all(), f"{qt}: null-metadata ghost row"
        assert (rich["doc_id"] <= eng.meta["max_doc"]).all()
    # the reader did NOT roll back the pending append (writer's job)
    assert fsio.glob(spark, f"{path}/_meta/pending_append_*.json")

    # the writer's retry recovers and commits; new docs become visible
    meta = append_conversations(spark, path, spark.createDataFrame(pdf_b), CFG)
    assert not fsio.glob(spark, f"{path}/_meta/pending_append_*.json")
    eng2 = QueryEngine(spark, path)
    assert eng2.meta["n_docs"] == meta["n_docs"] > before[QUERIES[0]].shape[0]
    got = eng2.top_k_pdf(QUERIES[0], 20)
    assert (got["doc_id"] > eng.meta["max_doc"]).any() or len(got) == 20
