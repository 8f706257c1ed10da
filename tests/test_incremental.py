"""Incremental append + streaming ingest: an index grown by appends
must answer queries rank-identically to a from-scratch build over the
full corpus (the engine's analog of the reference's incremental
synchronize producing the same state as a full reindex)."""

import numpy as np
import pandas as pd
import pytest

from sotohp_spark.config import EngineConfig
from sotohp_spark.generator import generate_transcripts_pdf
from sotohp_spark.index import IndexBuilder, QueryEngine
from sotohp_spark.oracle.bm25_oracle import Bm25Oracle
from sotohp_spark.streaming.incremental import append_conversations

CFG = EngineConfig(range_size=8, block_size=4, ranges_per_batch=2, shuffle_partitions=4)

QUERIES = ["error retry timeout", "search query", "tool call", "retryTimeout"]


@pytest.fixture(scope="module")
def split_corpus(spark):
    pdf = generate_transcripts_pdf(0.05)
    convs = sorted(pdf["conv_id"].unique())
    first, second = set(convs[:30]), set(convs[30:])
    pdf_a = pdf[pdf["conv_id"].isin(first)]
    pdf_b = pdf[pdf["conv_id"].isin(second)]
    return pdf, pdf_a, pdf_b


def test_append_matches_oracle_on_grown_corpus(spark, tmp_path, split_corpus):
    pdf, pdf_a, pdf_b = split_corpus
    path = str(tmp_path / "grown")

    IndexBuilder(spark, path, CFG).build(
        spark.createDataFrame(pdf_a), input_fingerprint="base"
    )
    meta = append_conversations(spark, path, spark.createDataFrame(pdf_b), CFG)

    # oracle over the APPEND-ordERED corpus: batch A docs get ids first
    # (by (min_ts, conv_id) within A), then batch B continues after.
    oa = Bm25Oracle(pdf_a)
    ob = Bm25Oracle(pdf_b)
    assert meta["n_docs"] == oa.n_docs + ob.n_docs

    engine = QueryEngine(spark, path)
    # combined oracle: merge doc tables with offset ids
    combined = _CombinedOracle(oa, ob)
    for qt in QUERIES:
        got = engine.top_k_pdf(qt, 10)
        want = combined.top_k(qt, 10)
        assert list(got["doc_id"]) == list(want["doc_id"]), f"{qt!r} docs mismatch"
        assert np.allclose(
            got["score"].to_numpy(dtype=np.float64),
            want["score"].to_numpy(dtype=np.float64),
            atol=1e-9,
            rtol=0,
        ), f"{qt!r} scores mismatch"


def test_append_skips_already_indexed(spark, tmp_path, split_corpus):
    _, pdf_a, _ = split_corpus
    path = str(tmp_path / "skip")
    IndexBuilder(spark, path, CFG).build(
        spark.createDataFrame(pdf_a), input_fingerprint="base"
    )
    meta1 = QueryEngine(spark, path).meta
    meta2 = append_conversations(spark, path, spark.createDataFrame(pdf_a), CFG)
    assert meta2["n_docs"] == meta1["n_docs"]


def test_crashed_append_rolls_back_no_double_postings(spark, tmp_path, split_corpus):
    """Crash between the postings move and the docs-table commit must
    not double-append postings on retry: the pending marker rolls the
    orphaned files back, and the retried append converges to exactly
    the clean-append state (scores would be doubled otherwise)."""
    _, pdf_a, pdf_b = split_corpus
    clean, crashed = str(tmp_path / "clean"), str(tmp_path / "crashed")
    for p in (clean, crashed):
        IndexBuilder(spark, p, CFG).build(
            spark.createDataFrame(pdf_a), input_fingerprint="base"
        )
    append_conversations(spark, clean, spark.createDataFrame(pdf_b), CFG)

    with pytest.raises(RuntimeError, match="kill-switch"):
        append_conversations(
            spark, crashed, spark.createDataFrame(pdf_b), CFG,
            _fail_before_commit=True,
        )
    # orphaned postings are live on disk at this point; retry must heal
    append_conversations(spark, crashed, spark.createDataFrame(pdf_b), CFG)

    e_clean, e_crashed = QueryEngine(spark, clean), QueryEngine(spark, crashed)
    assert e_clean.meta["n_docs"] == e_crashed.meta["n_docs"]
    for qt in QUERIES:
        a = e_clean.top_k_pdf(qt, 10)
        b = e_crashed.top_k_pdf(qt, 10)
        assert list(a["doc_id"]) == list(b["doc_id"]), f"{qt!r} docs mismatch"
        assert np.allclose(
            a["score"].to_numpy(np.float64),
            b["score"].to_numpy(np.float64),
            atol=1e-12, rtol=0,
        ), f"{qt!r} scores mismatch (double-counted postings?)"
    # no leftover markers or staging
    import glob as _glob

    assert not _glob.glob(f"{crashed}/_meta/pending_append_*.json")
    assert not _glob.glob(f"{crashed}/_staging/*")


def test_update_conversations_upserts(spark, tmp_path, split_corpus):
    """The reference's re-enrichment flow: updating an already-indexed
    conversation replaces its searchable content (tombstone + fresh
    doc_ids), while unknown conv_ids in the same batch append."""
    from sotohp_spark.streaming.incremental import update_conversations

    _, pdf_a, pdf_b = split_corpus
    path = str(tmp_path / "upsert")
    IndexBuilder(spark, path, CFG).build(
        spark.createDataFrame(pdf_a), input_fingerprint="base"
    )
    n0 = QueryEngine(spark, path).meta["n_docs"]

    # batch = one existing conversation with corrected text + one new one
    victim = pdf_a["conv_id"].iloc[0]
    corrected = pdf_a[pdf_a["conv_id"] == victim].copy()
    corrected["text"] = "zzupserted marker " + corrected["turn_idx"].astype(str)
    new_conv = pdf_b[pdf_b["conv_id"] == pdf_b["conv_id"].iloc[0]]
    batch = pd.concat([corrected, new_conv])

    meta = update_conversations(spark, path, spark.createDataFrame(batch), CFG)
    # old version tombstoned (still physically present) + 2 new docs
    assert meta["n_docs"] == n0 + 2

    engine = QueryEngine(spark, path)
    hits = engine.top_k("zzupserted", 5).select("conv_id").collect()
    assert [r["conv_id"] for r in hits] == [victim]
    # idempotent: same batch again is a no-op (content identical? no —
    # conv_ids now live, so the anti-join skips both)
    meta2 = update_conversations(spark, path, spark.createDataFrame(batch), CFG)
    assert meta2["n_docs"] == meta["n_docs"] + 2  # old 2 tombstoned, re-added

    # still exactly one live version answering queries
    hits2 = QueryEngine(spark, path).top_k("zzupserted", 5).select("conv_id").collect()
    assert [r["conv_id"] for r in hits2] == [victim]


def test_streaming_available_now(spark, tmp_path, split_corpus):
    _, pdf_a, pdf_b = split_corpus
    path = str(tmp_path / "streamed")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    IndexBuilder(spark, path, CFG).build(
        spark.createDataFrame(pdf_a), input_fingerprint="base"
    )
    spark.createDataFrame(pdf_b).coalesce(2).write.mode("overwrite").parquet(src)

    from sotohp_spark.streaming.incremental import stream_ingest_available_now

    stream_ingest_available_now(spark, src, path, ckpt, CFG)
    engine = QueryEngine(spark, path)
    oa, ob = Bm25Oracle(pdf_a), Bm25Oracle(pdf_b)
    assert engine.meta["n_docs"] == oa.n_docs + ob.n_docs
    assert len(engine.top_k_pdf("error", 10)) == 10


class _CombinedOracle:
    """Oracle over base+appended corpora with append-ordered doc ids."""

    def __init__(self, base: Bm25Oracle, added: Bm25Oracle):
        self.parts = [(base, 0), (added, base.n_docs)]
        self.n_docs = base.n_docs + added.n_docs
        self.doc_len = list(base.doc_len) + list(added.doc_len)
        self.avgdl = sum(self.doc_len) / self.n_docs
        from collections import Counter

        self.df = Counter(base.df)
        self.df.update(added.df)
        self.tfs = list(base.tfs) + list(added.tfs)

    def top_k(self, query_text, k=10):
        import math
        from collections import Counter

        from sotohp_spark.functions.tokenizer import tokenize

        qtf = Counter(tokenize(query_text))
        terms = sorted(t for t in qtf if t in self.df)
        rows = []
        for doc_id in range(self.n_docs):
            c = self.tfs[doc_id]
            score, hit = 0.0, False
            for t in terms:
                tf = c.get(t, 0)
                if not tf:
                    continue
                hit = True
                dl = self.doc_len[doc_id]
                idf = math.log1p((self.n_docs - self.df[t] + 0.5) / (self.df[t] + 0.5))
                score += (
                    qtf[t]
                    * idf
                    * tf
                    * 2.2
                    / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / self.avgdl))
                )
            if hit:
                rows.append((doc_id, score))
        rows.sort(key=lambda r: (-r[1], r[0]))
        return pd.DataFrame(rows[:k], columns=["doc_id", "score"])


def test_delete_conversations_dataframe_overload(spark, tmp_path, split_corpus):
    """Bulk deletes take a DataFrame of conv_ids (distributed semi
    join) and must tombstone exactly what the list path tombstones;
    an empty match must NOT create a tombstone table."""
    from sotohp_spark.streaming.incremental import delete_conversations

    _, pdf_a, _ = split_corpus
    victims = sorted(pdf_a["conv_id"].unique())[:3]
    a, b = str(tmp_path / "del_list"), str(tmp_path / "del_df")
    for p in (a, b):
        IndexBuilder(spark, p, CFG).build(
            spark.createDataFrame(pdf_a), input_fingerprint="base"
        )
    n_list = delete_conversations(spark, a, victims)
    n_df = delete_conversations(
        spark, b, spark.createDataFrame([(v,) for v in victims], "conv_id string")
    )
    assert n_list == n_df == 3
    t_list = {r["doc_id"] for r in spark.read.parquet(f"{a}/deletes").collect()}
    t_df = {r["doc_id"] for r in spark.read.parquet(f"{b}/deletes").collect()}
    assert t_list == t_df

    import os as _os

    c = str(tmp_path / "del_noop")
    IndexBuilder(spark, c, CFG).build(
        spark.createDataFrame(pdf_a), input_fingerprint="base"
    )
    n0 = delete_conversations(
        spark, c, spark.createDataFrame([("no-such-conv",)], "conv_id string")
    )
    assert n0 == 0 and not _os.path.exists(f"{c}/deletes")


def test_update_conversations_stays_distributed(spark, tmp_path, split_corpus,
                                                monkeypatch):
    """The upsert's stale-id set must reach delete_conversations as a
    DataFrame — the old path collect()ed O(distinct convs) to the
    driver (streaming/incremental.py r03)."""
    from pyspark.sql import DataFrame as _DF

    from sotohp_spark.streaming import incremental as inc

    _, pdf_a, _ = split_corpus
    path = str(tmp_path / "upsert_dist")
    IndexBuilder(spark, path, CFG).build(
        spark.createDataFrame(pdf_a), input_fingerprint="base"
    )
    seen = {}
    real = inc.delete_conversations

    def spy(s, p, conv_ids):
        seen["type"] = type(conv_ids)
        return real(s, p, conv_ids)

    monkeypatch.setattr(inc, "delete_conversations", spy)
    victim = pdf_a["conv_id"].iloc[0]
    corrected = pdf_a[pdf_a["conv_id"] == victim].copy()
    corrected["text"] = "zzdistributed " + corrected["turn_idx"].astype(str)
    inc.update_conversations(spark, path, spark.createDataFrame(corrected), CFG)
    assert issubclass(seen["type"], _DF)
    hits = QueryEngine(spark, path).top_k("zzdistributed", 5).collect()
    assert [r["conv_id"] for r in hits] == [victim]


def test_streaming_bounded_microbatches(spark, tmp_path, split_corpus):
    """maxFilesPerTrigger must partition the AvailableNow catch-up into
    MULTIPLE appends (each O(batch), committing progress per trigger)
    and converge to the same corpus as one big batch."""
    _, pdf_a, pdf_b = split_corpus
    path = str(tmp_path / "mb_idx")
    src = str(tmp_path / "mb_src")
    ckpt = str(tmp_path / "mb_ckpt")
    IndexBuilder(spark, path, CFG).build(
        spark.createDataFrame(pdf_a), input_fingerprint="base"
    )
    # 4 CONVERSATION-ALIGNED source files (the bounded-trigger data
    # contract: a conversation's turns must never straddle two
    # micro-batches) -> 1 file per trigger -> 4 micro-batches
    spark.createDataFrame(pdf_b).repartition(4, "conv_id").write.mode(
        "overwrite"
    ).parquet(src)

    from sotohp_spark.streaming.incremental import stream_ingest_available_now

    q = stream_ingest_available_now(
        spark, src, path, ckpt, CFG, max_files_per_trigger=1
    )
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, n_batches  # genuinely micro-batched

    engine = QueryEngine(spark, path)
    oa, ob = Bm25Oracle(pdf_a), Bm25Oracle(pdf_b)
    assert engine.meta["n_docs"] == oa.n_docs + ob.n_docs
    # per-batch appends created one SEGMENT each; all searchable
    assert len(engine.meta["segments"]) >= 3
    assert len(engine.top_k_pdf("error", 10)) == 10
