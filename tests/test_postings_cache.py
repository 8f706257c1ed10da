"""Selective postings cache (the serving-tier hot set).

`cache_postings(top_terms=N)` pins only the N highest-df terms (the
Zipf head that dominates warm p95 — BENCH/p95_sf400.md) and routes
scoring driver-side: hot query terms read the InMemoryRelation, cold
terms read parquet with an IN-list of ONLY the cold terms.  These
tests pin

- rank identity vs an uncached engine over the full reference query
  set (queries mix hot and cold terms, both WAND and conjunctive);
- the plan: a hot-term query scans the in-memory relation, a
  cold-term query does NOT, and a mixed query does both with the
  parquet side's IN-list free of hot terms;
- the default (top_terms=None) cache never pins the positional
  payload on a store_positions index (BM25-only serving must not pay
  phrase memory) — the round-5 ADVICE item;
- the hot/cold union adds ZERO Spark jobs to a warm query on either
  scoring path (driver-local stays the pinned 1 job; distributed
  stays at uncached parity — the union lives inside the same action).

Reference analog: Lucene/ES hot-segment + filter caching on the
search tier the reference delegates to (ElasticOperations.scala).
"""

import uuid

import pytest

from sotohp_spark.config import EngineConfig
from sotohp_spark.generator import generate_transcripts_pdf, reference_queries
from sotohp_spark.index import IndexBuilder, QueryEngine


def _jobs_during(spark, fn):
    gid = uuid.uuid4().hex
    sc = spark.sparkContext
    sc.setJobGroup(gid, "job-count probe")
    try:
        fn()
    finally:
        sc.setJobGroup("default", "")
    return len(sc.statusTracker().getJobIdsForGroup(gid))


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cache_idx"))
    pdf = generate_transcripts_pdf(0.05)
    cfg = EngineConfig(range_size=8, block_size=4, ranges_per_batch=2,
                       shuffle_partitions=8)
    IndexBuilder(spark, path, cfg).build(
        spark.createDataFrame(pdf), input_fingerprint="cache-test"
    )
    return path


def test_selective_cache_rank_identity(spark, built):
    plain = QueryEngine(spark, built)
    hot = QueryEngine(spark, built)
    n = hot.cache_postings(top_terms=5)
    assert n > 0
    assert hot._hot_terms is not None and len(hot._hot_terms) == 5
    for q in reference_queries():
        for conj in (False, True):
            a = plain.top_k_pdf(q, 10, conj)
            b = hot.top_k_pdf(q, 10, conj)
            assert list(a["doc_id"]) == list(b["doc_id"]), (q, conj)
            assert list(a["score"]) == pytest.approx(list(b["score"]))


def test_selective_cache_plan_routing(spark, built):
    eng = QueryEngine(spark, built)
    eng.cache_postings(top_terms=3)
    hot_term = next(iter(eng._hot_terms))
    # a cold term: present in the corpus, not in the hot set
    cold_term = next(
        r["term"]
        for r in eng._term_stats.orderBy("df").limit(50).collect()
        if r["term"] not in eng._hot_terms
    )

    hot_plan = eng._scoring_shards([hot_term])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "InMemoryTableScan" in hot_plan

    cold_plan = eng._scoring_shards([cold_term])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "InMemoryTableScan" not in cold_plan

    mixed_plan = eng._scoring_shards([hot_term, cold_term])._jdf \
        .queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in mixed_plan
    # the parquet side of the union (the live cold scan — NOT the scan
    # recorded inside the InMemoryRelation's build plan) must push ONLY
    # the cold term: the hot term may not leak into the cold scan, and
    # there is no NOT-IN pollution — the split is driver-side exact
    import re
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", mixed_plan)
    cold_scans = [p for p in pushed if cold_term in p]
    assert cold_scans, mixed_plan
    for p in cold_scans:
        assert hot_term not in p


def test_selective_cache_adds_no_jobs(spark, built):
    """The hot/cold union must not change the warm query's job count
    on EITHER scoring path: the union lives inside the same action.
    Local fast path stays the pinned 1 job; the distributed path costs
    exactly what it costs uncached (AQE stages, cache-independent)."""
    q = "error retry timeout"  # mixes hot and cold terms at sf0.05

    def probe(engine):
        engine.preload_term_stats()
        engine.top_k(q, k=10, with_docs=False).collect()  # warm up
        return _jobs_during(
            spark, lambda: engine.top_k(q, k=10, with_docs=False).collect()
        )

    plain = QueryEngine(spark, built)
    hot = QueryEngine(spark, built)
    hot.cache_postings(top_terms=5)
    assert probe(hot) == probe(plain) == 1  # driver-local fast path

    plain_d = QueryEngine(spark, built)
    plain_d.LOCAL_PATH_MAX_POSTINGS = 0
    hot_d = QueryEngine(spark, built)
    hot_d.cache_postings(top_terms=5)
    hot_d.LOCAL_PATH_MAX_POSTINGS = 0
    assert probe(hot_d) == probe(plain_d)  # distributed path parity


def test_default_cache_excludes_positions(spark, tmp_path):
    """On a store_positions index the default cache must pin the
    POSITIONLESS projection only (round-5 ADVICE: the full-frame cache
    roughly doubled executor memory for BM25-only workloads)."""
    path = str(tmp_path / "pos_idx")
    pdf = generate_transcripts_pdf(0.02)
    cfg = EngineConfig(range_size=8, block_size=4, ranges_per_batch=2,
                       shuffle_partitions=4, store_positions=True)
    IndexBuilder(spark, path, cfg).build(
        spark.createDataFrame(pdf), input_fingerprint="pos-cache"
    )
    eng = QueryEngine(spark, path)
    assert eng.meta.get("positions")
    eng.cache_postings()
    assert "pos_payload" not in eng._postings_hot.columns
    assert "pos_offsets" not in eng._postings_hot.columns
    # phrase paths still work: they read the uncached full frame
    out = eng.phrase_match_doc_ids("error retry").count()
    assert out >= 0

    # opt-in full pin for phrase-heavy serving keeps all columns
    eng2 = QueryEngine(spark, path)
    eng2.cache_postings(include_positions=True)
    assert "pos_payload" in eng2._postings_hot.columns


def test_encode_shard_rejects_anchor_overflow():
    """positional_phrase_match packs anchors into _POS_SHIFT bits; a
    position past that must fail LOUDLY at build time (round-5 ADVICE:
    it used to be dropped silently at query time, violating the
    documented superset property)."""
    import numpy as np

    from sotohp_spark.config import DEFAULT
    from sotohp_spark.operators.postings import _POS_SHIFT, encode_shard

    doc_ids = np.array([0, 1], dtype=np.int64)
    tfs = np.array([1, 1], dtype=np.int64)
    dls = np.array([3, 3], dtype=np.int64)
    ok_pos = [np.array([0]), np.array([(1 << _POS_SHIFT) - 1])]
    encode_shard(doc_ids, tfs, dls, 3.0, DEFAULT, positions=ok_pos)  # fine
    bad_pos = [np.array([0]), np.array([1 << _POS_SHIFT])]
    with pytest.raises(ValueError, match="positional postings"):
        encode_shard(doc_ids, tfs, dls, 3.0, DEFAULT, positions=bad_pos)


def test_driver_tier_budget_gate_and_identity(spark, built):
    """The r08 driver-tier postings cache must (a) stay OFF when the
    payload budget says the index is too big — queries then keep the
    one-collect local path — and (b) when ON, return rank-identical
    results.  This pins the two-tier behavior the 100 TB story relies
    on: the budget, not the cluster size, picks the tier."""
    gated = QueryEngine(spark, built)
    gated.preload_term_stats()
    gated.DRIVER_POSTINGS_CACHE_MAX_BYTES = 0
    gated.cache_postings()
    assert gated._driver_shards is None

    cached = QueryEngine(spark, built)
    cached.preload_term_stats()
    cached.cache_postings()
    assert cached._driver_shards is not None

    for q in reference_queries()[:12]:
        a = gated.top_k_pdf(q, 10)
        b = cached.top_k_pdf(q, 10)
        assert list(a["doc_id"]) == list(b["doc_id"]), q
        assert list(a["score"]) == list(b["score"]), q
