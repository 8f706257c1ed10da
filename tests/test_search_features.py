"""ES-tier query surface (round 6): suggest / facets / more_like_this.

Each feature is checked against a brute-force recompute from the raw
fixture (membership, ordering, scores), and suggest additionally pins
its SCALE SHAPE — the prefix predicate must reach the term_stats
parquet scan as a StringStartsWith pushdown (dictionary-range cost,
never a vocabulary scan).  The sf0.01 DuckDB oracles
(__spark_entry__) cover the same features end-to-end; these tests are
the fast adversarial fixture (known term overlaps, exact expected
sets).
"""

import datetime
import math
from collections import Counter

from sotohp_spark.config import EngineConfig
from sotohp_spark.functions.tokenizer import tokenize
from sotohp_spark.index import IndexBuilder, QueryEngine

TS = datetime.datetime(2025, 1, 15)

TEXTS = [
    "redis retry error storm",
    "retry retry retry error",
    "redis cache warmup",
    "restart requested by operator error",
    "regression test flake retry",
    "unrelated words entirely",
    "error error redis retry",
    "restart loop detected error retry",
]


def _fixture(spark, tmp_path):
    rows = [
        (f"c{i:03d}", 0, TS + datetime.timedelta(days=31 * (i % 3)), t)
        for i, t in enumerate(TEXTS)
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts timestamp, text string"
    )
    path = str(tmp_path / "feat_idx")
    cfg = EngineConfig(
        range_size=4, block_size=2, ranges_per_batch=2, shuffle_partitions=4
    )
    IndexBuilder(spark, path, cfg).build(turns, input_fingerprint="feat")
    return QueryEngine(spark, path)


def test_suggest_matches_brute_and_pushes_down(spark, tmp_path):
    engine = _fixture(spark, tmp_path)
    df_count = Counter()
    for t in TEXTS:
        for term in set(tokenize(t)):
            df_count[term] += 1
    expect = sorted(
        ((t, n) for t, n in df_count.items() if t.startswith("re")),
        key=lambda x: (-x[1], x[0]),
    )[:5]
    got = [(r["term"], r["df"]) for r in engine.suggest("re", 5).collect()]
    assert got == expect, (got, expect)
    plan = engine.suggest("re", 5)._jdf.queryExecution().executedPlan().toString()
    assert "StringStartsWith" in plan, plan
    # empty / no-hit prefixes
    assert engine.suggest("", 5).count() == 0
    assert engine.suggest("zzz", 5).count() == 0


def test_facets_counts_conjunctive_matches_by_month(spark, tmp_path):
    engine = _fixture(spark, tmp_path)
    match = [
        i for i, t in enumerate(TEXTS)
        if {"error", "retry"} <= set(tokenize(t))
    ]
    expect = Counter(
        (TS + datetime.timedelta(days=31 * (i % 3))).strftime("%Y-%m")
        for i in match
    )
    rows = engine.facets("error retry", by="month").collect()
    got = {r["facet"]: r["n_docs"] for r in rows}
    assert got == dict(expect), (got, expect)
    assert [r["facet"] for r in rows] == sorted(got)  # ordered by facet
    # avg_doc_len is the mean over the month's matched docs
    lens = {}
    for i in match:
        lens.setdefault(
            (TS + datetime.timedelta(days=31 * (i % 3))).strftime("%Y-%m"), []
        ).append(len(tokenize(TEXTS[i])))
    for r in rows:
        assert abs(r["avg_doc_len"] - sum(lens[r["facet"]]) / len(lens[r["facet"]])) < 1e-6
    # n_turns facet key works and an unknown key raises
    assert engine.facets("error retry", by="n_turns").count() >= 1
    try:
        engine.facets("error retry", by="bogus")
        assert False, "expected ValueError"
    except ValueError:
        pass


def _brute_bm25(weights, k1=1.2, b=0.75):
    """score every doc against (term -> weight) with qtf folded in."""
    docs = [Counter(tokenize(t)) for t in TEXTS]
    avgdl = sum(sum(d.values()) for d in docs) / len(docs)
    out = {}
    for i, d in enumerate(docs):
        s = 0.0
        for term, w in weights.items():
            tf = d.get(term, 0)
            if tf:
                dl = sum(d.values())
                s += w * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        if s > 0:
            out[i] = s
    return out


def test_more_like_this_matches_brute_derivation(spark, tmp_path):
    engine = _fixture(spark, tmp_path)
    # doc ids are TIME-ordered by the build (not input order): recover
    # the engine's doc_id <-> fixture-index mapping through conv_id
    id_of = {
        int(r["conv_id"][1:]): r["doc_id"]
        for r in engine._docs.select("doc_id", "conv_id").collect()
    }
    doc_of = {v: k for k, v in id_of.items()}
    src_i = 1  # "retry retry retry error" — its head terms overlap others
    src = id_of[src_i]
    docs = [Counter(tokenize(t)) for t in TEXTS]
    n = len(docs)

    def idf(term):
        df = sum(1 for d in docs if term in d)
        return math.log1p((n - df + 0.5) / (df + 0.5))

    ranked = sorted(
        ((tf * idf(t), t) for t, tf in docs[src_i].items()),
        key=lambda x: (-x[0], x[1]),
    )[:3]
    weights = {t: idf(t) for _, t in ranked}
    scores = _brute_bm25(weights)
    scores.pop(src_i, None)
    expect = sorted(
        ((id_of[i], s) for i, s in scores.items()),
        key=lambda x: (-x[1], x[0]),
    )[:5]
    got = [
        (r["doc_id"], r["score"])
        for r in engine.more_like_this(src, k=5, max_terms=3).collect()
    ]
    assert [g[0] for g in got] == [e[0] for e in expect], (got, expect)
    for (_, gs), (_, es) in zip(got, expect):
        assert abs(gs - es) < 1e-9
    # the source doc never appears even with a large k
    all_ids = [
        r["doc_id"] for r in engine.more_like_this(src, k=50).collect()
    ]
    assert src not in all_ids
    # a doc whose top terms are UNIQUE to it has no neighbors at all
    lonely = id_of[3]  # "restart requested by operator error"
    assert engine.more_like_this(lonely, k=5, max_terms=3).count() == 0
    assert doc_of  # mapping sanity
    # unknown doc raises
    try:
        engine.more_like_this(10_000)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_search_after_pages_stitch_to_full_ranking(spark, tmp_path):
    """Deep pagination: walking pages of size p via search_after must
    reproduce top_k(k=ALL) exactly (ids and float64 scores), on both
    the driver-local and distributed scoring paths, disjunctive and
    conjunctive, and a cursor past the last row yields an empty page."""
    engine = _fixture(spark, tmp_path)
    for conj in (False, True):
        full = engine.top_k(
            "error retry redis", k=50, with_docs=False, conjunctive=conj
        ).collect()
        assert full, "fixture must match something"
        for dist in (False, True):
            pages, cursor = [], None
            if dist:
                assert engine._local_gate.acquire(blocking=False)
            try:
                while True:
                    page = engine.top_k(
                        "error retry redis", k=2, with_docs=False,
                        conjunctive=conj, search_after=cursor,
                    ).collect()
                    if not page:
                        break
                    pages.extend(page)
                    cursor = (page[-1]["score"], page[-1]["doc_id"])
            finally:
                if dist:
                    engine._local_gate.release()
            assert [(r["doc_id"], r["score"]) for r in pages] == [
                (r["doc_id"], r["score"]) for r in full
            ], (conj, dist)
    # cursor below everything -> empty page, not an error
    assert (
        engine.top_k("error", k=5, with_docs=False,
                     search_after=(-1.0, 10**9)).count() == 0
    )


def test_count_matches_brute(spark, tmp_path):
    engine = _fixture(spark, tmp_path)
    n = sum(1 for t in TEXTS if {"error", "retry"} <= set(tokenize(t)))
    assert engine.count("error retry").collect()[0]["n_matches"] == n
    assert engine.count("zzzabsent").collect()[0]["n_matches"] == 0


def test_must_not_excludes_matching_docs(spark, tmp_path):
    """ES bool-query must_not: results equal top_k minus docs
    containing any excluded term, scores unchanged (Lucene filter
    semantics), on both scoring paths and both match semantics."""
    engine = _fixture(spark, tmp_path)
    conv_text = {f"c{i:03d}": t for i, t in enumerate(TEXTS)}
    texts_by_doc = {
        r["doc_id"]: conv_text[r["conv_id"]]
        for r in engine._docs.select("doc_id", "conv_id").collect()
    }
    for conj in (False, True):
        base = engine.top_k(
            "error retry", k=50, with_docs=False, conjunctive=conj
        ).collect()
        assert base
        expect = [
            (r["doc_id"], r["score"]) for r in base
            if "redis" not in tokenize(texts_by_doc[r["doc_id"]])
        ]
        for dist in (False, True):
            if dist:
                assert engine._local_gate.acquire(blocking=False)
            try:
                got = engine.top_k(
                    "error retry", k=50, with_docs=False,
                    conjunctive=conj, must_not="redis",
                ).collect()
            finally:
                if dist:
                    engine._local_gate.release()
            assert [(r["doc_id"], r["score"]) for r in got] == expect, (
                conj, dist,
            )
    # absent excluded term -> no-op
    assert (
        engine.top_k("error", k=50, with_docs=False,
                     must_not="zzqabsent").count()
        == engine.top_k("error", k=50, with_docs=False).count()
    )
    # same term in must and must_not (conjunctive) -> provably empty
    assert engine.top_k(
        "error", k=5, with_docs=False, conjunctive=True, must_not="error"
    ).count() == 0
    # disjunctive dual term: docs containing it are gone, others keep
    # their other-term scores
    got = engine.top_k(
        "error retry", k=50, with_docs=False, must_not="retry"
    ).collect()
    for r in got:
        assert "retry" not in tokenize(texts_by_doc[r["doc_id"]])
