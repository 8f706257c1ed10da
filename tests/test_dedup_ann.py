"""Dedup + similarity-search semantics on small deterministic corpora:
LSH candidate recall vs exact Jaccard, SimHash near-dup detection, ANN
recall vs brute force, multimodal plumbing shape."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from sotohp_spark.operators import ann, dedup


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("today", "tomorrow")),  # near dup
        (3, "completely different text about spark shuffle partitions and joins"),
        (4, "another unrelated document mentioning inverted index compression"),
        (5, base.replace("quick", "slow").replace("lazy", "sleepy")),  # near dup
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_duplicates(near_dup_docs):
    groups = dedup.exact_duplicates(near_dup_docs).collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == [0, 1]


def test_ann_kernels_tolerate_null_and_ragged_vectors(spark):
    """The Arrow scoring kernels must reproduce the old expression
    chain's dirty-input behavior instead of crashing: a NULL vector
    scores NULL (sorts last on desc), a wrong-dimension vector scores
    NULL (zip_with padded it to nulls), SRP buckets fall back to 0
    (every when() took its otherwise), and the IVF near-dup kernel
    simply never pairs such rows."""
    import pandas as pd

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.1]),
        (2, None),
        (3, [1.0, 0.0]),  # ragged
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )
    q = [1.0, 0.0, 0.0, 0.0]

    got = ann.cosine_topk_bruteforce(df, q, k=10).collect()
    by_id = {r["vec_id"]: r["cos_sim"] for r in got}
    assert by_id[0] == 1.0 and by_id[1] is not None
    assert by_id[2] is None and by_id[3] is None
    # NULLs sort last on desc
    assert [r["vec_id"] for r in got[:2]] == [0, 1]

    lsh = ann.cosine_topk_lsh(df, q, k=10, bits=4, multiprobe_hamming=2)
    assert lsh.count() >= 1  # does not crash; valid rows score

    pairs = ann.embedding_neardup_ivf(
        df, threshold=0.5, n_centroids=2, n_probe=2
    ).collect()
    ids_in_pairs = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    assert 2 not in ids_in_pairs and 3 not in ids_in_pairs
    assert (0, 1) in {(r["id_a"], r["id_b"]) for r in pairs}


def test_simhash_kernel_parity(spark, near_dup_docs):
    """The Arrow simhash kernel (r08) must equal the retained
    expression form bit for bit on every doc (same md5 prefix, same
    +-tf integer sums, same sign rule), including empty/None texts
    being absent from the output."""
    rows = [(100, ""), (101, None), (102, "a a b"), (103, "  x  ")]
    extra = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    docs = near_dup_docs.unionByName(extra)
    a = {r["doc_id"]: r["simhash"]
         for r in dedup.simhash64(docs).collect()}
    b = {r["doc_id"]: r["simhash"]
         for r in dedup._simhash64_expr(docs).collect()}
    assert a == b


def test_shingle_udf_parity(spark):
    """The Arrow-batched shingler the dedup explode paths use (r08)
    must produce EXACTLY word_shingles(distinct=True): same grams,
    same first-occurrence order, same empty-array edge cases (null
    text, empty text, < n tokens, repeated separators)."""
    texts = [
        "a b c d e a b c", "a b", "", None, "  x   y  z w  ",
        "one two three one two three one two", "t t t t t",
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    for n in (2, 3, 5):
        expr = {
            r["doc_id"]: r["g"]
            for r in df.select(
                "doc_id", dedup.word_shingles(F.col("text"), n).alias("g")
            ).collect()
        }
        udf = {
            r["doc_id"]: r["g"]
            for r in df.select(
                "doc_id",
                dedup.word_shingles_udf(n)(F.col("text")).alias("g"),
            ).collect()
        }
        assert expr == udf, (n, expr, udf)


def test_jaccard_pairs_exact(near_dup_docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(near_dup_docs, threshold=0.3).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.5
    assert (3, 4) not in pairs


def test_short_docs_do_not_crash_shingles(spark):
    """Docs with fewer than n tokens must yield empty shingle arrays
    (not INVALID_PARAMETER_VALUE.START from slice(start=0)) and be
    excluded from pairs — mirroring the oracle's len(w) >= n guard."""
    rows = [
        (0, ""),                         # empty
        (1, "one"),                      # 1 token  (< n)
        (2, "two words"),                # 2 tokens (< n)
        (3, "exactly three tokens"),     # == n -> 1 shingle
        (4, "exactly three tokens"),     # dup of 3
        (5, None),                       # null text
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]).astype({"text": object})
    )
    sh = docs.select(
        "doc_id", F.size(dedup.word_shingles(F.col("text"), 3)).alias("n_sh")
    ).collect()
    by_id = {r["doc_id"]: r["n_sh"] for r in sh}
    assert by_id[0] == 0 and by_id[1] == 0 and by_id[2] == 0
    assert by_id[3] == 1
    # the full pipelines run (no SparkRuntimeException) and only the
    # >=n-token dup pair survives
    jac = {
        (r["doc_a"], r["doc_b"]) for r in dedup.ngram_jaccard_pairs(docs, 0.5).collect()
    }
    assert jac == {(3, 4)}
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_candidates(docs).collect()
    }
    assert (3, 4) in cand and all(a >= 3 for a, _ in cand)


def test_hot_shingle_df_cap(spark):
    """A boilerplate shingle shared by every doc makes the inverted-
    index join quadratic; the df cap drops it before the self-join.
    Jaccard is computed over the capped universe on both sides."""
    common = "all rights reserved"
    rows = [(i, f"{common} unique{i} tail{i} words{i}") for i in range(30)]
    rows += [(100, "alpha beta gamma delta"), (101, "alpha beta gamma delta")]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.05).collect()
    }
    assert len(uncapped) > 400  # quadratic blowup via the hot shingle

    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.05, max_shingle_df=5
        ).collect()
    }
    assert capped == {(100, 101): 1.0}  # boilerplate-only pairs gone


def test_minhash_lsh_finds_near_dups(near_dup_docs):
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_candidates(near_dup_docs).collect()
    }
    assert (0, 1) in cand  # exact dups always collide
    assert (0, 2) in cand or (1, 2) in cand  # near dup should collide
    # unrelated docs should not both appear with everything
    assert (3, 4) not in cand


def test_simhash_near_dups(near_dup_docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_near_dups(near_dup_docs, max_hamming=10).collect()
    }
    assert pairs.get((0, 1)) == 0  # identical text -> identical simhash
    assert (3, 4) not in pairs


@pytest.fixture(scope="module")
def embeddings(spark):
    rng = np.random.Generator(np.random.PCG64(3))
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    # plant a near-dup cluster of the query vector
    q = rng.standard_normal(16)
    q /= np.linalg.norm(q)
    for i, eps in [(7, 0.01), (23, 0.05), (91, 0.1)]:
        vecs[i] = (q + eps * rng.standard_normal(16)).astype(np.float32)
    pdf = pd.DataFrame(
        {"vec_id": range(200), "embedding": [v.tolist() for v in vecs]}
    )
    df = spark.createDataFrame(pdf)
    return df, q.tolist()


def test_ann_bruteforce_exact(embeddings):
    df, q = embeddings
    got = ann.cosine_topk_bruteforce(df, q, k=3).toPandas()
    assert set(got["vec_id"]) == {7, 23, 91}
    assert got["cos_sim"].iloc[0] > 0.99


def test_ann_lsh_recall(embeddings):
    df, q = embeddings
    exact = ann.cosine_topk_bruteforce(df, q, k=5).toPandas()
    approx = ann.cosine_topk_lsh(df, q, k=5, bits=6, multiprobe_hamming=2).toPandas()
    recall = len(set(exact["vec_id"]) & set(approx["vec_id"])) / 5
    assert recall >= 0.6  # planted neighbors collide with high prob
    assert {7, 23}.issubset(set(approx["vec_id"]))


def test_ann_ivf_recall(embeddings):
    df, q = embeddings
    exact = ann.cosine_topk_bruteforce(df, q, k=5).toPandas()
    approx = ann.cosine_topk_ivf(df, q, k=5, n_centroids=8, n_probe=3).toPandas()
    recall = len(set(exact["vec_id"]) & set(approx["vec_id"])) / 5
    assert recall >= 0.6


def test_incremental_dedup_matches_full_lsh_cross_pairs(spark, sf_dir, tmp_path):
    """Deduping a new batch against the materialized signature index
    must find exactly the cross-split candidate pairs the all-pairs LSH
    finds — same bucketing contract — while hashing only the batch."""
    from sotohp_spark.operators.dedup import (
        build_signature_index,
        minhash_lsh_candidates,
        neardup_against_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    split = (int(max_id) + 1) * 4 // 5
    corpus = docs.where(F.col("doc_id") < split)
    new = docs.where(F.col("doc_id") >= split)

    path = str(tmp_path / "sig_index")
    build_signature_index(corpus, path)
    got = {
        (r["new_doc"], r["corpus_doc"])
        for r in neardup_against_index(new, path).collect()
    }

    full = minhash_lsh_candidates(docs)
    want = {
        (r["doc_b"], r["doc_a"])
        for r in full.collect()
        if r["doc_a"] < split <= r["doc_b"]
    }
    assert got == want and len(want) > 0

    # the probe plan READS the materialized index (a parquet scan of
    # the sig-index path) — it must not re-shingle the corpus
    from sotohp_spark.plans.checks import formatted_plan

    plan = formatted_plan(neardup_against_index(new, path))
    assert "sig_index" in plan and "Scan parquet" in plan


def test_multimodal_plumbing(spark):
    from sotohp_spark.operators.multimodal import extract_features, synthetic_media

    feats = extract_features(synthetic_media(spark, n=32), dim=8).toPandas()
    assert len(feats) == 32
    ok = feats[feats["ok"]]
    assert (ok["feature"].map(len) == 8).all()
    assert (~feats["ok"]).sum() == 2  # media 0 and 17 have null payloads
    null_rows = feats[~feats["ok"]]
    assert null_rows["feature"].isna().all()
    # determinism: same input -> same features
    feats2 = extract_features(synthetic_media(spark, n=32), dim=8).toPandas()
    pd.testing.assert_frame_equal(
        feats.sort_values("media_id").reset_index(drop=True),
        feats2.sort_values("media_id").reset_index(drop=True),
    )


def test_multimodal_injected_decoder_path(spark):
    """The real-decoder code path (decoder applies to image payloads,
    stub covers audio/video and decode failures) driven via an injected
    callable — same plumbing PIL would ride.  Defined as a closure so
    cloudpickle ships it by value (test modules aren't importable on
    executors, exactly like a notebook-defined decoder)."""
    from sotohp_spark.operators.multimodal import (
        extract_features,
        synthetic_media,
    )

    def unit_decoder(payload, dim):
        if len(payload) < 4:
            raise ValueError("too short to decode")
        return [1.0] * dim

    feats = extract_features(
        synthetic_media(spark, n=32), dim=4, decoder=unit_decoder
    ).toPandas().set_index("media_id")
    ok = feats[feats["ok"]]
    assert (ok["feature"].map(len) == 4).all()
    # every decodable image went through the injected decoder...
    img = ok[ok["kind"] == "image"]
    assert len(img) and all(list(f) == [1.0] * 4 for f in img["feature"])
    # ...audio/video stay on the deterministic fold (not all-ones)
    rest = ok[ok["kind"] != "image"]
    assert len(rest) and any(list(f) != [1.0] * 4 for f in rest["feature"])
    # null payloads unaffected
    assert feats.loc[0, "feature"] is None and not feats.loc[0, "ok"]


def test_ivf_udf_assignment_matches_expr(embeddings):
    """The broadcast-matrix argmax path (real-IVF scale) must assign
    every vector to the same centroid as the per-centroid-column
    expression path (the oracle contract)."""
    df, _ = embeddings
    a_expr, _ = ann.ivf_assign(df, n_centroids=16, method="expr")
    a_udf, _ = ann.ivf_assign(df, n_centroids=16, method="udf")
    expr = {r["vec_id"]: r["centroid_id"] for r in a_expr.collect()}
    udf = {r["vec_id"]: r["centroid_id"] for r in a_udf.collect()}
    assert expr == udf


def test_ivf_scales_past_expr_limit_and_stays_exact(embeddings):
    """n_centroids above IVF_EXPR_MAX_CENTROIDS routes to the udf path
    (a 128-column literal plan would already crawl; 64k would be
    unusable); probing ALL centroids makes IVF exhaustive, so the
    result must equal brute force exactly."""
    df, q = embeddings
    approx = ann.cosine_topk_ivf(
        df, q, k=5, n_centroids=128, n_probe=128
    ).toPandas()
    exact = ann.cosine_topk_bruteforce(df, q, k=5).toPandas()
    assert list(approx["vec_id"]) == list(exact["vec_id"])
    assert list(approx["cos_sim"]) == list(exact["cos_sim"])


def test_ivf_lloyd_refinement_deterministic(embeddings):
    """A fixed Lloyd iteration count must be reproducible run-to-run
    (exact aggregates, ties to lowest centroid id)."""
    df, q = embeddings
    r1 = ann.cosine_topk_ivf(
        df, q, k=5, n_centroids=8, n_probe=3, lloyd_iters=1
    ).toPandas()
    r2 = ann.cosine_topk_ivf(
        df, q, k=5, n_centroids=8, n_probe=3, lloyd_iters=1
    ).toPandas()
    assert list(r1["vec_id"]) == list(r2["vec_id"])


def test_duplicate_clusters_transitive_chain(spark):
    """A 5-hop chain must collapse to ONE cluster (transitivity needs
    iteration, not one join), and disjoint components stay separate."""
    pairs = spark.createDataFrame(
        pd.DataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),   # chain 1..6
             (10, 11),                                  # small pair
             (20, 22), (21, 22)],                       # star 20,21,22
            columns=["doc_a", "doc_b"],
        )
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(pairs).collect()
    }
    assert {k: got[k] for k in range(1, 7)} == {k: 1 for k in range(1, 7)}
    assert got[10] == 10 and got[11] == 10
    assert got[20] == got[21] == got[22] == 20
    assert len(got) == 11


def test_duplicate_clusters_long_chain_pointer_jumping(spark):
    """A 60-hop chain converges well inside max_iters (pointer jumping
    halves depth per round; one-hop propagation alone would need 60)."""
    pairs = spark.createDataFrame(
        pd.DataFrame(
            [(i, i + 1) for i in range(60)], columns=["doc_a", "doc_b"]
        )
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(pairs, max_iters=10).collect()
    }
    assert set(got.values()) == {0}
    assert len(got) == 61


def test_duplicate_clusters_max_iters_validation(spark):
    """max_iters < 1 is a parameter error (ValueError), not the
    non-convergence RuntimeError — even for empty/trivial input the
    loop never runs, so `changed` stays None and the old code
    misreported it as non-convergence."""
    pairs = spark.createDataFrame(
        pd.DataFrame([(1, 2)], columns=["doc_a", "doc_b"])
    )
    with pytest.raises(ValueError, match="max_iters"):
        dedup.duplicate_clusters(pairs, max_iters=0)
    with pytest.raises(ValueError, match="max_iters"):
        dedup.duplicate_clusters(
            spark.createDataFrame([], "doc_a long, doc_b long"), max_iters=-3
        )


def test_duplicate_clusters_one_action_per_round(spark):
    """The convergence counter must ride on the SAME job that
    materializes each round's checkpoint (an Observation), not a
    separate count() — per propagation round, exactly ONE action.

    AQE and auto-broadcast are disabled for the probe so one action ==
    one tracked job (AQE adds a job per materialized exchange, and a
    broadcast-hash join adds a broadcast-build job — both orthogonal
    to the action count under test).  A single pair converges in
    exactly 2 rounds (one move, one fixpoint check): 2 setup
    checkpoints + 2 round actions = 4 jobs.  The old two-action loop
    measured 6; pin <= 5 so a regression to 2 actions/round fails."""
    import uuid

    sc = spark.sparkContext
    pairs = spark.createDataFrame(
        pd.DataFrame([(1, 2)], columns=["doc_a", "doc_b"])
    )
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    gid = uuid.uuid4().hex
    sc.setJobGroup(gid, "cluster round probe")
    try:
        dedup.duplicate_clusters(pairs)
    finally:
        sc.setJobGroup("default", "")
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
    n_jobs = len(sc.statusTracker().getJobIdsForGroup(gid))
    assert n_jobs <= 5, (
        f"{n_jobs} jobs for a 2-round clustering — expected 2 setup "
        f"+ 1 action per round"
    )


def test_ann_ivf_index_recall_at_least_lsh(spark, embeddings, tmp_path):
    """Materialized-IVF recall@5 on the planted-neighbor fixture must
    be >= the materialized-LSH index's recall (centroids adapt to the
    data; random hyperplanes do not) and the index must be
    deterministic across rebuilds."""
    from sotohp_spark.operators.ann_index import (
        ann_index_ivf_topk,
        ann_index_topk,
        build_ann_index,
        build_ann_index_ivf,
    )

    sdf, q = embeddings
    exact = ann.cosine_topk_bruteforce(sdf, q, k=5).toPandas()

    lsh_path = str(tmp_path / "lsh")
    build_ann_index(sdf, lsh_path, bits=6, seed=42)
    lsh = ann_index_topk(spark, lsh_path, q, k=5, multiprobe_hamming=2).toPandas()
    r_lsh = len(set(exact["vec_id"]) & set(lsh["vec_id"])) / 5

    ivf_path = str(tmp_path / "ivf")
    m1 = build_ann_index_ivf(sdf, ivf_path, n_centroids=8, lloyd_iters=1)
    ivf = ann_index_ivf_topk(spark, ivf_path, q, k=5, n_probe=3).toPandas()
    r_ivf = len(set(exact["vec_id"]) & set(ivf["vec_id"])) / 5
    assert r_ivf >= r_lsh
    assert r_ivf >= 0.6

    m2 = build_ann_index_ivf(
        sdf, str(tmp_path / "ivf2"), n_centroids=8, lloyd_iters=1
    )
    assert m1["centroids"] == m2["centroids"]


def test_jaccard_prefix_filter_lossless(spark, near_dup_docs):
    """PPJoin-style prefix filtering must return EXACTLY the
    unfiltered pairs at any threshold (lossless), with and without
    the hot-shingle cap."""
    for t in (0.3, 0.5, 0.8):
        for cap in (None, 5):
            a = {
                (r["doc_a"], r["doc_b"], r["jaccard"])
                for r in dedup.ngram_jaccard_pairs(
                    near_dup_docs, threshold=t, max_shingle_df=cap,
                    prefix_filter=True,
                ).collect()
            }
            b = {
                (r["doc_a"], r["doc_b"], r["jaccard"])
                for r in dedup.ngram_jaccard_pairs(
                    near_dup_docs, threshold=t, max_shingle_df=cap,
                    prefix_filter=False,
                ).collect()
            }
            assert a == b, (t, cap)


def test_embedding_neardup_ivf_recall_and_precision(spark, embeddings):
    """IVF-probed near-dup (round-6): candidates from each vector's
    top-n_probe Voronoi cells, exact cosine verify.  Precision is 1.0
    by construction (every reported pair re-checked exactly); recall
    vs the exact all-pairs set is pinned on the planted fixture, and
    the planted near-dup cluster (7, 23, 91 — copies of one query
    vector) must be fully recovered: true near-dups share a cell by
    construction of the geometry."""
    df, _ = embeddings
    thr = 0.8
    # exact all-pairs baseline in numpy (200 vectors)
    pdf = df.toPandas().sort_values("vec_id")
    m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    ids = pdf["vec_id"].to_numpy()
    exact = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            cs = round(float(sims[i, j]), 6)
            if cs >= thr:
                exact[(int(ids[i]), int(ids[j]))] = cs
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in ann.embedding_neardup_ivf(
            df, threshold=thr, n_centroids=8, n_probe=2
        ).collect()
    }
    # precision 1.0: every reported pair is a true pair w/ equal cosine
    for pair, cs in got.items():
        assert pair in exact and cs == exact[pair]
    # planted cluster fully recovered
    for pair in [(7, 23), (7, 91), (23, 91)]:
        if pair in exact:
            assert pair in got, pair
    # overall recall floor on the fixture
    assert len(got) >= 0.8 * len(exact), (len(got), len(exact))


def test_embedding_neardup_ivf_no_allpairs_plan(spark, embeddings):
    """The candidate join must be keyed on centroid_id — never a
    cartesian/broadcast-nested-loop over the vector table."""
    df, _ = embeddings
    plan = (
        ann.embedding_neardup_ivf(df, threshold=0.9, n_centroids=8,
                                  n_probe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_jaccard_kernel_gate_falls_back_to_join(spark, near_dup_docs):
    """Above the row budget (or on non-integer ids) the jaccard kernel
    must hand over to the self-join path with IDENTICAL pairs — the
    scale-tier switch may never change results."""
    import sotohp_spark.operators.dedup as dd

    def all_pairs():
        return {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in dd.ngram_jaccard_pairs(
                near_dup_docs, threshold=0.3, max_shingle_df=5
            ).collect()
        }

    kernel = all_pairs()
    saved = dd.JACCARD_KERNEL_MAX_ROWS
    dd.JACCARD_KERNEL_MAX_ROWS = 0  # force the self-join tier
    try:
        join_path = all_pairs()
    finally:
        dd.JACCARD_KERNEL_MAX_ROWS = saved
    assert kernel == join_path and kernel
