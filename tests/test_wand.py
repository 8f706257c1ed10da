"""Pure-numpy equivalence: block-max WAND (score_range) vs an
exhaustive scorer over randomly generated shard sets — the pruning
correctness guard, independent of Spark."""

import numpy as np
import pytest

from sotohp_spark.config import EngineConfig
from sotohp_spark.operators import bm25
from sotohp_spark.operators.postings import encode_shard
from sotohp_spark.operators.wand import score_range

CFG = EngineConfig(block_size=8, range_size=1 << 20)


def make_shards(rng, n_terms=4, n_docs=400, avgdl=50.0):
    """Random posting shards for one doc range + exhaustive truth."""
    shards = []
    weights = {}
    truth: dict[int, float] = {}
    for t in range(n_terms):
        term = f"t{t:02d}"
        df = int(rng.integers(5, n_docs))
        docs = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 30, size=df).astype(np.int64)
        dls = rng.integers(10, 200, size=df).astype(np.int64)
        w = float(rng.uniform(0.2, 3.0))
        weights[term] = w
        (n, first, last, offs, bf, bl, bmax, bmin, payload, _po, _pp) = encode_shard(
            docs, tfs, dls, avgdl, CFG
        )
        shards.append(
            {
                "term": term,
                "n_docs": n,
                "first_doc": first,
                "last_doc": last,
                "block_offsets": offs,
                "block_first_doc": bf.tolist(),
                "block_last_doc": bl.tolist(),
                "block_max_tf": bmax.tolist(),
                "block_min_dl": bmin.tolist(),
                "payload": payload,
            }
        )
        sc = w * bm25.tf_norm(tfs, dls, avgdl, CFG.k1, CFG.b)
        for d, s in zip(docs.tolist(), sc.tolist()):
            truth[d] = truth.get(d, 0.0) + s
    return shards, weights, truth


@pytest.mark.parametrize("seed", range(12))
@pytest.mark.parametrize("k", [1, 5, 20])
def test_wand_equals_exhaustive(seed, k):
    rng = np.random.Generator(np.random.PCG64(seed))
    shards, weights, truth = make_shards(rng)
    docs, scores = score_range(shards, weights, k, avgdl=50.0, cfg=CFG)

    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert list(docs) == [d for d, _ in want]
    assert np.allclose(scores, [s for _, s in want], atol=1e-12, rtol=0)


@pytest.mark.parametrize("seed", range(6))
def test_conjunctive_equals_exhaustive(seed):
    rng = np.random.Generator(np.random.PCG64(100 + seed))
    shards, weights, truth = make_shards(rng, n_terms=3)
    docs, scores = score_range(
        shards, weights, 10, avgdl=50.0, conjunctive=True, cfg=CFG
    )
    # exhaustive conjunctive truth: docs present in ALL terms
    from sotohp_spark.operators.postings import decode_shard_blocks

    per_term_docs = []
    for s in shards:
        d, _, _ = decode_shard_blocks(s["payload"], s["block_offsets"])
        per_term_docs.append(set(d.tolist()))
    common = set.intersection(*per_term_docs)
    want = sorted(
        ((d, truth[d]) for d in common), key=lambda kv: (-kv[1], kv[0])
    )[:10]
    assert list(docs) == [d for d, _ in want]
    assert np.allclose(scores, [s for _, s in want], atol=1e-12, rtol=0)


def test_wand_ties_broken_by_doc_id():
    # identical (tf, dl) everywhere -> all scores tie -> lowest doc ids win
    docs = np.arange(0, 64, dtype=np.int64)
    tfs = np.full(64, 3, dtype=np.int64)
    dls = np.full(64, 40, dtype=np.int64)
    (n, first, last, offs, bf, bl, bmax, bmin, payload, _po, _pp) = encode_shard(
        docs, tfs, dls, 40.0, CFG
    )
    shard = {
        "term": "x",
        "n_docs": n,
        "first_doc": first,
        "last_doc": last,
        "block_offsets": offs,
        "block_first_doc": bf.tolist(),
        "block_last_doc": bl.tolist(),
        "block_max_tf": bmax.tolist(),
        "block_min_dl": bmin.tolist(),
        "payload": payload,
    }
    got, scores = score_range([shard], {"x": 1.0}, 5, avgdl=40.0, cfg=CFG)
    assert list(got) == [0, 1, 2, 3, 4]
    assert len(set(np.round(scores, 12))) == 1
