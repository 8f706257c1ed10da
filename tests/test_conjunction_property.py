"""Property tests for the posting-list conjunction kernels: for random
term -> doc-id sets, encode with the REAL shard encoder and check the
block-skipping intersection (single and batch) against plain Python
set intersection — including delete filtering and absent terms."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sotohp_spark.config import EngineConfig
from sotohp_spark.operators.postings import (
    conjunctive_match,
    conjunctive_match_batch,
    encode_shard,
)

CFG = EngineConfig(range_size=64, block_size=4, ranges_per_batch=2)

_doc_set = st.sets(st.integers(min_value=0, max_value=200), min_size=1, max_size=60)


def _row(term, docs):
    d = np.array(sorted(docs), dtype=np.int64)
    tfs = (d % 5 + 1).astype(np.int64)
    dls = np.full(len(d), 40, dtype=np.int64)
    (n, first, last, offsets, bfirst, blast, bmax_tf, bmin_dl, payload,
     _po, _pp) = encode_shard(d, tfs, dls, avgdl=40.0, cfg=CFG)
    return {
        "term": term,
        "n_docs": n,
        "block_offsets": offsets,
        "block_first_doc": bfirst,
        "block_last_doc": blast,
        "payload": payload,
    }


@settings(max_examples=60, deadline=None)
@given(
    sets=st.lists(_doc_set, min_size=1, max_size=4),
    deletes=st.sets(st.integers(min_value=0, max_value=200), max_size=20),
)
def test_conjunctive_match_equals_set_intersection(sets, deletes):
    rows = [_row(f"t{i}", s) for i, s in enumerate(sets)]
    want = set.intersection(*sets) - set(deletes)
    stats = {}
    got = conjunctive_match(
        rows, deletes=np.array(sorted(deletes), dtype=np.int64), stats=stats
    )
    assert set(got.tolist()) == want
    assert sorted(got.tolist()) == got.tolist()
    assert (
        stats.get("blocks_decoded", 0) + stats.get("blocks_skipped", 0)
        == stats.get("blocks_total", 0)
    )


@settings(max_examples=40, deadline=None)
@given(
    sets=st.lists(_doc_set, min_size=2, max_size=5),
    deletes=st.sets(st.integers(min_value=0, max_value=200), max_size=10),
)
def test_conjunctive_match_batch_equals_per_query(sets, deletes):
    rows = [_row(f"t{i}", s) for i, s in enumerate(sets)]
    # queries: single-term, all-terms, a pair, and one with an absent term
    queries = {
        "single": ["t0"],
        "all": [f"t{i}" for i in range(len(sets))],
        "pair": ["t0", f"t{len(sets) - 1}"],
        "absent": ["t0", "zzz"],
    }
    dels = np.array(sorted(deletes), dtype=np.int64)
    pairs = conjunctive_match_batch(rows, queries, deletes=dels)
    got = {}
    for qid, doc in pairs:
        got.setdefault(qid, set()).add(doc)
    for qid, terms in queries.items():
        if qid == "absent":
            assert qid not in got
            continue
        want = set.intersection(*[sets[int(t[1:])] for t in terms]) - set(
            deletes
        )
        assert got.get(qid, set()) == want, qid
