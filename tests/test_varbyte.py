"""Round-trip property tests for the delta+varbyte codec and the
block-structured shard encoder."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sotohp_spark.config import EngineConfig
from sotohp_spark.operators.postings import decode_shard_blocks, encode_shard
from sotohp_spark.operators.varbyte import (
    delta_decode,
    delta_encode,
    varbyte_decode,
    varbyte_encode,
)


@given(
    st.lists(st.integers(min_value=0, max_value=2**62), max_size=500)
)
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr)), arr)


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=400, unique=True
    )
)
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.int64)
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)


def test_varbyte_known_values():
    # 0 -> single byte 0x80; 127 -> 0xFF; 128 -> 0x00 0x81
    assert varbyte_encode(np.array([0], dtype=np.uint64)) == b"\x80"
    assert varbyte_encode(np.array([127], dtype=np.uint64)) == b"\xff"
    assert varbyte_encode(np.array([128], dtype=np.uint64)) == b"\x00\x81"
    assert list(varbyte_decode(b"\x80\xff\x00\x81")) == [0, 127, 128]


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**7),  # doc_id
            st.integers(min_value=1, max_value=500),  # tf
            st.integers(min_value=1, max_value=5000),  # dl
        ),
        min_size=1,
        max_size=600,
    )
)
@settings(max_examples=50, deadline=None)
def test_shard_roundtrip(rows):
    # dedupe doc ids, keep first
    seen, uniq = set(), []
    for d, tf, dl in rows:
        if d not in seen:
            seen.add(d)
            uniq.append((d, tf, dl))
    d = np.array([r[0] for r in uniq], dtype=np.int64)
    tf = np.array([r[1] for r in uniq], dtype=np.int64)
    dl = np.array([r[2] for r in uniq], dtype=np.int64)
    cfg = EngineConfig(block_size=64)
    (n, first, last, offs, bf, bl, bmax_tf, bmin_dl, payload, _po, _pp) = encode_shard(
        d, tf, dl, 100.0, cfg
    )

    order = np.argsort(d, kind="stable")
    dd, tfd, dld = decode_shard_blocks(payload, offs)
    assert np.array_equal(dd, d[order])
    assert np.array_equal(tfd, tf[order])
    assert np.array_equal(dld, dl[order])
    assert n == len(uniq)
    assert first == int(d.min()) and last == int(d.max())
    assert len(bf) == len(bmax_tf) == len(bmin_dl) == (n + 63) // 64
    # block bounds are exact per-block extrema
    tfs_sorted, dls_sorted = tf[order], dl[order]
    for bi in range(len(bf)):
        assert bmax_tf[bi] == tfs_sorted[bi * 64 : (bi + 1) * 64].max()
        assert bmin_dl[bi] == dls_sorted[bi * 64 : (bi + 1) * 64].min()

    # partial decode: each single block matches its slice
    ds = d[order]
    for bi in range(len(bf)):
        db, _, _ = decode_shard_blocks(payload, offs, [bi])
        assert np.array_equal(db, ds[bi * 64 : (bi + 1) * 64])
        assert db[0] == bf[bi] and db[-1] == bl[bi]
