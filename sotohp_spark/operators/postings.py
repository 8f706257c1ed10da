"""Posting-list construction: (doc_id, term, tf, dl) -> compressed,
block-structured posting shards keyed by (term, range_id).

Physical layout (the engine's answer to the reference's hand-built
LMDB secondary indexes + monthly ES index routing,
MediaServiceLive.scala:1803-1877 / ElasticOperations.scala:91-97):

- ``range_id = doc_id // range_size`` with GLOBAL fixed boundaries:
  every term's shards align on the same doc-id ranges, so query-time
  intersection/union is local to one shard set — no cross-partition
  coordination.
- Hot-term skew (Zipf head) is bounded by construction: a (term,
  range) group holds at most ``range_size`` postings, however hot the
  term; a hot term simply produces more shards.  This is the explicit
  skew salting demanded at 10^12-turn scale — salt = doc range, which
  (unlike hash salts) keeps lists sorted and merge = concatenation.
- Inside a shard, postings are split into blocks of ``block_size``
  docs.  Each block is a self-contained compressed segment
  [varbyte: n, first_doc, gaps..., tfs..., dls...], with byte offsets
  and an idf-free BM25 upper bound stored per block -> block-max WAND
  can skip decoding losing blocks.

Build is a single shuffle: explode tf maps -> groupBy(term, range_id)
.applyInPandas(encode).  The pandas encoder is numpy-vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sotohp_spark.config import EngineConfig, DEFAULT
from sotohp_spark.operators import bm25
from sotohp_spark.operators.varbyte import varbyte_encode

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("range_id", T.IntegerType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("last_doc", T.LongType(), False),
        T.StructField("block_offsets", T.ArrayType(T.IntegerType()), False),
        T.StructField("block_first_doc", T.ArrayType(T.LongType()), False),
        T.StructField("block_last_doc", T.ArrayType(T.LongType()), False),
        # block-max metadata is stored avgdl-FREE: (max tf, min dl) per
        # block; the query computes ub = tf_norm(max_tf, min_dl, avgdl)
        # with the CURRENT global avgdl, so incremental appends (which
        # shift N/avgdl) never invalidate stored pruning bounds.
        T.StructField("block_max_tf", T.ArrayType(T.IntegerType()), False),
        T.StructField("block_min_dl", T.ArrayType(T.IntegerType()), False),
        # payload size as a plain column so metrics/accounting scans
        # never deserialize the payload bytes
        T.StructField("payload_bytes", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
        # OPTIONAL positional payload (cfg.store_positions): per block,
        # a self-delimiting varbyte stream of [npos, first_pos,
        # pos_gaps...] per posting, in the block's doc order; NULL on
        # positionless indexes (the default).  Kept in a SEPARATE
        # column so positionless queries never deserialize a byte of
        # it (parquet column pruning) — Lucene separates .doc/.pos
        # files for the same reason.
        T.StructField("pos_offsets", T.ArrayType(T.IntegerType()), True),
        T.StructField("pos_payload", T.BinaryType(), True),
    ]
)


def encode_shard(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    avgdl: float,
    cfg: EngineConfig = DEFAULT,
    positions=None,
):
    """Encode one (term, range) posting list -> shard fields.

    Returns (n_docs, first_doc, last_doc, block_offsets,
    block_first_doc, block_last_doc, block_max_tf, block_min_dl,
    payload, pos_offsets, pos_payload).  (avgdl/cfg kept for signature
    stability; the stored bound is avgdl-free — see POSTINGS_SCHEMA.)

    ``positions``: optional sequence of per-posting position arrays
    (aligned with ``doc_ids`` BEFORE sorting).  When given, a second
    block-aligned varbyte stream is produced: per posting
    [npos, first_pos, pos_gaps...] — self-delimiting, so decode needs
    no per-doc length table.  When None, (None, None) is returned for
    the positional fields.
    """
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = np.asarray(doc_ids, dtype=np.int64)[order]
    tfs = np.asarray(tfs, dtype=np.int64)[order]
    dls = np.asarray(dls, dtype=np.int64)[order]
    if positions is not None:
        positions = [positions[i] for i in order.tolist()]
    n = doc_ids.size
    bs = cfg.block_size
    nblocks = (n + bs - 1) // bs

    chunks = []
    offsets = [0]
    pos_chunks = []
    pos_offsets = [0]
    bfirst = np.empty(nblocks, dtype=np.int64)
    blast = np.empty(nblocks, dtype=np.int64)
    bmax_tf = np.empty(nblocks, dtype=np.int64)
    bmin_dl = np.empty(nblocks, dtype=np.int64)
    pos = 0
    ppos = 0
    for bi in range(nblocks):
        lo, hi = bi * bs, min((bi + 1) * bs, n)
        d = doc_ids[lo:hi]
        gaps = (d[1:] - d[:-1]).astype(np.uint64)
        header = np.array([hi - lo, d[0]], dtype=np.uint64)
        seg = (
            varbyte_encode(header)
            + varbyte_encode(gaps)
            + varbyte_encode(tfs[lo:hi].astype(np.uint64))
            + varbyte_encode(dls[lo:hi].astype(np.uint64))
        )
        chunks.append(seg)
        pos += len(seg)
        offsets.append(pos)
        bfirst[bi] = d[0]
        blast[bi] = d[-1]
        bmax_tf[bi] = tfs[lo:hi].max()
        bmin_dl[bi] = dls[lo:hi].min()
        if positions is not None:
            # VECTORIZED positional stream: the per-posting layout
            # stays [npos, first_pos, pos_gaps...] (self-delimiting),
            # but all of a block's records are interleaved into ONE
            # uint64 array and varbyte-encoded in ONE call — varbyte
            # is elementwise, so the bytes are identical to per-record
            # encoding while dropping the per-posting Python loop that
            # made the positional build ~1.7x the positionless one
            # (encode microbench: 34x per-posting vs 1.5x vectorized).
            pls = [
                np.asarray(positions[pi], dtype=np.int64)
                for pi in range(lo, hi)
            ]
            sizes = np.array([p.size for p in pls], dtype=np.int64)
            cat = (
                np.concatenate(pls)
                if int(sizes.sum())
                else np.zeros(0, dtype=np.int64)
            )
            # positional_phrase_match packs (doc_id, anchor) into a
            # 64-bit key with the anchor in the low _POS_SHIFT bits;
            # an anchor >= 2^_POS_SHIFT would be silently DROPPED at
            # query time, breaking the documented superset property.
            # Enforce the invariant here, where the index is built,
            # so the violation is loud instead of a silent miss.
            if cat.size and int(cat.max()) >= (1 << _POS_SHIFT):
                bad = next(
                    pi for pi, p in enumerate(pls)
                    if p.size and int(p.max()) >= (1 << _POS_SHIFT)
                )
                raise ValueError(
                    f"token position {int(pls[bad].max())} >= "
                    f"2^{_POS_SHIFT} (doc {int(doc_ids[lo + bad])}): "
                    f"documents longer than {1 << _POS_SHIFT} tokens "
                    "are not supported by positional postings (the "
                    f"phrase key packs the anchor into {_POS_SHIFT} "
                    "bits); split the document or build without "
                    "store_positions"
                )
            starts = np.zeros(sizes.size + 1, dtype=np.int64)
            np.cumsum(sizes, out=starts[1:])
            d = np.empty_like(cat)
            if cat.size:
                d[0] = cat[0]
                d[1:] = cat[1:] - cat[:-1]
                firsts = starts[:-1][sizes > 0]
                d[firsts] = cat[firsts]  # absolute first per posting
            total = int(sizes.sum()) + sizes.size
            vals = np.empty(total, dtype=np.uint64)
            hdr = starts[:-1] + np.arange(sizes.size)
            vals[hdr] = sizes.astype(np.uint64)
            mask = np.ones(total, dtype=bool)
            mask[hdr] = False
            vals[mask] = d.astype(np.uint64)
            pseg = varbyte_encode(vals)
            pos_chunks.append(pseg)
            ppos += len(pseg)
            pos_offsets.append(ppos)

    return (
        int(n),
        int(doc_ids[0]),
        int(doc_ids[-1]),
        offsets,
        bfirst,
        blast,
        bmax_tf,
        bmin_dl,
        b"".join(chunks),
        pos_offsets if positions is not None else None,
        b"".join(pos_chunks) if positions is not None else None,
    )


def decode_shard_blocks(payload: bytes, block_offsets, block_ids=None):
    """Decode selected blocks of a shard payload.

    block_ids None -> all blocks.  Returns (doc_ids, tfs, dls) int64
    arrays concatenated over the selected blocks, in doc order.
    """
    from sotohp_spark.operators.varbyte import varbyte_decode

    buf = np.frombuffer(payload, dtype=np.uint8)
    if block_ids is None:
        block_ids = range(len(block_offsets) - 1)
    docs_out, tfs_out, dls_out = [], [], []
    for bi in block_ids:
        seg = buf[block_offsets[bi] : block_offsets[bi + 1]]
        vals = varbyte_decode(seg.tobytes())
        cnt = int(vals[0])
        first = np.int64(vals[1])
        gaps = vals[2 : 2 + (cnt - 1)].astype(np.int64)
        tf = vals[1 + cnt : 1 + 2 * cnt].astype(np.int64)
        dl = vals[1 + 2 * cnt : 1 + 3 * cnt].astype(np.int64)
        d = np.empty(cnt, dtype=np.int64)
        d[0] = first
        if cnt > 1:
            d[1:] = first + np.cumsum(gaps)
        docs_out.append(d)
        tfs_out.append(tf)
        dls_out.append(dl)
    if not docs_out:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    return (
        np.concatenate(docs_out),
        np.concatenate(tfs_out),
        np.concatenate(dls_out),
    )


def build_postings_df(
    doc_term_tf: DataFrame, avgdl: float, cfg: EngineConfig = DEFAULT
) -> DataFrame:
    """(doc_id, doc_len, term, tf) -> postings shards DataFrame.

    One shuffle on (term, range_id).  The encoder is mapInPandas over
    partitions pre-grouped by repartition + sortWithinPartitions —
    NOT groupBy().applyInPandas(): per-group Arrow round trips are
    ruinous when the Zipf tail produces millions of tiny (term, range)
    groups.  One partition = one pandas pass; group boundaries found
    by vectorized change detection; each group encoded with numpy
    slices.  Partition memory is bounded by shuffle partition count
    (tune spark.sql.shuffle.partitions with data volume)."""
    rs = cfg.range_size

    def encode_partition(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        # stable sort so every (term, range_id) group is contiguous and
        # doc-sorted (encode_shard's argsort then degenerates to a
        # no-op permutation)
        pdf = pdf.sort_values(["term", "range_id", "doc_id"], kind="stable")
        terms = pdf["term"].to_numpy()
        ranges = pdf["range_id"].to_numpy()
        docs = pdf["doc_id"].to_numpy()
        tfs = pdf["tf"].to_numpy()
        dls = pdf["doc_len"].to_numpy()
        poss = (
            pdf["positions"].to_numpy()
            if "positions" in pdf.columns
            else None
        )
        # group boundaries: term change OR range change
        change = np.empty(terms.size, dtype=bool)
        change[0] = True
        np.not_equal(terms[1:], terms[:-1], out=change[1:])
        change[1:] |= ranges[1:] != ranges[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], terms.size)

        rows = []
        for lo, hi in zip(starts.tolist(), ends.tolist()):
            (n, first, last, offsets, bfirst, blast, bmax_tf, bmin_dl,
             payload, p_off, p_pay) = encode_shard(
                docs[lo:hi], tfs[lo:hi], dls[lo:hi], avgdl, cfg,
                positions=(poss[lo:hi] if poss is not None else None),
            )
            rows.append(
                (
                    terms[lo],
                    int(ranges[lo]),
                    n,
                    first,
                    last,
                    list(offsets),
                    bfirst.tolist(),
                    blast.tolist(),
                    bmax_tf.tolist(),
                    bmin_dl.tolist(),
                    len(payload),
                    payload,
                    p_off,
                    p_pay,
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[f.name for f in POSTINGS_SCHEMA.fields],
        )

    with_range = doc_term_tf.withColumn(
        "range_id", (F.col("doc_id") / F.lit(rs)).cast("int")
    )
    return (
        with_range.repartition(cfg.shuffle_partitions, "term", "range_id")
        .mapInPandas(encode_partition, schema=POSTINGS_SCHEMA)
    )


def decode_shard_positions(pos_payload: bytes, pos_offsets, block_ids=None):
    """Decode selected blocks of a positional payload.

    Returns a list of int64 position arrays, one per posting, in the
    SAME order as decode_shard_blocks yields doc ids for the same
    ``block_ids`` — zip them.  Records are self-delimiting
    ([npos, first, gaps...]), so no per-doc length table is needed.
    """
    from sotohp_spark.operators.varbyte import varbyte_decode

    buf = np.frombuffer(pos_payload, dtype=np.uint8)
    if block_ids is None:
        block_ids = range(len(pos_offsets) - 1)
    out = []
    for bi in block_ids:
        seg = buf[pos_offsets[bi]: pos_offsets[bi + 1]]
        vals = varbyte_decode(seg.tobytes()).astype(np.int64)
        i = 0
        while i < vals.size:
            npos = int(vals[i])
            rec = vals[i + 1: i + 1 + npos]
            p = np.empty(npos, dtype=np.int64)
            if npos:
                p[0] = rec[0]
                if npos > 1:
                    p[1:] = rec[0] + np.cumsum(rec[1:])
            out.append(p)
            i += 1 + npos
    return out


# positional match keys pack (doc_id, anchor) into one int64:
# anchor = token position of the phrase start, < 2^24 (a 16M-token
# conversation; longer docs would need a wider key), leaving 39 bits
# for doc_id — ~5*10^11 documents, comfortably past the 10^12-TURN
# target (docs are whole conversations, ~20 turns each).
_POS_SHIFT = 24


def positional_phrase_match(rows, phrase_offsets, deletes=None, stats=None):
    """Exact phrase match from POSITIONS — no text access.

    ``rows``: shard dicts of ONE doc-id range, carrying pos_offsets /
    pos_payload (built with cfg.store_positions).
    ``phrase_offsets``: [(term, rel_offset)] from
    tokenize_with_positions(phrase) with the first kept token at
    offset 0 (a dropped phrase token leaves a GAP in the offsets, so
    "error 2024 retry" demands pos(retry) == pos(error) + 2).

    Two phases, both block-skipping:
      1. candidate docs via the positionless rarest-first conjunction
         (conjunctive_match — reuses its block-max skipping and its
         stats instrumentation);
      2. for each distinct term, decode positions ONLY for blocks
         overlapping a surviving candidate, then intersect
         (doc, pos - offset) anchor keys across the phrase terms,
         rarest pair first.

    Returns a sorted int64 doc-id array.
    """
    if not rows or not phrase_offsets:
        return np.zeros(0, dtype=np.int64)
    cand = conjunctive_match(rows, deletes, stats)
    if cand.size == 0:
        return cand
    by_term: dict = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(r)

    # (doc, anchor) key arrays per (term, offset) pair
    key_sets = []
    term_keys: dict = {}
    for term, off in phrase_offsets:
        if term not in term_keys:
            term_keys[term] = _decode_term_positions(
                by_term.get(term, ()), cand
            )
        docs_all, pos_all = term_keys[term]
        anchor = pos_all - off
        ok = (anchor >= 0) & (anchor < (1 << _POS_SHIFT))
        key_sets.append(
            np.unique((docs_all[ok] << _POS_SHIFT) | anchor[ok])
        )

    key_sets.sort(key=len)
    keys = key_sets[0]
    for ks in key_sets[1:]:
        if keys.size == 0:
            break
        keys = np.intersect1d(keys, ks, assume_unique=True)
    return np.unique(keys >> _POS_SHIFT)


def score_doc_set(rows, weights, avgdl, doc_ids,
                  cfg: EngineConfig = DEFAULT) -> np.ndarray:
    """Exact BM25 scores for a GIVEN sorted-unique doc-id set over one
    range's shards — the membership is decided elsewhere (a phrase
    match, a filter), scoring stays the standard scorer (Lucene
    filter-query semantics: membership changes, collection stats and
    per-term weights do not).

    Decodes ONLY blocks whose fences overlap the doc set; terms
    without a weight contribute nothing.  Accumulation follows the
    canonical (term, first_doc) ascending order score_range uses, so
    scores are bit-identical to the WAND path and the SQL oracle at
    6-dp rounding.  Returns float64 scores aligned with ``doc_ids``.
    """
    scores = np.zeros(doc_ids.size, dtype=np.float64)
    if doc_ids.size == 0:
        return scores
    for r in sorted(rows, key=lambda s: (s["term"], s.get("first_doc", 0))):
        w = weights.get(r["term"])
        if w is None:
            continue
        bf = np.asarray(r["block_first_doc"], dtype=np.int64)
        bl = np.asarray(r["block_last_doc"], dtype=np.int64)
        lo = np.searchsorted(doc_ids, bf, side="left")
        hi = np.searchsorted(doc_ids, bl, side="right")
        keep = np.nonzero(hi > lo)[0].tolist()
        if not keep:
            continue
        dd, tf, dl = decode_shard_blocks(
            r["payload"], r["block_offsets"], keep
        )
        sel = np.isin(dd, doc_ids, assume_unique=True)
        if not sel.any():
            continue
        idx = np.searchsorted(doc_ids, dd[sel])
        scores[idx] += w * bm25.tf_norm(
            tf[sel], dl[sel], avgdl, cfg.k1, cfg.b
        )
    return scores


def phrase_match_scored(rows, phrase_offsets, weights, avgdl,
                        cfg: EngineConfig = DEFAULT, deletes=None,
                        stats=None):
    """Phrase-RANKED kernel for one doc-id range: exact positional
    phrase membership (positional_phrase_match — block-skipping
    conjunction then anchor intersection) followed by an exact BM25
    score of ONLY the matched docs, from the same decoded shards.

    One pass over one range's rows serves both membership and
    relevance — the engine-side analog of Lucene's phrase query
    scoring (ES ``match_phrase``: phrase containment gates, BM25 over
    the phrase terms ranks).  Returns (doc_ids int64[], scores
    float64[]), doc-sorted.
    """
    matched = positional_phrase_match(rows, phrase_offsets, deletes, stats)
    if matched.size == 0:
        return matched, np.zeros(0, dtype=np.float64)
    return matched, score_doc_set(rows, weights, avgdl, matched, cfg)


def positional_phrase_match_batch(rows, phrase_offsets, deletes=None):
    """Positional phrase matches for MANY queries over one doc-id
    range in one decode pass — the positional analog of
    conjunctive_match_batch: each term's postings AND positions are
    decoded at most once and shared by every phrase referencing it
    (contamination screens probe thousands of phrases whose Zipf-head
    terms repeat constantly).

    ``phrase_offsets``: query_id -> [(term, rel_offset)]
    (QueryEngine._phrase_offsets semantics).  Queries with a term
    absent from this range yield no rows.  Returns [(query_id,
    doc_id)] pairs.
    """
    if not rows or not phrase_offsets:
        return []
    needed = set()
    for offs in phrase_offsets.values():
        needed.update(t for t, _ in offs)
    decoded: dict = {}
    for r in rows:
        if r["term"] not in needed:
            continue
        if r.get("pos_payload") is None:
            raise ValueError(
                f"shard for term {r['term']!r} has no positional "
                f"payload — index built without store_positions"
            )
        dd, _, _ = decode_shard_blocks(r["payload"], r["block_offsets"])
        pl = decode_shard_positions(r["pos_payload"], r["pos_offsets"])
        doc_parts, pos_parts = [], []
        for di in range(dd.size):
            p = pl[di]
            if p.size:
                doc_parts.append(np.full(p.size, dd[di], dtype=np.int64))
                pos_parts.append(p)
        if doc_parts:
            da = np.concatenate(doc_parts)
            pa = np.concatenate(pos_parts)
        else:
            da = np.zeros(0, dtype=np.int64)
            pa = np.zeros(0, dtype=np.int64)
        prev = decoded.get(r["term"])
        decoded[r["term"]] = (
            (da, pa)
            if prev is None
            else (
                np.concatenate([prev[0], da]),
                np.concatenate([prev[1], pa]),
            )
        )
    out = []
    for qid, offs in phrase_offsets.items():
        if any(t not in decoded for t, _ in offs):
            continue
        key_sets = []
        for t, off in offs:
            da, pa = decoded[t]
            anchor = pa - off
            ok = (anchor >= 0) & (anchor < (1 << _POS_SHIFT))
            key_sets.append(np.unique((da[ok] << _POS_SHIFT) | anchor[ok]))
        key_sets.sort(key=len)
        keys = key_sets[0]
        for ks in key_sets[1:]:
            if keys.size == 0:
                break
            keys = np.intersect1d(keys, ks, assume_unique=True)
        cand = np.unique(keys >> _POS_SHIFT)
        if deletes is not None and len(deletes) and cand.size:
            cand = cand[~np.isin(cand, deletes)]
        out.extend((qid, int(d)) for d in cand)
    return out


def conjunctive_match(rows, deletes=None, stats=None, with_dl=False):
    """Doc ids present in EVERY term's postings among ``rows`` (shard
    dicts of one doc-id range) — rarest-first block-skipping
    intersection, the positionless analog of Lucene's leapfrog
    (galloping) conjunction:

      1. decode the term with the fewest docs in full — its posting
         list IS the initial candidate set;
      2. for each remaining term in ascending df order, decode ONLY
         the blocks whose [first_doc, last_doc] span overlaps a
         surviving candidate (binary search on the sorted candidate
         array against the block fences), then intersect.

    With one selective term and N-1 Zipf-head terms the hot lists are
    mostly SKIPPED, not decoded — the dominant phrase-query shape.
    ``stats`` (optional dict) accumulates blocks_total /
    blocks_decoded / blocks_skipped as evidence.

    ``rows``: dicts with term, n_docs, block_offsets, block_first_doc,
    block_last_doc, payload.  Returns a sorted int64 array — or, with
    ``with_dl=True``, ``(ids, dls)``: each survivor's BM25 document
    length, read from the FIRST (rarest, fully decoded) term's
    posting stream at zero extra decode cost.  A doc_len-keyed
    aggregation (percentiles / histogram / range / stats) can then
    skip the docs-table join entirely.
    """
    def _empty():
        ids = np.zeros(0, dtype=np.int64)
        return (ids, np.zeros(0, dtype=np.int64)) if with_dl else ids

    if not rows:
        return _empty()
    by_term: dict = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(r)
    ordered = sorted(
        by_term.values(), key=lambda rs: sum(r["n_docs"] for r in rs)
    )

    def bump(key, n):
        if stats is not None:
            stats[key] = stats.get(key, 0) + n

    cand = None
    first_dd = first_dl = None
    for rs in ordered:
        if cand is not None and cand.size == 0:
            # count the never-touched lists as fully skipped
            for row in rs:
                nb = len(row["block_offsets"]) - 1
                bump("blocks_total", nb)
                bump("blocks_skipped", nb)
            continue
        parts, dl_parts = [], []
        for row in rs:
            nblocks = len(row["block_offsets"]) - 1
            bump("blocks_total", nblocks)
            if cand is None:
                ids = None
                bump("blocks_decoded", nblocks)
            else:
                bf = np.asarray(row["block_first_doc"], dtype=np.int64)
                bl = np.asarray(row["block_last_doc"], dtype=np.int64)
                lo = np.searchsorted(cand, bf, side="left")
                hi = np.searchsorted(cand, bl, side="right")
                keep = np.nonzero(hi > lo)[0]
                bump("blocks_decoded", int(keep.size))
                bump("blocks_skipped", nblocks - int(keep.size))
                if keep.size == 0:
                    continue
                ids = keep.tolist()
            dd, _, dl = decode_shard_blocks(
                row["payload"], row["block_offsets"], ids
            )
            parts.append(dd)
            if with_dl and cand is None:
                dl_parts.append(dl)
        if parts:
            concat = np.concatenate(parts)
            if with_dl and cand is None:
                # keep the rarest term's dl aligned through the sort
                # (shards of one term are disjoint; unique is a
                # stable safety net)
                dls = np.concatenate(dl_parts)
                order = np.argsort(concat, kind="stable")
                sdd, sdl = concat[order], dls[order]
                uniq = np.empty(sdd.size, dtype=bool)
                if sdd.size:
                    uniq[0] = True
                    np.not_equal(sdd[1:], sdd[:-1], out=uniq[1:])
                first_dd, first_dl = sdd[uniq], sdl[uniq]
                dd = first_dd
            else:
                dd = np.unique(concat)
        else:
            dd = np.zeros(0, dtype=np.int64)
        cand = dd if cand is None else np.intersect1d(cand, dd, assume_unique=True)
    if cand is None:
        return _empty()
    if deletes is not None and len(deletes) and cand.size:
        cand = cand[~np.isin(cand, deletes)]
    if not with_dl:
        return cand
    if cand.size == 0 or first_dd is None:
        return cand, np.zeros(0, dtype=np.int64)
    pos = np.searchsorted(first_dd, cand)
    return cand, first_dl[pos].astype(np.int64)


def conjunctive_match_batch(rows, phrase_terms, deletes=None):
    """Conjunctions for MANY queries over one doc-id range in one
    decode pass: each term's posting list is decoded AT MOST ONCE and
    shared by every query that references it (the batch amortization —
    a contamination screen probes thousands of phrases whose Zipf-head
    terms repeat constantly; per-query block skipping would re-decode
    the shared hot terms per phrase and lose the amortization).

    ``phrase_terms``: query_id -> list of terms.  Queries whose terms
    are not all present in this range yield no rows (the caller owns
    global absent-term semantics).  Returns a list of (query_id,
    doc_id) pairs.
    """
    if not rows:
        return []
    needed = set()
    for terms in phrase_terms.values():
        needed.update(terms)
    arrays: dict = {}
    for r in rows:
        if r["term"] not in needed:
            continue
        dd, _, _ = decode_shard_blocks(r["payload"], r["block_offsets"])
        prev = arrays.get(r["term"])
        arrays[r["term"]] = (
            dd if prev is None else np.unique(np.concatenate([prev, dd]))
        )
    out = []
    for qid, terms in phrase_terms.items():
        if any(t not in arrays for t in terms):
            continue
        arrs = sorted((arrays[t] for t in terms), key=len)
        cand = arrs[0]
        for a in arrs[1:]:
            if cand.size == 0:
                break
            cand = np.intersect1d(cand, a, assume_unique=True)
        if deletes is not None and len(deletes) and cand.size:
            cand = cand[~np.isin(cand, deletes)]
        out.extend((qid, int(d)) for d in cand)
    return out


def _decode_term_positions(rows_for_term: list, cand: np.ndarray):
    """(docs_all, pos_all) for one term restricted to ``cand`` docs —
    the decode pattern positional_phrase_match uses, factored for the
    span matcher.  docs_all is ascending (blocks are doc-ordered) and
    each doc's positions are contiguous."""
    doc_parts, pos_parts = [], []
    for row in rows_for_term:
        if row.get("pos_payload") is None:
            raise ValueError(
                f"shard for term {row['term']!r} has no positional "
                f"payload — index built without store_positions"
            )
        bf = np.asarray(row["block_first_doc"], dtype=np.int64)
        bl = np.asarray(row["block_last_doc"], dtype=np.int64)
        lo = np.searchsorted(cand, bf, side="left")
        hi = np.searchsorted(cand, bl, side="right")
        keep = np.nonzero(hi > lo)[0].tolist()
        if not keep:
            continue
        dd, _, _ = decode_shard_blocks(
            row["payload"], row["block_offsets"], keep
        )
        pl = decode_shard_positions(
            row["pos_payload"], row["pos_offsets"], keep
        )
        sel = np.isin(dd, cand, assume_unique=True)
        for di in np.nonzero(sel)[0].tolist():
            p = pl[di]
            if p.size:
                doc_parts.append(np.full(p.size, dd[di], dtype=np.int64))
                pos_parts.append(p)
    if doc_parts:
        return np.concatenate(doc_parts), np.concatenate(pos_parts)
    return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)


def span_near_match(rows, terms: list, slop: int, in_order: bool,
                    deletes=None) -> np.ndarray:
    """Docs of ONE range containing the DISTINCT ``terms`` with some
    occurrence selection spanning at most len(terms) - 1 + slop
    positions (optionally in term order) — Lucene SpanNearQuery over
    the analyzed position stream.

    Candidates come from the block-skipping conjunction first (every
    term must be present at all), each term's position stream decodes
    ONCE, and the span predicate is evaluated over packed
    ``(doc << _POS_SHIFT) | pos`` keys with NO per-doc loop:

    - ordered: a vectorized greedy next-position chain over ALL start
      occurrences at once — searchsorted on the packed keys finds the
      first same-doc position after the previous term's (a hit in a
      later doc kills that start), and taking the FIRST next position
      minimizes the reachable end for every start, so existence is
      exact;
    - unordered: every occurrence of every term is an anchor (a valid
      selection's minimum position is one), and a selection within the
      window exists iff every term's first packed key >= the anchor is
      within ``window`` of it AND in the same doc — the same-doc mask
      is NOT implied by the distance test: near the key-space edge,
      2**_POS_SHIFT + p2 - p1 can be <= window when p1 approaches the
      position-width limit (pinned by
      test_span_near_unordered_key_space_edge).

    The position-width invariant (positions < 2**_POS_SHIFT, enforced
    at encode) is what makes packed-key arithmetic carry both the doc
    identity and the distance.  Returns a sorted int64 doc-id array.
    """
    if not rows or not terms:
        return np.zeros(0, dtype=np.int64)
    window = len(terms) - 1 + int(slop)
    if window >= (1 << _POS_SHIFT):
        raise ValueError(
            f"slop window {window} exceeds the positional key width "
            f"2^{_POS_SHIFT}"
        )
    cand = conjunctive_match(rows, deletes)
    if cand.size == 0:
        return cand
    by_term: dict = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(r)
    keys: dict = {}
    for t in terms:
        da, pa = _decode_term_positions(by_term.get(t, ()), cand)
        if da.size == 0:
            return np.zeros(0, dtype=np.int64)
        keys[t] = np.sort((da << _POS_SHIFT) | pa.astype(np.int64))

    if in_order:
        start = keys[terms[0]]
        last = start
        for t in terms[1:]:
            kt = keys[t]
            idx = np.searchsorted(kt, last, side="right")
            ok = idx < kt.size
            start, idx = start[ok], idx[ok]
            if start.size == 0:
                return np.zeros(0, dtype=np.int64)
            nxt = kt[idx]
            same = (nxt >> _POS_SHIFT) == (start >> _POS_SHIFT)
            start, nxt = start[same], nxt[same]
            if start.size == 0:
                return np.zeros(0, dtype=np.int64)
            last = nxt
        hit = (last - start) <= window  # same doc -> pure position diff
        return np.unique(start[hit] >> _POS_SHIFT)

    anchors = np.unique(np.concatenate(list(keys.values())))
    ok = np.ones(anchors.size, dtype=bool)
    for t in terms:
        kt = keys[t]
        idx = np.searchsorted(kt, anchors, side="left")
        in_range = idx < kt.size
        cond = np.zeros(anchors.size, dtype=bool)
        nxt = kt[idx[in_range]]
        anc = anchors[in_range]
        # explicit same-doc mask: an anchor position within `window`
        # of 2^_POS_SHIFT would otherwise accept the NEXT doc's early
        # position (2^_POS_SHIFT + p2 - p1 <= window is reachable when
        # p1 is near the width limit) — the distance test alone is NOT
        # doc-safe at the key-space edge
        cond[in_range] = (
            ((nxt >> _POS_SHIFT) == (anc >> _POS_SHIFT))
            & ((nxt - anc) <= window)
        )
        ok &= cond
        if not ok.any():
            return np.zeros(0, dtype=np.int64)
    return np.unique(anchors[ok] >> _POS_SHIFT)
