"""Top-k scoring within one doc-id range: block-max pruning + exact BM25.

Classic WAND/BMW is pointer-chasing — hostile to a vectorized runtime.
This is a vectorized block-max formulation over the aligned doc-range
shards:

1. every compressed block of every query term carries
   [first_doc, last_doc, ub] where ub is its idf-free BM25 upper
   bound; multiply by idf at query time;
2. an interval sweep over block boundaries yields the piecewise-
   constant upper bound U(doc) = sum of overlapping blocks' idf*ub;
3. intervals are processed in descending U order; once U <= theta
   (current k-th best exact score) the remaining intervals — and
   every block only they cover — are never decoded;
4. surviving blocks are decoded (varbyte) and scored exactly with
   numpy; ties broken by ascending doc_id.

Conjunctive (AND) mode intersects decoded doc ids across all query
terms before scoring (posting-list intersection, the reference's
`mediaSearch` AND semantics, MediaServiceLive.scala:108-112); ranges
missing any query term are skipped before decode.

Equivalence to the exhaustive scorer is pytest-enforced
(tests/test_wand.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from sotohp_spark.config import EngineConfig, DEFAULT
from sotohp_spark.operators import bm25
from sotohp_spark.operators.postings import decode_shard_blocks


@dataclass(frozen=True)
class BoolSpec:
    """Compiled eligibility of an ES ``bool`` query for the per-range
    scorer: clause GROUPS as bit positions.

    A match clause ("error retry") matches a doc iff the doc contains
    ANY of its analyzed terms, so per doc the scorer needs the set of
    matched CLAUSES, not just the matched-term count.  Each clause
    group gets one bit; a term carries the OR of the bits of every
    group that contains it (a term may appear in several clauses).
    Eligibility: all ``must_mask`` bits present, and at least
    ``min_should`` of the ``should_bits`` present.  Scoring (the
    boosted weight sum) is orthogonal — weights are pre-merged per
    term on the driver; this spec only gates membership.

    Pruning validity is the min_match argument again: the all-blocks
    interval bound U also bounds any eligible doc's exact score, and
    theta builds only from eligible docs, so a pruned interval cannot
    hide an eligible doc outscoring theta.
    """

    term_bits: dict        # term -> int bitmask of its clause groups
    must_mask: int = 0     # doc eligible iff (mask & must_mask) == must_mask
    should_bits: tuple = ()  # bit values of the should groups
    min_should: int = 0    # required count of matched should groups


def _bool_eligible(masks: np.ndarray, spec: BoolSpec) -> np.ndarray:
    """Vectorized BoolSpec eligibility over per-doc group masks."""
    ok = (masks & spec.must_mask) == spec.must_mask
    if spec.min_should > 0 and spec.should_bits:
        cnt = np.zeros(masks.shape, dtype=np.int64)
        for b in spec.should_bits:
            cnt += (masks & b) != 0
        ok &= cnt >= spec.min_should
    return ok


def score_range(
    shards: list,
    term_weights: dict,
    k: int,
    avgdl,
    conjunctive: bool = False,
    cfg: EngineConfig = DEFAULT,
    deletes: np.ndarray | None = None,
    doc_bounds: tuple | None = None,
    stats: dict | None = None,
    cursor: tuple | None = None,
    min_match: int | None = None,
    bool_spec: BoolSpec | None = None,
):
    """Score one doc-id range.

    ``shards``: list of dict-like rows with keys term, n_docs,
    block_offsets, block_first_doc, block_last_doc, block_max_tf, block_min_dl, payload
    (one per query term present in this range).
    ``term_weights``: term -> qtf * idf  (precomputed on the driver).
    ``doc_bounds``: optional inclusive doc-id window(s) — one (lo, hi)
    tuple or a list of disjoint tuples (time-filtered search: doc ids
    are time-ordered WITHIN each index segment, so a timestamp range is
    one doc-id interval per segment — appends create new segments).
    Scores keep GLOBAL collection stats (Lucene filter-query semantics:
    a filter changes membership, not scoring).

    ``cursor``: optional (score, doc_id) from a previous page — only
    docs STRICTLY after it in (score desc, doc_id asc) order are
    returned (the ES search_after shape).  The exclusion applies to
    EXACT scores, so block-max pruning stays valid: theta builds from
    cursor-eligible docs only, and any unprocessed interval's docs
    score below theta regardless of eligibility.  Low-scoring docs
    become eligible on deep pages, so late pages decode more blocks —
    the same cost profile Lucene's searchAfter has.  Cursor equality
    is float64-exact, which holds because cursors come from a previous
    page of the SAME deterministic summation.

    ``min_match``: minimum number of DISTINCT query terms a doc must
    contain (the ES/Lucene ``minimum_should_match`` N-of-M bool-query
    shape; disjunctive path only — ``conjunctive`` already means
    min_match == n_terms).  Block-max pruning stays valid: the
    all-terms interval bound U also bounds any term-subset's score,
    and theta builds only from count-eligible docs, so a pruned
    interval can't hide an eligible doc outscoring theta.  Exactness
    is structural — a doc's interval decodes ALL covering blocks, so
    the per-doc contribution multiplicity IS its distinct matched-term
    count (one posting per term per doc).

    ``stats``: optional dict the call ACCUMULATES block-max pruning
    evidence into (keys blocks_total / blocks_decoded / blocks_skipped)
    — the proof that the machinery actually skips on Zipf-head terms,
    not just that it is rank-equivalent (tests/test_wand_skip.py).

    ``bool_spec``: compiled ES ``bool`` eligibility (clause groups as
    bits — see BoolSpec).  Disjunctive path only; mutually exclusive
    with ``conjunctive`` and ``min_match`` (a bool query compiles its
    own AND/N-of-M semantics into groups).

    Returns (doc_ids int64[], scores float64[]) of the local top-k.
    ``k=None`` is the no-cut scored-export mode: every match returns
    with its exact score, unordered, and the running-threshold upkeep
    (which could never trigger) is skipped entirely.
    """
    if bool_spec is not None and (conjunctive or min_match is not None):
        raise ValueError(
            "bool_spec compiles its own conjunction/N-of-M semantics; "
            "do not combine with conjunctive/min_match"
        )
    # ``avgdl`` may be a PER-TERM dict (term -> that term's collection
    # avgdl): field-tagged keys of a multi-field most_fields query
    # normalize with their field's own avgdl while sharing this whole
    # block-max machinery (a tagged key is just another term; its
    # bounds and exact scores both use its own avgdl, so pruning
    # validity is unchanged)
    if isinstance(avgdl, dict):
        _adl = avgdl.__getitem__
    else:
        _a = float(avgdl)

        def _adl(_t):
            return _a
    if not shards:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)
    cur_mask = None
    if cursor is not None:
        c_s, c_d = float(cursor[0]), int(cursor[1])

        def cur_mask(dd: np.ndarray, ss: np.ndarray) -> np.ndarray:
            return (ss < c_s) | ((ss == c_s) & (dd > c_d))

    bounds_mask = None
    if doc_bounds is not None:
        ivs = sorted(
            [doc_bounds] if isinstance(doc_bounds, tuple) else list(doc_bounds)
        )
        if not ivs:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)
        iv_starts = np.array([lo for lo, _ in ivs], dtype=np.int64)
        iv_ends = np.array([hi for _, hi in ivs], dtype=np.int64)
        lo_b, hi_b = int(iv_starts[0]), int(iv_ends.max())

        def bounds_mask(dd: np.ndarray) -> np.ndarray:
            pos = np.searchsorted(iv_starts, dd, side="right") - 1
            ok = pos >= 0
            ok[ok] = dd[ok] <= iv_ends[pos[ok]]
            return ok

        # whole-shard pruning on the coarse envelope; exact interval
        # membership is applied to decoded ids via bounds_mask
        shards = [
            s
            for s in shards
            if s["last_doc"] >= lo_b and s["first_doc"] <= hi_b
        ]
        if not shards:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)

    # canonical float-summation order: contributions accumulate by
    # (term, block) ascending — the oracle sums per-doc in the same
    # sorted-term order, so scores agree bit-for-bit.
    shards = sorted(shards, key=lambda s: (s["term"], s.get("first_doc", 0)))

    if conjunctive:
        if len({s["term"] for s in shards}) < len(term_weights):
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)
        if stats is not None:
            n_blocks = sum(len(s["block_offsets"]) for s in shards)
            stats["blocks_total"] = stats.get("blocks_total", 0) + n_blocks
            stats["blocks_decoded"] = stats.get("blocks_decoded", 0) + n_blocks
            stats["blocks_skipped"] = stats.get("blocks_skipped", 0)
        return _score_conjunctive(
            shards, term_weights, k, _adl, cfg, deletes, bounds_mask,
            cur_mask,
        )

    # ---- disjunctive block-max path ----
    # gather all blocks: (start, end, weighted_ub, shard_idx, block_idx)
    starts, ends, ubs, sidx, bidx = [], [], [], [], []
    for si, s in enumerate(shards):
        w = term_weights[s["term"]]
        bf = np.asarray(s["block_first_doc"], dtype=np.int64)
        bl = np.asarray(s["block_last_doc"], dtype=np.int64)
        # avgdl-free stored bound -> evaluate with the CURRENT avgdl
        ub = w * bm25.tf_norm(
            np.asarray(s["block_max_tf"], dtype=np.float64),
            np.asarray(s["block_min_dl"], dtype=np.float64),
            _adl(s["term"]),
            cfg.k1,
            cfg.b,
        )
        bi = np.arange(bf.size, dtype=np.int64)
        if bounds_mask is not None:
            keep = (bl >= lo_b) & (bf <= hi_b)
            bf, bl, ub, bi = bf[keep], bl[keep], ub[keep], bi[keep]
        starts.append(bf)
        ends.append(bl)
        ubs.append(ub)
        sidx.append(np.full(bf.size, si, dtype=np.int64))
        bidx.append(bi)
    starts = np.concatenate(starts)
    ends = np.concatenate(ends)
    ubs = np.concatenate(ubs)
    sidx = np.concatenate(sidx)
    bidx = np.concatenate(bidx)

    # interval sweep: boundaries where the active block set changes
    bounds = np.unique(np.concatenate([starts, ends + 1]))
    # U(interval i) = sum of ub over blocks covering [bounds[i], bounds[i+1])
    n_iv = bounds.size - 1
    if n_iv <= 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)
    add_at = np.searchsorted(bounds, starts)
    rem_at = np.searchsorted(bounds, ends + 1)
    delta = np.zeros(bounds.size, dtype=np.float64)
    np.add.at(delta, add_at, ubs)
    np.subtract.at(delta, rem_at, ubs)
    U = np.cumsum(delta)[:n_iv]

    order = np.argsort(-U, kind="stable")
    block_cache: dict = {}  # (shard_idx, block_idx) -> (doc_ids, partial_scores)
    done_docs: list = []  # per-interval doc arrays (mutually disjoint)
    done_scores: list = []
    total_done = 0
    topk_scores = np.zeros(0, dtype=np.float64)  # running k best
    theta = -np.inf

    # Process intervals in descending upper-bound order.  A doc's exact
    # score is fully accumulated when ITS interval is processed (all
    # blocks overlapping the interval are decoded then); docs of
    # never-processed intervals are never emitted, so every returned
    # score is exact.  Pruning is strict (<) so upper-bound ties with
    # theta are still scored — exact-tie rank identity vs the oracle.
    # All accumulation is vectorized: per interval, the covering block
    # slices are concatenated in term order (shards pre-sorted) and
    # grouped with a stable sort, so each doc's contributions still sum
    # in ascending-term order (bit-identical to the oracle).
    for ii in order:
        if k is not None and total_done >= k and U[ii] < theta:
            break
        lo, hi = bounds[ii], bounds[ii + 1] - 1
        hit = np.flatnonzero((starts <= hi) & (ends >= lo))
        piece_d, piece_s, piece_g = [], [], []
        for j in hit:
            key = (int(sidx[j]), int(bidx[j]))
            if key not in block_cache:
                s = shards[sidx[j]]
                d, tf, dl = decode_shard_blocks(
                    s["payload"], s["block_offsets"], [int(bidx[j])]
                )
                w = term_weights[s["term"]]
                block_cache[key] = (
                    d,
                    w * bm25.tf_norm(tf, dl, _adl(s["term"]),
                                     cfg.k1, cfg.b),
                )
            d, sc = block_cache[key]
            a, z = np.searchsorted(d, lo), np.searchsorted(d, hi, side="right")
            if z > a:
                piece_d.append(d[a:z])
                piece_s.append(sc[a:z])
                if bool_spec is not None:
                    piece_g.append(
                        bool_spec.term_bits.get(
                            shards[sidx[j]]["term"], 0
                        )
                    )
        if not piece_d:
            continue
        if bool_spec is not None and len(piece_d) == 1:
            # one covering piece == one matched clause-group set; the
            # scalar eligibility test covers every doc in the piece
            if not bool(
                _bool_eligible(
                    np.array([piece_g[0]], dtype=np.int64), bool_spec
                )[0]
            ):
                continue
        dd = np.concatenate(piece_d)
        ss = np.concatenate(piece_s)
        gg = (
            np.concatenate(
                [
                    np.full(p.size, g, dtype=np.int64)
                    for p, g in zip(piece_d, piece_g)
                ]
            )
            if bool_spec is not None and len(piece_d) > 1
            else None
        )
        if bounds_mask is not None:
            keep = bounds_mask(dd)
            if not keep.all():
                dd, ss = dd[keep], ss[keep]
                gg = gg[keep] if gg is not None else None
            if dd.size == 0:
                continue
        if deletes is not None and deletes.size:
            keep = ~_is_deleted(dd, deletes)
            if not keep.all():
                dd, ss = dd[keep], ss[keep]
                gg = gg[keep] if gg is not None else None
            if dd.size == 0:
                continue
        if len(piece_d) > 1:
            o = np.argsort(dd, kind="stable")  # stable: term order kept per doc
            dd, ss = dd[o], ss[o]
            uniq = np.empty(dd.size, dtype=bool)
            uniq[0] = True
            np.not_equal(dd[1:], dd[:-1], out=uniq[1:])
            grp = np.cumsum(uniq) - 1
            out_d = dd[uniq]
            out_s = np.zeros(out_d.size, dtype=np.float64)
            np.add.at(out_s, grp, ss)
            if min_match is not None and min_match > 1:
                # contribution multiplicity == distinct matched terms
                # (one posting per term per doc, all terms' covering
                # blocks decoded at the doc's own interval)
                cnt = np.bincount(grp, minlength=out_d.size)
                keep = cnt >= min_match
                out_d, out_s = out_d[keep], out_s[keep]
                if out_d.size == 0:
                    continue
            if gg is not None:
                # per-doc clause-group mask = OR of its contributions'
                # bits (same completeness argument as min_match: ALL
                # covering blocks decode at the doc's own interval)
                gg = gg[o]
                out_g = np.zeros(out_d.size, dtype=np.int64)
                np.bitwise_or.at(out_g, grp, gg)
                keep = _bool_eligible(out_g, bool_spec)
                out_d, out_s = out_d[keep], out_s[keep]
                if out_d.size == 0:
                    continue
            dd, ss = out_d, out_s
        elif min_match is not None and min_match > 1:
            # a single covering piece means every doc here matched
            # exactly one query term — none can reach min_match
            continue
        if cur_mask is not None:
            # scores here are EXACT (all covering blocks of this
            # interval decoded), so the page membership test is final
            keep = cur_mask(dd, ss)
            if not keep.all():
                dd, ss = dd[keep], ss[keep]
            if dd.size == 0:
                continue
        done_docs.append(dd)
        done_scores.append(ss)
        total_done += dd.size
        if k is None:
            # no-cut mode (scored export): theta can never trigger, so
            # maintaining the running top-k would just re-copy every
            # scored doc per interval — O(docs * intervals) for nothing
            continue
        # running exact top-k threshold, O(interval + k)
        cand = np.concatenate([topk_scores, ss])
        if cand.size > k:
            topk_scores = np.partition(cand, cand.size - k)[cand.size - k :]
        else:
            topk_scores = cand
        if topk_scores.size >= k:
            theta = float(topk_scores.min())

    if stats is not None:
        stats["blocks_total"] = stats.get("blocks_total", 0) + int(starts.size)
        stats["blocks_decoded"] = stats.get("blocks_decoded", 0) + len(block_cache)
        stats["blocks_skipped"] = (
            stats.get("blocks_skipped", 0) + int(starts.size) - len(block_cache)
        )
    if not done_docs:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)
    docs = np.concatenate(done_docs)
    scs = np.concatenate(done_scores)
    if k is None:
        # scored export: every match, no order contract, no cut
        return docs, scs
    # top-k with (score desc, doc asc) tie-break
    sel = np.lexsort((docs, -scs))[:k]
    return docs[sel], scs[sel]


def score_range_multi(
    shards: list,
    term_weights: dict,
    term_field: dict,
    field_avgdl: list,
    k: int | None,
    cfg: EngineConfig = DEFAULT,
    deletes: np.ndarray | None = None,
    combine: str = "best",
    term_tid: dict | None = None,
    tie_breaker: float = 0.0,
):
    """Multi-field BM25 for one doc-id range (ES ``multi_match``).

    ``shards``: rows whose terms are FIELD-TAGGED keys (the plain term
    for the default field).  ``term_weights``: key -> qtf * idf *
    boost.  ``term_field``: key -> field index into ``field_avgdl``
    (each field normalizes tf with ITS OWN avgdl — the per-field
    (k1, b) normalization ES applies).  ``combine``: "best" =
    dis_max over fields (ES best_fields, the default), "sum" = ES
    most_fields, "cross" = term-centric — per (doc, TERM) the best
    single field's contribution, summed over terms (the ES
    cross_fields shape at tie_breaker=0, evaluated with per-field
    statistics; ``term_tid``: key -> base-term id, required for
    "cross").

    ``tie_breaker`` (``"best"`` only — the ES dis_max knob): the
    winning field scores fully, every OTHER matching field adds
    ``tie_breaker`` times its score — ``max + tb * (sum - max)``.
    0.0 is pure dis_max (the ES default); 1.0 makes best_fields
    score-identical to most_fields.

    Full-decode path, no block-max cut: the cross-field combine needs
    every field's exact partial per doc before max/sum, so a per-field
    early exit cannot bound the combined score (same
    score-the-matched-set contract as function_score/collapse).  Cost
    tracks the query terms' posting volume.  Returns the local top-k
    (or every match when k is None)."""
    if combine not in ("best", "sum", "cross"):
        raise ValueError(
            f"combine must be 'best', 'sum' or 'cross', got {combine}"
        )
    if combine == "cross" and term_tid is None:
        raise ValueError("combine='cross' needs term_tid")
    tie_breaker = float(tie_breaker)
    if not 0.0 <= tie_breaker <= 1.0:
        raise ValueError(f"tie_breaker must be in [0, 1], got {tie_breaker}")
    if tie_breaker and combine != "best":
        raise ValueError("tie_breaker applies to combine='best' only")
    if not shards:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)
    shards = sorted(shards, key=lambda s: (s["term"], s.get("first_doc", 0)))
    n_fields = len(field_avgdl)
    d_l, s_l, g_l = [], [], []
    for s in shards:
        d, tf, dl = decode_shard_blocks(s["payload"], s["block_offsets"])
        if d.size == 0:
            continue
        fi = term_field[s["term"]]
        w = term_weights[s["term"]]
        d_l.append(d)
        s_l.append(
            w * bm25.tf_norm(tf, dl, field_avgdl[fi], cfg.k1, cfg.b)
        )
        # the intra-doc grouping dimension: field for best/sum
        # (per-field sums, then max/add across fields), base TERM for
        # cross (per-term max across fields, then add across terms)
        gi = term_tid[s["term"]] if combine == "cross" else fi
        g_l.append(np.full(d.size, gi, dtype=np.int64))
    if not d_l:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)
    dd = np.concatenate(d_l)
    ss = np.concatenate(s_l)
    gg = np.concatenate(g_l)
    if deletes is not None and deletes.size:
        keep = ~_is_deleted(dd, deletes)
        dd, ss, gg = dd[keep], ss[keep], gg[keep]
        if dd.size == 0:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)
    n_groups = (
        (max(term_tid.values()) + 1) if combine == "cross" else n_fields
    )
    # per-(doc, group) partials, contributions in term order (the
    # stable sort preserves the concatenation order within a key)
    key = dd * n_groups + gg
    o = np.argsort(key, kind="stable")
    key, ss = key[o], ss[o]
    uniq = np.empty(key.size, dtype=bool)
    uniq[0] = True
    np.not_equal(key[1:], key[:-1], out=uniq[1:])
    grp = np.cumsum(uniq) - 1
    pf_key = key[uniq]
    if combine == "cross":
        # per (doc, term): best single field's contribution
        pf = np.full(pf_key.size, -np.inf, dtype=np.float64)
        np.maximum.at(pf, grp, ss)
    else:
        pf = np.zeros(pf_key.size, dtype=np.float64)
        np.add.at(pf, grp, ss)
    # combine groups per doc
    docs2 = pf_key // n_groups
    uniq2 = np.empty(docs2.size, dtype=bool)
    uniq2[0] = True
    np.not_equal(docs2[1:], docs2[:-1], out=uniq2[1:])
    starts = np.flatnonzero(uniq2)
    out_d = docs2[uniq2]
    if combine == "best":
        out_s = np.maximum.reduceat(pf, starts)
        if tie_breaker:
            # ES dis_max: losing fields add tie_breaker * their score
            sums = np.add.reduceat(pf, starts)
            out_s = out_s + tie_breaker * (sums - out_s)
    else:  # "sum" and "cross" both ADD their per-group partials
        out_s = np.add.reduceat(pf, starts)
    if k is None:
        return out_d, out_s
    sel = np.lexsort((out_d, -out_s))[:k]
    return out_d[sel], out_s[sel]


def split_excluded(rows: list, excl_terms, deletes: np.ndarray | None):
    """Split a range's shard rows into (scoring rows, widened deletes).

    Rows whose term is in ``excl_terms`` (an ES bool-query must_not
    clause) are fully decoded and their doc ids merged into the SORTED
    tombstone array — exclusion then rides the existing deletes mask,
    so every scoring path (block-max, conjunctive, driver-local,
    distributed) honors it identically with no further branching.
    Decoding every block of an excluded term's shard mirrors Lucene's
    MUST_NOT iterator, which always advances through the excluded
    postings; the shards arrive on the same pruned term-IN scan as the
    query terms, so the marginal cost is the excluded terms' decode."""
    keep, excl_docs = [], []
    for r in rows:
        if r["term"] in excl_terms:
            d, _tf, _dl = decode_shard_blocks(
                r["payload"], r["block_offsets"]
            )
            excl_docs.append(d)
        else:
            keep.append(r)
    if excl_docs:
        merged = np.concatenate(
            ([deletes] if deletes is not None and deletes.size else [])
            + excl_docs
        )
        deletes = np.unique(merged)
    return keep, deletes


def _is_deleted(doc_ids: np.ndarray, deletes: np.ndarray) -> np.ndarray:
    """Membership of doc_ids in the SORTED deletes array (tombstones)."""
    pos = np.searchsorted(deletes, doc_ids)
    pos = np.minimum(pos, deletes.size - 1)
    return deletes[pos] == doc_ids


def _score_conjunctive(shards, term_weights, k, _adl, cfg: EngineConfig,
                       deletes: np.ndarray | None = None,
                       bounds_mask=None, cur_mask=None):
    """AND semantics: intersect doc ids across terms, exact scores.
    ``_adl``: term -> avgdl resolver (see score_range)."""
    per_term: dict[str, list] = {}
    for s in shards:
        per_term.setdefault(s["term"], []).append(s)

    decoded = {}
    for term, rows in per_term.items():
        docs_l, tf_l, dl_l = [], [], []
        for s in rows:
            d, tf, dl = decode_shard_blocks(s["payload"], s["block_offsets"])
            docs_l.append(d)
            tf_l.append(tf)
            dl_l.append(dl)
        d = np.concatenate(docs_l)
        o = np.argsort(d, kind="stable")
        decoded[term] = (
            d[o],
            np.concatenate(tf_l)[o],
            np.concatenate(dl_l)[o],
        )

    # intersect starting from the rarest term
    terms_sorted = sorted(decoded, key=lambda t: decoded[t][0].size)
    common = decoded[terms_sorted[0]][0]
    if bounds_mask is not None:
        common = common[bounds_mask(common)]
        if common.size == 0:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)
    if deletes is not None and deletes.size:
        common = common[~_is_deleted(common, deletes)]
        if common.size == 0:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)
    for t in terms_sorted[1:]:
        common = common[np.isin(common, decoded[t][0], assume_unique=True)]
        if common.size == 0:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)

    total = np.zeros(common.size, dtype=np.float64)
    for t, (d, tf, dl) in decoded.items():
        pos = np.searchsorted(d, common)
        total += term_weights[t] * bm25.tf_norm(
            tf[pos], dl[pos], _adl(t), cfg.k1, cfg.b
        )
    if cur_mask is not None:
        keep = cur_mask(common, total)
        common, total = common[keep], total[keep]
        if common.size == 0:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)
    if k is None:
        # no-cut scored export: unordered contract, skip the lexsort
        return common, total
    sel = np.lexsort((common, -total))[:k]
    return common[sel], total[sel]
