"""Deduplication operators for large-scale training-data pipelines.

All variants are pure DataFrame plans (JVM-side, codegen) except where
bit-twiddling forces a pandas UDF.  Cross-engine determinism (for the
DuckDB oracles) comes from md5/sha2 — identical lowercase-hex output
in Spark and DuckDB — never from engine-specific hash().

Scale notes:
- exact dedup: one shuffle on the digest; at 100 TB this is the
  canonical groupBy with map-side partial agg; digest (not raw text)
  is shuffled.
- MinHash+LSH: signatures are per-row (narrow); the only shuffle is
  the band-bucket self-join, and each band key is (band_idx, band
  hash) — hot buckets mean near-dup clusters, which is the signal,
  not skew pathology; pair generation per bucket is bounded by
  cluster size.
- shingles: word n-grams via a single transform over the split
  array — no explode until the signature needs it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sotohp_spark.operators.topk import ensure_scan_parallelism, simple_tokens


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Groups of byte-identical texts: (digest, n_docs, doc_ids)."""
    return (
        docs.select(id_col, F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .where(F.col("n_docs") > 1)
    )


def distinct_by_text(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Keep the min-id representative per identical text (dedup sink)."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("digest"), id_col)
        .groupBy("digest")
        .agg(F.min(id_col).alias("keep_id"))
    )


# ---------------------------------------------------------------------------
# shingles + MinHash + LSH
# ---------------------------------------------------------------------------

def word_shingles(col, n: int = 3, distinct: bool = True):
    """Word n-grams as strings ('a b c'), distinct by default
    (``distinct=False`` keeps duplicates in order — repetition metrics
    need the multiplicity).

    Documents with fewer than n tokens yield an EMPTY array (mirrors
    the oracle's ``len(w) >= n`` guard): without the guard,
    F.sequence counts DOWN for size < n and F.slice(start=0) throws
    INVALID_PARAMETER_VALUE.START, aborting the whole job on any
    short/empty document.

    PERFORMANCE: the token array is BOUND once per row through an
    outer single-element transform (a lambda variable), because
    higher-order-function lambdas re-evaluate every captured
    expression PER ELEMENT — with the tokenization inlined, each of
    the ~|words| shingle slices re-ran the split+filter, turning
    shingling into O(|words|^2) per document (measured 4.2x slower on
    the 5k-doc driver corpus, and the dominant cost of the whole
    dedup chain)."""

    def _from_toks(toks):
        grams = F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
        if distinct:
            grams = F.array_distinct(grams)
        return F.when(F.size(toks) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )

    # transform(array(x), f)[0] == let x in f(x): the lambda variable
    # is a materialized VALUE, so `toks` references inside _from_toks
    # do not re-evaluate the tokenizer
    return F.transform(F.array(simple_tokens(col)), _from_toks)[0]


def word_shingles_udf(n: int = 3):
    """Arrow-batched twin of ``word_shingles(distinct=True)`` for the
    dedup EXPLODE paths (r08): higher-order-function slicing is
    CodegenFallback (interpreted per shingle) and measured ~1.7x
    slower than a batched Python shingler at sf1.0.  Semantics are
    pinned equal by tests/test_dedup_ann.py::test_shingle_udf_parity:
    split on single spaces dropping empties (simple_tokens), <n tokens
    -> empty array, first-occurrence order dedup (array_distinct).
    Curation's repetition metrics keep the expression form (their
    shingles feed further array expressions, not an explode)."""
    from pyspark.sql.functions import pandas_udf

    nn = int(n)

    @pandas_udf("array<string>")
    def sh(texts: pd.Series) -> pd.Series:
        out = []
        for s in texts:
            if s is None:
                out.append([])
                continue
            toks = [t for t in s.split(" ") if t]
            if len(toks) < nn:
                out.append([])
                continue
            out.append(list(dict.fromkeys(
                " ".join(toks[i:i + nn])
                for i in range(len(toks) - nn + 1)
            )))
        return pd.Series(out)

    return sh


# universal-hash multipliers for the MinHash family: deterministic,
# engine-independent (plain int64 arithmetic, no overflow: operands
# stay below 2^31 * 2^30).  h_i = (a_i*h_hi + b_i*h_lo + c_i) mod M.
_MINHASH_M = 2147483647  # 2^31 - 1


def _minhash_params(num_hashes: int):
    # fixed linear-congruential-style constants (seeded, public-knowledge
    # universal hashing construction)
    a = [(2 * i + 1) * 40503 % _MINHASH_M for i in range(1, num_hashes + 1)]
    b = [(2 * i + 1) * 69621 % _MINHASH_M for i in range(1, num_hashes + 1)]
    c = [(i * 104729 + 12345) % _MINHASH_M for i in range(1, num_hashes + 1)]
    return a, b, c


def minhash_signatures(
    docs: DataFrame,
    id_col="doc_id",
    text_col="text",
    shingle_n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """(doc, s0..s{H-1}) MinHash signature via ONE md5 per distinct
    shingle + H integer universal hashes — exploded shingles feed a
    single groupBy with H min() aggregates (all whole-stage codegen;
    no per-shingle crypto re-hashing per hash function)."""
    a, b, c = _minhash_params(num_hashes)
    sh = ensure_scan_parallelism(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles_udf(shingle_n)(F.col(text_col))).alias("sh"),
    )
    h = F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10).cast("long")
    hashed = sh.select(
        "doc",
        F.shiftright(h, 30).alias("h_hi"),
        h.bitwiseAND(F.lit((1 << 30) - 1)).alias("h_lo"),
    )
    aggs = [
        F.min(
            (F.col("h_hi") * a[i] + F.col("h_lo") * b[i] + c[i]) % _MINHASH_M
        ).alias(f"s{i}")
        for i in range(num_hashes)
    ]
    return hashed.groupBy("doc").agg(*aggs)


def minhash_band_keys(
    docs: DataFrame,
    id_col="doc_id",
    text_col="text",
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(doc, band, bkey) LSH band keys — the bucketing contract shared
    by the all-pairs path, the materialized signature index, and the
    DuckDB oracle (same constants, same md5-of-joined-rows key)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, id_col, text_col, shingle_n, num_hashes)
    return sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.col(f"s{bi * rows_per_band + j}").cast("string")
                                    for j in range(rows_per_band)
                                ],
                            )
                        ).alias("bkey"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc", "bk.band", "bk.bkey")


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col="doc_id",
    text_col="text",
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing >= 1 LSH band.

    bands * rows_per_band = num_hashes; a pair colliding on any band is
    a candidate (verify with exact jaccard downstream).
    Returns (doc_a, doc_b) with doc_a < doc_b, distinct.
    """
    band_keys = minhash_band_keys(
        docs, id_col, text_col, shingle_n, num_hashes, bands
    )

    a = band_keys.alias("a")
    b = band_keys.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (verification / small-scale path)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    id_col="doc_id",
    text_col="text",
    shingle_n: int = 3,
    max_shingle_df: int | None = None,
    prefix_filter: bool = False,
) -> DataFrame:
    """All pairs with Jaccard(shingles) >= threshold, via an inverted
    shingle index (no cross join): pairs sharing a shingle -> count
    intersections -> |A ∪ B| = |A| + |B| - |A ∩ B|.

    Scale controls (required before this can verify LSH candidates on
    a big corpus):
    - ``max_shingle_df``: drop shingles appearing in more than this
      many docs BEFORE the self-join (the standard hot-shingle cap —
      one boilerplate shingle shared by n docs otherwise produces
      n² join rows).  Jaccard is then computed over the CAPPED shingle
      universe on both sides of |A ∪ B| (the DuckDB oracle mirrors the
      cap exactly).
    - ``prefix_filter`` (default OFF): AllPairs/PPJoin prefix
      filtering (Bayardo et al. 2007; Xiao et al. 2008).  Shingles
      get a GLOBAL rarity order (df asc, shingle asc); two sets with
      Jaccard >= t MUST share an element within their first
      ``|X| - ceil(t*|X|) + 1`` elements under any fixed total order,
      so the candidate self-join runs over those prefixes only and
      candidates are verified with one array_intersect over the
      per-doc sorted shingle sets.  LOSSLESS for the given threshold
      (equality vs the unfiltered path is pytest-pinned at several
      thresholds).  MEASURED NEGATIVE RESULT (round 5, recorded in
      BENCH/BASELINE.md so it isn't retried as a default): with the
      df cap on, the extra window/df-join/verify machinery costs more
      than it saves (5.0 vs 3.1 s at 5k docs; 12.3 vs 11.4 s at 55k);
      without the cap, a boilerplate-heavy corpus defeats it — sets
      that are half boilerplate put hot shingles inside the prefix
      (too few rare shingles), and near-threshold boilerplate pairs
      are irreducible for ANY lossless method.  Keep the df cap as
      the scale control; use prefix_filter when a corpus needs an
      exact uncapped sweep and its documents carry enough distinctive
      content.
    - the per-doc sizes table is joined WITHOUT a forced broadcast: it
      is O(n_docs) and must stay a shuffle join at scale (AQE may still
      choose broadcast when it is actually small).
    """
    # MATERIALIZE the per-doc shingle ARRAYS once (localCheckpoint):
    # one tokenize+shingle pass, 50k compact array rows instead of a
    # millions-of-rows exploded checkpoint; every consumer below
    # (kernel collect, hot-cap agg, sizes, both self-join sides)
    # derives from it — re-running only the cheap in-memory explode,
    # never the shingler (guide §2.4: remove repeated passes; §5:
    # localCheckpoint as the cheap lineage cut).  Eager by design:
    # every invocation still computes from the parquet input —
    # nothing persists across calls.
    per_doc = (
        ensure_scan_parallelism(docs.select(id_col, text_col))
        .select(
            F.col(id_col).alias("doc"),
            word_shingles_udf(shingle_n)(F.col(text_col)).alias("shs"),
        )
        .localCheckpoint()
    )
    if not prefix_filter:
        # kernel path first, on the RAW arrays: the hot-shingle cap is
        # a bincount inside the kernel, so the hot-agg job, the anti
        # join and the exploded materialization never run at all
        kernel = _jaccard_pairs_kernel(per_doc, threshold, max_shingle_df)
        if kernel is not None:
            return kernel
    sh = per_doc.select("doc", F.explode("shs").alias("sh"))
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("sh")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") > max_shingle_df)
            .select("sh")
        )
        # second materialization: the capped index feeds three
        # consumers; without it each one re-runs the anti join
        sh = sh.join(hot, "sh", "left_anti").localCheckpoint()
    inv = sh
    sizes = inv.groupBy("doc").agg(F.count("*").alias("sz"))

    if prefix_filter and threshold > 0:
        from pyspark.sql import Window

        df_tab = inv.groupBy("sh").agg(F.count("*").alias("_df"))
        ranked = (
            inv.join(df_tab, "sh")
            .withColumn(
                "_rk",
                F.row_number().over(
                    Window.partitionBy("doc").orderBy(
                        F.col("_df").asc(), F.col("sh").asc()
                    )
                ),
            )
            .join(sizes, "doc")
        )
        prefix = ranked.where(
            F.col("_rk")
            <= F.col("sz") - F.ceil(F.lit(float(threshold)) * F.col("sz")) + 1
        ).select("doc", "sh")
        pa, pb = prefix.alias("a"), prefix.alias("b")
        cand = (
            pa.join(
                pb,
                (F.col("a.sh") == F.col("b.sh"))
                & (F.col("a.doc") < F.col("b.doc")),
            )
            .select(
                F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b")
            )
            .distinct()
        )
        arrays = inv.groupBy("doc").agg(
            F.sort_array(F.collect_set("sh")).alias("arr")
        )
        return (
            cand.join(
                arrays.select(
                    F.col("doc").alias("doc_a"), F.col("arr").alias("_arr_a")
                ),
                "doc_a",
            )
            .join(
                arrays.select(
                    F.col("doc").alias("doc_b"), F.col("arr").alias("_arr_b")
                ),
                "doc_b",
            )
            .withColumn(
                "inter", F.size(F.array_intersect("_arr_a", "_arr_b"))
            )
            .withColumn(
                "jaccard",
                F.round(
                    F.col("inter")
                    / (
                        F.size("_arr_a") + F.size("_arr_b") - F.col("inter")
                    ),
                    6,
                ),
            )
            .where(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard")
        )

    a = inv.alias("a")
    b = inv.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ship the whole inverted index as one shared variable only while it
# stays well inside driver/executor memory; past this the self-join
# path (arbitrary scale, one shuffle per stage) takes over.  Budget
# accounting is for the WHOLE kernel, not just the broadcast: the
# driver transiently holds the (doc, shingle-string) pandas frame
# (~50-100 B/row with string objects) plus the int CSR arrays
# (~32 B/row across the five broadcast arrays), so 20M rows is
# roughly 1-2.5 GB peak driver footprint against the 8 GB default —
# deliberately conservative headroom, not an 8 B/row estimate
JACCARD_KERNEL_MAX_ROWS = 20_000_000


def _jaccard_pairs_kernel(inv: DataFrame, threshold: float,
                          max_shingle_df: int | None = None):
    """Shared-inverted-index jaccard pair counting (r08).

    The self-join path materializes one row PER (shingle, doc_a,
    doc_b) co-occurrence and shuffles ~|candidate pairs| rows into a
    mostly-unique groupBy — measured 127M join rows / 114M distinct
    pairs for 50k synthetic docs, ~22 s of pure join+aggregate at 28
    cores.  The same arithmetic partitioned BY OWNER DOC needs no
    pair shuffle at all: every pair (a, b) with a < b is counted
    exactly once by a's task, from a's complete shingle list against
    the shared shingle->docs lists (each list sorted by doc, so the
    owner's own position marks the start of its strictly-greater
    neighbors).  Candidate counts, sizes, and the final
    round(inter/(sz_a+sz_b-inter), 6) >= threshold filter in the JVM
    are integer-exact and IDENTICAL to the join path (the kernel's
    own float prefilter keeps a conservative 1e-6 margin), which the
    prefix-filter equality pytest pins.

    Returns None when the index is too big to ship (the caller falls
    back to the self-join path) or ids are not integers."""
    import itertools

    from pyspark.sql import types as T

    spark = inv.sparkSession
    # id-dtype check BEFORE any collect (non-integer ids keep the
    # generic self-join path), and the output schema mirrors the
    # input id type so both paths return identical frames
    id_type = inv.schema["doc"].dataType
    if not isinstance(
        id_type, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
    ):
        return None
    id_t = id_type.simpleString()
    n_rows = int(
        inv.agg(
            F.coalesce(F.sum(F.size("shs")), F.lit(0))
        ).collect()[0][0]
    )  # cheap: inv is localCheckpointed per-doc arrays
    if n_rows == 0:
        return spark.createDataFrame(
            [], f"doc_a {id_t}, doc_b {id_t}, jaccard double"
        ).limit(0)
    if n_rows > JACCARD_KERNEL_MAX_ROWS:
        return None
    pdf = inv.toPandas()
    arr_list = [
        a if a is not None else () for a in pdf["shs"].to_numpy()
    ]
    row_sizes = np.fromiter(
        (len(a) for a in arr_list), dtype=np.int64, count=len(arr_list)
    )
    doc_vals = np.repeat(pdf["doc"].to_numpy(np.int64), row_sizes)
    sh_codes, _ = pd.factorize(
        pd.Series(list(itertools.chain.from_iterable(arr_list))),
        sort=False,
    )
    if max_shingle_df is not None:
        # hot-shingle cap as a bincount over the RAW stream — same
        # semantics as the DataFrame anti join (df computed on the
        # uncapped universe, sizes over the capped one), without the
        # hot-agg job / anti join / second checkpoint
        counts = np.bincount(sh_codes)
        keep = counts[sh_codes] <= int(max_shingle_df)
        if not keep.all():
            doc_vals = doc_vals[keep]
            sh_codes = sh_codes[keep]
            if doc_vals.size == 0:
                return spark.createDataFrame(
                    [], f"doc_a {id_t}, doc_b {id_t}, jaccard double"
                ).limit(0)
    n_rows = int(doc_vals.size)  # post-cap row count
    doc_ids = np.unique(doc_vals)              # sorted original ids
    didx = np.searchsorted(doc_ids, doc_vals)  # dense ids, id-ordered
    n_docs = int(doc_ids.size)
    n_sh = int(sh_codes.max()) + 1
    # shingle -> docs CSR, each bucket sorted by dense doc id
    lex = np.lexsort((didx, sh_codes))
    s_docs = didx[lex].astype(np.int64)
    s_indptr = np.searchsorted(sh_codes[lex], np.arange(n_sh + 1))
    # per-element lexsorted position, grouped per doc (CSR by doc):
    # element i's strictly-greater neighbors in its bucket are
    # s_docs[i+1 : s_indptr[code+1]]
    pos_in_lex = np.empty(n_rows, dtype=np.int64)
    pos_in_lex[lex] = np.arange(n_rows)
    by_doc = np.argsort(didx, kind="stable")
    d_indptr = np.searchsorted(didx[by_doc], np.arange(n_docs + 1))
    d_elem_pos = pos_in_lex[by_doc]
    sizes = np.diff(d_indptr).astype(np.int64)
    # per lex element: end of its bucket
    elem_bucket_end = np.repeat(
        s_indptr[1:], np.diff(s_indptr)
    ).astype(np.int64)
    bc = spark.sparkContext.broadcast({
        "doc_ids": doc_ids,
        "sizes": sizes,
        "s_docs": s_docs,
        "d_indptr": d_indptr,
        "d_elem_pos": d_elem_pos,
        "elem_bucket_end": elem_bucket_end,
    })
    t = float(threshold)
    n_docs_l = n_docs

    def pair_counts(batches):
        v = bc.value
        s_docs_ = v["s_docs"]
        d_indptr_ = v["d_indptr"]
        d_elem_pos_ = v["d_elem_pos"]
        ends_ = v["elem_bucket_end"]
        sizes_ = v["sizes"]
        doc_ids_ = v["doc_ids"]
        for pdf_in in batches:
            mes = pdf_in["id"].to_numpy(np.int64)
            for s in range(0, mes.size, 2048):
                batch = mes[s:s + 2048]
                owners, nbrs = [], []
                for me in batch:
                    for p in d_elem_pos_[d_indptr_[me]:d_indptr_[me + 1]]:
                        e = ends_[p]
                        if e > p + 1:
                            tail = s_docs_[p + 1:e]
                            nbrs.append(tail)
                            owners.append(
                                np.full(tail.size, me, dtype=np.int64)
                            )
                if not nbrs:
                    continue
                keys = (
                    np.concatenate(owners) * n_docs_l
                    + np.concatenate(nbrs)
                )
                uk, counts = np.unique(keys, return_counts=True)
                aa = uk // n_docs_l
                bb = uk % n_docs_l
                union = sizes_[aa] + sizes_[bb] - counts
                with np.errstate(divide="ignore", invalid="ignore"):
                    jac = counts / union
                keep = jac >= t - 1e-6
                if not keep.any():
                    continue
                yield pd.DataFrame({
                    "doc_a": doc_ids_[aa[keep]],
                    "doc_b": doc_ids_[bb[keep]],
                    "inter": counts[keep].astype(np.int64),
                    "sz_a": sizes_[aa[keep]],
                    "sz_b": sizes_[bb[keep]],
                })

    par = spark.sparkContext.defaultParallelism
    cand = spark.range(n_docs, numPartitions=par).mapInPandas(
        pair_counts,
        f"doc_a {id_t}, doc_b {id_t}, inter long, sz_a long, sz_b long",
    )
    return (
        cand.withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash (64-bit, md5-derived -> engine-agnostic)
# ---------------------------------------------------------------------------

def simhash64(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """64-bit SimHash over whitespace tokens, tf-weighted.

    Token hash = first 15 hex chars of md5 (stable across engines).
    Bit b of the simhash = 1 iff sum over tokens of tf * (bit b ? +1 :
    -1) > 0.

    r08: ONE Arrow kernel per partition replaces the token explode +
    (doc, term) shuffle + md5-per-row + 60-aggregate groupBy — the
    whole signature is a per-doc integer computation, so shuffling
    2.8M token rows to compute 50k signatures was pure movement
    (guide §2.3/§4.2).  Arithmetic is integer-exact and IDENTICAL to
    the old expression plan (same md5 prefix, same ±tf sums, same
    sign rule) — pinned by test_simhash_kernel_parity against the
    retained expression form below."""
    import hashlib

    base = ensure_scan_parallelism(docs.select(id_col, text_col))
    id_t = docs.schema[id_col].dataType.simpleString()
    bitpos = np.arange(60, dtype=np.int64)

    def kern(batches):
        # per-task sign cache: one 60-byte int8 row per distinct
        # token, cleared at a 500k-entry cap (~50 MB with overhead)
        # so a high-vocabulary partition cannot grow task memory
        # without bound
        signs_cache: dict = {}
        for pdf in batches:
            if len(signs_cache) > 500_000:
                signs_cache.clear()
            ids_out, sims_out = [], []
            for i, s in zip(pdf[id_col], pdf[text_col]):
                if s is None:
                    continue
                cnt: dict = {}
                for t in s.split(" "):
                    if t:
                        cnt[t] = cnt.get(t, 0) + 1
                if not cnt:
                    continue
                rows = []
                tfs = np.empty(len(cnt), dtype=np.int64)
                for j, (t, tf) in enumerate(cnt.items()):
                    sg = signs_cache.get(t)
                    if sg is None:
                        h = int(
                            hashlib.md5(t.encode("utf-8")).hexdigest()[:15],
                            16,
                        )
                        # int8 signs: the tf (int64) matmul promotes
                        # back to int64, values stay exact
                        sg = (((h >> bitpos) & 1) * 2 - 1).astype(np.int8)
                        signs_cache[t] = sg
                    rows.append(sg)
                    tfs[j] = tf
                bitsum = tfs @ np.stack(rows)
                ids_out.append(i)
                sims_out.append(int(
                    ((bitsum > 0).astype(np.int64) << bitpos).sum()
                ))
            if ids_out:
                yield pd.DataFrame({
                    id_col: ids_out,
                    "simhash": np.asarray(sims_out, dtype=np.int64),
                })

    return base.mapInPandas(kern, f"{id_col} {id_t}, simhash long")


def _simhash64_expr(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """The original pure-column-expression simhash (conv(md5) + 60
    conditional sums) — retained as the parity oracle for the Arrow
    kernel above."""
    tf = (
        docs
        .select(id_col, F.explode(simple_tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        .withColumn(
            "h", F.conv(F.substring(F.md5("term"), 1, 15), 16, 10).cast("long")
        )
    )
    # per-bit weighted sums (60 usable bits from 15 hex chars)
    bit_sums = tf.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), bi).bitwiseAND(F.lit(1)) == 1, F.col("tf")).otherwise(-F.col("tf"))
            ).alias(f"b{bi}")
            for bi in range(60)
        ]
    )
    sim = bit_sums.select(
        id_col,
        sum(
            [
                F.when(F.col(f"b{bi}") > 0, F.lit(1 << bi)).otherwise(F.lit(0))
                for bi in range(60)
            ]
        ).cast("long").alias("simhash"),
    )
    return sim


def simhash_near_dups(docs: DataFrame, max_hamming: int = 3,
                      id_col="doc_id", text_col="text") -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Scale path: band join on 15-bit chunks (a pair within Hamming 3 of
    60 bits must agree exactly on >= 1 of 4 chunks, pigeonhole).  The
    four bands are ONE self-join on the exploded (chunk_idx, chunk_val)
    pair — one shuffle of a 4x-row table instead of four separate
    self-join shuffles plus a union (measured ~2x faster and the plan
    the banding is supposed to have).
    """
    sim = simhash64(docs, id_col, text_col)
    chunks = sim.select(
        F.col(id_col).alias("doc"),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("ci"),
                        F.shiftright(F.col("simhash"), 15 * c)
                        .bitwiseAND(F.lit((1 << 15) - 1))
                        .alias("cv"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ch"),
    ).select("doc", "simhash", "ch.ci", "ch.cv")
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = a.join(
        b,
        (F.col("a.ci") == F.col("b.ci"))
        & (F.col("a.cv") == F.col("b.cv"))
        & (F.col("a.doc") < F.col("b.doc")),
    ).select(
        F.col("a.doc").alias("doc_a"),
        F.col("b.doc").alias("doc_b"),
        F.col("a.simhash").alias("sh_a"),
        F.col("b.simhash").alias("sh_b"),
    )
    return (
        pairs.distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# incremental dedup: new batch vs a MATERIALIZED signature index
# ---------------------------------------------------------------------------

def build_signature_index(docs: DataFrame, path: str, id_col="doc_id",
                          text_col="text", shingle_n: int = 3,
                          num_hashes: int = 16, bands: int = 4) -> dict:
    """Materialize the corpus's LSH band keys once, hive-partitioned by
    band — the 100 TB incremental-dedup shape: deduping a new crawl
    batch against an existing corpus must NOT re-shingle and re-hash
    the corpus per batch.  Hash params ride in a meta file so the probe
    side (and the DuckDB oracle) always buckets identically.

    Publish is stage-then-swap via a RETIRE/PROMOTE rename chain (the
    primary index's compaction discipline): data AND meta land in a
    _tmp dir first, then the live dir is renamed aside and the staged
    one renamed in — a concurrent reader's no-index window shrinks to
    the instant between two renames instead of a full rmtree+copy.
    (The index is a DERIVED artifact: a crash between the renames
    loses only the index, and a rebuild recreates it; contrast the
    primary index's marker-based recovery, which must never lose
    source data.)"""
    import json

    from sotohp_spark import fsio

    from pyspark.sql import Observation

    spark = docs.sparkSession
    live = path.rstrip("/")
    tmp, old = live + "_tmp", live + "_retired"
    fsio.rmtree(spark, tmp)
    # n_docs counts the INPUT rows (minhash drops zero-shingle docs,
    # so counting the materialized keys under-reports the indexed
    # corpus) — measured via an Observation ON THE SAME PASS as the
    # band-key write, never a second execution of the docs lineage
    # (which may be a whole materialization pipeline).  Ids are unique
    # by contract, so count == countDistinct (which observe() forbids).
    obs = Observation("sig_index_n_docs")
    keys = minhash_band_keys(
        docs.observe(obs, F.count(F.col(id_col)).alias("n")),
        id_col, text_col, shingle_n, num_hashes, bands,
    )
    (
        keys.repartition("band", "bkey")
        .write.mode("overwrite")
        .partitionBy("band")
        .parquet(tmp)
    )
    meta = {
        "shingle_n": shingle_n,
        "num_hashes": num_hashes,
        "bands": bands,
        "n_docs": int(obs.get["n"]),
    }
    fsio.write_text_atomic(spark, f"{tmp}/_sig_meta.json", json.dumps(meta))
    fsio.rmtree(spark, old)
    if fsio.exists(spark, live):
        fsio.move_dir(spark, live, old)
    fsio.move_dir(spark, tmp, live)
    fsio.rmtree(spark, old)
    return meta


def neardup_against_index(new_docs: DataFrame, path: str, id_col="doc_id",
                          text_col="text") -> DataFrame:
    """Candidate near-dup pairs (new_doc, corpus_doc): hash ONLY the new
    batch (O(batch), not O(corpus)) and bucket-join it against the
    stored band keys.  Returns distinct (new_doc, corpus_doc)."""
    import json

    from sotohp_spark import fsio

    spark = new_docs.sparkSession
    meta = json.loads(fsio.read_text(spark, f"{path}/_sig_meta.json"))
    probe = minhash_band_keys(
        new_docs, id_col, text_col,
        meta["shingle_n"], meta["num_hashes"], meta["bands"],
    )
    corpus = (
        spark.read.option("basePath", path).parquet(path)
        .select(F.col("doc").alias("corpus_doc"), "band", "bkey")
    )
    return (
        probe.select(F.col("doc").alias("new_doc"), "band", "bkey")
        .join(corpus, ["band", "bkey"])
        .where(F.col("new_doc") != F.col("corpus_doc"))
        .select("new_doc", "corpus_doc")
        .distinct()
    )


def duplicate_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 25,
) -> DataFrame:
    """Connected components over near-duplicate pairs: every doc that
    appears in a pair gets the MIN doc id of its component as
    cluster_id — the step that turns pairwise candidates into "keep
    one per cluster" (reference analog: duplicate GROUPS, not pairs —
    HashOperations digest grouping generalized to fuzzy edges).

    Min-label propagation: each round every node takes the minimum of
    its own label and its neighbors' labels; converges in O(component
    diameter) rounds — near-dup clusters are shallow (dozens of docs,
    diameter a few hops), so the loop is short.  Each round is ONE
    distributed join + aggregate keyed by node; the driver only
    orchestrates and checks the convergence counter (no data ever
    collects).  localCheckpoint per round cuts the lineage so plan
    size stays constant.  Deterministic: labels are pure min()s.

    Cost shape: ONE Spark action per round — the convergence counter
    (sum of moved labels) rides on the SAME job that materializes the
    round's checkpoint, via an Observation on the checkpointed plan.
    A separate count() per round doubled the round's job count (and
    re-ran the label join when the checkpoint was not yet hit) for a
    number the plan already knows.

    Returns DataFrame(doc_id, cluster_id) over the docs present in
    ``pairs``.
    """
    if max_iters < 1:
        # the non-convergence RuntimeError below reports "did not
        # converge" — a zero/negative budget is a parameter error, not
        # a convergence failure, and must not masquerade as one
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")
    from pyspark.sql import Observation

    F_ = F
    # symmetrize via explode, not union: the union's two branches each
    # re-evaluated the ENTIRE pairs lineage (for the dedup chain that
    # is the full inverted-index self-join) — one explode emits both
    # directions from a single pass (guide §2.4), same rows, same ONE
    # materializing action
    sym = pairs.select(
        F_.explode(
            F_.array(
                F_.struct(
                    F_.col(a_col).alias("src"), F_.col(b_col).alias("dst")
                ),
                F_.struct(
                    F_.col(b_col).alias("src"), F_.col(a_col).alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst").distinct().localCheckpoint()
    # seeded init (r08): the label distinct-pass shuffles by src
    # anyway, so fold the FIRST propagation step into it — initial
    # label = min(self, neighbors).  Same fixpoint (component-min
    # labels are unique), one fewer distributed round.
    labels = (
        sym.groupBy("src")
        .agg(F_.least(F_.min("dst"), F_.first("src")).alias("lbl"))
        .select(F_.col("src").alias("node"), "lbl")
        .localCheckpoint()
    )
    changed = None
    for _ in range(max_iters):
        nbr_min = (
            sym.join(labels, sym["dst"] == labels["node"])
            .groupBy("src")
            .agg(F_.min("lbl").alias("nbr_lbl"))
        )
        # carry the PRE-round label through as `prev` so the moved-
        # label count is a plain column comparison at the end of the
        # round's plan (no extra join against the old frame)
        stepped = labels.join(
            nbr_min, labels["node"] == nbr_min["src"], "left"
        ).select(
            "node",
            F_.col("lbl").alias("prev"),
            F_.least(
                F_.col("lbl"), F_.coalesce("nbr_lbl", F_.col("lbl"))
            ).alias("lbl"),
        )
        # pointer jumping: also take the label OF the current label
        # (labels are always node ids, so the self-join hits).  One-hop
        # propagation alone needs O(diameter) rounds — a 30-doc
        # sliding near-dup chain would exhaust max_iters and silently
        # return a split component; with the jump, depth halves every
        # round and max_iters=25 covers diameters beyond 2^25.
        obs = Observation()
        new_labels = (
            stepped.alias("x")
            .join(
                stepped.alias("y"),
                F_.col("x.lbl") == F_.col("y.node"),
                "left",
            )
            .select(
                F_.col("x.node").alias("node"),
                F_.least(
                    F_.col("x.lbl"),
                    F_.coalesce(F_.col("y.lbl"), F_.col("x.lbl")),
                ).alias("lbl"),
                F_.col("x.prev").alias("prev"),
            )
            .observe(
                obs,
                F_.sum(
                    (F_.col("lbl") != F_.col("prev")).cast("long")
                ).alias("moved"),
            )
            .select("node", "lbl")
            .localCheckpoint()  # the round's ONE action; fires the observation
        )
        changed = int(obs.get["moved"] or 0)
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iters} rounds "
            f"({changed} labels still moving) — raise max_iters"
        )
    return labels.select(
        F_.col("node").alias("doc_id"), F_.col("lbl").alias("cluster_id")
    )
