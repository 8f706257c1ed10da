"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

MEDIAN-OF-N harness (default N=3, $SPARK_GRAFT_BENCH_REPS): the box
has documented ±25% co-tenant variance and a single sample cannot
distinguish a noisy slot from a code regression (the r03 record
regressed 1.5× uniformly for exactly this reason).  Every timed
section runs N times; the JSON reports per-query MEDIANS plus a
spread map ((max-min)/median) so a noisy run is visible in the record
itself.

Prints ONE JSON line:
  {"metric": ..., "value": <total of medians, sec>, "unit": "sec",
   "queries": {...per-query median sec...}, "spread": {...},
   "sf": ..., "build_turns_per_sec": ..., "topk_p95_ms": ...}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

# transcript corpus scale per sf dir (turns ~= 21.5 * convs)
TRANSCRIPT_SF = {"sf0.001": 0.1, "sf0.01": 1.0, "sf0.1": 4.0}


def main():
    import shutil

    from pyspark.sql import functions as F  # noqa

    import __spark_entry__ as entrymod
    from sotohp_spark.config import EngineConfig
    from sotohp_spark.generator import reference_queries, transcripts_df
    from sotohp_spark.index import IndexBuilder, QueryEngine
    from sotohp_spark.session import get_spark

    tag = os.path.basename(SF_DIR.rstrip("/"))
    tsf = TRANSCRIPT_SF.get(tag, 4.0)
    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)

    samples: dict[str, list[float]] = {}

    def record(name: str, sec: float):
        samples.setdefault(name, []).append(sec)

    # ---- transcript index build (north-star: turns/sec) ----
    turns = transcripts_df(spark, tsf)
    turns = turns.localCheckpoint()  # materialize generator cost out of the timing
    n_turns = turns.count()
    idx_path = f"/tmp/bench_index_{tag}"
    cfg = EngineConfig(shuffle_partitions=CPUS, ranges_per_batch=64)
    for _ in range(REPS):
        shutil.rmtree(idx_path, ignore_errors=True)
        t0 = time.time()
        IndexBuilder(spark, idx_path, cfg).build(
            turns, input_fingerprint=f"bench-{tsf}"
        )
        record("index_build", time.time() - t0)

    # ---- top-k query latency over the reference query set ----
    engine = QueryEngine(spark, idx_path)
    engine.preload_term_stats()
    engine.cache_postings()
    qset = reference_queries()
    p95_samples = []
    for _ in range(REPS):
        lat = []
        t0 = time.time()
        for _, q in qset.iterrows():
            t1 = time.time()
            engine.top_k(q["query_text"], int(q["k"]), with_docs=False).collect()
            lat.append(time.time() - t1)
        record("topk_queries_total", time.time() - t0)
        lat.sort()
        p95_samples.append(lat[max(0, int(len(lat) * 0.95) - 1)] * 1000.0)

    # time-windowed search (doc-id interval + range_bucket pruning)
    import datetime

    for _ in range(REPS):
        t1 = time.time()
        engine.top_k(
            "error retry timeout", 10, with_docs=False,
            ts_min=datetime.datetime(2025, 2, 1),
            ts_max=datetime.datetime(2025, 2, 28, 23, 59, 59),
        ).collect()
        record("topk_time_filtered", time.time() - t1)

    # phrase-style candidate generation on the same index (rarest-
    # first block-skipping conjunction; the index-side cost of a
    # prune-then-verify phrase query)
    for _ in range(REPS):
        t1 = time.time()
        engine.matching_doc_ids("retry timeout").count()
        record("phrase_candidates", time.time() - t1)

    # positional index: build-once overhead vs the positionless build
    # (one sample — it is a delta measurement, not a headline), then
    # index-only phrase adjacency (no text verify, no docs scan)
    pos_path = f"/tmp/bench_pos_index_{tag}"
    shutil.rmtree(pos_path, ignore_errors=True)
    cfg_pos = EngineConfig(
        shuffle_partitions=CPUS, ranges_per_batch=64, store_positions=True
    )
    t1 = time.time()
    IndexBuilder(spark, pos_path, cfg_pos).build(
        turns, input_fingerprint=f"bench-{tsf}-pos"
    )
    record("index_build_positional", time.time() - t1)
    pos_engine = QueryEngine(spark, pos_path)
    pos_engine.preload_term_stats()
    for _ in range(REPS):
        t1 = time.time()
        pos_engine.phrase_match_doc_ids("retry timeout").count()
        record("phrase_positional", time.time() - t1)

    # phrase-RANKED: membership + BM25 relevance out of the SAME
    # per-range pass (ES match_phrase scoring analog, round-6)
    for _ in range(REPS):
        t1 = time.time()
        pos_engine.phrase_ranked("retry timeout", k=10).collect()
        record("phrase_ranked", time.time() - t1)

    # round-7: multi-field index (extra_fields=("tool",)) — one
    # build-tax sample, then (a) the SAME single-field query on the
    # fields index vs the plain index (the single-field path must be
    # unaffected: its term IN-list contains no tagged keys), and (b)
    # multi_match best_fields itself
    mf_path = f"/tmp/bench_mf_index_{tag}"
    shutil.rmtree(mf_path, ignore_errors=True)
    cfg_mf = EngineConfig(
        shuffle_partitions=CPUS, ranges_per_batch=64,
        extra_fields=("tool",),
    )
    t1 = time.time()
    IndexBuilder(spark, mf_path, cfg_mf).build(
        turns, input_fingerprint=f"bench-{tsf}-mf"
    )
    record("index_build_fields", time.time() - t1)
    mf_engine = QueryEngine(spark, mf_path)
    mf_engine.preload_term_stats()
    for _ in range(REPS):
        t1 = time.time()
        mf_engine.top_k(
            "error retry timeout", 10, with_docs=False
        ).collect()
        record("topk_single_field_on_mf_index", time.time() - t1)
        t1 = time.time()
        mf_engine.top_k_multi_match(
            "search python", [("text", 1.0), ("tool", 2.0)],
            k=10, with_docs=False,
        ).collect()
        record("multi_match_best_fields", time.time() - t1)
        t1 = time.time()
        engine.top_k(
            "error retry timeout", 10, with_docs=False
        ).collect()
        record("topk_single_field_plain_index", time.time() - t1)

    # round-7: composable bool query (must + boosted should + must_not
    # + minimum_should_match in one object, one job warm), and the
    # full dashboard shape — the same bool with every clause evaluated
    # as a most_fields multi_match over (text, tool^2) on the
    # multi-field index (key expansion, still one pruned job)
    from sotohp_spark.index import Bool

    for _ in range(REPS):
        t1 = time.time()
        engine.top_k_bool(
            Bool(must=["error retry"], should=[("timeout", 2.0)],
                 must_not=["spark shuffle"], minimum_should_match=1),
            k=10, with_docs=False,
        ).collect()
        record("bool_composed", time.time() - t1)
        t1 = time.time()
        mf_engine.top_k_bool(
            Bool(must=["error retry"], should=[("search", 2.0)],
                 must_not=["browser"], minimum_should_match=1),
            k=10, with_docs=False,
            fields=[("text", 1.0), ("tool", 2.0)],
        ).collect()
        record("bool_over_fields", time.time() - t1)

    # round-6 ES-tier surfaces, warm on the main engine: bool
    # exclusion (excluded postings ride the scoring scan), fuzzy
    # (one dictionary job + scoring), recency sort (WindowGroupLimit
    # over the conjunction)
    for _ in range(REPS):
        t1 = time.time()
        engine.top_k(
            "error retry timeout", 10, with_docs=False,
            must_not="spark shuffle",
        ).collect()
        record("topk_must_not", time.time() - t1)
        t1 = time.time()
        engine.top_k_fuzzy(
            "errox retru timeouf", 10, with_docs=False
        ).collect()
        record("fuzzy_topk", time.time() - t1)
        t1 = time.time()
        engine.top_k_recent("error retry", 10).collect()
        record("sort_recent", time.time() - t1)

    # round-6 session surfaces, warm: N-of-M count filter (inside the
    # block-max scorer), field collapse + recency decay (full scored
    # export + agg/top-k), wildcard (dictionary job + scoring),
    # span_near (positional proximity) on the positional engine
    for _ in range(REPS):
        t1 = time.time()
        engine.top_k(
            "error retry timeout deploy", 10, with_docs=False,
            min_should_match=3,
        ).collect()
        record("topk_min_should_match", time.time() - t1)
        t1 = time.time()
        engine.top_k_collapse("error retry timeout", k=10, by="day").collect()
        record("topk_collapse_day", time.time() - t1)
        t1 = time.time()
        engine.top_k_decay(
            "error retry timeout", origin="2025-04-01 00:00:00", k=10
        ).collect()
        record("topk_decay", time.time() - t1)
        t1 = time.time()
        engine.top_k_wildcard("tim*", k=10, with_docs=False).collect()
        record("wildcard_topk", time.time() - t1)
        t1 = time.time()
        pos_engine.span_near_doc_ids(
            "error retry timeout", slop=2
        ).count()
        record("span_near", time.time() - t1)

    # round-7: query_string — the search-box grammar; the term/prefix
    # shape rides the one-job bool path, the phrase shape adds one
    # positional adjacency job to the uncut (conjunctive-pruned) scan
    for _ in range(REPS):
        t1 = time.time()
        engine.top_k_query_string(
            "+error +(retry | timeout) ti* -deploy search^2",
            k=10, with_docs=False,
        ).collect()
        record("query_string", time.time() - t1)
        t1 = time.time()
        pos_engine.top_k_query_string(
            '+"error retry" timeout', k=10, with_docs=False,
        ).collect()
        record("query_string_phrase", time.time() - t1)

    # round-7 aggregations pack, warm: top_hits (windowed matched
    # set), exact percentiles, filters (one batch job), range+stats
    for _ in range(REPS):
        t1 = time.time()
        engine.top_hits("error retry", k=5, size=3, by="month").collect()
        record("agg_top_hits", time.time() - t1)
        t1 = time.time()
        engine.percentiles("error retry").collect()
        record("agg_percentiles", time.time() - t1)
        t1 = time.time()
        engine.filters_agg({
            "errors": "error retry", "timeouts": "timeout",
            "searches": "search query",
        }).collect()
        record("agg_filters", time.time() - t1)
        t1 = time.time()
        engine.range_agg(
            "error", field="doc_len", edges=(1000.0, 1200.0),
            metric="n_turns",
        ).collect()
        record("agg_range", time.time() - t1)

    # ---- operator-surface headliners on the driver testdata ----
    headline = [
        "bm25_topk_docs",
        "hybrid_rrf_topk",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "ann_cosine_topk",
        "ann_cosine_topk_lsh",
        "q1_pricing_summary",
        "join_order_customer_nation",
        "sessionization",
        "asof_join_last_error",
        "text_metrics",
        "repetition_filter",
        "contamination_check",
        "pii_scrub",
        "dedup_clusters",
    ]
    qs = entrymod.queries()
    for name in headline:
        for _ in range(REPS):
            t1 = time.time()
            # count() forces the full plan without driver-side collect
            qs[name](spark, SF_DIR).count()
            record(name, time.time() - t1)

    # IVF-probed near-dup with a SCALE-SANE cell count.  The registry
    # entry pins n_centroids=8 to match its closed-form sf0.01 oracle
    # (500 vectors -> ~60/cell); reusing that 8 at sf0.1's 2,000
    # vectors makes every cell ~quadratic (measured 37 s median).  A
    # user sizes cells ~sqrt(N) — that config is what this row prices
    # (~4.6 s warm, dominated by the probe-assign + self-join stages).
    from sotohp_spark.operators import ann as _ann

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_vecs = emb.count()
    nc = max(8, int(n_vecs ** 0.5))
    for _ in range(REPS):
        t1 = time.time()
        _ann.embedding_neardup_ivf(
            emb, threshold=0.45, n_centroids=nc, n_probe=2
        ).count()
        record("embedding_neardup_ivf", time.time() - t1)

    timings = {k: round(statistics.median(v), 3) for k, v in samples.items()}
    spread = {
        k: round((max(v) - min(v)) / max(statistics.median(v), 1e-9), 3)
        for k, v in samples.items()
    }
    build_turns_per_sec = n_turns / timings["index_build"]
    p95_ms = statistics.median(p95_samples)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "index-build turns/sec + top-k p95 + operator suite",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "sf": tag,
                "n_turns": n_turns,
                "build_turns_per_sec": round(build_turns_per_sec, 1),
                "topk_p95_ms": round(p95_ms, 1),
                "cpus": CPUS,
                "reps": REPS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
