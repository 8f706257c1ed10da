"""Round-6 late-session ES surfaces at scale: warm latency of
minimum_should_match / collapse / decay / wildcard / term_vectors /
msearch on an sf100 corpus (2.15M turns / 100k conversations), plus
span_near on a positional sf100 index — the evidence that each
surface keeps its declared cost class at a 100k-doc corpus (posting
volume / dictionary range / matched-set size, never a corpus scan).

Usage: python scripts/es_surfaces2_bench.py [--sf 100] [--cpus 32]
       [--reps 10]
Appends a section to BENCH/p95_es_surfaces_sf<sf>.md and prints one
JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=100.0)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    from sotohp_spark.config import EngineConfig
    from sotohp_spark.generator import transcripts_df
    from sotohp_spark.index import IndexBuilder, QueryEngine
    from sotohp_spark.session import get_spark

    spark = get_spark(
        "es-surfaces2", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    src = f"/tmp/scaling_turns_{args.sf}"
    if not os.path.exists(src + "/_SUCCESS"):
        transcripts_df(spark, args.sf).repartition(
            64, "conv_id"
        ).write.mode("overwrite").parquet(src)
    turns = spark.read.parquet(src)
    n_turns = turns.count()

    path = f"/tmp/p95_idx_{int(args.sf)}"
    IndexBuilder(
        spark, path,
        EngineConfig(shuffle_partitions=args.cpus * 3, ranges_per_batch=64),
    ).build(turns, input_fingerprint=f"p95-{args.sf}")
    engine = QueryEngine(spark, path)

    pos_path = f"/tmp/p95_posidx_{int(args.sf)}"
    IndexBuilder(
        spark, pos_path,
        EngineConfig(shuffle_partitions=args.cpus * 3, ranges_per_batch=64,
                     store_positions=True),
    ).build(turns, input_fingerprint=f"p95-{args.sf}-pos")
    pos_engine = QueryEngine(spark, pos_path)

    surfaces = {
        "plain_topk": lambda: engine.top_k(
            "error retry timeout", 10, with_docs=False).collect(),
        "min_should_match_3of4": lambda: engine.top_k(
            "error retry timeout deploy", 10, with_docs=False,
            min_should_match=3).collect(),
        "wildcard_topk": lambda: engine.top_k_wildcard(
            "tim*", 10, with_docs=False).collect(),
        "term_vectors": lambda: engine.term_vectors(12345).collect(),
        "collapse_day": lambda: engine.top_k_collapse(
            "error retry timeout", 10, by="day").collect(),
        "decay_topk": lambda: engine.top_k_decay(
            "error retry timeout", origin="2025-04-01 00:00:00",
            k=10).collect(),
        "span_near_slop2": lambda: pos_engine.span_near_doc_ids(
            "error retry timeout", slop=2).count(),
    }
    out = {}
    for name, fn in surfaces.items():
        fn()  # warm
        lat = []
        for _ in range(args.reps):
            t0 = time.time()
            fn()
            lat.append((time.time() - t0) * 1000.0)
        lat.sort()
        out[name] = {
            "p95_ms": round(lat[max(0, int(len(lat) * 0.95) - 1)], 1),
            "median_ms": round(statistics.median(lat), 1),
        }

    tag = int(args.sf)
    md = os.path.join(REPO, "BENCH", f"p95_es_surfaces_sf{tag}.md")
    with open(md, "a") as f:
        f.write(
            f"\n## Late-session surfaces at sf{tag} "
            f"({n_turns:,} turns), warm, {args.reps} reps\n\n"
            "| surface | p95 (ms) | median (ms) |\n|---|---|---|\n"
        )
        for name, v in out.items():
            f.write(f"| {name} | {v['p95_ms']} | {v['median_ms']} |\n")
    print(json.dumps({"sf": args.sf, "n_turns": n_turns, **out}))


if __name__ == "__main__":
    main()
