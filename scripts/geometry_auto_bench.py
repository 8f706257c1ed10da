"""Round-7 directive #1 evidence: the AUTO range geometry
(cfg.range_size=None, derived at build time) must reproduce the
hand-tuned range_size=4096 sf100 positional numbers
(BENCH/p95_es_surfaces_sf100.md) — same corpus, same session,
auto-geometry index vs the hand-tuned index measured back to back.

Usage: python scripts/geometry_auto_bench.py [--sf 100] [--cpus 32]
       [--reps 7]
Appends to BENCH/p95_es_surfaces_sf<sf>.md and prints one JSON line.
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


def measure(engine_ops, reps):
    out = {}
    for name, fn in engine_ops.items():
        fn()  # warm
        lat = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            lat.append((time.time() - t0) * 1000.0)
        out[name] = round(statistics.median(lat), 1)
    return out


def ops(engine):
    return {
        "phrase_match_2hot": lambda: engine.phrase_match_doc_ids(
            "retry timeout").count(),
        "span_near_slop2_ordered": lambda: engine.span_near_doc_ids(
            "error retry timeout", slop=2).count(),
        "span_near_slop2_unordered": lambda: engine.span_near_doc_ids(
            "error retry timeout", slop=2, in_order=False).count(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=100.0)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=7)
    args = ap.parse_args()

    from sotohp_spark.config import EngineConfig
    from sotohp_spark.generator import transcripts_df
    from sotohp_spark.index import IndexBuilder, QueryEngine
    from sotohp_spark.session import get_spark

    spark = get_spark(
        "geometry-auto", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    src = f"/tmp/scaling_turns_{args.sf}"
    if not os.path.exists(src + "/_SUCCESS"):
        transcripts_df(spark, args.sf).repartition(
            64, "conv_id"
        ).write.mode("overwrite").parquet(src)
    turns = spark.read.parquet(src)
    n_turns = turns.count()
    tag = int(args.sf)

    # AUTO geometry: the engine's own default cfg, positions on
    auto_path = f"/tmp/p95_posidx_{tag}_autogeom"
    t0 = time.time()
    meta = IndexBuilder(
        spark, auto_path,
        EngineConfig(shuffle_partitions=args.cpus * 3,
                     ranges_per_batch=64, store_positions=True),
    ).build(turns, input_fingerprint=f"geom-auto-{args.sf}")
    build_s = time.time() - t0
    auto_engine = QueryEngine(spark, auto_path)
    auto_engine.preload_term_stats()
    auto = measure(ops(auto_engine), args.reps)
    auto_meta = {
        "range_size": meta["range_size"],
        "source": meta.get("range_size_source"),
        "build_s": round(build_s, 1),
    }

    # the round-6 hand-tuned index, same session (apples to apples);
    # rebuilt here if a fresh environment lacks it
    hand_path = f"/tmp/p95_posidx_{tag}_r4k"
    if not os.path.exists(f"{hand_path}/_meta/meta.json"):
        IndexBuilder(
            spark, hand_path,
            EngineConfig(shuffle_partitions=args.cpus * 3,
                         ranges_per_batch=64, store_positions=True,
                         range_size=4096),
        ).build(turns, input_fingerprint=f"p95-{args.sf}-pos-r4k")
    hand_engine = QueryEngine(spark, hand_path)
    hand_engine.preload_term_stats()
    hand = measure(ops(hand_engine), args.reps)
    hand_rs = hand_engine.meta["range_size"]

    md = os.path.join(REPO, "BENCH", f"p95_es_surfaces_sf{tag}.md")
    with open(md, "a") as f:
        f.write(
            f"\n## Auto range geometry vs hand-tuned (round 7) — "
            f"sf{tag} ({n_turns:,} turns), warm medians, "
            f"{args.reps} reps, same session\n\n"
            f"Auto geometry derived range_size="
            f"{auto_meta['range_size']} "
            f"(source={auto_meta['source']}; positional build "
            f"{auto_meta['build_s']} s); hand-tuned index "
            f"range_size={hand_rs}.\n\n"
            "| op | auto (ms) | hand-tuned r4k (ms) |\n|---|---|---|\n"
        )
        for name in auto:
            f.write(f"| {name} | {auto[name]} | {hand[name]} |\n")
    print(json.dumps({
        "sf": args.sf, "n_turns": n_turns, "auto_meta": auto_meta,
        "hand_range_size": hand_rs, "auto_ms": auto, "hand_ms": hand,
    }))


if __name__ == "__main__":
    main()
