"""Round-7 directive #6 evidence: percolator registry-as-index at the
round-6 record's scale (101 registered queries vs the sf100 corpus).
The registered-table variant must match the per-call variant's results
with the per-call driver tokenization loop GONE (analyzed once at
registration, reused by every percolate call — the ES
indexed-percolator model).

Usage: python scripts/percolator_registry_bench.py [--sf 100]
       [--cpus 32] [--reps 3]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=100.0)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from sotohp_spark.config import EngineConfig
    from sotohp_spark.generator import transcripts_df
    from sotohp_spark.index import IndexBuilder, QueryEngine
    from sotohp_spark.session import get_spark

    spark = get_spark(
        "percolator-registry", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    tag = int(args.sf)
    path = f"/tmp/p95_idx_{tag}"
    if not os.path.exists(f"{path}/_meta/meta.json"):
        src = f"/tmp/scaling_turns_{args.sf}"
        if not os.path.exists(src + "/_SUCCESS"):
            transcripts_df(spark, args.sf).repartition(
                64, "conv_id"
            ).write.mode("overwrite").parquet(src)
        IndexBuilder(
            spark, path,
            EngineConfig(shuffle_partitions=args.cpus * 3,
                         ranges_per_batch=64),
        ).build(spark.read.parquet(src), input_fingerprint=f"p95-{args.sf}")
    engine = QueryEngine(spark, path)

    # the round-6 deliberately-unselective registry: "error retry
    # tNNNN" — each query matches tens of thousands of docs
    queries = [
        (f"q{i:03d}", f"error retry t{i:04d}") for i in range(100)
    ] + [("q_hot", "error retry")]

    t0 = time.time()
    n_reg = engine.register_percolator_queries(queries, name="sf100rec")
    reg_s = time.time() - t0

    def timed(fn):
        fn()  # warm
        lat = []
        for _ in range(args.reps):
            t1 = time.time()
            lat.append(fn())
            lat[-1] = time.time() - t1
        return round(statistics.median(lat), 2)

    n_pairs_reg = engine.percolate_registered(name="sf100rec").count()
    med_reg = timed(
        lambda: engine.percolate_registered(name="sf100rec").count()
    )
    n_pairs_call = engine.percolate(queries).count()
    med_call = timed(lambda: engine.percolate(queries).count())
    assert n_pairs_reg == n_pairs_call, (n_pairs_reg, n_pairs_call)

    md = os.path.join(REPO, "BENCH", f"p95_es_surfaces_sf{tag}.md")
    with open(md, "a") as f:
        f.write(
            f"\n## Percolator registry-as-index (round 7) — "
            f"{n_reg} registered queries vs the sf{tag} corpus, "
            f"{n_pairs_reg:,} result pairs, median of {args.reps}\n\n"
            f"Registration (analyze once + write the table): "
            f"{reg_s:.2f} s.  Identical result sets "
            f"(count-asserted in-run).\n\n"
            "| variant | median (s) | per-call driver work |\n"
            "|---|---|---|\n"
            f"| percolate (per-call list) | {med_call} | tokenize "
            f"{n_reg} queries + build the term frame every call |\n"
            f"| percolate_registered | {med_reg} | none — one parquet "
            f"read of the persisted (query_id, term, n_terms) table |\n"
        )
    print(json.dumps({
        "sf": args.sf, "n_queries": n_reg, "n_pairs": n_pairs_reg,
        "register_s": round(reg_s, 2),
        "median_registered_s": med_reg, "median_per_call_s": med_call,
    }))


if __name__ == "__main__":
    main()
