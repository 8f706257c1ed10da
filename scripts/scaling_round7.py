"""Round-7 strong-scaling record (north rule: two parallelism levels,
same input): the NEW query surfaces — multi_match best_fields and the
composable bool query — timed as one fixed unit at local[1] vs
local[4], fresh JVM per arm, over a multi-field sf100 index built once
at full width (the serving shape: index exists, queries scale).

Usage: python scripts/scaling_round7.py [--sf 100] [--build-cpus 32]
       [--reps 3]
Appends to BENCH/p95_es_surfaces_sf<sf>.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from sotohp_spark.index import Bool, QueryEngine
from sotohp_spark.session import get_spark

cores, path, reps = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
spark = get_spark(f"r7scale-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=max(cores, 2))
engine = QueryEngine(spark, path)
engine.preload_term_stats()
# force the distributed per-range path: the driver-local fast path is
# single-threaded by design and would hide executor scaling
engine.LOCAL_PATH_MAX_POSTINGS = 0

MM = [("search python", [("text", 1.0), ("tool", 2.0)]),
      ("error retry search", [("text", 1.0), ("tool", 3.0)]),
      ("bash editor timeout", ["text", ("tool", 2.0)])]
BOOLS = [
    Bool(must=["error retry"], should=[("timeout", 2.0)],
         must_not=["t0040"], minimum_should_match=1),
    Bool(must=["search", "query"], should=[("tool", 1.5)]),
    Bool(should=["error retry", "timeout", "search query"],
         minimum_should_match=2),
]

def unit():
    for qt, fields in MM:
        engine.top_k_multi_match(qt, fields, k=10,
                                 with_docs=False).collect()
    for b in BOOLS:
        engine.top_k_bool(b, k=10, with_docs=False).collect()

def overhead_unit():
    # 6 rare-term queries through the SAME distributed path: per-query
    # fixed cost (term-stats lookup, job scheduling, k-row merge) with
    # negligible decode compute — the subtraction baseline for the
    # fixed-overhead decomposition
    for t in ("t4990", "t4991", "t4992", "t4993", "t4994", "t4995"):
        engine.top_k(t, k=10, with_docs=False).collect()

unit()  # warm (postings file footers, term stats)
overhead_unit()
best, best_ov = None, None
for _ in range(reps):
    t0 = time.time()
    unit()
    w = time.time() - t0
    best = w if best is None or w < best else best
    t0 = time.time()
    overhead_unit()
    w = time.time() - t0
    best_ov = w if best_ov is None or w < best_ov else best_ov
print("RESULT " + json.dumps({{"cores": cores, "unit_sec": best,
                               "overhead_sec": best_ov}}))
spark.stop()
"""


def run_arm(cores: int, path: str, reps: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(repo=REPO),
         str(cores), path, str(reps)],
        capture_output=True, text=True, timeout=3000, cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"arm failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=100.0)
    ap.add_argument("--build-cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from sotohp_spark.config import EngineConfig
    from sotohp_spark.generator import transcripts_df
    from sotohp_spark.index import IndexBuilder
    from sotohp_spark.session import get_spark

    tag = int(args.sf)
    path = f"/tmp/r7_mf_idx_{tag}"
    if not os.path.exists(f"{path}/_meta/meta.json"):
        spark = get_spark(
            "r7scale-build", master=f"local[{args.build_cpus}]",
            shuffle_partitions=args.build_cpus,
        )
        src = f"/tmp/scaling_turns_{args.sf}"
        if not os.path.exists(src + "/_SUCCESS"):
            transcripts_df(spark, args.sf).repartition(
                64, "conv_id"
            ).write.mode("overwrite").parquet(src)
        IndexBuilder(
            spark, path,
            EngineConfig(shuffle_partitions=args.build_cpus * 3,
                         ranges_per_batch=64,
                         extra_fields=("tool",)),
        ).build(spark.read.parquet(src),
                input_fingerprint=f"r7-mf-{args.sf}")
        spark.stop()

    r1 = run_arm(1, path, args.reps)
    r4 = run_arm(4, path, args.reps)
    speedup = r1["unit_sec"] / r4["unit_sec"]
    eff = speedup / 4.0
    # fixed-overhead decomposition (the round-6 span_near methodology):
    # per-query fixed cost measured with rare-term queries through the
    # same path; the COMPUTE part is what executor count can touch
    c1 = max(r1["unit_sec"] - r1["overhead_sec"], 1e-9)
    c4 = max(r4["unit_sec"] - r4["overhead_sec"], 1e-9)
    eff_c = (c1 / c4) / 4.0
    md = os.path.join(REPO, "BENCH", f"p95_es_surfaces_sf{tag}.md")
    with open(md, "a") as f:
        f.write(
            f"\n## Round-7 surfaces strong-scaling — sf{tag}, "
            f"multi-field index (auto geometry), fresh JVM per arm, "
            f"best of {args.reps}\n\n"
            "Unit = 3 multi_match best_fields + 3 composable bool "
            "queries, distributed per-range path forced.  Overhead = "
            "6 rare-term queries through the same path (per-query "
            "fixed cost: term-stats lookup + job scheduling + k-row "
            "merge — executor count cannot touch it).\n\n"
            "| cores | unit (s) | overhead (s) | compute (s) |\n"
            "|---|---|---|---|\n"
            f"| 1 | {r1['unit_sec']:.2f} | {r1['overhead_sec']:.2f} "
            f"| {c1:.2f} |\n"
            f"| 4 | {r4['unit_sec']:.2f} | {r4['overhead_sec']:.2f} "
            f"| {c4:.2f} |\n\n"
            f"Raw efficiency {eff:.3f} ({speedup:.2f}x); COMPUTE-part "
            f"efficiency {eff_c:.3f} — the raw number is bounded by "
            f"the ~{r1['overhead_sec'] / 6:.2f} s/query fixed floor "
            f"over a fast unit, the same fixed-overhead regime the "
            f"round-6 span_near sf100 arm decomposed.\n"
        )
    print(json.dumps({
        "sf": args.sf, "unit_1core_s": r1["unit_sec"],
        "unit_4core_s": r4["unit_sec"],
        "overhead_1core_s": r1["overhead_sec"],
        "overhead_4core_s": r4["overhead_sec"],
        "speedup": round(speedup, 2), "efficiency": round(eff, 3),
        "efficiency_compute": round(eff_c, 3),
    }))


if __name__ == "__main__":
    main()
