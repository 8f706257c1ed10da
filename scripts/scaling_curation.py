"""Curation-tier scaling evidence (round-5 directive): the dedup chain
(shingle/jaccard candidate pairs -> connected-component clusters ->
deduped-corpus keep list) run end-to-end at two parallelism levels on
the same input — the 100-TB claim of the curation tier made
measurable, with the same protocol and honesty notes as the
index-build scaling record (scripts/scaling.py): fresh JVM per run,
machine compute ceiling measured with a pure-python burn, best-of-N
repetitions.

Usage: python scripts/scaling_curation.py [--n 1] [--sf 25] [--reps 2]
Writes BENCH/scaling_curation_<n>v<4n>_sf<sf>.md and prints one JSON
line.
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
sys.path.insert(0, os.path.join(REPO, "scripts"))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from sotohp_spark.generator import transcripts_df
from sotohp_spark.operators.docs import materialize_documents
from sotohp_spark.operators import dedup
from sotohp_spark.session import get_spark

cores = int(sys.argv[1]); sf = float(sys.argv[2])
spark = get_spark(f"cur-scal-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=max(cores * 3, 8))
# documents = materialized conversations of the deterministic
# transcript generator, truncated to the driver documents-table shape
# (~400 chars), with a planted 10% near-duplicate population (same
# text + one appended token -> jaccard > 0.5) so the cluster/keep
# stages do real work; generation+write excluded from the timed region
src = f"/tmp/cur_docs_v2_{{sf}}"
if not os.path.exists(src + "/_SUCCESS"):
    base = materialize_documents(transcripts_df(spark, sf)).select(
        F.xxhash64("conv_id").alias("doc_id"),
        F.substring(F.col("doc_text"), 1, 400).alias("text"),
    )
    dups = base.where(F.pmod("doc_id", F.lit(10)) == 0).select(
        (F.col("doc_id") + F.lit(1)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" duplicated")).alias("text"),
    )
    base.unionByName(dups).repartition(64).write.mode(
        "overwrite").parquet(src)
docs = spark.read.parquet(src)
n_docs = docs.count()

t0 = time.time()
# the driver's dedup_keep_list chain, verbatim shapes:
# candidate pairs (inverted shingle index, hot-shingle df cap) ->
# min-label clusters (pointer jumping) -> keep list (anti join)
pairs = dedup.ngram_jaccard_pairs(
    docs, threshold=0.5, max_shingle_df=200
).select("doc_a", "doc_b")
clusters = dedup.duplicate_clusters(pairs)
doomed = clusters.where(F.col("doc_id") != F.col("cluster_id")).select(
    "doc_id"
)
n_kept = docs.join(doomed, "doc_id", "left_anti").count()
chain_sec = time.time() - t0
print("RESULT " + json.dumps({{
    "cores": cores, "n_docs": n_docs, "n_kept": n_kept,
    "chain_sec": chain_sec, "docs_per_sec": n_docs / chain_sec,
}}))
spark.stop()
"""


def run_at(cores: int, sf: float) -> dict:
    code = WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(sf)],
        capture_output=True, text=True, timeout=3000, cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"worker failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main():
    from scaling import machine_speedup  # same burn-ceiling protocol

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1)
    ap.add_argument("--sf", type=float, default=25.0)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    n, n4 = args.n, args.n * 4

    ceiling = machine_speedup(n, n4)
    runs_n = [run_at(n, args.sf) for _ in range(args.reps)]
    runs_n4 = [run_at(n4, args.sf) for _ in range(args.reps)]
    r_n = max(runs_n, key=lambda r: r["docs_per_sec"])
    r_n4 = max(runs_n4, key=lambda r: r["docs_per_sec"])
    assert r_n["n_kept"] == r_n4["n_kept"], "chain result differs by cores!"

    speedup = r_n4["docs_per_sec"] / r_n["docs_per_sec"]
    eff = speedup / 4
    eff_vs_machine = speedup / ceiling

    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    path = f"{REPO}/BENCH/scaling_curation_{n}v{n4}_sf{int(args.sf)}.md"
    with open(path, "w") as f:
        f.write(f"""# Curation-tier scaling — dedup chain, sf={args.sf}

Same deterministic input ({r_n['n_docs']:,} conversation documents
from the transcript generator, read from parquet), fresh JVM per run,
`local[{n}]` vs `local[{n4}]` (the N vs 4N executor proxy), best of
{args.reps} repetitions.  Timed region: shingle/jaccard candidate
pairs (inverted shingle index, hot-shingle df cap 200) ->
connected-component clusters (pointer-jumped min-label propagation,
one action per round) -> deduped keep list — the driver's
`dedup_keep_list` chain verbatim.  Result identical at both core
counts ({r_n['n_kept']:,} docs kept).

| cores | chain wall (s) | docs/s |
|---|---|---|
| {n} | {r_n['chain_sec']:.2f} | {r_n['docs_per_sec']:.1f} |
| {n4} | {r_n4['chain_sec']:.2f} | {r_n4['docs_per_sec']:.1f} |

- speedup {n}->{n4} cores: **{speedup:.2f}x**
- scaling efficiency (speedup / 4): **{eff:.3f}**
- measured machine compute ceiling {n}->{n4} procs (pure-python
  burn, no Spark): {ceiling:.2f}x -> efficiency vs ceiling:
  **{eff_vs_machine:.3f}**

Honesty notes: single shared JVM + co-tenant noise (±25% band
documented in BENCH/BASELINE.md); the ceiling row shows how much of
the ideal 4x this box can physically deliver to ANY workload.
""")
    print("RESULT " + json.dumps({
        "n": n, "n4": n4, "sf": args.sf,
        "docs": r_n["n_docs"],
        "docs_per_sec_n": round(r_n["docs_per_sec"], 1),
        "docs_per_sec_n4": round(r_n4["docs_per_sec"], 1),
        "speedup": round(speedup, 2), "eff": round(eff, 3),
        "ceiling": round(ceiling, 2),
        "eff_vs_machine": round(eff_vs_machine, 3),
    }))


if __name__ == "__main__":
    main()
