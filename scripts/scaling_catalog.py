"""Catalog-leg scaling evidence (round-5 directive #6): every prior
1v4 scaling record runs the PARQUET leg; this runs the same sf-scale
build through CatalogIndexBuilder + the CI catalog double
(tests/fake_catalog.FakeCatalogStore) at two core counts to show the
control plane — versioned meta rows, pending commit points, state-table
appends — adds no serial driver work that breaks scaling.

The fake store's table I/O is parquet underneath (same data plane the
parquet leg uses), so any efficiency gap vs the parquet record is
attributable to the CONTROL plane, which is exactly what this measures.
Note the fake store's copy-on-write appends are O(table) per commit —
a real Iceberg catalog commits metadata-only; the fake is therefore an
UPPER bound on control-plane cost.

Usage: python scripts/scaling_catalog.py [--n 1] [--sf 100]
Writes BENCH/scaling_catalog_<n>v<4n>_sf<sf>.md, prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, shutil, sys, time, os
sys.path.insert(0, {repo!r})
sys.path.insert(0, {repo!r} + "/tests")
from sotohp_spark.config import EngineConfig
from sotohp_spark.generator import transcripts_df
from sotohp_spark.index.catalog_build import CatalogIndexBuilder
from sotohp_spark.session import get_spark
from fake_catalog import FakeCatalogStore

cores = int(sys.argv[1]); sf = float(sys.argv[2])
spark = get_spark(f"cat-scaling-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores)
src = f"/tmp/scaling_turns_{{sf}}"
if not os.path.exists(src + "/_SUCCESS"):
    transcripts_df(spark, sf).repartition(64, "conv_id").write.mode(
        "overwrite").parquet(src)
turns = spark.read.parquet(src)
n_turns = turns.count()
root = f"/tmp/cat_scaling_{{cores}}"
shutil.rmtree(root, ignore_errors=True)
cfg = EngineConfig(shuffle_partitions=cores * 3, ranges_per_batch=64,
                   range_size=768)
store = FakeCatalogStore(spark, root, cfg)
t0 = time.time()
CatalogIndexBuilder(spark, store, cfg).build(
    turns, input_fingerprint=f"cat-scal-{{sf}}")
build_sec = time.time() - t0
print("RESULT " + json.dumps({{
    "cores": cores, "n_turns": n_turns, "build_sec": build_sec,
    "build_turns_per_sec": n_turns / build_sec,
}}))
shutil.rmtree(root, ignore_errors=True)
spark.stop()
"""


def run_at(cores, sf):
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1)
    ap.add_argument("--sf", type=float, default=100.0)
    ap.add_argument("--reps", type=int, default=1)
    args = ap.parse_args()
    n, n4 = args.n, args.n * 4

    runs_n = [run_at(n, args.sf) for _ in range(args.reps)]
    runs_n4 = [run_at(n4, args.sf) for _ in range(args.reps)]
    r_n = max(runs_n, key=lambda r: r["build_turns_per_sec"])
    r_n4 = max(runs_n4, key=lambda r: r["build_turns_per_sec"])
    eff = r_n4["build_turns_per_sec"] / (4 * r_n["build_turns_per_sec"])

    out = {
        "sf": args.sf,
        "leg": "catalog(FakeCatalogStore)",
        "n_cores": n,
        "n4_cores": n4,
        "n_turns": r_n["n_turns"],
        "build_sec_n": round(r_n["build_sec"], 1),
        "build_sec_n4": round(r_n4["build_sec"], 1),
        "turns_per_sec_n": round(r_n["build_turns_per_sec"], 0),
        "turns_per_sec_n4": round(r_n4["build_turns_per_sec"], 0),
        "efficiency": round(eff, 3),
    }
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(
        f"{REPO}/BENCH/scaling_catalog_{n}v{n4}_sf{int(args.sf)}.md", "w"
    ) as f:
        f.write(f"""# Catalog-leg 1v4 scaling — sf={args.sf} \
({r_n['n_turns']:,} turns), fresh JVM per run

Same build as the parquet-leg record, routed through
CatalogIndexBuilder over the CI catalog double (FakeCatalogStore —
parquet data plane + versioned control tables; its copy-on-write
appends make it an UPPER bound on control-plane cost vs a real
metadata-only Iceberg commit).

| cores | build (s) | turns/s |
|---|---|---|
| {n} | {out['build_sec_n']} | {out['turns_per_sec_n']:.0f} |
| {n4} | {out['build_sec_n4']} | {out['turns_per_sec_n4']:.0f} |

Catalog-leg scaling efficiency = **{out['efficiency']}** (compare the
parquet-leg record in BENCH/BASELINE.md; a gap beyond noise would
mean the control plane serializes driver work — pending rows, state
appends, meta versions — which it must not).
""")
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
