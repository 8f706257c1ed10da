"""Pin the positional build tax (round-5 directive #4): the driver
slot showed `index_build_positional` anywhere from +6% to +2x over the
positionless build across rounds — too wide to price.  This script
runs the SAME corpus through positionless (A) and positional (B)
builds INTERLEAVED (A B A B ...) in fresh subprocesses on the same
slot, so slot load drift hits both arms equally, and reports the
median ratio with spread.

Usage: python scripts/positional_tax.py [--sf 0.1 4] [--cpus 8]
       [--reps 3]
Writes BENCH/positional_tax.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, shutil, sys, time, os
sys.path.insert(0, {repo!r})
from sotohp_spark.config import EngineConfig
from sotohp_spark.generator import transcripts_df
from sotohp_spark.index import IndexBuilder
from sotohp_spark.session import get_spark

cores = int(sys.argv[1]); sf = float(sys.argv[2])
positional = sys.argv[3] == "pos"
spark = get_spark("postax", master=f"local[{{cores}}]",
                  shuffle_partitions=cores)
src = f"/tmp/scaling_turns_{{sf}}"
if not os.path.exists(src + "/_SUCCESS"):
    transcripts_df(spark, sf).repartition(64, "conv_id").write.mode(
        "overwrite").parquet(src)
turns = spark.read.parquet(src)
n_turns = turns.count()
path = f"/tmp/postax_idx_{{os.getpid()}}"
shutil.rmtree(path, ignore_errors=True)
cfg = EngineConfig(shuffle_partitions=cores * 3, ranges_per_batch=64,
                   range_size=768, store_positions=positional)
t0 = time.time()
IndexBuilder(spark, path, cfg).build(
    turns, input_fingerprint=f"postax-{{sf}}-{{positional}}")
sec = time.time() - t0
# payload sizes: what the option actually buys/costs on disk
import glob
pbytes = sum(os.path.getsize(p) for p in glob.glob(
    path + "/postings/range_bucket=*/*.parquet"))
print("RESULT " + json.dumps({{
    "positional": positional, "n_turns": n_turns, "build_sec": sec,
    "postings_bytes": pbytes,
}}))
shutil.rmtree(path, ignore_errors=True)
spark.stop()
"""


def run_one(cores, sf, positional):
    code = WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(sf),
         "pos" if positional else "plain"],
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
    ap.add_argument("--sf", type=float, nargs="+", default=[0.1, 4.0])
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    results = {}
    for sf in args.sf:
        plain, pos = [], []
        for _ in range(args.reps):  # interleaved on the same slot
            plain.append(run_one(args.cpus, sf, False))
            pos.append(run_one(args.cpus, sf, True))
        p_secs = [r["build_sec"] for r in plain]
        q_secs = [r["build_sec"] for r in pos]
        ratios = sorted(b / a for a, b in zip(p_secs, q_secs))
        results[str(sf)] = {
            "n_turns": plain[0]["n_turns"],
            "plain_sec": [round(s, 2) for s in p_secs],
            "pos_sec": [round(s, 2) for s in q_secs],
            "ratio_median": round(statistics.median(ratios), 3),
            "ratio_min": round(ratios[0], 3),
            "ratio_max": round(ratios[-1], 3),
            "bytes_ratio": round(
                pos[0]["postings_bytes"] / plain[0]["postings_bytes"], 3
            ),
        }
        print(f"sf={sf}: {results[str(sf)]}", flush=True)

    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    lines = "\n".join(
        f"| {sf} | {r['n_turns']:,} | {r['plain_sec']} | {r['pos_sec']} | "
        f"{r['ratio_median']} ({r['ratio_min']}..{r['ratio_max']}) | "
        f"{r['bytes_ratio']} |"
        for sf, r in results.items()
    )
    with open(f"{REPO}/BENCH/positional_tax.md", "w") as f:
        f.write(f"""# Positional build tax — A/B on one slot, \
local[{args.cpus}], {args.reps} interleaved reps each

Same corpus, fresh JVM per build, arms interleaved (plain, pos, plain,
pos, ...) so slot load drift hits both equally.  Ratio = positional /
positionless wall time; bytes ratio = on-disk postings size.

| sf | turns | plain build s (reps) | positional build s (reps) | \
time ratio median (min..max) | postings bytes ratio |
|---|---|---|---|---|---|
{lines}

Mechanism: one tokenizer pass emits tf AND positions (build.py —
tokenize_with_positions routes both from the same Arrow batch); the
tax is the positional varbyte streams (encode + shuffle + write) and
the wider postings rows.  The option is off by default and priced
here; phrase-heavy deployments buy index-only phrase matching and
phrase_ranked with it.
""")
    print("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
