"""Segment-count degradation bench (round-5 directive #2): the
streaming steady state leaves one index segment per append.  Measure
what MANY small segments cost — time-window planning
(_doc_bounds_for_ts walks per-segment bounds), warm windowed and
plain top-k p95, and the physical file count — at 1 / 32 / 256
segments over the SAME corpus, then apply `merge_segments` to the
worst case and re-measure.

Usage: python scripts/segments_bench.py [--sf 0.1] [--cpus 8]
       [--reps 3] [--segments 1 32 256]
Writes BENCH/segments_sf<sf>.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_segmented(spark, pdf, path, cfg, n_segments):
    """Base build of the first time chunk + n-1 in-order appends."""
    from sotohp_spark.index import IndexBuilder
    from sotohp_spark.streaming.incremental import append_conversations

    first_ts = pdf.groupby("conv_id")["ts"].min().sort_values()
    convs = list(first_ts.index)
    size = (len(convs) + n_segments - 1) // n_segments
    chunks = [
        pdf[pdf["conv_id"].isin(set(convs[i:i + size]))]
        for i in range(0, len(convs), size)
    ]
    t0 = time.time()
    IndexBuilder(spark, path, cfg).build(
        spark.createDataFrame(chunks[0]),
        input_fingerprint=f"seg-{n_segments}",
    )
    for c in chunks[1:]:
        append_conversations(spark, path, spark.createDataFrame(c), cfg)
    return time.time() - t0, len(chunks)


def measure(spark, path, reps):
    """(planning_ms, p95_window_ms, p95_plain_ms, postings_files,
    n_segments) for the index at ``path`` — all warm."""
    import glob as pyglob

    from sotohp_spark.index import QueryEngine

    eng = QueryEngine(spark, path)
    eng.preload_term_stats()
    w_lo = datetime.datetime(2025, 2, 1)
    w_hi = datetime.datetime(2025, 6, 30)
    queries = ["error retry timeout", "search query", "tool call",
               "agent response", "timeout error"]

    # driver-side planning cost alone (bounds translation; may run a
    # partial-segment scan job — that IS the planning cost)
    eng._doc_bounds_for_ts(w_lo, w_hi)  # warm
    t0 = time.time()
    for _ in range(max(reps, 3)):
        eng._doc_bounds_for_ts(w_lo, w_hi)
    planning_ms = (time.time() - t0) / max(reps, 3) * 1000

    def p95(fn):
        lat = []
        for q in queries:
            fn(q)  # warm
        for _ in range(reps):
            for q in queries:
                t1 = time.time()
                fn(q)
                lat.append((time.time() - t1) * 1000)
        lat.sort()
        return lat[max(0, int(len(lat) * 0.95) - 1)]

    p95_win = p95(
        lambda q: eng.top_k(q, 10, with_docs=False,
                            ts_min=w_lo, ts_max=w_hi).collect()
    )
    p95_plain = p95(
        lambda q: eng.top_k(q, 10, with_docs=False).collect()
    )
    files = len(pyglob.glob(f"{path}/postings/range_bucket=*/*.parquet"))
    return {
        "planning_ms": round(planning_ms, 1),
        "p95_window_ms": round(p95_win, 1),
        "p95_plain_ms": round(p95_plain, 1),
        "postings_files": files,
        "n_segments": len(eng.meta["segments"]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--segments", type=int, nargs="+",
                    default=[1, 32, 256])
    ap.add_argument("--no-auto-merge", action="store_true",
                    help="disable the default background-merge policy "
                         "(auto_merge_segments=None) to reproduce the "
                         "raw fragmentation cliff")
    args = ap.parse_args()

    from sotohp_spark.config import EngineConfig
    from sotohp_spark.generator import generate_transcripts_pdf
    from sotohp_spark.session import get_spark
    from sotohp_spark.streaming.incremental import merge_segments

    spark = get_spark("segments-bench", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    pdf = generate_transcripts_pdf(args.sf)
    cfg = EngineConfig(
        shuffle_partitions=args.cpus,
        auto_merge_segments=None if args.no_auto_merge else 8,
    )
    mode = "noauto" if args.no_auto_merge else "auto"
    rows = {}
    worst_path = None
    for n in args.segments:
        path = f"/tmp/segbench_{mode}_{args.sf}_{n}"
        if not os.path.exists(f"{path}/_meta/meta.json"):
            import shutil

            shutil.rmtree(path, ignore_errors=True)
            wall, built = build_segmented(spark, pdf, path, cfg, n)
            print(f"built {built} segments in {wall:.1f}s", flush=True)
        rows[n] = measure(spark, path, args.reps)
        worst_path = path
        print(f"segments={n}: {rows[n]}", flush=True)

    # merge the worst case and re-measure (fresh copy so the cached
    # segmented index stays reusable)
    import shutil

    merged_path = worst_path + "_merged"
    shutil.rmtree(merged_path, ignore_errors=True)
    shutil.copytree(worst_path, merged_path)
    t0 = time.time()
    merge_segments(spark, merged_path, cfg)
    merge_sec = time.time() - t0
    merged = measure(spark, merged_path, args.reps)
    print(f"after merge_segments ({merge_sec:.1f}s): {merged}", flush=True)

    out = {
        "sf": args.sf,
        "cpus": args.cpus,
        "reps": args.reps,
        "auto_merge": None if args.no_auto_merge else 8,
        "by_segments": rows,
        "merged": merged,
        "merge_sec": round(merge_sec, 1),
    }
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    lines = "\n".join(
        f"| {n} | {r['planning_ms']} | {r['p95_window_ms']} | "
        f"{r['p95_plain_ms']} | {r['postings_files']} |"
        for n, r in sorted(rows.items())
    )
    suffix = "_noauto" if args.no_auto_merge else "_auto"
    with open(f"{REPO}/BENCH/segments_sf{args.sf}{suffix}.md", "w") as f:
        f.write(f"""# Segment-count degradation — sf={args.sf}, \
local[{args.cpus}], {args.reps} reps, auto_merge_segments=\
{out['auto_merge']}

Same corpus, built as 1 append vs many in-order appends (the
streaming steady state).  "planning" = _doc_bounds_for_ts wall time
for a 5-month window (driver bounds translation + any
partial-segment scan); p95s are warm.

| segments | planning ms | windowed p95 ms | plain p95 ms | postings files |
|---|---|---|---|---|
{lines}

After `merge_segments` on the {max(rows)}-segment index
({out['merge_sec']} s, metadata coalesce + bucket-local consolidation):

| segments | planning ms | windowed p95 ms | plain p95 ms | postings files |
|---|---|---|---|---|
| {merged['n_segments']} | {merged['planning_ms']} | \
{merged['p95_window_ms']} | {merged['p95_plain_ms']} | \
{merged['postings_files']} |

Scores and ranks are identical before/after the merge
(tests/test_merge_segments.py pins this on both storage legs).
""")
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
