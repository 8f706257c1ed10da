"""Isolation benchmarks for OPTIMIZATION r08 (guide §1).

NOT the driver's bench (bench.py is frozen): this file times individual
hot operators with the noop sink and job labels so the computation is
measured, not the sink, and per-stage behavior is attributable in logs.

Usage: python bench_extra.py [section ...]
  sections: ivf clusters jaccard bm25 hybrid minhash simhash all
Reads $SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0) and
$SPARK_GRAFT_CPUS (default 32) like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    from pyspark.sql import functions as F  # noqa

    import __spark_entry__ as entrymod
    from sotohp_spark.session import get_spark

    want = set(sys.argv[1:]) or {"all"}

    def on(name):
        return "all" in want or name in want

    spark = get_spark("bench_extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    sc = spark.sparkContext
    out: dict[str, float] = {}

    def timed(name, fn, reps=REPS):
        best = None
        for i in range(reps):
            sc.setJobDescription(f"{name} rep{i}")
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            print(f"  {name} rep{i}: {dt:.2f}s", flush=True)
        out[name] = round(best, 3)
        sc.setJobDescription(None)

    qs = entrymod.queries()

    if on("ivf"):
        from sotohp_spark.operators import ann as _ann

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        n_vecs = emb.count()
        nc = max(8, int(n_vecs ** 0.5))
        print(f"ivf: n_vecs={n_vecs} nc={nc}")
        timed("embedding_neardup_ivf_bench", lambda: _ann.embedding_neardup_ivf(
            emb, threshold=0.45, n_centroids=nc, n_probe=2).count())
        timed("embedding_neardup_ivf_registry",
              lambda: qs["embedding_neardup_ivf"](spark, SF_DIR).count())

    if on("jaccard") or on("clusters"):
        from sotohp_spark.operators import dedup

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

        if on("jaccard"):
            timed("ngram_jaccard_pairs", lambda: dedup.ngram_jaccard_pairs(
                docs, threshold=0.5, max_shingle_df=200).count())
        if on("clusters"):
            timed("dedup_clusters", lambda: qs["dedup_clusters"](
                spark, SF_DIR).count())

    if on("bm25"):
        timed("bm25_topk_docs", lambda: qs["bm25_topk_docs"](spark, SF_DIR).count())
    if on("hybrid"):
        timed("hybrid_rrf_topk", lambda: qs["hybrid_rrf_topk"](spark, SF_DIR).count())
    if on("minhash"):
        timed("dedup_minhash_lsh", lambda: qs["dedup_minhash_lsh"](spark, SF_DIR).count())
    if on("simhash"):
        timed("dedup_simhash", lambda: qs["dedup_simhash"](spark, SF_DIR).count())

    print(json.dumps({"sf": os.path.basename(SF_DIR.rstrip("/")),
                      "cpus": CPUS, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
