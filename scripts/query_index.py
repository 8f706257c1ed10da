"""spark-submit entry point: BM25 top-k queries against a built index.

    spark-submit --py-files sotohp_spark.zip scripts/query_index.py \
        --index s3://bucket/index/ --query "error retry timeout" --k 10

    python scripts/query_index.py --index /tmp/idx --query "error retry" \
        --conjunctive
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True, action="append",
                    help="repeatable; >1 query runs the batch path")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--conjunctive", action="store_true")
    args = ap.parse_args()

    from sotohp_spark.index import QueryEngine
    from sotohp_spark.session import get_spark

    spark = get_spark("query-index")
    engine = QueryEngine(spark, args.index)
    engine.preload_term_stats()
    t0 = time.time()
    if len(args.query) == 1:
        engine.top_k(args.query[0], args.k, conjunctive=args.conjunctive).show(
            args.k, truncate=False
        )
    else:
        batch = [(f"q{i}", q, args.k) for i, q in enumerate(args.query)]
        engine.top_k_batch(batch, conjunctive=args.conjunctive).orderBy(
            "query_id", "rank"
        ).show(args.k * len(batch), truncate=False)
    print(f"wall: {time.time() - t0:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
