"""spark-submit entry point: build (or resume) a transcript index.

Cluster usage (the north rule's deployment shape):

    spark-submit --py-files sotohp_spark.zip scripts/build_index.py \
        --turns s3://bucket/transcripts/ --index s3://bucket/index/ \
        --fingerprint v1

Local smoke:  python scripts/build_index.py --sf 1.0 --index /tmp/idx
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", help="path to a turns table (parquet)")
    ap.add_argument("--sf", type=float, help="OR: generate deterministic transcripts at this sf")
    ap.add_argument("--index", required=True)
    ap.add_argument("--fingerprint", default="cli")
    ap.add_argument("--range-size", type=int, default=None)
    ap.add_argument("--reindex", action="store_true", help="clear checkpoint + full rebuild")
    args = ap.parse_args()

    from sotohp_spark.config import DEFAULT, EngineConfig
    from sotohp_spark.index import IndexBuilder
    from sotohp_spark.session import get_spark

    spark = get_spark("build-index")
    if args.turns:
        turns = spark.read.parquet(args.turns)
    elif args.sf:
        from sotohp_spark.generator import transcripts_df

        turns = transcripts_df(spark, args.sf)
    else:
        ap.error("one of --turns / --sf is required")

    cfg = (
        EngineConfig(range_size=args.range_size) if args.range_size else DEFAULT
    )
    builder = IndexBuilder(spark, args.index, cfg)
    t0 = time.time()
    if args.reindex:
        meta = builder.reindex_all(turns, input_fingerprint=args.fingerprint)
    else:
        meta = builder.build(turns, input_fingerprint=args.fingerprint)
    print(json.dumps({"built": True, "wall_sec": round(time.time() - t0, 2),
                      "n_docs": meta["n_docs"], "avgdl": meta["avgdl"]}))
    spark.stop()


if __name__ == "__main__":
    main()
