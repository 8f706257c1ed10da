"""spark-submit entry point: offline index schema migration + parity
verify (the reference's MediaMigrationTool.scala:24-136 analog).

    spark-submit --py-files sotohp_spark.zip scripts/migrate_index.py \
        --src s3://bucket/index_v1/ --dst s3://bucket/index_v2/

Local smoke:  python scripts/migrate_index.py --src /tmp/idx --dst /tmp/idx2
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="source index path")
    ap.add_argument("--dst", required=True, help="target index path (emptied)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from sotohp_spark.index.migrate import migrate_index
    from sotohp_spark.session import get_spark

    spark = get_spark("migrate-index", master=args.master)
    report = migrate_index(spark, args.src, args.dst)
    print(json.dumps(report, default=str))


if __name__ == "__main__":
    main()
