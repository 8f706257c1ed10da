"""Replicates the driver's correctness gate: run every queries() entry
on Spark at sf0.01 and its oracle_sql() on DuckDB over the same
parquet, compare row count, column names, and order-insensitive
values.  Usage: python scripts/selfcheck.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF_DIR = os.environ.get("SELFCHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        else:
            try:
                if df[c].map(lambda v: isinstance(v, float)).any():
                    df[c] = df[c].map(
                        lambda v: round(v, 6) if isinstance(v, float) else v
                    )
            except Exception:
                pass
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name, spark_pdf, duck_pdf) -> list:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = canon(spark_pdf), canon(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].tolist(), b[c].tolist()
            for i, (x, y) in enumerate(zip(av, bv)):
                same = (
                    (x == y)
                    or (x is None and y is None)
                    or (isinstance(x, float) and isinstance(y, float)
                        and (math.isnan(x) and math.isnan(y) or abs(x - y) <= 1e-6))
                    or (pd.isna(x) and pd.isna(y))
                )
                if not same:
                    problems.append(f"col {c} row {i}: spark={x!r} duck={y!r}")
                    break
    return problems


def main():
    from pyspark.sql import functions as F  # noqa

    import __spark_entry__ as entrymod
    from sotohp_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("selfcheck", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            spdf = sdf.toPandas()
        except Exception as e:
            results[name] = f"SPARK ERROR: {type(e).__name__}: {str(e)[:300]}"
            print(f"[{name}] {results[name]}")
            continue
        if name not in oracles:
            results[name] = f"rows-only: {len(spdf)} rows ({time.time()-t0:.1f}s)"
            print(f"[{name}] {results[name]}")
            continue
        try:
            dpdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"DUCK ERROR: {type(e).__name__}: {str(e)[:300]}"
            print(f"[{name}] {results[name]}")
            continue
        problems = compare(name, spdf, dpdf)
        if problems:
            results[name] = "MISMATCH: " + "; ".join(problems[:4])
        else:
            results[name] = f"OK ({len(spdf)} rows, {time.time()-t0:.1f}s)"
        print(f"[{name}] {results[name]}")

    bad = {k: v for k, v in results.items() if not v.startswith(("OK", "rows-only"))}
    print(f"\n{len(results) - len(bad)}/{len(results)} clean")
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
