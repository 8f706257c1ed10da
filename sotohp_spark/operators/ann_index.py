"""Materialized ANN index: SRP-LSH buckets as a PARTITION KEY on disk.

`ann.cosine_topk_lsh` computes the bucket column on the fly — right for
ad-hoc queries, but at 100 TB the winning move is to pay the bucketing
once at ingest and make the bucket the physical partition key: a probe
then reads ONLY the probed buckets' files (hive partition pruning — a
b-bit index turns a full scan into ~(1+b+C(b,2))/2^b of the data at
multiprobe Hamming 2).  This module materializes exactly that layout:

    <path>/bucket=<b>/*.parquet     (id, embedding)
    <path>/_ann_meta.json           dim, bits, seed, n_vectors

Determinism contract: hyperplanes derive from (seed, bits, dim) alone,
so index and query sides (and the DuckDB oracle,
ann.lsh_topk_oracle_sql) always agree on bucket assignment.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sotohp_spark.operators.ann import (
    _hyperplanes,
    cosine_sim,
    probe_buckets,
    srp_bucket_col,
)


def build_ann_index(
    embeddings: DataFrame,
    path: str,
    bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """One distributed pass: bucket every vector, write bucket-partitioned."""
    first = embeddings.select(vec_col).first()
    dim = len(first[vec_col])
    planes = _hyperplanes(dim, bits, seed)
    (
        embeddings.select(id_col, vec_col)
        .withColumn("bucket", srp_bucket_col(F.col(vec_col), planes))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
    n = embeddings.sparkSession.read.parquet(path).count()
    meta = {"dim": dim, "bits": bits, "seed": seed, "n_vectors": int(n),
            "id_col": id_col, "vec_col": vec_col}
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/_ann_meta.json", "w") as f:
        json.dump(meta, f)
    return meta


def ann_index_topk(
    spark: SparkSession,
    path: str,
    query_vec: list,
    k: int = 10,
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """Top-k cosine over the materialized index.  The bucket predicate
    is a PARTITION filter: unprobed buckets are never read
    (plan-asserted in tests/test_plans.py)."""
    with open(f"{path}/_ann_meta.json") as f:
        meta = json.load(f)
    probe = probe_buckets(
        query_vec, meta["bits"], meta["seed"], multiprobe_hamming
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    df = (
        spark.read.option("basePath", path).parquet(path)
        .where(F.col("bucket").isin(probe))
    )
    return (
        df.select(
            meta["id_col"],
            F.round(cosine_sim(F.col(meta["vec_col"]), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(meta["id_col"]).asc())
        .limit(k)
    )
