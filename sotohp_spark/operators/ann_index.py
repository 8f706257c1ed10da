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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sotohp_spark import fsio

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
    spark = embeddings.sparkSession
    n = spark.read.parquet(path).count()
    meta = {"dim": dim, "bits": bits, "seed": seed, "n_vectors": int(n),
            "id_col": id_col, "vec_col": vec_col}
    fsio.write_text_atomic(spark, f"{path}/_ann_meta.json", json.dumps(meta))
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
    meta = json.loads(fsio.read_text(spark, f"{path}/_ann_meta.json"))
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
