"""Materialized ANN indexes: the partition-pruned scale path.

`ann.cosine_topk_lsh` / `ann.cosine_topk_ivf` compute the bucket /
centroid assignment on the fly — right for ad-hoc queries, but at
100 TB the winning move is to pay the assignment once at ingest and
make it the physical partition key: a probe then reads ONLY the probed
partitions' files (hive partition pruning).  Two layouts:

SRP-LSH (build_ann_index / ann_index_topk):
    <path>/bucket=<b>/*.parquet     (id, embedding)
    <path>/_ann_meta.json           dim, bits, seed, n_vectors
a b-bit index turns a full scan into ~(1+b+C(b,2))/2^b of the data at
multiprobe Hamming 2.  Determinism: hyperplanes derive from
(seed, bits, dim) alone, so index and query sides (and the DuckDB
oracle, ann.lsh_topk_oracle_sql) always agree on bucket assignment.

IVF (build_ann_index_ivf / ann_index_ivf_topk):
    <path>/centroid_id=<c>/*.parquet   (id, embedding)
    <path>/_ann_meta.json              centroids (the trained matrix), ...
the classic inverted-file layout: deterministic seed centroids
(first-n rows by id, L2-normalized) optionally Lloyd-refined, stored
IN the meta so probe selection needs no data read; nprobe nearest
centroids -> a partition IN-filter.  Recall tracks the data
distribution (centroids adapt) where LSH's random hyperplanes do not.
The DuckDB oracle re-derives seed+Lloyd+assignment in closed form
(ann.ivf_lloyd_oracle_sql), so the materialized layout is
value-checked end-to-end.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sotohp_spark import fsio

from sotohp_spark.operators.ann import (
    _hyperplanes,
    _cosine_raw_udf,
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
    raw = _cosine_raw_udf(query_vec)
    df = (
        spark.read.option("basePath", path).parquet(path)
        .where(F.col("bucket").isin(probe))
    )
    return (
        df.select(
            meta["id_col"],
            F.round(raw(F.col(meta["vec_col"])), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(meta["id_col"]).asc())
        .limit(k)
    )


def build_ann_index_ivf(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 16,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Materialize the IVF layout: train centroids (deterministic
    seeds + ``lloyd_iters`` refinements, operators/ann.ivf_assign),
    assign every vector ONCE, write with ``centroid_id`` as the hive
    partition key, and persist the trained centroid matrix in the
    meta file — query-side probe selection is then a pure driver-side
    argsort over (n_centroids x dim), no data read."""
    import numpy as np

    from sotohp_spark.operators.ann import ivf_assign

    assigned, cent = ivf_assign(
        embeddings, n_centroids, id_col, vec_col,
        method="auto", lloyd_iters=lloyd_iters,
    )
    (
        assigned.select(id_col, vec_col, "centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(path)
    )
    spark = embeddings.sparkSession
    n = spark.read.parquet(path).count()
    meta = {
        "kind": "ivf",
        "dim": int(cent.shape[1]),
        "n_centroids": int(cent.shape[0]),
        "lloyd_iters": int(lloyd_iters),
        "centroids": [[float(x) for x in row] for row in cent],
        "n_vectors": int(n),
        "id_col": id_col,
        "vec_col": vec_col,
    }
    fsio.write_text_atomic(spark, f"{path}/_ann_meta.json", json.dumps(meta))
    return meta


def ann_index_ivf_topk(
    spark: SparkSession,
    path: str,
    query_vec: list,
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Top-k cosine over the materialized IVF index: nprobe nearest
    centroids (from the stored matrix) become a PARTITION filter —
    unprobed centroid partitions are never read (plan-asserted in
    tests/test_plans.py)."""
    import numpy as np

    meta = json.loads(fsio.read_text(spark, f"{path}/_ann_meta.json"))
    cent = np.asarray(meta["centroids"], dtype=np.float64)
    qv = np.asarray(query_vec, dtype=np.float64)
    qv = qv / np.linalg.norm(qv)
    order = np.argsort(-(cent @ qv), kind="stable")[:n_probe]
    raw = _cosine_raw_udf(query_vec)
    df = (
        spark.read.option("basePath", path).parquet(path)
        .where(F.col("centroid_id").isin([int(c) for c in order]))
    )
    return (
        df.select(
            meta["id_col"],
            F.round(raw(F.col(meta["vec_col"])), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(meta["id_col"]).asc())
        .limit(k)
    )
