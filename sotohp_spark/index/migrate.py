"""Offline index schema migration + source/target parity verification.

The reference ships a standalone migration tool that rewrites a store
from an old on-disk schema to the current one and then verifies that
source and target agree (MediaMigrationTool.scala:24-136: migrate +
per-entity parity checks).  The analog here:

- every index records ``schema_version`` in meta.json (missing = v1);
- ``migrate_index`` reads a source index at ITS version, applies the
  registered per-version docs-table upgrades, rewrites the target at
  the CURRENT version, rebuilds the derived state (postings /
  term_stats — always derivable from the stored tf maps, so migration
  never re-tokenizes raw turns), and
- ``verify_parity`` cross-checks source vs target: global stats,
  order-independent docs content digests, per-term document
  frequencies, and rank/score identity on probe queries.

Upgrades are pure DataFrame transforms, so a migration is one
distributed rewrite — no driver loops, no per-row Python.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sotohp_spark.config import EngineConfig, DEFAULT
from sotohp_spark.index.build import SCHEMA_VERSION, IndexBuilder, write_docs

log = logging.getLogger("sotohp_spark.migrate")


def _v1_to_v2(docs: DataFrame) -> DataFrame:
    """v2 adds the nullable per-source column (per-source rules)."""
    if "source" in docs.columns:
        return docs
    return docs.withColumn("source", F.lit(None).cast("string"))


def _v2_to_v3(docs: DataFrame) -> DataFrame:
    """v3 is a LAYOUT change only (docs hive-partitioned by
    range_bucket); columns are unchanged, and the partitioned rewrite
    itself happens in write_docs — the transform is the identity."""
    return docs


# version -> transform that upgrades docs FROM that version to the next
_UPGRADES = {1: _v1_to_v2, 2: _v2_to_v3}


class ParityError(RuntimeError):
    """Source/target divergence found by verify_parity."""


def migrate_index(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    cfg: EngineConfig | None = None,
    probe_queries: list | None = None,
) -> dict:
    """Rewrite ``src_path`` at the current schema version into
    ``dst_path`` and verify parity.  Returns the parity report."""
    src = IndexBuilder(spark, src_path)
    meta = src._read_meta()
    if meta is None:
        raise ValueError(f"no index at {src_path}")
    from_version = int(meta.get("schema_version", 1))
    if from_version > SCHEMA_VERSION:
        raise ValueError(
            f"index at {src_path} is schema v{from_version}, newer than "
            f"this engine (v{SCHEMA_VERSION})"
        )

    docs = spark.read.parquet(src.docs_path)
    v = from_version
    while v < SCHEMA_VERSION:
        if v not in _UPGRADES:
            raise ValueError(f"no registered upgrade from schema v{v}")
        docs = _UPGRADES[v](docs)
        v += 1

    cfg = cfg or EngineConfig(
        range_size=meta["range_size"],
        block_size=meta["block_size"],
        ranges_per_batch=meta.get("ranges_per_batch", 8),
    )
    dst = IndexBuilder(spark, dst_path, cfg)
    dst._rm_dir(dst.path)  # target must start empty (offline tool)
    write_docs(docs, dst.docs_path, cfg)
    # tombstones are part of the index state: carry them over verbatim
    # (doc ids are preserved by migration), or deleted conversations
    # would resurrect on the target
    if src.has_deletes():
        span = meta["range_size"] * meta.get("ranges_per_batch", 8)
        (
            spark.read.parquet(f"{src.path}/deletes")
            .select(
                "doc_id",
                (F.col("doc_id") / F.lit(span)).cast("int").alias("range_bucket"),
            )
            .sortWithinPartitions("doc_id")  # same layout as the writer:
            .write.mode("overwrite")         # stats-prunable flat files
            .parquet(f"{dst.path}/deletes")
        )
    new_meta = dict(
        meta,
        schema_version=SCHEMA_VERSION,
        fingerprint=meta["fingerprint"] + f"+migrate_v{from_version}",
        docs_done=True,
        postings_done=False,
    )
    dst._write_meta(new_meta)
    # derived state (postings/term_stats) rebuilt from the stored tf
    # maps — stage 1 is skipped (fingerprint matches), stage 2/3 run
    new_meta = dst.build(turns=None, input_fingerprint=new_meta["fingerprint"])
    log.info("migrated %s (v%d) -> %s (v%d)", src_path, from_version,
             dst_path, SCHEMA_VERSION)

    report = verify_parity(spark, src_path, dst_path, probe_queries)
    return report


def verify_parity(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    probe_queries: list | None = None,
) -> dict:
    """Cross-check two indexes; raises ParityError on any divergence.

    Checks (all distributed aggregates; nothing O(rows) on the driver):
    - meta globals: n_docs / avgdl / max_doc;
    - docs content: order-independent digest (sum of per-row crc32 over
      the id/length columns) — detects dropped, duplicated, or mutated
      rows without a sort;
    - per-term df: full anti-join both ways on term_stats;
    - probe queries: rank AND score identity via each index's engine.
    """
    report: dict = {}

    def fail(msg):
        raise ParityError(f"{msg} (report so far: {report})")

    a_meta = IndexBuilder(spark, src_path)._read_meta()
    b_meta = IndexBuilder(spark, dst_path)._read_meta()
    for key in ("n_docs", "max_doc"):
        report[key] = (a_meta[key], b_meta[key])
        if a_meta[key] != b_meta[key]:
            fail(f"meta {key} differs")
    report["avgdl"] = (a_meta["avgdl"], b_meta["avgdl"])
    if abs(a_meta["avgdl"] - b_meta["avgdl"]) > 1e-9:
        fail("meta avgdl differs")

    def docs_digest(path):
        docs = spark.read.parquet(f"{path}/docs")
        # cover EVERY column migrations can touch: doc_ts (time-windowed
        # search depends on it) and source (the v1->v2 payload) included
        src_col = (
            F.coalesce(F.col("source"), F.lit("\x00"))
            if "source" in docs.columns
            else F.lit("\x00")
        )
        return (
            docs.select(
                F.crc32(
                    F.concat_ws(
                        "|",
                        F.col("doc_id").cast("string"),
                        "conv_id",
                        F.col("doc_len").cast("string"),
                        F.col("n_turns").cast("string"),
                        F.col("doc_ts").cast("string"),
                        src_col,
                    )
                ).alias("h")
            )
            .agg(F.sum("h").alias("s"), F.count("*").alias("n"))
            .collect()[0]
        )

    da, db = docs_digest(src_path), docs_digest(dst_path)
    report["docs_digest"] = (int(da["s"]), int(db["s"]))
    if (da["s"], da["n"]) != (db["s"], db["n"]):
        fail("docs content digest differs")

    def deletes_digest(path):
        if not IndexBuilder(spark, path).has_deletes():
            return (0, 0)
        row = (
            spark.read.parquet(f"{path}/deletes")
            .select("doc_id")
            .distinct()
            .agg(F.count("*").alias("n"), F.sum(F.crc32(F.col("doc_id").cast("string"))).alias("s"))
            .collect()[0]
        )
        return (int(row["n"]), int(row["s"] or 0))

    report["deletes_digest"] = (deletes_digest(src_path), deletes_digest(dst_path))
    if report["deletes_digest"][0] != report["deletes_digest"][1]:
        fail("tombstone sets differ")

    ts_a = spark.read.parquet(f"{src_path}/term_stats").select("term", "df")
    ts_b = spark.read.parquet(f"{dst_path}/term_stats").select("term", "df")
    n_diff = (
        ts_a.join(ts_b, ["term", "df"], "left_anti").count()
        + ts_b.join(ts_a, ["term", "df"], "left_anti").count()
    )
    report["term_df_mismatches"] = n_diff
    if n_diff:
        fail(f"{n_diff} term df mismatches")

    from sotohp_spark.index.query import QueryEngine

    probes = probe_queries or ["error retry timeout", "retryTimeout", "search"]
    ea, eb = QueryEngine(spark, src_path), QueryEngine(spark, dst_path)
    for qt in probes:
        pa, pb = ea.top_k_pdf(qt, 10), eb.top_k_pdf(qt, 10)
        same = list(pa["doc_id"]) == list(pb["doc_id"]) and (
            (pa["score"] - pb["score"]).abs().max() <= 1e-9
            if len(pa)
            else True
        )
        report[f"probe:{qt}"] = "ok" if same else "MISMATCH"
        if not same:
            fail(f"probe query {qt!r} diverges")
    report["ok"] = True
    return report
