"""Iceberg-conditional storage adapter for the index tables.

The engine's on-disk layout is hive-partitioned parquet plus an
explicit commit protocol (markers + recovery lease, index/build.py,
streaming/incremental.py).  On a cluster with an Iceberg catalog the
same logical operations map 1:1 onto Iceberg's ATOMIC table commits —
snapshot isolation replaces the hand-rolled marker discipline, and
the non-atomic-rename object-store limitation (fsio.require_atomic_
rename) disappears because Iceberg never renames data files.

Operation mapping (the reference's ES sink analogs, S7/S8 in SURVEY
§2; ElasticOperations.scala:149-167 bulk index, :113-130 delete
routing):

    parquet leg (default, what CI exercises)     Iceberg leg
    ------------------------------------------   ---------------------
    docs/postings initial write                  writeTo(t).partitionedBy(
      (write.partitionBy("range_bucket"))          col("range_bucket")
                                                   ).createOrReplace()
    docs append (2-phase: marker + parquet       writeTo(t).append()
      append as the commit point)                  (one atomic commit)
    postings per-bucket rebuild (dynamic         writeTo(t)
      partitionOverwriteMode=dynamic)              .overwritePartitions()
    delete-by-id (tombstone table + query-       MERGE INTO t USING ids
      side anti filtering)                         WHEN MATCHED THEN
                                                   DELETE (eager) — or
                                                   keep tombstones and
                                                   MERGE at compaction
    term_stats refresh (overwrite dir)           writeTo(t).createOrReplace()
    meta.json (atomic rename)                    snapshot summary props
    crash recovery (markers + lease)             not needed: a failed
                                                 job simply never
                                                 commits its snapshot

The adapter resolves per EngineConfig: when ``iceberg_table_prefix``
is set AND the Iceberg runtime is on the classpath, index table
writes can be routed through :class:`IcebergIndexStore`; otherwise
:class:`ParquetIndexStore` delegates to the existing parquet paths.
The sandbox ships no Iceberg jars, so the Iceberg leg is exercised by
integration tests that skip when ``iceberg_available()`` is False —
the code paths are real Spark DataFrameWriterV2 / SQL calls either
way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sotohp_spark.config import EngineConfig, DEFAULT


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class ParquetIndexStore:
    """Default leg: hive-partitioned parquet directories under an
    index root, committed via the marker + recovery-lease protocol the
    rest of the engine implements.  Methods delegate to the existing
    write paths so THIS class is what the main test suite exercises."""

    kind = "parquet"

    def __init__(self, spark: SparkSession, index_path: str,
                 cfg: EngineConfig = DEFAULT):
        self.spark = spark
        self.path = index_path.rstrip("/")
        self.cfg = cfg

    def _recover(self) -> None:
        """Finish any interrupted compaction swap BEFORE a read or
        write touches the index.  Critical for reads that later feed
        delete_doc_ids: compact_index re-densifies doc ids, so ids
        derived from a pre-recovery (stale live) docs table would
        tombstone arbitrary WRONG documents once the swap is
        completed by a later open."""
        from sotohp_spark.index.build import (
            IndexBuilder,
            recover_pending_compact,
        )
        from sotohp_spark.streaming.incremental import (
            _recover_pending_bucket_compact,
        )

        recover_pending_compact(self.spark, self.path)
        _recover_pending_bucket_compact(
            self.spark, IndexBuilder(self.spark, self.path, self.cfg)
        )

    # --- docs ---
    def write_docs(self, df: DataFrame, mode: str = "overwrite") -> None:
        from sotohp_spark.index.build import write_docs

        self._recover()
        write_docs(df, f"{self.path}/docs", self.cfg, mode=mode)

    def read_docs(self) -> DataFrame:
        self._recover()
        return self.spark.read.parquet(f"{self.path}/docs")

    # --- postings ---
    def overwrite_postings_partitions(self, shards: DataFrame) -> None:
        prev = self.spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        self.spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        try:
            (
                shards.repartition(self.cfg.shuffle_partitions, "term")
                .sortWithinPartitions("term", "range_id")
                .write.mode("overwrite")
                .partitionBy("range_bucket")
                .parquet(f"{self.path}/postings")
            )
        finally:
            self.spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev
            )

    def read_postings(self) -> DataFrame:
        self._recover()
        return self.spark.read.option(
            "basePath", f"{self.path}/postings"
        ).parquet(f"{self.path}/postings")

    # --- deletes ---
    def delete_doc_ids(self, ids: DataFrame) -> None:
        """Tombstone append (queries filter; compaction drops) — the
        SAME sink delete_conversations uses (incremental.py
        append_tombstones): pending-compact recovery first, legacy
        layout normalization, META-derived bucket span, empty no-op.
        One definition, so the guards can never drift apart.

        ``ids`` must be derived from a POST-recovery view of the index
        (this store's read_docs runs recovery for exactly that
        reason): compact_index re-densifies doc ids, so ids computed
        against a stale pre-swap docs table would tombstone the wrong
        documents."""
        from sotohp_spark.index.build import IndexBuilder
        from sotohp_spark.streaming.incremental import append_tombstones

        append_tombstones(
            self.spark,
            IndexBuilder(self.spark, self.path, self.cfg),
            ids.select("doc_id"),
        )


class IcebergIndexStore:
    """Iceberg leg: the same logical operations as atomic catalog
    commits.  ``table_prefix`` is a catalog-qualified prefix (e.g.
    ``local.db.myindex``); tables used: ``<prefix>_docs``,
    ``<prefix>_postings``, ``<prefix>_term_stats``.

    No markers, no lease, no tombstone table: every method is ONE
    Iceberg commit, and a job that dies before committing leaves the
    table at its previous snapshot — which is the whole point of
    honoring the north rule's "over Iceberg tables" literally."""

    kind = "iceberg"

    def __init__(self, spark: SparkSession, table_prefix: str,
                 cfg: EngineConfig = DEFAULT):
        self.spark = spark
        self.prefix = table_prefix
        self.cfg = cfg

    @property
    def docs_table(self) -> str:
        return f"{self.prefix}_docs"

    @property
    def postings_table(self) -> str:
        return f"{self.prefix}_postings"

    # --- docs ---
    def write_docs(self, df: DataFrame, mode: str = "overwrite") -> None:
        from sotohp_spark.index.build import docs_bucket_col, docs_output

        out = docs_output(df).withColumn(
            "range_bucket", docs_bucket_col(self.cfg)
        )
        writer = out.writeTo(self.docs_table).partitionedBy(
            F.col("range_bucket")
        )
        if mode == "append":
            # SURVEY S7 (bulk sink): the 2-phase marker protocol's
            # parquet append becomes one atomic snapshot commit
            out.writeTo(self.docs_table).append()
        else:
            writer.createOrReplace()

    def read_docs(self) -> DataFrame:
        return self.spark.table(self.docs_table)

    # --- postings ---
    def overwrite_postings_partitions(self, shards: DataFrame) -> None:
        """Dynamic-partition overwrite of exactly the range buckets
        present in ``shards`` — Iceberg's overwritePartitions is the
        catalog-native form of partitionOverwriteMode=dynamic."""
        laid = shards.repartition(
            self.cfg.shuffle_partitions, "term"
        ).sortWithinPartitions("term", "range_id")
        # existence is checked EXPLICITLY: a catch-all fallback to
        # createOrReplace would, on any transient overwritePartitions
        # failure (commit conflict, executor loss), silently REPLACE
        # the whole table with just this chunk's buckets — corrupting
        # every previously committed bucket with no error surfaced
        if self.spark.catalog.tableExists(self.postings_table):
            laid.writeTo(self.postings_table).overwritePartitions()
        else:
            laid.writeTo(self.postings_table).partitionedBy(
                F.col("range_bucket")
            ).create()

    def read_postings(self) -> DataFrame:
        return self.spark.table(self.postings_table)

    # --- deletes ---
    def delete_doc_ids(self, ids: DataFrame) -> None:
        """SURVEY S8 (delete-by-id sink): eager MERGE INTO ... DELETE
        against the docs table — the reference's ES delete routing
        (ElasticOperations.scala:113-130) as one atomic commit; the
        postings rows of deleted docs are dropped at the next bucket
        overwrite (same semantics as the parquet leg's compaction)."""
        view = "_sotohp_delete_ids"
        ids.select("doc_id").distinct().createOrReplaceTempView(view)
        self.spark.sql(
            f"MERGE INTO {self.docs_table} t USING {view} s "
            f"ON t.doc_id = s.doc_id WHEN MATCHED THEN DELETE"
        )


def resolve_store(spark: SparkSession, index_path: str,
                  cfg: EngineConfig = DEFAULT):
    """Pick the storage leg: Iceberg when the config names a catalog
    table prefix AND the runtime is present; parquet otherwise (the
    current protocol stays the fallback — and the only leg CI can
    run, since the sandbox ships no Iceberg jars)."""
    prefix = getattr(cfg, "iceberg_table_prefix", None)
    if prefix and iceberg_available(spark):
        return IcebergIndexStore(spark, prefix, cfg)
    return ParquetIndexStore(spark, index_path, cfg)
