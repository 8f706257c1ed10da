"""Storage adapters for the index: parquet leg and Iceberg catalog leg.

The engine's default on-disk layout is hive-partitioned parquet plus an
explicit commit protocol (markers + recovery lease, index/build.py,
streaming/incremental.py).  On a cluster with an Iceberg catalog the
same logical operations map 1:1 onto Iceberg's ATOMIC table commits —
snapshot isolation replaces the hand-rolled marker discipline, and
the non-atomic-rename object-store limitation (fsio.require_atomic_
rename) disappears because Iceberg never renames data files.

Operation mapping (the reference's ES sink analogs, S7/S8 in SURVEY
§2; ElasticOperations.scala:91-97 index routing, :149-167 bulk index,
:113-130 delete routing):

    parquet leg (default, what CI exercises)     Iceberg leg
    ------------------------------------------   ---------------------
    docs/postings initial write                  writeTo(t).partitionedBy(
      (write.partitionBy("range_bucket"))          col("range_bucket")
                                                   ).createOrReplace()
    docs append (2-phase: marker + parquet       writeTo(t).append()
      append as the commit point)                  (one atomic commit)
    postings per-bucket rebuild (dynamic         writeTo(t)
      partitionOverwriteMode=dynamic)              .overwritePartitions()
    delete-by-id (tombstone table + query-       tombstone TABLE
      side anti filtering)                         (atomic append); the
                                                   physical drop happens
                                                   at compaction — SAME
                                                   protocol, so scores
                                                   stay delete-stable on
                                                   both legs (Lucene
                                                   semantics)
    meta.json (atomic rename)                    `<prefix>_meta` table:
                                                   versioned key/value
                                                   rows, one atomic
                                                   append per update
    checkpoint rows (_meta/partition_state)      `<prefix>_state` table
    pending-append marker files                  pending rows in _meta
                                                   + SNAPSHOT IDS as
                                                   the rollback points
    crash recovery (markers + recovery lease)    reconcile pending rows:
                                                   roll FORWARD if the
                                                   docs commit landed,
                                                   else roll each table
                                                   BACK to its recorded
                                                   snapshot id

The adapter resolves per EngineConfig: when ``iceberg_table_prefix``
is set AND the Iceberg runtime is on the classpath, the whole builder
pipeline (index/catalog_build.CatalogIndexBuilder) routes through
:class:`IcebergIndexStore`; otherwise :class:`ParquetIndexStore`
delegates to the existing parquet paths.  The sandbox ships no Iceberg
jars, so the Iceberg leg is exercised two ways: integration tests that
skip when ``iceberg_available()`` is False (real DataFrameWriterV2 /
SQL calls), and a versioned-directory test double
(tests/fake_catalog.FakeCatalogStore) that overrides ONLY the eight
storage primitives — the control-plane logic above them runs for real
in CI.

Concurrency contract (both legs): ONE writer at a time per index.
The parquet leg serializes recovery with a lease; the catalog leg
relies on Iceberg's atomic commits for reader consistency, but two
concurrent WRITERS could interleave pending rows and snapshot
rollbacks — run appends/compactions from a single scheduler, as the
reference does with its synchronize job (MediaServiceLive.scala:1484).
"""

from __future__ import annotations

import json
import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sotohp_spark.config import EngineConfig, DEFAULT

log = logging.getLogger("sotohp_spark.catalog")


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

    def recover(self) -> None:
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

    # back-compat alias (pre-round-5 name)
    _recover = recover

    # --- docs ---
    def write_docs(self, df: DataFrame, mode: str = "overwrite") -> None:
        from sotohp_spark.index.build import write_docs

        self.recover()
        write_docs(df, f"{self.path}/docs", self.cfg, mode=mode)

    def read_docs(self) -> DataFrame:
        self.recover()
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
        self.recover()
        return self.spark.read.option(
            "basePath", f"{self.path}/postings"
        ).parquet(f"{self.path}/postings")

    # --- term stats / meta (read side for the store-uniform engine) ---
    def read_term_stats(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/term_stats")

    def read_meta(self) -> dict | None:
        from sotohp_spark.index.build import IndexBuilder

        return IndexBuilder(self.spark, self.path, self.cfg)._read_meta()

    # --- deletes ---
    def has_deletes(self) -> bool:
        from sotohp_spark import fsio

        return fsio.exists(self.spark, f"{self.path}/deletes")

    def read_deletes(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/deletes")

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


# key/value schema of the catalog meta table: `seq` totally orders the
# versions of one key (read = max seq); pending rows use key prefixes
META_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("value", T.StringType(), False),
    ]
)


class IcebergIndexStore:
    """Iceberg leg: every logical operation is an atomic catalog
    commit.  ``table_prefix`` is a catalog-qualified prefix (e.g.
    ``local.db.myindex``); tables used: ``<prefix>_docs``,
    ``<prefix>_postings``, ``<prefix>_term_stats``, ``<prefix>_meta``
    (versioned key/value control state, incl. pending commit points),
    ``<prefix>_state`` (per-bucket checkpoint/metric rows), and
    ``<prefix>_deletes`` (tombstones).

    No marker files, no recovery lease, no staging directories: a job
    that dies before committing leaves each table at its previous
    snapshot, and multi-table operations record the participating
    tables' SNAPSHOT IDS in a pending row first — crash recovery rolls
    forward (if the commit-point table advanced) or rolls each table
    back to its recorded snapshot (index/catalog_build.py).  That is
    the whole point of honoring the north rule's "over Iceberg tables"
    literally.

    The eight ``*_table`` / snapshot primitives at the bottom are the
    ONLY methods that touch Iceberg SQL/DataFrameWriterV2 — the test
    double (tests/fake_catalog.FakeCatalogStore) overrides exactly
    those, so all control-plane logic above them runs in CI.
    """

    kind = "iceberg"

    def __init__(self, spark: SparkSession, table_prefix: str,
                 cfg: EngineConfig = DEFAULT):
        self.spark = spark
        self.prefix = table_prefix
        self.cfg = cfg

    # --- table names ---
    @property
    def docs_table(self) -> str:
        return f"{self.prefix}_docs"

    @property
    def postings_table(self) -> str:
        return f"{self.prefix}_postings"

    @property
    def term_stats_table(self) -> str:
        return f"{self.prefix}_term_stats"

    @property
    def meta_table(self) -> str:
        return f"{self.prefix}_meta"

    @property
    def state_table(self) -> str:
        return f"{self.prefix}_state"

    @property
    def deletes_table(self) -> str:
        return f"{self.prefix}_deletes"

    # ------------------------------------------------------------------
    # recovery (pending commit points -> roll forward/back)
    def recover(self) -> None:
        from sotohp_spark.index.catalog_build import recover_pending_catalog

        recover_pending_catalog(self.spark, self)

    # ------------------------------------------------------------------
    # docs
    def write_docs(self, df: DataFrame, mode: str = "overwrite") -> None:
        from sotohp_spark.index.build import docs_bucket_col, docs_output

        out = docs_output(df).withColumn(
            "range_bucket", docs_bucket_col(self.cfg)
        )
        if mode == "append":
            # SURVEY S7 (bulk sink): the 2-phase marker protocol's
            # parquet append becomes one atomic snapshot commit
            self.append_table(self.docs_table, out,
                              partition_col="range_bucket")
        else:
            self.replace_table(self.docs_table, out,
                               partition_col="range_bucket")

    def read_docs(self) -> DataFrame:
        return self.read_table(self.docs_table)

    # postings
    def overwrite_postings_partitions(self, shards: DataFrame) -> None:
        """Dynamic-partition overwrite of exactly the range buckets
        present in ``shards`` — Iceberg's overwritePartitions is the
        catalog-native form of partitionOverwriteMode=dynamic."""
        laid = shards.repartition(
            self.cfg.shuffle_partitions, "term"
        ).sortWithinPartitions("term", "range_id")
        self.overwrite_partitions_table(
            self.postings_table, laid, partition_col="range_bucket"
        )

    def append_postings(self, shards: DataFrame) -> None:
        laid = shards.repartition(
            self.cfg.shuffle_partitions, "term"
        ).sortWithinPartitions("term", "range_id")
        self.append_table(self.postings_table, laid,
                          partition_col="range_bucket")

    def read_postings(self) -> DataFrame:
        return self.read_table(self.postings_table)

    # term stats
    def write_term_stats(self, df: DataFrame) -> None:
        self.replace_table(self.term_stats_table, df)

    def read_term_stats(self) -> DataFrame:
        return self.read_table(self.term_stats_table)

    # ------------------------------------------------------------------
    # meta + pending commit points (versioned key/value rows)
    def _kv_read_latest(self, key: str) -> str | None:
        if not self.table_exists(self.meta_table):
            return None
        rows = (
            self.read_table(self.meta_table)
            .where(F.col("key") == key)
            .orderBy(F.col("seq").desc())
            .limit(1)
            .collect()
        )
        return rows[0]["value"] if rows else None

    def _kv_append(self, key: str, value: str) -> None:
        seq = 0
        if self.table_exists(self.meta_table):
            row = (
                self.read_table(self.meta_table)
                .where(F.col("key") == key)
                .agg(F.max("seq").alias("m"))
                .collect()[0]
            )
            seq = (int(row["m"]) + 1) if row["m"] is not None else 0
        df = self.spark.createDataFrame(
            [(key, seq, value)], schema=META_TABLE_SCHEMA
        )
        self.append_table(self.meta_table, df)

    def read_meta(self) -> dict | None:
        v = self._kv_read_latest("meta")
        return json.loads(v) if v is not None else None

    def write_meta(self, meta: dict) -> None:
        """One atomic append; readers take the max-seq row, so a torn
        writer can never expose a half-written meta (the catalog form
        of fsio.write_text_atomic).  Old versions accumulate as audit
        history; clear_control_history() drops them at compaction."""
        self._kv_append("meta", json.dumps(meta))

    def put_pending(self, kind: str, batch_id: str, payload: dict) -> None:
        self._kv_append(f"pending::{kind}::{batch_id}", json.dumps(payload))

    def list_pending(self, kind: str) -> list:
        """[(batch_id, payload dict)] for every live pending row."""
        if not self.table_exists(self.meta_table):
            return []
        prefix = f"pending::{kind}::"
        rows = (
            self.read_table(self.meta_table)
            .where(F.col("key").startswith(prefix))
            .collect()
        )
        return [
            (r["key"][len(prefix):], json.loads(r["value"])) for r in rows
        ]

    def clear_pending(self, kind: str, batch_id: str) -> None:
        self.delete_where(
            self.meta_table, f"key = 'pending::{kind}::{batch_id}'"
        )

    def clear_control_history(self) -> None:
        """Drop superseded meta versions (keep only the max seq per
        key) — housekeeping for compaction; never required for
        correctness."""
        if not self.table_exists(self.meta_table):
            return
        cur = self.read_table(self.meta_table)
        latest = cur.groupBy("key").agg(F.max("seq").alias("seq"))
        kept = cur.join(latest, ["key", "seq"], "left_semi")
        self.replace_table(self.meta_table, kept)

    # ------------------------------------------------------------------
    # checkpoint state rows
    def append_state(self, rows_df: DataFrame) -> None:
        self.append_table(self.state_table, rows_df)

    def read_state(self) -> DataFrame | None:
        if not self.table_exists(self.state_table):
            return None
        return self.read_table(self.state_table)

    def built_buckets(self, fingerprint: str) -> set:
        st = self.read_state()
        if st is None:
            return set()
        rows = (
            st.where(
                (F.col("status") == "built")
                & (F.col("input_fingerprint") == fingerprint)
            )
            .select("partition_id")
            .collect()
        )
        return {r["partition_id"] for r in rows}

    def clear_state(self) -> None:
        if self.table_exists(self.state_table):
            self.delete_where(self.state_table, "true")

    # ------------------------------------------------------------------
    # deletes (tombstone table — SAME protocol as the parquet leg, so
    # query-side filtering and score stability are leg-independent;
    # the physical MERGE/rewrite happens at compaction)
    def has_deletes(self) -> bool:
        if not self.table_exists(self.deletes_table):
            return False
        return bool(self.read_deletes().limit(1).count())

    def read_deletes(self) -> DataFrame:
        return self.read_table(self.deletes_table)

    def append_deletes(self, ids: DataFrame) -> int:
        meta = self.read_meta()
        if meta is not None:
            span = meta["range_size"] * meta.get("ranges_per_batch", 8)
        else:
            from sotohp_spark.config import RANGE_SIZE_MAX

            span = (
                self.cfg.range_size or RANGE_SIZE_MAX
            ) * self.cfg.ranges_per_batch
        doomed = ids.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            (F.col("doc_id") / F.lit(span)).cast("int").alias("range_bucket"),
        ).localCheckpoint()  # one scan: count + write read the same rows
        n = doomed.count()
        if n == 0:
            return 0
        self.append_table(self.deletes_table, doomed)
        return n

    def delete_doc_ids(self, ids: DataFrame) -> None:
        """SURVEY S8 (delete-by-id sink; reference ES delete routing,
        ElasticOperations.scala:113-130): ONE atomic tombstone-table
        commit.  Postings/docs rows of deleted docs are dropped at the
        next compaction; until then queries anti-filter — identical
        semantics (and identical scores) to the parquet leg."""
        self.recover()
        self.append_deletes(ids.select("doc_id"))

    def clear_deletes(self) -> None:
        if self.table_exists(self.deletes_table):
            self.delete_where(self.deletes_table, "true")

    # ------------------------------------------------------------------
    # STORAGE PRIMITIVES — the only Iceberg-SQL surface; the CI test
    # double overrides exactly these eight methods.
    def table_exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(name)

    def read_table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def append_table(self, name: str, df: DataFrame,
                     partition_col: str | None = None) -> None:
        if self.table_exists(name):
            df.writeTo(name).append()
            return
        w = df.writeTo(name)
        if partition_col is not None:
            w = w.partitionedBy(F.col(partition_col))
        w.create()

    def replace_table(self, name: str, df: DataFrame,
                      partition_col: str | None = None) -> None:
        w = df.writeTo(name)
        if partition_col is not None:
            w = w.partitionedBy(F.col(partition_col))
        w.createOrReplace()

    def overwrite_partitions_table(self, name: str, df: DataFrame,
                                   partition_col: str) -> None:
        # existence is checked EXPLICITLY: a catch-all fallback to
        # createOrReplace would, on any transient overwritePartitions
        # failure (commit conflict, executor loss), silently REPLACE
        # the whole table with just this chunk's buckets — corrupting
        # every previously committed bucket with no error surfaced
        if self.table_exists(name):
            df.writeTo(name).overwritePartitions()
        else:
            df.writeTo(name).partitionedBy(F.col(partition_col)).create()

    def delete_where(self, name: str, cond_sql: str) -> None:
        self.spark.sql(f"DELETE FROM {name} WHERE {cond_sql}")

    def current_snapshot(self, name: str) -> int | None:
        """Snapshot id the table currently points at, or None if the
        table does not exist yet (rollback(None) then means 'drop').

        Read from ``.history``, NOT ``.snapshots``: the snapshots table
        lists ALL snapshots including ones orphaned by a prior
        rollback_to_snapshot (and committed_at can tie at millisecond
        granularity), so ordering it by committed_at can return an
        orphaned snapshot after a crash recovery.  A pending row would
        then record that orphan as its rollback point and a second
        recovery would resurrect the first crash's ghost postings.
        rollback_to_snapshot appends a history row making the restored
        snapshot current, so the latest made_current_at row IS the
        current table pointer."""
        if not self.table_exists(name):
            return None
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {name}.history "
            f"ORDER BY made_current_at DESC LIMIT 1"
        ).collect()
        return int(rows[0]["snapshot_id"]) if rows else None

    def rollback(self, name: str, snapshot_id: int | None) -> None:
        """Restore ``name`` to a recorded snapshot (the catalog form of
        'remove the files the marker listed').  ``None`` = the table
        did not exist at the commit point -> drop it."""
        if snapshot_id is None:
            self.spark.sql(f"DROP TABLE IF EXISTS {name}")
            return
        parts = name.split(".")
        if len(parts) < 3:
            raise ValueError(
                f"rollback needs a catalog-qualified table name "
                f"(catalog.db.table), got {name!r}"
            )
        catalog, tbl = parts[0], ".".join(parts[1:])
        self.spark.sql(
            f"CALL {catalog}.system.rollback_to_snapshot"
            f"('{tbl}', {int(snapshot_id)})"
        )


def resolve_store(spark: SparkSession, index_path: str,
                  cfg: EngineConfig = DEFAULT):
    """Pick the storage leg: Iceberg when the config names a catalog
    table prefix AND the runtime is present; parquet otherwise (the
    current protocol stays the fallback — and the only leg CI can
    run natively, since the sandbox ships no Iceberg jars)."""
    prefix = getattr(cfg, "iceberg_table_prefix", None)
    if prefix and iceberg_available(spark):
        return IcebergIndexStore(spark, prefix, cfg)
    if prefix:
        log.warning(
            "iceberg_table_prefix=%s set but the Iceberg runtime is not "
            "on the classpath — falling back to the parquet protocol at "
            "%s", prefix, index_path,
        )
    return ParquetIndexStore(spark, index_path, cfg)
