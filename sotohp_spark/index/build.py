"""Resumable, checkpointed inverted-index build.

The semantic model is the reference's `synchronize` pipeline
(MediaServiceLive.scala:1484-1565): an incremental batch job that
skips already-published work via a per-unit checkpoint
(State.mediaLastSynchronized, State.scala:3-9), commits progress after
each micro-batch, emits progress metrics, and is idempotent because
ids are deterministic (OriginalBuilder.scala:33-40).  Here the unit of
work is a doc-id RANGE (a batch of postings shards), the checkpoint is
the `_meta/partition_state` table, and idempotence comes from
deterministic doc ids + overwrite-by-partition writes.  The reference's
acknowledged gap ("TODO no transaction take care",
MediaServiceLive.scala:1480) is closed by writing postings first and
committing the checkpoint row last.

Index layout on disk (all parquet):

    <index>/docs/range_bucket=<b>/       doc_id, conv_id, doc_ts, n_turns,
                                         doc_len, tfs, source
    <index>/postings/range_bucket=<b>/   shards sorted by term
    <index>/term_stats/           term, df, cf
    <index>/_meta/meta.json       N, avgdl, config, fingerprint
    <index>/_meta/partition_state/  checkpoint + per-partition metrics

`range_bucket` groups `ranges_per_batch` consecutive doc ranges into
one hive partition => partition pruning on doc ranges, bounded file
counts, and a natural resume/commit unit.
"""

from __future__ import annotations

import json
import logging
import math
import os
import time

log = logging.getLogger("sotohp_spark.build")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataclasses import replace as _cfg_replace

from sotohp_spark import fsio
from sotohp_spark.config import EngineConfig, DEFAULT, derive_range_size
from sotohp_spark.functions.tokenizer import (
    KeywordRules,
    KeywordRulesRouter,
    make_term_freq_udf,
    make_term_freq_udf_routed,
)
from sotohp_spark.operators.docs import build_documents
from sotohp_spark.operators.postings import build_postings_df


def apply_term_freqs(docs: DataFrame, rules,
                     with_positions: bool = False,
                     extra_fields: tuple = ()) -> DataFrame:
    """tfs + doc_len columns via the Arrow-batched tokenizer UDF.

    ``extra_fields``: each named field's ``doc_field_<f>`` stream gets
    its own ``tfs_<f>`` map and ``doc_len_<f>`` through the SAME
    analysis chain — the multi-field search-doc shape.  Field streams
    are positionless (field phrase search is not a surface; the field
    postings carry tf + the FIELD's doc length, which is all per-field
    BM25 needs).

    ``rules`` may be a single KeywordRules (one chain for the whole
    corpus) or a KeywordRulesRouter (per-source resolution, reference
    parity: MediaServiceLive.scala:1670-1676) — routed tokenization
    reads the docs' ``source`` column (null -> router default).

    ``with_positions`` (cfg.store_positions): ONE tokenizer pass emits
    a ``poss`` map<term, positions> column and tfs is DERIVED from it
    with pure column expressions (tf == len(positions) by
    construction) — positions never cost a second pass over the
    text."""
    from sotohp_spark.functions.tokenizer import (
        make_term_positions_udf,
        make_term_positions_udf_routed,
    )

    routed = isinstance(rules, KeywordRulesRouter)
    src = (
        F.col("source")
        if "source" in docs.columns
        else F.lit(None).cast("string")
    )
    if with_positions:
        if routed:
            poss = make_term_positions_udf_routed(rules)(F.col("doc_text"), src)
        else:
            poss = make_term_positions_udf(rules)(F.col("doc_text"))
        docs = docs.withColumn("poss", poss).withColumn(
            "tfs",
            F.map_from_arrays(
                F.map_keys("poss"),
                F.transform(F.map_values("poss"), lambda a: F.size(a)),
            ),
        )
    else:
        if routed:
            tfs = make_term_freq_udf_routed(rules)(F.col("doc_text"), src)
        else:
            tfs = make_term_freq_udf(rules)(F.col("doc_text"))
        docs = docs.withColumn("tfs", tfs)
    docs = docs.withColumn(
        "doc_len",
        F.coalesce(
            F.aggregate(F.map_values("tfs"), F.lit(0), lambda a, x: a + x),
            F.lit(0),
        ),
    )
    for f in extra_fields:
        if routed:
            ftfs = make_term_freq_udf_routed(rules)(
                F.col(f"doc_field_{f}"), src
            )
        else:
            ftfs = make_term_freq_udf(rules)(F.col(f"doc_field_{f}"))
        docs = (
            docs.withColumn(f"tfs_{f}", ftfs)
            .withColumn(
                f"doc_len_{f}",
                F.coalesce(
                    F.aggregate(
                        F.map_values(f"tfs_{f}"), F.lit(0),
                        lambda a, x: a + x,
                    ),
                    F.lit(0),
                ),
            )
            .drop(f"doc_field_{f}")
        )
    return docs

PARTITION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("input_fingerprint", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("postings_count", T.LongType(), False),
        T.StructField("compressed_bytes", T.LongType(), False),
        T.StructField("skew_ratio", T.DoubleType(), False),
        T.StructField("n_terms", T.LongType(), False),
        # the bucket's amortized share of its BATCH's wall time (the
        # one-job stage-2 writer builds many buckets per job, so a true
        # per-bucket wall does not exist) — named to say so
        T.StructField("wall_share_sec", T.DoubleType(), False),
        T.StructField("built_at", T.TimestampType(), False),
    ]
)


class BuildInterrupted(RuntimeError):
    """Raised by the kill-switch in tests to simulate a mid-build crash."""


def partition_state_rows(spark, committed: DataFrame, buckets: list,
                         fingerprint: str, wall: float) -> DataFrame:
    """Per-bucket checkpoint/metric rows (PARTITION_STATE_SCHEMA)
    derived from the COMMITTED postings of a batch — one agg job,
    shared by the parquet and catalog builders.  EVERY bucket of the
    batch gets a row: a bucket whose docs all tokenize to nothing
    produces no postings and would otherwise never be marked built
    (stage 2 would rescan it on every build call forever)."""
    metrics = {
        int(m["range_bucket"]): m
        for m in committed.groupBy("range_bucket").agg(
            F.sum("n_docs").alias("postings"),
            F.sum("payload_bytes").alias("bytes"),
            F.countDistinct("term").alias("n_terms"),
            F.max("n_docs").alias("max_shard"),
            F.avg("n_docs").alias("mean_shard"),
        ).collect()
    }
    wall_each = wall / max(len(buckets), 1)
    rows = []
    for bucket in buckets:
        m = metrics.get(int(bucket))
        if m is None:
            rows.append(
                (int(bucket), fingerprint, "built", 0, 0, 1.0, 0,
                 float(wall_each))
            )
            continue
        skew = (
            float(m["max_shard"]) / float(m["mean_shard"])
            if m["mean_shard"]
            else 1.0
        )
        rows.append(
            (
                int(bucket),
                fingerprint,
                "built",
                int(m["postings"] or 0),
                int(m["bytes"] or 0),
                skew,
                int(m["n_terms"] or 0),
                float(wall_each),
            )
        )
    import pandas as pd

    # pandas-backed frame: a plain-list createDataFrame is RDD-backed
    # and its write schedules defaultParallelism near-empty tasks for
    # a <=buckets-per-batch-row table (r08 empty/tiny-frame finding)
    cols = [f.name for f in PARTITION_STATE_SCHEMA.fields[:-1]]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=cols),
        schema=T.StructType(PARTITION_STATE_SCHEMA.fields[:-1]),
    ).withColumn("built_at", F.current_timestamp())


def compact_marker_path(index_path: str) -> str:
    """Pending-compaction marker, SIBLING of the index dir — it must
    survive both directory renames of the swap."""
    return index_path.rstrip("/") + "._compact_pending.json"


def recovery_lock_path(index_path: str) -> str:
    """Recovery lease file, SIBLING of the index dir (it must survive
    the swap's directory renames, like the compact marker)."""
    return index_path.rstrip("/") + "._recovery.lock"


# a lease older than this (since its last RENEWAL — the holder
# refreshes the body every stale_sec/4 from a background thread, so a
# live holder never reads as stale no matter how long the swap takes)
# is an orphan from a crashed holder and is broken by the next
# acquirer; acquisition gives up after TIMEOUT
RECOVERY_LOCK_STALE_SEC = 120.0
RECOVERY_LOCK_TIMEOUT_SEC = 300.0


import contextlib
import threading


@contextlib.contextmanager
def recovery_lock(spark, index_path: str,
                  stale_sec: float = RECOVERY_LOCK_STALE_SEC,
                  timeout_sec: float = RECOVERY_LOCK_TIMEOUT_SEC):
    """Mutual exclusion for compaction swaps AND their recovery.

    Marker-driven recovery runs on every engine/builder open; without
    exclusion, a reader opening while a writer is mid-swap could run
    the SAME swap concurrently — interleaved rmtree/rename losing the
    bucket entirely (reader's rmtree(live) after the writer's
    move(staged->live) consumes the staged copy, then both moves
    fail).  The lease is a create-exclusive file (fsio.create_exclusive:
    O_EXCL locally, FileSystem.create(overwrite=false) on HDFS —
    both atomic): the writer holds it across marker-write + swap, and
    recovery holders re-check the marker after acquiring, so a reader
    that waited out a writer finds the marker gone and does nothing.

    Liveness vs safety:
    - the HOLDER renews the lease body (fresh ts, same nonce) every
      stale_sec/4 from a daemon thread, so a swap that legitimately
      outlives stale_sec (large index, slow FS) is never broken out
      from under a live process;
    - the lease body RECORDS the holder's stale_sec, and a breaker
      judges age against max(its own, the holder's) — a holder that
      chose a longer lease cannot be broken by a contender configured
      with a shorter one;
    - a breaker only removes a lease whose CONTENT it re-reads
      unchanged across two polls — a lease that was meanwhile
      released-and-reacquired or renewed (ts changes) is left alone;
    - renewal and release are NONCE-CHECKED: both re-read the lease
      and touch it only while it still carries this holder's nonce,
      so a holder that stalled past its own stale_sec and was
      legitimately broken can neither clobber nor delete its
      successor's lease.  The remaining read->write windows are
      microseconds wide and require a holder that already blew its
      lease deadline; the swap steps themselves re-check staged/live
      existence (incremental.py _apply_bucket_swap) as the last line
      of defense.
    """
    path = recovery_lock_path(index_path)
    nonce = f"{os.getpid()}-{time.monotonic_ns()}"

    def _body() -> str:
        return json.dumps(
            {"nonce": nonce, "ts": time.time(), "stale_sec": stale_sec}
        )

    def _holder_nonce() -> str | None:
        try:
            return json.loads(fsio.read_text(spark, path)).get("nonce")
        except (OSError, ValueError, AttributeError):
            return None

    deadline = time.time() + timeout_sec
    stale_body: str | None = None  # content observed as stale last poll
    while True:
        if fsio.create_exclusive(spark, path, _body()):
            break
        cur_body = None
        age = None
        holder_stale = stale_sec
        try:
            cur_body = fsio.read_text(spark, path)
            holder = json.loads(cur_body)
            age = time.time() - float(holder.get("ts", 0.0))
            holder_stale = float(holder.get("stale_sec", stale_sec))
        except (OSError, ValueError, AttributeError, TypeError):
            pass  # just released, torn, or unreadable: fall through
        if age is not None and age > max(stale_sec, holder_stale):
            if cur_body is not None and cur_body == stale_body:
                # observed stale across TWO polls with identical
                # content -> the holder is neither renewing nor
                # releasing; claim the break
                log.warning(
                    "breaking stale recovery lease at %s (age %.0fs)",
                    path, age,
                )
                fsio.remove(spark, path, missing_ok=True)
                stale_body = None
                continue  # immediately contend for the freed lease
            stale_body = cur_body
        else:
            stale_body = None
        if time.time() > deadline:
            raise TimeoutError(
                f"recovery lease at {path} held >{timeout_sec}s; "
                f"remove it manually if the holder is dead"
            )
        time.sleep(0.1)

    stop = threading.Event()

    def _renew():
        while not stop.wait(stale_sec / 4.0):
            try:
                # nonce check + stop re-check right before the write:
                # if this lease was broken and reacquired (we stalled
                # past our own deadline), or release already ran, the
                # successor's lease must not be clobbered
                if _holder_nonce() != nonce or stop.is_set():
                    return
                fsio.write_text_atomic(spark, path, _body())
            except Exception:  # renewal is best-effort; never kill the swap
                log.warning("recovery-lease renewal failed at %s", path)

    renewer = threading.Thread(target=_renew, daemon=True)
    renewer.start()
    try:
        yield
    finally:
        stop.set()
        renewer.join(timeout=30.0)
        if renewer.is_alive():
            # a renewal write is wedged in the FS layer; removing now
            # could race its completion and resurrect the lease under
            # our nonce with nobody left to release it.  Leave it: the
            # stale-break path reclaims it after stale_sec — a bounded
            # stall, never a second holder.
            log.warning(
                "recovery-lease renewer wedged; leaving lease at %s "
                "for stale-break reclamation", path,
            )
        elif _holder_nonce() == nonce:
            fsio.remove(spark, path, missing_ok=True)


def require_atomic_rename(index_path: str, op: str) -> None:
    """Fail fast when a multi-directory swap is requested on an object
    store whose rename is copy+delete (s3a & friends): a crash during
    the delete phase leaves a partially-deleted staging dir next to a
    complete live one, and marker recovery cannot tell that state from
    'staged complete, live stale' — promoting the partial dir would
    lose data.  Compaction on such stores should write to a NEW index
    path and repoint the catalog instead (or use the Iceberg leg of
    sources/catalog.py, whose commits don't rely on rename at all)."""
    if not fsio.atomic_rename_supported(index_path):
        raise ValueError(
            f"{op} requires an atomic-rename filesystem (local/HDFS); "
            f"{index_path!r} is on an object store where rename is "
            f"copy+delete — write a fresh index and switch paths, or "
            f"use an Iceberg-backed index"
        )


def _complete_compact_swap(spark, index_path: str, _fail_after: str | None = None):
    """Finish (or re-finish) a compaction swap from any crash point.

    The swap replaces ``rmtree(live); move(tmp, live)`` — whose crash
    window left NO live index — with a marker-guarded rename chain:

        marker written (tmp is COMPLETE at this point)
        1. live  -> <path>_compact_old     (retire)
        2. tmp   -> live                   (promote)
        3. rmtree old; remove marker       (cleanup)

    Every state the chain can crash in is distinguishable from the
    directories that exist, so this function is idempotent: it runs the
    remaining steps and no others.  Renames are atomic on POSIX/HDFS;
    on object stores the marker + re-run discipline covers the
    non-atomic copy (fsio.py module docstring).

    ``_fail_after``: test kill-switch ('retire' | 'promote').
    """
    path = index_path.rstrip("/")
    marker = compact_marker_path(path)
    tmp, old = path + "_compact_tmp", path + "_compact_old"
    if fsio.exists(spark, f"{tmp}/_meta/meta.json"):
        if fsio.exists(spark, f"{path}/_meta/meta.json"):
            fsio.rmtree(spark, old)  # stale old from a double crash
            fsio.move_dir(spark, path, old)
        elif fsio.exists(spark, path):
            fsio.rmtree(spark, path)  # torn live dir without meta
        if _fail_after == "retire":
            raise RuntimeError("test kill-switch: crash after live retire")
        fsio.move_dir(spark, tmp, path)
    if _fail_after == "promote":
        raise RuntimeError("test kill-switch: crash after tmp promote")
    if not fsio.exists(spark, f"{path}/_meta/meta.json"):
        raise RuntimeError(
            f"compaction swap recovery failed: no live index at {path} "
            f"and no complete staging at {tmp}"
        )
    fsio.rmtree(spark, old)
    fsio.remove(spark, marker, missing_ok=True)


def recover_pending_compact(spark, index_path: str) -> bool:
    """Crash recovery for an interrupted compaction swap — called on
    every engine/builder open (QueryEngine.__init__, build, append,
    delete, compact).  The marker exists iff a swap was in flight; the
    staging index was complete before the marker was written, so
    finishing the swap is always safe.  Returns True if recovery ran."""
    marker = compact_marker_path(index_path)
    if not fsio.exists(spark, marker):
        return False  # fast path: no lease traffic on a healthy open
    with recovery_lock(spark, index_path):
        # re-check under the lease: a concurrent writer/recoverer may
        # have finished the swap while this opener waited
        if not fsio.exists(spark, marker):
            return False
        log.warning("recovering interrupted compaction swap at %s", index_path)
        _complete_compact_swap(spark, index_path)
    return True


# on-disk layout version, recorded in meta.json; bump when the docs /
# postings schema changes and register the upgrade in index/migrate.py
# (the reference ships an offline migrator for exactly this,
# MediaMigrationTool.scala:24-136).  v1: docs without `source`;
# v2: docs carry a nullable `source` column (per-source rules);
# v3: docs hive-partitioned by range_bucket (same bucket key as the
# postings) — bucket-local compaction can rewrite ONLY tombstoned
# docs partitions, and doc-id-interval reads (time-windowed search,
# stage-2 resume, metadata joins) get partition pruning instead of
# relying on row-group stats.
SCHEMA_VERSION = 3


def docs_output(df: DataFrame) -> DataFrame:
    """Canonical docs-table column projection (+ the positional map
    when the build stores positions, + per-field tf maps on a
    multi-field index — compaction rebuilds postings from the docs
    table, so both must survive the round trip)."""
    src = (
        F.col("source")
        if "source" in df.columns
        else F.lit(None).cast("string")
    )
    cols = [
        "doc_id", "conv_id", "doc_ts", "n_turns", "doc_len", "tfs",
        src.alias("source"),
    ]
    if "poss" in df.columns:
        cols.append("poss")
    for c in df.columns:
        if c.startswith("tfs_") or c.startswith("doc_len_"):
            cols.append(c)
    return df.select(*cols)


# field-tagged term key separator: the analysis chain lowercases and
# strips control chars, so no document term can ever contain it —
# "<field>\x1f<term>" rows live in the SAME postings layout and
# dictionary as plain terms (multi-field as layout, not a new engine)
FIELD_SEP = "\x1f"


def explode_doc_terms(docs_df: DataFrame, positions: bool,
                      fields: tuple = ()) -> DataFrame:
    """docs -> (doc_id, doc_len, term, tf[, positions]) for the
    postings build.  With positions, tf derives from the positions
    array (len == tf by construction) so only ONE map column is
    exploded.

    ``fields``: multi-field index — each field's tfs_<f> map explodes
    with the FIELD-TAGGED term key and, crucially, the FIELD's doc
    length in the doc_len slot, so the posting stream's stored dl is
    what per-field BM25 tf-normalization needs.  Field rows carry no
    positions (empty arrays on a positional index — field phrase
    search is not a surface)."""
    if positions:
        base = docs_df.select(
            "doc_id", "doc_len",
            F.explode("poss").alias("term", "positions"),
        ).withColumn("tf", F.size("positions"))
    else:
        base = docs_df.select(
            "doc_id", "doc_len", F.explode("tfs").alias("term", "tf")
        )
    for f in fields:
        fe = docs_df.select(
            "doc_id",
            F.col(f"doc_len_{f}").alias("doc_len"),
            F.explode(f"tfs_{f}").alias("term", "tf"),
        ).withColumn(
            "term", F.concat(F.lit(f + FIELD_SEP), F.col("term"))
        )
        if positions:
            fe = fe.withColumn(
                "positions", F.array().cast("array<int>")
            ).select("doc_id", "doc_len", "term", "positions", "tf")
            base = base.select(
                "doc_id", "doc_len", "term", "positions", "tf"
            )
        else:
            fe = fe.select("doc_id", "doc_len", "term", "tf")
            base = base.select("doc_id", "doc_len", "term", "tf")
        base = base.unionByName(fe)
    return base


def docs_bucket_col(cfg: EngineConfig):
    """The docs hive-partition key: doc_id // (range_size *
    ranges_per_batch) — identical to the postings bucket."""
    bucket_span = cfg.range_size * cfg.ranges_per_batch
    return (F.col("doc_id") / F.lit(bucket_span)).cast("int")


def write_docs(df: DataFrame, path: str, cfg: EngineConfig,
               mode: str = "overwrite", repartition: bool = True) -> None:
    """Write the docs table in the v3 layout: range-partitioned by
    doc_id within files, hive-partitioned by range_bucket on disk.
    ``repartition=False`` when the caller already laid the frame out
    by doc_id range (stage 1 does, before tokenizing)."""
    out = docs_output(df).withColumn("range_bucket", docs_bucket_col(cfg))
    if repartition:
        out = out.repartitionByRange(cfg.shuffle_partitions, "doc_id")
    out.write.mode(mode).partitionBy("range_bucket").parquet(path)


class IndexBuilder:
    def __init__(self, spark: SparkSession, index_path: str, cfg: EngineConfig = DEFAULT,
                 rules: KeywordRules | None = None):
        self.spark = spark
        self.path = index_path.rstrip("/")
        self.cfg = cfg
        self.rules = rules

    # --- paths ---
    @property
    def docs_path(self):
        return f"{self.path}/docs"

    @property
    def postings_path(self):
        return f"{self.path}/postings"

    @property
    def term_stats_path(self):
        return f"{self.path}/term_stats"

    @property
    def meta_path(self):
        return f"{self.path}/_meta/meta.json"

    @property
    def state_path(self):
        return f"{self.path}/_meta/partition_state"

    # ------------------------------------------------------------------
    def build(
        self,
        turns: DataFrame,
        stop_after_batches: int | None = None,
        input_fingerprint: str | None = None,
    ) -> dict:
        """Build (or resume) the index from the turns table.

        ``stop_after_batches``: test hook — raise BuildInterrupted after
        committing that many checkpoint batches (kill-and-resume test).
        Returns the meta dict.
        """
        cfg = self.cfg
        fingerprint = input_fingerprint or "default"
        from sotohp_spark.sources.catalog import resolve_store

        # resolved ONCE per build (not per chunk).  A configured
        # Iceberg catalog routes the WHOLE pipeline — meta, checkpoint
        # state, pending commit points, data tables — through the
        # catalog-native builder (index/catalog_build.py); the parquet
        # marker protocol below remains the default leg.
        store = resolve_store(self.spark, self.path, cfg)
        if store.kind != "parquet":
            from sotohp_spark.index.catalog_build import CatalogIndexBuilder

            return CatalogIndexBuilder(
                self.spark, store, cfg, self.rules
            ).build(
                turns,
                stop_after_batches=stop_after_batches,
                input_fingerprint=input_fingerprint,
            )
        recover_pending_compact(self.spark, self.path)
        if self._read_meta() is not None:
            # a pending BUCKET compaction must also be reconciled before
            # any rebuild decision: its marker refers to the CURRENT
            # index's staged dirs, and leaving it behind would let a
            # later open "recover" against a freshly rebuilt index
            from sotohp_spark.streaming.incremental import (
                _recover_pending_bucket_compact,
            )

            _recover_pending_bucket_compact(self.spark, self)

        # ---- stage 1: docs + doc stats (deterministic, idempotent) ----
        # Skipped on resume if already built for the same fingerprint.
        meta = self._read_meta()
        if (
            meta is not None
            and meta.get("fingerprint") == fingerprint
            and int(meta.get("schema_version", 1)) != SCHEMA_VERSION
        ):
            # resuming across an on-disk layout change would mix layouts
            # (e.g. flat + hive-partitioned docs) — fail loudly toward
            # the offline migration tool instead
            raise ValueError(
                f"index at {self.path} is schema v{meta.get('schema_version', 1)}"
                f", engine writes v{SCHEMA_VERSION}; run index.migrate_index"
            )
        if meta is None or meta.get("fingerprint") != fingerprint:
            if meta is not None and meta.get("fingerprint") != fingerprint:
                # CHANGED input on an existing index: the new corpus may
                # span fewer range buckets than the old one, and stage 2
                # only overwrites buckets 0..n_buckets-1 — ghost postings
                # from the old corpus would survive in higher buckets and
                # pollute df counts and query results.  Wipe all derived
                # state; docs are rebuilt below anyway.
                log.warning(
                    "fingerprint changed (%s -> %s): clearing stale postings/"
                    "term_stats/checkpoint/tombstone state",
                    meta.get("fingerprint"), fingerprint,
                )
                self._rm_dir(self.postings_path)
                self._rm_dir(self.term_stats_path)
                self._rm_dir(self.state_path)
                # tombstones reference the OLD doc-id space — left in
                # place they would hide arbitrary new docs; staged /
                # pending appends belong to the old corpus too
                self._rm_dir(f"{self.path}/deletes")
                self._rm_dir(f"{self.path}/_staging")
                for m in fsio.glob(
                    self.spark, f"{self.path}/_meta/pending_append_*.json"
                ):
                    fsio.remove(self.spark, m)
                # any pending bucket-compact marker was reconciled above;
                # remove defensively so a stale one can never replay its
                # empty-bucket deletions against the rebuilt index
                fsio.remove(
                    self.spark,
                    f"{self.path}/_meta/pending_compact_buckets.json",
                    missing_ok=True,
                )
            t_stage = time.time()
            docs, n_docs_in = build_documents(
                turns, num_ranges=cfg.shuffle_partitions, with_count=True,
                extra_fields=tuple(cfg.extra_fields),
            )
            # GEOMETRY IS DECIDED HERE, before any write: the doc count
            # comes free from the id-assignment pass, and cfg.range_size
            # = None (the default) derives a corpus-sized layout so a
            # mid-size corpus is never ONE serial doc-id range (the
            # measured sf100 span_near artifact).  The chosen value is
            # fixed in meta; opens/appends/compactions adopt it from
            # meta, never from a caller cfg.
            if cfg.range_size is None:
                cfg = _cfg_replace(
                    cfg,
                    range_size=derive_range_size(
                        n_docs_in,
                        self.spark.sparkContext.defaultParallelism,
                    ),
                )
                range_size_source = "auto"
                log.info(
                    "derived range_size=%d for %d docs",
                    cfg.range_size, n_docs_in,
                )
            else:
                range_size_source = "explicit"
            self.cfg = cfg
            # no exchange needed before tokenizing (r08): assign_doc_ids
            # now EMITS the doc_id-range layout — num_ranges (==
            # cfg.shuffle_partitions) partitions, each a contiguous
            # sorted doc_id interval — so the tokenizer already runs at
            # full task width and the write gets its range layout for
            # free; the old repartitionByRange here was a second full
            # shuffle of the document texts.
            docs = apply_term_freqs(
                docs, self.rules, with_positions=cfg.store_positions,
                extra_fields=tuple(cfg.extra_fields),
            )
            # single write: the docs table keeps the tf maps (used by the
            # postings stage); readers that want only doc metadata get
            # the tfs column pruned away by the parquet scan for free.
            # Global stats ride on the SAME pass via an Observation —
            # no second full scan of the docs table (at 100 TB that
            # re-read is a whole extra pass over the corpus).
            from pyspark.sql import Observation

            obs = Observation("docs_stats")
            field_obs = []
            for f in cfg.extra_fields:
                # per-field collection stats for multi-field BM25:
                # avgdl over docs that HAVE the field (nonzero length)
                field_obs += [
                    F.sum(F.col(f"doc_len_{f}")).alias(f"dl_sum_{f}"),
                    F.count(
                        F.when(F.col(f"doc_len_{f}") > 0, 1)
                    ).alias(f"dl_n_{f}"),
                ]
            (
                docs_output(docs)
                .withColumn("range_bucket", docs_bucket_col(cfg))
                .observe(
                    obs,
                    F.count(F.lit(1)).alias("n"),
                    F.avg("doc_len").alias("avgdl"),
                    F.max("doc_id").alias("max_doc"),
                    F.min("doc_ts").alias("ts_lo"),
                    F.max("doc_ts").alias("ts_hi"),
                    *field_obs,
                )
                .write.mode("overwrite")
                .partitionBy("range_bucket")
                .parquet(self.docs_path)
            )
            log.info("stage1 docs+tokenize+write: %.1fs", time.time() - t_stage)
            t_stage = time.time()
            stats = obs.get
            field_avgdl = {
                f: (
                    float(stats[f"dl_sum_{f}"]) / int(stats[f"dl_n_{f}"])
                    if int(stats[f"dl_n_{f}"] or 0) else 0.0
                )
                for f in cfg.extra_fields
            }
            meta = {
                "n_docs": int(stats["n"]),
                "avgdl": float(stats["avgdl"]),
                "max_doc": int(stats["max_doc"]),
                "k1": cfg.k1,
                "b": cfg.b,
                "range_size": cfg.range_size,
                "range_size_source": range_size_source,
                "block_size": cfg.block_size,
                "ranges_per_batch": cfg.ranges_per_batch,
                "fingerprint": fingerprint,
                "schema_version": SCHEMA_VERSION,
                "positions": bool(cfg.store_positions),
                "fields": list(cfg.extra_fields),
                "field_avgdl": field_avgdl,
                "field_dl_stats": {
                    f: [
                        float(stats[f"dl_sum_{f}"] or 0),
                        int(stats[f"dl_n_{f}"] or 0),
                    ]
                    for f in cfg.extra_fields
                },
                # doc ids are (doc_ts, conv_id)-ordered WITHIN a
                # segment; appends add segments (Lucene-style).  Time-
                # windowed search resolves a ts range to one doc-id
                # interval per segment; segment_ts (the per-segment
                # event-time bounds, aligned with segments) lets it skip
                # or whole-include segments WITHOUT a docs scan.
                "segments": [[0, int(stats["max_doc"])]],
                "segment_ts": [[str(stats["ts_lo"]), str(stats["ts_hi"])]],
                "docs_done": True,
                "postings_done": False,
            }
            self._write_meta(meta)
            log.info("stage1 stats: %.1fs", time.time() - t_stage)
        else:
            # RESUME on an existing index: geometry was fixed in meta at
            # first build — adopt it, so a caller cfg with different (or
            # auto) geometry can never re-bucket the remaining stage-2
            # work against a mismatched on-disk layout
            cfg = _cfg_replace(
                cfg,
                range_size=int(meta["range_size"]),
                block_size=int(meta["block_size"]),
                ranges_per_batch=int(meta.get("ranges_per_batch", 8)),
            )
            self.cfg = cfg

        # ---- stage 2: postings for ALL unbuilt range buckets in O(1)
        # Spark jobs (one partitionBy("range_bucket") write with dynamic
        # partition overwrite), checkpoint rows derived per bucket AFTER
        # the commit.  A driver loop of one job per bucket serializes
        # the build behind fixed per-job overhead (~2 s each: at 10^12
        # turns that is tens of thousands of buckets, >24 h of pure
        # driver time); one job writes every bucket in parallel and the
        # resume granularity stays per-bucket because the state rows are
        # still per bucket.  ``stop_after_batches`` (the kill-and-resume
        # test hook) falls back to one-bucket-per-job chunks so a crash
        # mid-build with partial state remains reproducible.
        bucket_span = cfg.range_size * cfg.ranges_per_batch
        n_buckets = max(1, math.ceil((meta["max_doc"] + 1) / bucket_span))
        done = self._built_buckets(fingerprint)
        remaining = [b for b in range(n_buckets) if b not in done]
        if stop_after_batches is not None:
            chunks = [[b] for b in remaining]
        else:
            chunks = [remaining] if remaining else []
        docs_raw = None
        batches_done = 0
        for chunk in chunks:
            if docs_raw is None:
                docs_raw = self.spark.read.parquet(self.docs_path)
            t0 = time.time()
            part = docs_raw
            if len(chunk) < n_buckets:
                # v3 layout: range_bucket is the docs hive-partition key,
                # so a resume touching a subset of buckets reads ONLY
                # those docs partitions (partition pruning, not just
                # row-group stats on doc_id)
                part = part.where(
                    F.col("range_bucket").isin([int(b) for b in chunk])
                )
            part = explode_doc_terms(
                part, bool(meta.get("positions")),
                fields=tuple(meta.get("fields") or ()),
            )
            shards = build_postings_df(part, meta["avgdl"], cfg)
            shards = shards.withColumn(
                "range_bucket",
                (F.col("range_id").cast("long") * cfg.range_size / bucket_span)
                .cast("int"),
            )
            # storage adapter (resolved once above): parquet dynamic-
            # partition overwrite; the Iceberg leg maps this onto ONE
            # overwritePartitions snapshot commit (sources/catalog.py)
            store.overwrite_postings_partitions(shards)
            self._commit_state_many(chunk, fingerprint, time.time() - t0)
            log.info(
                "stage2 buckets %s..%s (%d): %.1fs",
                min(chunk), max(chunk), len(chunk), time.time() - t0,
            )
            batches_done += 1
            if stop_after_batches is not None and batches_done >= stop_after_batches:
                raise BuildInterrupted(
                    f"test kill-switch after {batches_done} batches"
                )

        # ---- stage 3: term stats + finalize ----
        t_stage = time.time()
        if not meta.get("postings_done"):
            postings = self.spark.read.option("basePath", self.postings_path).parquet(
                self.postings_path
            )
            (
                postings.groupBy("term")
                .agg(
                    F.sum("n_docs").alias("df"),
                    F.count("*").alias("n_shards"),
                )
                .repartition(cfg.shuffle_partitions, "term")
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .parquet(self.term_stats_path)
            )
            meta["postings_done"] = True
            self._write_meta(meta)
            log.info("stage3 term_stats: %.1fs", time.time() - t_stage)
        return meta

    def has_deletes(self) -> bool:
        """True iff the tombstone table exists (local or Hadoop FS)."""
        return fsio.exists(self.spark, f"{self.path}/deletes")

    def _rm_dir(self, path: str) -> None:
        """Remove a directory tree on any Hadoop-visible filesystem
        (local shutil fast path; FileSystem API for object stores)."""
        fsio.rmtree(self.spark, path)

    # ------------------------------------------------------------------
    def _commit_state_many(self, buckets: list, fingerprint: str, wall: float):
        """Write postings first, checkpoint rows last (closes the
        reference's no-transaction gap).  One agg job derives the
        per-bucket metrics from the committed files; one append writes
        every checkpoint row of the batch."""
        committed = (
            self.spark.read.option("basePath", self.postings_path)
            .parquet(self.postings_path)
            .where(F.col("range_bucket").isin(list(buckets)))
        )
        partition_state_rows(
            self.spark, committed, buckets, fingerprint, wall
        ).write.mode("append").parquet(self.state_path)

    def _built_buckets(self, fingerprint: str) -> set:
        # cheap existence probe avoids a logged AnalysisException on
        # fresh builds (one stat call on any filesystem)
        if not fsio.exists(self.spark, self.state_path):
            return set()
        try:
            rows = (
                self.spark.read.parquet(self.state_path)
                .where(
                    (F.col("status") == "built")
                    & (F.col("input_fingerprint") == fingerprint)
                )
                .select("partition_id")
                .collect()
            )
            return {r["partition_id"] for r in rows}
        except Exception:
            return set()

    def partition_state(self) -> DataFrame:
        return self.spark.read.parquet(self.state_path)

    def reindex_all(self, turns: DataFrame, **kw) -> dict:
        """Full rebuild: clear checkpoint + meta, rebuild everything
        (the reference's `reindexAll`, MediaServiceLive.scala:1587-1612)."""
        fsio.rmtree(self.spark, self.path)
        return self.build(turns, **kw)

    # ------------------------------------------------------------------
    def _read_meta(self):
        try:
            return json.loads(fsio.read_text(self.spark, self.meta_path))
        except (OSError, json.JSONDecodeError):
            return None

    def _write_meta(self, meta: dict):
        fsio.mkdirs(self.spark, os.path.dirname(self.meta_path))
        fsio.write_text_atomic(self.spark, self.meta_path, json.dumps(meta, indent=1))
