"""Catalog-backed builder pipeline: the index lifecycle (build, append,
delete, compact, query-side open) executed entirely against an Iceberg
catalog through :class:`sotohp_spark.sources.catalog.IcebergIndexStore`.

This is the Iceberg leg of the north rule ("over Iceberg tables") made
literal: the SAME data-plane stages as the parquet builder
(operators/docs.py materialization, the Arrow tokenizer, postings
shard construction in operators/postings.py) with the parquet leg's
hand-rolled commit protocol replaced by catalog-native commits —

    parquet protocol                         catalog protocol
    ------------------------------------     -----------------------------
    meta.json atomic rename                  versioned row in `_meta`
    _meta/partition_state parquet append     `_state` table append
    pending_append_<id>.json marker files    pending row in `_meta`
      listing moved postings FILES             recording the postings
                                               table's SNAPSHOT ID
    rollback = delete the moved files        rollback = one
                                               rollback_to_snapshot call
    compaction staging dirs + rename swap    REPLACE TABLE commits, with
      + recovery lease                        pre-replace snapshot ids as
                                              the abort points
    recovery lease (concurrent opens)        not needed for READERS —
                                              every commit is atomic, a
                                              reader never sees a torn
                                              table (single WRITER per
                                              index remains the contract,
                                              as on the parquet leg)

Multi-table operations keep the parquet leg's write-data-first /
commit-last discipline.  An APPEND's commit point is the docs-table
append (what the conv-id dedup anti-join sees): postings are appended
first under a pending row that records the postings table's pre-append
snapshot, so a crash before the docs commit rolls the postings back
with one catalog call.  A COMPACTION's commit point is the meta write:
every table replace before it is abortable by rolling back to the
snapshot ids recorded in the pending row.

Reference semantics carried over: synchronize-style incremental skip
(MediaServiceLive.scala:1484-1565), ES index routing / bulk upsert /
delete routing (ElasticOperations.scala:91-97, 113-130, 149-167), and
the closed "TODO no transaction take care" gap
(MediaServiceLive.scala:1480) — closed here by Iceberg's atomicity
plus pending-row ordering instead of marker files.
"""

from __future__ import annotations

import hashlib
import logging
import math
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sotohp_spark.config import EngineConfig, DEFAULT
from sotohp_spark.functions.tokenizer import KeywordRules

log = logging.getLogger("sotohp_spark.catalog_build")


# ----------------------------------------------------------------------
# crash recovery: reconcile pending commit points on every open
def recover_pending_catalog(spark: SparkSession, store) -> bool:
    """Reconcile pending multi-table commits recorded in `_meta`.

    - pending APPEND: the docs-table append is the commit point.  If
      the docs table's max doc_id advanced past the pending row's
      pre-append snapshot -> the append committed; re-derive meta /
      term_stats (roll FORWARD).  Otherwise -> roll the postings table
      back to its recorded snapshot id (the orphaned shards would
      double-count term contributions on re-append) and drop the row.
    - pending COMPACT: the meta write is the commit point.  If the
      current meta already carries the compaction's fingerprint ->
      finish the cleanup (clear deletes, drop the row).  Otherwise ->
      roll every participating table back to its recorded snapshot.

    Returns True if any recovery ran.  Idempotent; ordered by
    pre_max_doc so two committed appends recover oldest-first (the
    segment guard in _derived_state only extends past the last
    segment end, mirroring incremental._recover_pending_append).
    """
    ran = False
    pend = sorted(
        store.list_pending("append"), key=lambda t: t[1]["pre_max_doc"]
    )
    for batch_id, p in pend:
        ran = True
        cur_max = (
            store.read_docs().agg(F.max("doc_id")).collect()[0][0]
            if store.table_exists(store.docs_table)
            else None
        )
        if cur_max is not None and cur_max > p["pre_max_doc"]:
            log.warning(
                "pending catalog append %s already committed; "
                "refreshing derived state", batch_id,
            )
            _refresh_derived_state(
                spark, store,
                new_segment=(
                    p["pre_max_doc"] + 1, p["pre_max_doc"] + p["n_new"],
                ),
                new_segment_ts=tuple(p["segment_ts"]),
            )
        else:
            log.warning(
                "rolling back uncommitted catalog append %s "
                "(postings -> snapshot %s)", batch_id,
                p["postings_snapshot"],
            )
            store.rollback(store.postings_table, p["postings_snapshot"])
        store.clear_pending("append", batch_id)

    for batch_id, p in store.list_pending("compact"):
        ran = True
        meta = store.read_meta()
        if meta is not None and meta.get("fingerprint") == p["new_fingerprint"]:
            log.warning(
                "pending catalog compaction %s already committed; "
                "finishing cleanup", batch_id,
            )
            store.clear_deletes()
        else:
            log.warning(
                "rolling back uncommitted catalog compaction %s", batch_id
            )
            for tbl_key in (
                "docs_snapshot", "postings_snapshot",
                "term_stats_snapshot", "state_snapshot",
                "deletes_snapshot",
            ):
                name = getattr(
                    store, tbl_key.replace("_snapshot", "_table")
                )
                store.rollback(name, p[tbl_key])
        store.clear_pending("compact", batch_id)
    return ran


def _refresh_derived_state(
    spark: SparkSession, store, new_segment=None, new_segment_ts=None,
) -> dict:
    """Full recompute of meta globals + term_stats from the committed
    tables — the crash-recovery path (the happy append path uses the
    O(batch + vocabulary) arithmetic update, as on the parquet leg)."""
    meta = store.read_meta()
    idx_fields = tuple(meta.get("fields") or ())
    field_aggs = []
    for f in idx_fields:
        field_aggs += [
            F.sum(F.col(f"doc_len_{f}")).alias(f"dl_sum_{f}"),
            F.count(F.when(F.col(f"doc_len_{f}") > 0, 1)).alias(f"dl_n_{f}"),
        ]
    stats = store.read_docs().agg(
        F.count("*").alias("n"),
        F.avg("doc_len").alias("avgdl"),
        F.max("doc_id").alias("max_doc"),
        *field_aggs,
    ).collect()[0]
    meta.update(
        n_docs=int(stats["n"]), avgdl=float(stats["avgdl"]),
        max_doc=int(stats["max_doc"]),
    )
    if idx_fields:
        fstats = {
            f: [float(stats[f"dl_sum_{f}"] or 0), int(stats[f"dl_n_{f}"] or 0)]
            for f in idx_fields
        }
        meta["field_dl_stats"] = fstats
        meta["field_avgdl"] = {
            f: (s / n if n else 0.0) for f, (s, n) in fstats.items()
        }
    if new_segment is not None:
        _extend_segments(meta, new_segment, new_segment_ts)
    ts = (
        store.read_postings()
        .groupBy("term")
        .agg(F.sum("n_docs").alias("df"), F.count("*").alias("n_shards"))
        .repartition(store.cfg.shuffle_partitions, "term")
        .sortWithinPartitions("term")
        .localCheckpoint()  # term_stats replace may read its own table
    )
    store.write_term_stats(ts)
    store.write_meta(meta)
    return meta


def _extend_segments(meta: dict, new_segment, new_segment_ts) -> None:
    """Append a (first_doc, last_doc) segment + its event-time bounds to
    meta, idempotently (recovery may re-run)."""
    lo, hi = int(new_segment[0]), int(new_segment[1])
    segs = [list(s) for s in meta.get("segments", [])]
    if not segs or lo > segs[-1][1]:
        segs.append([lo, hi])
        seg_ts = list(meta.get("segment_ts") or [])
        while len(seg_ts) < len(segs) - 1:
            seg_ts.append(None)
        seg_ts.append(
            [str(new_segment_ts[0]), str(new_segment_ts[1])]
            if new_segment_ts is not None else None
        )
        meta["segment_ts"] = seg_ts
    meta["segments"] = segs


class CatalogIndexBuilder:
    """Build / append / delete / compact an index held in catalog
    tables.  Data-plane stages are shared with the parquet
    IndexBuilder; only the commit protocol differs (module docstring).
    """

    def __init__(self, spark: SparkSession, store,
                 cfg: EngineConfig = DEFAULT,
                 rules: KeywordRules | None = None):
        self.spark = spark
        self.store = store
        self.cfg = cfg
        self.rules = rules

    def _adopt_geometry(self, meta: dict) -> EngineConfig:
        """Replace this builder's cfg geometry with the index's —
        range layout is fixed in meta at first build; any mutation of
        an EXISTING index (resume, append, compact) must bucket
        against the on-disk geometry, never a caller cfg's (whose
        default is now auto/None)."""
        from dataclasses import replace as _cfg_replace

        self.cfg = _cfg_replace(
            self.cfg,
            range_size=int(meta["range_size"]),
            block_size=int(meta["block_size"]),
            ranges_per_batch=int(meta.get("ranges_per_batch", 8)),
        )
        return self.cfg

    # ------------------------------------------------------------------
    def build(
        self,
        turns: DataFrame | None,
        stop_after_batches: int | None = None,
        input_fingerprint: str | None = None,
    ) -> dict:
        """Build (or resume) the index from the turns table — the
        catalog form of IndexBuilder.build (same stages, same resume
        granularity; checkpoint rows live in the `_state` table)."""
        from pyspark.sql import Observation

        from sotohp_spark.index.build import (
            SCHEMA_VERSION,
            BuildInterrupted,
            apply_term_freqs,
            docs_bucket_col,
            docs_output,
            explode_doc_terms,
            partition_state_rows,
        )
        from sotohp_spark.operators.docs import build_documents
        from sotohp_spark.operators.postings import build_postings_df

        cfg, store = self.cfg, self.store
        fingerprint = input_fingerprint or "default"
        recover_pending_catalog(self.spark, store)
        meta = store.read_meta()
        if (
            meta is not None
            and meta.get("fingerprint") == fingerprint
            and int(meta.get("schema_version", 1)) != SCHEMA_VERSION
        ):
            raise ValueError(
                f"catalog index {store.prefix} is schema "
                f"v{meta.get('schema_version', 1)}, engine writes "
                f"v{SCHEMA_VERSION}; run index.migrate_index"
            )
        if meta is None or meta.get("fingerprint") != fingerprint:
            if meta is not None and meta.get("fingerprint") != fingerprint:
                # CHANGED input: stage 2 only overwrites buckets
                # 0..n_buckets-1 of the new corpus — ghost postings in
                # higher buckets (and stale tombstones referencing the
                # OLD doc-id space) must go first, exactly like the
                # parquet leg's wipe
                log.warning(
                    "fingerprint changed (%s -> %s): clearing stale "
                    "postings/term_stats/state/deletes tables",
                    meta.get("fingerprint"), fingerprint,
                )
                for name in (store.postings_table, store.term_stats_table):
                    if store.table_exists(name):
                        store.replace_table(
                            name, store.read_table(name).limit(0)
                        )
                store.clear_state()
                store.clear_deletes()
            # ---- stage 1: docs + tokenize + stats in ONE pass ----
            t_stage = time.time()
            docs, n_docs_in = build_documents(
                turns, num_ranges=cfg.shuffle_partitions, with_count=True,
                extra_fields=tuple(cfg.extra_fields),
            )
            # geometry decided before any write, exactly like the
            # parquet leg (index/build.py): auto range_size derives
            # from the corpus size and is then FIXED in meta
            if cfg.range_size is None:
                from dataclasses import replace as _cfg_replace

                from sotohp_spark.config import derive_range_size

                cfg = _cfg_replace(
                    cfg,
                    range_size=derive_range_size(
                        n_docs_in,
                        self.spark.sparkContext.defaultParallelism,
                    ),
                )
                range_size_source = "auto"
                log.info("derived range_size=%d for %d docs",
                         cfg.range_size, n_docs_in)
            else:
                range_size_source = "explicit"
            self.cfg = cfg
            docs = docs.repartitionByRange(cfg.shuffle_partitions, "doc_id")
            docs = apply_term_freqs(
                docs, self.rules, with_positions=cfg.store_positions,
                extra_fields=tuple(cfg.extra_fields),
            )
            obs = Observation()
            field_obs = []
            for f in cfg.extra_fields:
                field_obs += [
                    F.sum(F.col(f"doc_len_{f}")).alias(f"dl_sum_{f}"),
                    F.count(
                        F.when(F.col(f"doc_len_{f}") > 0, 1)
                    ).alias(f"dl_n_{f}"),
                ]
            out = (
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
            )
            store.replace_table(store.docs_table, out,
                                partition_col="range_bucket")
            log.info("stage1 docs+tokenize+write: %.1fs",
                     time.time() - t_stage)
            stats = obs.get
            fstats = {
                f: [
                    float(stats[f"dl_sum_{f}"] or 0),
                    int(stats[f"dl_n_{f}"] or 0),
                ]
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
                "field_avgdl": {
                    f: (s / n if n else 0.0)
                    for f, (s, n) in fstats.items()
                },
                "field_dl_stats": fstats,
                "segments": [[0, int(stats["max_doc"])]],
                "segment_ts": [[str(stats["ts_lo"]), str(stats["ts_hi"])]],
                "docs_done": True,
                "postings_done": False,
            }
            store.write_meta(meta)
        else:
            # RESUME: geometry fixed in meta at first build — adopt it
            cfg = self._adopt_geometry(meta)

        # ---- stage 2: postings for all unbuilt buckets, O(1) commits
        # per chunk (one overwritePartitions snapshot); per-bucket
        # checkpoint rows appended AFTER the commit, postings-first /
        # state-last exactly like the parquet leg ----
        bucket_span = cfg.range_size * cfg.ranges_per_batch
        n_buckets = max(1, math.ceil((meta["max_doc"] + 1) / bucket_span))
        done = store.built_buckets(fingerprint)
        remaining = [b for b in range(n_buckets) if b not in done]
        chunks = (
            [[b] for b in remaining]
            if stop_after_batches is not None
            else ([remaining] if remaining else [])
        )
        docs_raw = None
        batches_done = 0
        for chunk in chunks:
            if docs_raw is None:
                docs_raw = store.read_docs()
            t0 = time.time()
            part = docs_raw
            if len(chunk) < n_buckets:
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
            store.overwrite_postings_partitions(shards)
            committed = store.read_postings().where(
                F.col("range_bucket").isin([int(b) for b in chunk])
            )
            store.append_state(
                partition_state_rows(
                    self.spark, committed, chunk, fingerprint,
                    time.time() - t0,
                )
            )
            log.info(
                "stage2 buckets %s..%s (%d): %.1fs",
                min(chunk), max(chunk), len(chunk), time.time() - t0,
            )
            batches_done += 1
            if (
                stop_after_batches is not None
                and batches_done >= stop_after_batches
            ):
                raise BuildInterrupted(
                    f"test kill-switch after {batches_done} batches"
                )

        # ---- stage 3: term stats + finalize ----
        t_stage = time.time()
        if not meta.get("postings_done"):
            ts = (
                store.read_postings()
                .groupBy("term")
                .agg(
                    F.sum("n_docs").alias("df"),
                    F.count("*").alias("n_shards"),
                )
                .repartition(cfg.shuffle_partitions, "term")
                .sortWithinPartitions("term")
            )
            store.write_term_stats(ts)
            meta["postings_done"] = True
            store.write_meta(meta)
            log.info("stage3 term_stats: %.1fs", time.time() - t_stage)
        return meta

    # ------------------------------------------------------------------
    def _live_conv_ids(self) -> DataFrame:
        """conv_ids with at least one NON-tombstoned docs row (same
        update-vs-duplicate semantics as incremental._live_conv_ids)."""
        docs = self.store.read_docs().select("doc_id", "conv_id")
        if self.store.has_deletes():
            doomed = self.store.read_deletes().select("doc_id").distinct()
            docs = docs.join(doomed, "doc_id", "left_anti")
        return docs.select("conv_id").distinct()

    def append_conversations(
        self, new_turns: DataFrame, _fail_before_commit: bool = False,
    ) -> dict:
        """Append complete new conversations — the catalog two-phase:

          1. pending row in `_meta` records the postings table's
             CURRENT SNAPSHOT ID (the rollback point), then the new
             shards are appended (one atomic commit);
          2. the docs-table append is the commit point (what the
             conv-id dedup anti-join sees);
          3. derived state (meta arithmetic + O(batch+vocab)
             term-stats merge), pending row dropped.

        A crash between 1 and 2 is reconciled by
        recover_pending_catalog: one rollback_to_snapshot call —
        no file lists, no staging dirs."""
        from sotohp_spark.index.build import SCHEMA_VERSION, apply_term_freqs
        from sotohp_spark.operators.docs import (
            assign_doc_ids,
            materialize_documents,
        )
        from sotohp_spark.operators.postings import build_postings_df

        cfg, store = self.cfg, self.store
        recover_pending_catalog(self.spark, store)
        meta = store.read_meta()
        if meta is None:
            raise ValueError(
                f"no catalog index at prefix {store.prefix}; "
                f"run CatalogIndexBuilder.build first"
            )
        if int(meta.get("schema_version", 1)) != SCHEMA_VERSION:
            raise ValueError(
                f"catalog index {store.prefix} is schema "
                f"v{meta.get('schema_version', 1)}, appends write "
                f"v{SCHEMA_VERSION}; run index.migrate_index first"
            )
        # appended shards must bucket against the INDEX's geometry
        cfg = self._adopt_geometry(meta)
        fresh_turns = new_turns.join(
            self._live_conv_ids(), "conv_id", "left_anti"
        )
        pre_max_doc = store.read_docs().agg(
            F.max("doc_id")
        ).collect()[0][0]
        pre_max_doc = -1 if pre_max_doc is None else int(pre_max_doc)

        idx_fields = tuple(meta.get("fields") or ())
        docs = materialize_documents(fresh_turns, extra_fields=idx_fields)
        docs = assign_doc_ids(
            docs, num_ranges=cfg.shuffle_partitions
        ).withColumn("doc_id", F.col("doc_id") + F.lit(pre_max_doc + 1))
        docs = apply_term_freqs(
            docs, self.rules, with_positions=bool(meta.get("positions")),
            extra_fields=idx_fields,
        )
        docs = docs.localCheckpoint()
        field_aggs = []
        for f in idx_fields:
            field_aggs += [
                F.sum(F.col(f"doc_len_{f}")).alias(f"dl_sum_{f}"),
                F.count(
                    F.when(F.col(f"doc_len_{f}") > 0, 1)
                ).alias(f"dl_n_{f}"),
            ]
        agg = docs.agg(
            F.count("*").alias("n"),
            F.sum(F.crc32(F.col("conv_id"))).alias("digest"),
            F.min("conv_id").alias("lo"),
            F.max("conv_id").alias("hi"),
            F.min("doc_ts").alias("ts_lo"),
            F.max("doc_ts").alias("ts_hi"),
            F.sum("doc_len").alias("dl_sum"),
            *field_aggs,
        ).collect()[0]
        n_new = int(agg["n"])
        if n_new == 0:
            return meta
        batch_id = hashlib.md5(
            f"{int(agg['digest'])}|{n_new}|{agg['lo']}|{agg['hi']}".encode()
        ).hexdigest()[:16]

        from sotohp_spark.index.build import explode_doc_terms

        doc_tf = explode_doc_terms(docs, bool(meta.get("positions")),
                               fields=tuple(meta.get("fields") or ()))
        shards = build_postings_df(doc_tf, meta["avgdl"], cfg)
        bucket_span = cfg.range_size * cfg.ranges_per_batch
        shards = shards.withColumn(
            "range_bucket",
            (F.col("range_id").cast("long") * cfg.range_size / bucket_span)
            .cast("int"),
        ).localCheckpoint()  # reused: append + term-stats delta below

        # ---- phase 1: pending row (snapshot id), then postings ----
        store.put_pending(
            "append", batch_id,
            {
                "pre_max_doc": pre_max_doc,
                "n_new": n_new,
                "postings_snapshot": store.current_snapshot(
                    store.postings_table
                ),
                "segment_ts": [str(agg["ts_lo"]), str(agg["ts_hi"])],
            },
        )
        store.append_postings(shards)
        if _fail_before_commit:
            raise RuntimeError("test kill-switch: crash before docs commit")

        # ---- phase 2: docs append = the commit point ----
        store.write_docs(docs, mode="append")

        # ---- phase 3: derived state + pending removal ----
        old_n = int(meta["n_docs"])
        meta.update(
            n_docs=old_n + n_new,
            avgdl=(float(meta["avgdl"]) * old_n + float(agg["dl_sum"]))
            / (old_n + n_new),
            max_doc=pre_max_doc + n_new,
        )
        if idx_fields:
            fstats = dict(meta.get("field_dl_stats") or {})
            favg = dict(meta.get("field_avgdl") or {})
            for f in idx_fields:
                s0, n0 = fstats.get(f, [0.0, 0])
                s1 = float(s0) + float(agg[f"dl_sum_{f}"] or 0)
                n1 = int(n0) + int(agg[f"dl_n_{f}"] or 0)
                fstats[f] = [s1, n1]
                favg[f] = (s1 / n1) if n1 else 0.0
            meta["field_dl_stats"] = fstats
            meta["field_avgdl"] = favg
        _extend_segments(
            meta, (pre_max_doc + 1, pre_max_doc + n_new),
            (agg["ts_lo"], agg["ts_hi"]),
        )
        delta = shards.groupBy("term").agg(
            F.sum("n_docs").alias("_df_d"), F.count("*").alias("_ns_d")
        )
        merged = (
            store.read_term_stats()
            .join(delta, "term", "full_outer")
            .select(
                "term",
                (F.coalesce(F.col("df"), F.lit(0))
                 + F.coalesce(F.col("_df_d"), F.lit(0))).alias("df"),
                (F.coalesce(F.col("n_shards"), F.lit(0))
                 + F.coalesce(F.col("_ns_d"), F.lit(0))).alias("n_shards"),
            )
            .repartition(cfg.shuffle_partitions, "term")
            .sortWithinPartitions("term")
            .localCheckpoint()  # breaks lineage to the table being replaced
        )
        store.write_term_stats(merged)
        meta["appends_since_merge"] = int(
            meta.get("appends_since_merge", 0)
        ) + 1
        store.write_meta(meta)
        store.clear_pending("append", batch_id)
        # ---- background-merge policy (on by default): the parquet
        # leg's fragmentation probe is a cheap file glob it can run per
        # append; the catalog leg's signal (duplicate (term, range_id)
        # shard rows) is a postings-table aggregate, so amortize it —
        # run the full merge_segments pass once per `threshold`
        # appends, tracked by a meta counter.  None = off.
        thresh = getattr(self.cfg, "auto_merge_segments", None)
        if thresh is not None and meta["appends_since_merge"] >= int(thresh):
            meta = self.merge_segments(physical=True)
            meta["appends_since_merge"] = 0
            store.write_meta(meta)
        return meta

    # ------------------------------------------------------------------
    def delete_conversations(self, conv_ids) -> int:
        """Delete-by-id sink: ONE atomic tombstone-table append (list
        overload for the interactive path, DataFrame overload for the
        distributed bulk path — ids never touch the driver)."""
        store = self.store
        recover_pending_catalog(self.spark, store)
        docs = store.read_docs().select("doc_id", "conv_id")
        if isinstance(conv_ids, DataFrame):
            matched = docs.join(
                conv_ids.select("conv_id").distinct(), "conv_id", "left_semi"
            )
        else:
            matched = docs.where(F.col("conv_id").isin(list(conv_ids)))
        return store.append_deletes(matched.select("doc_id"))

    def update_conversations(self, new_turns: DataFrame) -> dict:
        """Upsert = tombstone-then-append, as on the parquet leg; the
        stale-id set stays a DataFrame end-to-end."""
        recover_pending_catalog(self.spark, self.store)
        if self.store.read_meta() is None:
            raise ValueError(
                f"no catalog index at prefix {self.store.prefix}"
            )
        stale = new_turns.select("conv_id").distinct().join(
            self._live_conv_ids(), "conv_id", "left_semi"
        )
        self.delete_conversations(stale)
        return self.append_conversations(new_turns)

    # ------------------------------------------------------------------
    def compact_buckets(self, buckets: list | None = None) -> dict:
        """BUCKET-LOCAL compaction on the catalog leg: rewrite ONLY the
        range buckets containing tombstoned docs.  Same contract as
        the parquet compact_buckets — doc ids stay sparse, meta and
        term_stats untouched, every query's ranks AND scores identical
        before and after; at a 0.1% delete ratio this touches ~0.1% of
        the index.

        ``buckets``: optional EXTRA buckets to rewrite even without
        tombstones (merge_segments' physical consolidation of
        append-fragmented buckets — same rewrite, same score
        identity).

        Catalog protocol — NO pending row needed, because every
        intermediate state is query-correct:
          1. overwritePartitions(docs, survivors of affected buckets)
             (+ explicit DELETE of buckets left empty — overwrite only
             touches partitions present in the new data);
          2. overwritePartitions(postings, rebuilt shards) (+ empty-
             bucket DELETEs);
          3. clear the tombstone table (the commit point).
        A crash anywhere before 3 leaves tombstones in place, and the
        anti-filter still masks any stale postings of doomed docs; a
        retry reconverges (survivor recompute is idempotent).  Bucket
        geometry comes from META, never the caller's cfg."""
        from sotohp_spark.index.build import (
            docs_bucket_col,
            docs_output,
            explode_doc_terms,
        )
        from sotohp_spark.operators.postings import build_postings_df

        store = self.store
        recover_pending_catalog(self.spark, store)
        meta = store.read_meta()
        if meta is None:
            raise ValueError(f"no catalog index at prefix {store.prefix}")
        if buckets is None and not store.has_deletes():
            return meta
        cfg = EngineConfig(
            k1=meta["k1"],
            b=meta["b"],
            range_size=meta["range_size"],
            block_size=meta["block_size"],
            ranges_per_batch=meta.get("ranges_per_batch", 8),
            shuffle_partitions=self.cfg.shuffle_partitions,
            store_positions=bool(meta.get("positions")),
        )
        span = cfg.range_size * cfg.ranges_per_batch
        if store.has_deletes():
            doomed = (
                store.read_deletes().select("doc_id").distinct()
                .localCheckpoint()
            )
        else:  # merge_segments path: rewrite without any tombstones
            doomed = self.spark.createDataFrame([], "doc_id long").limit(0)
        affected = sorted(
            {
                int(r["b"])
                for r in doomed.select(
                    (F.col("doc_id") / F.lit(span)).cast("int").alias("b")
                ).distinct().collect()
            }
            | set(int(b) for b in (buckets or []))
        )
        if not affected:
            store.clear_deletes()
            return meta

        surv = (
            store.read_docs()
            .where(F.col("range_bucket").isin(affected))
            .join(doomed, "doc_id", "left_anti")
            .localCheckpoint()  # one compute: docs overwrite + postings build
        )
        out = docs_output(surv).withColumn(
            "range_bucket", docs_bucket_col(cfg)
        )
        kept_buckets = {
            int(r["range_bucket"])
            for r in out.select("range_bucket").distinct().collect()
        }
        # 1. docs: overwrite surviving buckets, DELETE emptied ones
        if kept_buckets:
            store.overwrite_partitions_table(
                store.docs_table, out, partition_col="range_bucket"
            )
        for b in sorted(set(affected) - kept_buckets):
            store.delete_where(store.docs_table, f"range_bucket = {b}")

        # 2. postings rebuilt from the survivors' stored tf maps;
        # avgdl passed UNCHANGED (stored block-max metadata is
        # avgdl-free and scores must keep pre-compaction stats)
        doc_tf = explode_doc_terms(surv, bool(meta.get("positions")),
                                 fields=tuple(meta.get("fields") or ()))
        shards = build_postings_df(doc_tf, meta["avgdl"], cfg)
        shards = shards.withColumn(
            "range_bucket",
            (F.col("range_id").cast("long") * cfg.range_size / span)
            .cast("int"),
        ).localCheckpoint()
        shard_buckets = {
            int(r["range_bucket"])
            for r in shards.select("range_bucket").distinct().collect()
        }
        if shard_buckets:
            store.overwrite_postings_partitions(shards)
        for b in sorted(set(affected) - shard_buckets):
            store.delete_where(store.postings_table, f"range_bucket = {b}")

        # 3. commit point
        store.clear_deletes()
        return meta

    # ------------------------------------------------------------------
    def merge_segments(self, physical: bool = True,
                       fragment_shards: int = 1) -> dict:
        """Segment maintenance on the catalog leg (the counterpart of
        streaming.incremental.merge_segments): coalesce adjacent
        time-ordered segments in meta, then optionally consolidate
        append-fragmented buckets bucket-locally.

        The catalog-leg fragmentation signal is DUPLICATE
        (term, range_id) shard rows — each small append adds its own
        shard row for ranges a previous append already populated;
        buckets holding more than ``fragment_shards`` rows per key get
        rewritten through compact_buckets(buckets=...) (score-
        identical).  File-level compaction within a partition is the
        catalog's own concern (Iceberg rewrite_data_files)."""
        from sotohp_spark.streaming.incremental import coalesce_segments

        store = self.store
        recover_pending_catalog(self.spark, store)
        meta = store.read_meta()
        if meta is None:
            raise ValueError(f"no catalog index at prefix {store.prefix}")
        if coalesce_segments(meta):
            store.write_meta(meta)
        if physical:
            frag = sorted(
                int(r["range_bucket"])
                for r in store.read_postings()
                .groupBy("range_bucket", "range_id", "term")
                .count()
                .where(F.col("count") > fragment_shards)
                .select("range_bucket")
                .distinct()
                .collect()
            )
            if frag:
                meta = self.compact_buckets(buckets=frag)
        return meta

    # ------------------------------------------------------------------
    def compact(self, _fail_after: str | None = None) -> dict:
        """Compaction: physically drop tombstoned docs, re-densify doc
        ids, refresh global stats — fresh-build equivalent, like
        compact_index on the parquet leg, but with REPLACE TABLE
        commits instead of a staging-dir rename swap.

        Protocol: a pending row records every participating table's
        pre-replace snapshot id; the meta write is the commit point;
        recovery rolls forward (cleanup) or back (one rollback call
        per table).  ``_fail_after``: test kill-switch
        ('docs' | 'postings' | 'meta')."""
        from pyspark.sql import Observation

        from sotohp_spark.index.build import (
            SCHEMA_VERSION,
            docs_bucket_col,
            docs_output,
            explode_doc_terms,
            partition_state_rows,
        )
        from sotohp_spark.operators.docs import assign_doc_ids
        from sotohp_spark.operators.postings import build_postings_df

        cfg, store = self.cfg, self.store
        recover_pending_catalog(self.spark, store)
        meta = store.read_meta()
        if meta is None:
            raise ValueError(f"no catalog index at prefix {store.prefix}")
        cfg = self._adopt_geometry(meta)
        if not store.has_deletes():
            return meta
        doomed = store.read_deletes().select("doc_id").distinct()
        survivors = (
            store.read_docs()
            .join(doomed, "doc_id", "left_anti")
            .drop("doc_id", "range_bucket")
        )
        survivors = assign_doc_ids(
            survivors, num_ranges=cfg.shuffle_partitions
        ).localCheckpoint()
        idx_fields = tuple(meta.get("fields") or ())
        field_aggs = []
        for f in idx_fields:
            field_aggs += [
                F.sum(F.col(f"doc_len_{f}")).alias(f"dl_sum_{f}"),
                F.count(
                    F.when(F.col(f"doc_len_{f}") > 0, 1)
                ).alias(f"dl_n_{f}"),
            ]
        stats = survivors.agg(
            F.count("*").alias("n"),
            F.avg("doc_len").alias("avgdl"),
            F.max("doc_id").alias("max_doc"),
            F.min("doc_ts").alias("ts_lo"),
            F.max("doc_ts").alias("ts_hi"),
            *field_aggs,
        ).collect()[0]
        new_fp = meta["fingerprint"] + "+compact"
        batch_id = hashlib.md5(new_fp.encode()).hexdigest()[:16]
        store.put_pending(
            "compact", batch_id,
            {
                "new_fingerprint": new_fp,
                "docs_snapshot": store.current_snapshot(store.docs_table),
                "postings_snapshot": store.current_snapshot(
                    store.postings_table
                ),
                "term_stats_snapshot": store.current_snapshot(
                    store.term_stats_table
                ),
                "state_snapshot": store.current_snapshot(store.state_table),
                "deletes_snapshot": store.current_snapshot(
                    store.deletes_table
                ),
            },
        )
        t0 = time.time()
        out = docs_output(survivors).withColumn(
            "range_bucket", docs_bucket_col(cfg)
        )
        store.replace_table(store.docs_table, out,
                            partition_col="range_bucket")
        if _fail_after == "docs":
            raise RuntimeError("test kill-switch: crash after docs replace")
        doc_tf = explode_doc_terms(
            store.read_docs(), bool(meta.get("positions")),
            fields=tuple(meta.get("fields") or ()),
        )
        avgdl = float(stats["avgdl"])
        shards = build_postings_df(doc_tf, avgdl, cfg)
        bucket_span = cfg.range_size * cfg.ranges_per_batch
        shards = (
            shards.withColumn(
                "range_bucket",
                (F.col("range_id").cast("long") * cfg.range_size / bucket_span)
                .cast("int"),
            )
            .repartition(cfg.shuffle_partitions, "term")
            .sortWithinPartitions("term", "range_id")
        )
        store.replace_table(store.postings_table, shards,
                            partition_col="range_bucket")
        if _fail_after == "postings":
            raise RuntimeError(
                "test kill-switch: crash after postings replace"
            )
        n_buckets = max(1, math.ceil((int(stats["max_doc"]) + 1) / bucket_span))
        store.clear_state()
        store.append_state(
            partition_state_rows(
                self.spark, store.read_postings(), list(range(n_buckets)),
                new_fp, time.time() - t0,
            )
        )
        ts = (
            store.read_postings()
            .groupBy("term")
            .agg(F.sum("n_docs").alias("df"), F.count("*").alias("n_shards"))
            .repartition(cfg.shuffle_partitions, "term")
            .sortWithinPartitions("term")
            .localCheckpoint()
        )
        store.write_term_stats(ts)
        new_meta = dict(
            meta,
            n_docs=int(stats["n"]),
            avgdl=avgdl,
            max_doc=int(stats["max_doc"]),
            fingerprint=new_fp,
            segments=[[0, int(stats["max_doc"])]],
            segment_ts=[[str(stats["ts_lo"]), str(stats["ts_hi"])]],
            schema_version=SCHEMA_VERSION,
            postings_done=True,
        )
        if idx_fields:
            fstats = {
                f: [
                    float(stats[f"dl_sum_{f}"] or 0),
                    int(stats[f"dl_n_{f}"] or 0),
                ]
                for f in idx_fields
            }
            new_meta["field_dl_stats"] = fstats
            new_meta["field_avgdl"] = {
                f: (s / n if n else 0.0) for f, (s, n) in fstats.items()
            }
        store.write_meta(new_meta)  # <- the commit point
        if _fail_after == "meta":
            raise RuntimeError("test kill-switch: crash after meta commit")
        store.clear_deletes()
        store.clear_control_history()
        store.clear_pending("compact", batch_id)
        return new_meta
