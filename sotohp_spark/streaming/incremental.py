"""Incremental index maintenance — the reference's `synchronize`
semantics (MediaServiceLive.scala:1484-1565) as (a) a batch
append-with-checkpoint and (b) a Structured Streaming AvailableNow
ingest that drives (a) per micro-batch.

Model:
- new turns arrive for NEW conversations (the reference's Originals
  are immutable once scanned, README.md:21-22 — the transcript analog:
  a conversation is indexed once complete);
- `append_conversations` assigns doc_ids continuing after meta.max_doc
  (deterministic: dense rank over (min_ts, conv_id) of the new batch,
  offset by max_doc+1), builds postings shards for the new ranges,
  appends them, and updates term_stats and meta (N, avgdl);
- already-indexed conv_ids are skipped by an anti-join against the
  LIVE docs (docs minus tombstones — the reference's
  `state.mediaLastSynchronized.isEmpty` filter,
  MediaServiceLive.scala:1522); a deleted conversation may be
  re-appended with corrected turns (the update path: new doc_id, old
  one stays tombstoned until compaction);
- stored block-max metadata is avgdl-free (see postings.py), so the
  global avgdl shift caused by appends never invalidates pruning.

New shards land in NEW range buckets (doc-id space grows to the
right), so appends never rewrite existing partitions — an append is
O(new data), and readers of old ranges are undisturbed.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sotohp_spark import fsio
from sotohp_spark.config import EngineConfig, DEFAULT
from sotohp_spark.functions.tokenizer import KeywordRules
from sotohp_spark.index.build import IndexBuilder, apply_term_freqs
from sotohp_spark.operators.docs import assign_doc_ids, materialize_documents
from sotohp_spark.operators.postings import build_postings_df

log = logging.getLogger("sotohp_spark.incremental")


def _deletes_exist(builder: IndexBuilder) -> bool:
    """True iff the tombstone table exists (delegates to IndexBuilder —
    one definition for local and Hadoop filesystems)."""
    return builder.has_deletes()


def _normalize_deletes_layout(spark: SparkSession, builder: IndexBuilder) -> None:
    """One-time in-place rewrite of a hive-partitioned tombstone dir
    (deletes/range_bucket=N/...) to the flat layout.  Appending flat
    files NEXT TO hive subdirs would leave parquet files at mixed
    depths — Spark partition discovery rejects that dir forever
    ('Conflicting directory structures') — so the writer normalizes
    BEFORE it can create the mixed state."""
    path = f"{builder.path}/deletes"
    if not fsio.exists(spark, path):
        return
    hive_dirs = fsio.glob(spark, f"{path}/range_bucket=*")
    if not hive_dirs:
        return
    log.warning("normalizing hive-partitioned tombstones at %s to flat layout",
                path)
    doomed = spark.read.parquet(path).select("doc_id", "range_bucket")
    tmp = path + "_flat_tmp"
    fsio.rmtree(spark, tmp)
    doomed.sortWithinPartitions("doc_id").write.mode("overwrite").parquet(tmp)
    fsio.rmtree(spark, path)
    fsio.move_dir(spark, tmp, path)


def _live_conv_ids(spark: SparkSession, builder: IndexBuilder) -> DataFrame:
    """conv_ids with at least one NON-tombstoned docs row.

    The dedup anti-join must run against LIVE docs only: a conversation
    that was deleted (tombstoned) and later re-appended is an UPDATE,
    not a duplicate — anti-joining against all docs rows silently
    dropped the corrected version (delete-then-resync is a normal
    reference flow: ES delete routing, ElasticOperations.scala:113-130,
    then re-synchronize).  Existence is checked explicitly (no
    swallowed read errors: a corrupt tombstone table must fail loudly,
    not silently resurrect the update-loss bug)."""
    docs = spark.read.parquet(builder.docs_path).select("doc_id", "conv_id")
    if _deletes_exist(builder):
        doomed = (
            spark.read.parquet(f"{builder.path}/deletes")
            .select("doc_id")
            .distinct()
        )
        docs = docs.join(doomed, "doc_id", "left_anti")
    return docs.select("conv_id").distinct()


def _recover_pending_append(spark: SparkSession, builder: IndexBuilder) -> None:
    """Crash recovery for the two-phase append.

    A marker file exists iff postings files were moved into the live
    postings/ tree but the docs-table append (the COMMIT POINT) may
    not have happened.  Decide by comparing the docs table's max doc_id
    with the marker's pre-append snapshot:

    - max_doc unchanged  -> the append never committed: remove the
      orphaned postings files (they would double-count term
      contributions on re-append) and retry from scratch;
    - max_doc advanced   -> the append committed but meta/term_stats
      may be stale: finish the derived-state recompute.
    """
    loaded = []
    for mpath in fsio.glob(spark, f"{builder.path}/_meta/pending_append_*.json"):
        loaded.append((mpath, json.loads(fsio.read_text(spark, mpath))))
    # recover in doc-id order: two committed appends recovered out of
    # order would drop the earlier one's segment from meta["segments"]
    # (the append guard only extends past the last segment end)
    loaded.sort(key=lambda t: t[1]["pre_max_doc"])
    for mpath, marker in loaded:
        cur_max = spark.read.parquet(builder.docs_path).agg(
            F.max("doc_id")
        ).collect()[0][0]
        if cur_max is not None and cur_max > marker["pre_max_doc"]:
            log.warning("pending append %s already committed; refreshing stats",
                        marker["batch_id"])
            _refresh_derived_state(
                spark, builder,
                new_segment=(
                    marker["pre_max_doc"] + 1,
                    marker["pre_max_doc"] + marker["n_new"],
                ),
            )
        else:
            log.warning("rolling back uncommitted append %s (%d files)",
                        marker["batch_id"], len(marker["moved_files"]))
            for dst in marker["moved_files"]:
                fsio.remove(spark, dst, missing_ok=True)
        fsio.remove(spark, mpath)


def coalesce_segments(meta: dict) -> int:
    """Coalesce adjacent index segments IN META whenever their
    concatenation preserves the within-segment time ordering — the
    metadata half of segment merging (Lucene's tiered merge, applied
    to the doc-id-interval bookkeeping).

    meta["segments"] holds one (first_doc, last_doc) interval per
    build/append; _doc_bounds_for_ts relies on doc ids being
    time-ordered WITHIN a segment.  Two consecutive segments A,B can
    become one iff every timestamp of A precedes (<=) every timestamp
    of B — then the concatenated id sequence is still non-decreasing
    in doc_ts and any time window still maps to one contiguous id
    interval.  In the streaming steady state appends arrive roughly in
    event order, so B micro-batches collapse to ~1 segment and window
    planning returns to O(1) regardless of append count.  A segment
    without recorded ts bounds never merges (no evidence).

    Mutates ``meta`` in place; returns the number of merges applied.
    Doc-id gaps between segments (bucket-local compaction leaves
    sparse ids) are fine: the merged interval claims ids no document
    holds, which no query can match.
    """
    import datetime

    def _ts(v):
        return datetime.datetime.fromisoformat(str(v))

    segs = [list(s) for s in meta.get("segments") or []]
    seg_ts = list(meta.get("segment_ts") or [])
    while len(seg_ts) < len(segs):
        seg_ts.append(None)
    out_s: list = []
    out_t: list = []
    merged = 0
    for s, t in zip(segs, seg_ts):
        if (
            out_s
            and out_t[-1] is not None
            and t is not None
            and _ts(out_t[-1][1]) <= _ts(t[0])
        ):
            out_s[-1] = [out_s[-1][0], s[1]]
            out_t[-1] = [out_t[-1][0], t[1]]
            merged += 1
        else:
            out_s.append(list(s))
            out_t.append(list(t) if t is not None else None)
    if merged:
        meta["segments"] = out_s
        meta["segment_ts"] = out_t
    return merged


def fragmented_buckets(spark: SparkSession, builder: IndexBuilder,
                       max_files: int = 8) -> list:
    """Range buckets whose postings directory accumulated more than
    ``max_files`` data files — the physical fingerprint of many small
    appends landing in the same bucket (each append writes its own
    file set, and may add a SECOND shard row for a (term, range) a
    previous append already populated).  These are the buckets worth
    a bucket-local rewrite; a bucket written by one batch build stays
    out of the list."""
    from collections import Counter

    counts: Counter = Counter()
    # appended shard files are prefixed append-<batch>- (the pending
    # marker records them); match on the parquet suffix, not the name
    for p in fsio.glob(
        spark, f"{builder.postings_path}/range_bucket=*/*.parquet"
    ):
        bucket = p.split("range_bucket=", 1)[1].split("/", 1)[0]
        counts[int(bucket)] += 1
    return sorted(b for b, n in counts.items() if n > max_files)


def merge_segments(
    spark: SparkSession,
    index_path: str,
    cfg: EngineConfig = DEFAULT,
    rules: KeywordRules | None = None,
    fragment_files: int = 8,
    physical: bool = True,
) -> dict:
    """Segment maintenance for the append/streaming steady state —
    the engine's Lucene-style merge policy, WITHOUT re-densifying doc
    ids (that is compact_index, the full optimize):

    1. METADATA: coalesce adjacent time-ordered segments
       (coalesce_segments) — restores O(1) time-window planning after
       hundreds of in-order appends, costs one meta rewrite;
    2. PHYSICAL (``physical=True``): buckets fragmented past
       ``fragment_files`` data files are rewritten bucket-locally
       through the compact_buckets protocol (crash-safe staging +
       marker + swap), consolidating per-(term, range) shards and
       file sets.  Scores and ranks are IDENTICAL before and after
       (same contract as compact_buckets; the rewrite re-encodes the
       same postings from the stored tf maps).

    Returns the (possibly updated) meta.  Reference analog: ES/Lucene
    background segment merging under continuous indexing; the routing
    tier the reference builds on (ElasticOperations.scala:91-97).
    """
    from sotohp_spark.index.build import recover_pending_compact
    from sotohp_spark.sources.catalog import resolve_store

    store = resolve_store(spark, index_path, cfg)
    if store.kind != "parquet":
        from sotohp_spark.index.catalog_build import CatalogIndexBuilder

        return CatalogIndexBuilder(spark, store, cfg, rules).merge_segments(
            physical=physical
        )
    recover_pending_compact(spark, index_path)
    builder = IndexBuilder(spark, index_path, cfg, rules)
    _recover_pending_bucket_compact(spark, builder)
    meta = builder._read_meta()
    if meta is None:
        raise ValueError(f"no index at {index_path}")
    if coalesce_segments(meta):
        builder._write_meta(meta)
    if physical:
        frag = fragmented_buckets(spark, builder, fragment_files)
        if frag:
            meta = compact_buckets(
                spark, index_path, cfg, rules, buckets=frag
            )
    return meta


def _refresh_derived_state(
    spark: SparkSession, builder: IndexBuilder, new_segment: tuple | None = None,
    new_segment_ts: tuple | None = None,
) -> dict:
    """Recompute meta globals + term_stats from the committed tables.

    ``new_segment``: (first_doc, last_doc) of a just-committed append —
    recorded in meta["segments"] (doc ids are time-ordered only WITHIN
    a segment; time-windowed search needs the boundaries).
    ``new_segment_ts``: the segment's (min doc_ts, max doc_ts); if the
    caller doesn't know them (crash recovery), they are recomputed with
    one pruned docs scan.  Idempotent: a segment already covered by the
    list is not re-added (crash recovery may re-run this)."""
    meta = builder._read_meta()
    idx_fields = tuple(meta.get("fields") or ())
    field_aggs = []
    for f in idx_fields:
        field_aggs += [
            F.sum(F.col(f"doc_len_{f}")).alias(f"dl_sum_{f}"),
            F.count(F.when(F.col(f"doc_len_{f}") > 0, 1)).alias(f"dl_n_{f}"),
        ]
    stats = spark.read.parquet(builder.docs_path).agg(
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
        lo, hi = int(new_segment[0]), int(new_segment[1])
        segs = [list(s) for s in meta.get("segments", [[0, lo - 1]] if lo else [])]
        if not segs or lo > segs[-1][1]:
            segs.append([lo, hi])
            if new_segment_ts is None:
                row = (
                    spark.read.parquet(builder.docs_path)
                    .where(F.col("doc_id").between(lo, hi))
                    .agg(F.min("doc_ts").alias("a"), F.max("doc_ts").alias("b"))
                    .collect()[0]
                )
                new_segment_ts = (row["a"], row["b"])
            seg_ts = list(meta.get("segment_ts") or [])
            # keep ALIGNED with segments; pad unknown older entries
            while len(seg_ts) < len(segs) - 1:
                seg_ts.append(None)
            seg_ts.append([str(new_segment_ts[0]), str(new_segment_ts[1])])
            meta["segment_ts"] = seg_ts
        meta["segments"] = segs
    postings = spark.read.option("basePath", builder.postings_path).parquet(
        builder.postings_path
    )
    (
        postings.groupBy("term")
        .agg(F.sum("n_docs").alias("df"), F.count("*").alias("n_shards"))
        .repartition(builder.cfg.shuffle_partitions, "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(builder.term_stats_path)
    )
    builder._write_meta(meta)
    return meta


def _apply_append_derived_state(
    spark: SparkSession,
    builder: IndexBuilder,
    moved_files: list,
    n_new: int,
    dl_sum: int,
    new_segment: tuple,
    new_segment_ts: tuple,
    field_deltas: dict | None = None,
) -> dict:
    """O(batch + vocabulary) derived-state update for the HAPPY append
    path — the crash-recovery path keeps the full recompute
    (_refresh_derived_state).

    A full recompute per append re-aggregates the ENTIRE postings
    table (one groupBy(term) shuffle of everything) and re-scans the
    docs table for stats; under bounded streaming catch-up that made
    B micro-batches cost B full-index passes (quadratic).  Instead:

    - meta globals update ARITHMETICALLY from the batch aggregate
      (n_docs += n, avgdl = weighted mean, max_doc += n — exact, not
      approximate, because appends only add docs);
    - term_stats merges the batch's per-term deltas — read from the
      batch's just-moved shard files, an O(batch) scan — into the
      existing table with one full-outer join (O(vocabulary), no
      postings scan).  The merged frame is localCheckpointed before
      the overwrite because it reads the same path it rewrites.

    meta is RE-READ here rather than passed in: the caller's copy
    predates _recover_pending_append, which may itself have refreshed
    derived state for an earlier crashed append — compounding the
    arithmetic onto a stale baseline would double-count that batch.
    """
    meta = builder._read_meta()
    old_n = int(meta["n_docs"])
    meta.update(
        n_docs=old_n + n_new,
        avgdl=(float(meta["avgdl"]) * old_n + float(dl_sum))
        / (old_n + n_new),
        max_doc=int(new_segment[1]),
    )
    if field_deltas:
        # multi-field index: per-field (dl_sum, nonzero-doc count) are
        # kept in meta so field avgdl updates arithmetically per
        # append, like the global avgdl above
        fstats = dict(meta.get("field_dl_stats") or {})
        favg = dict(meta.get("field_avgdl") or {})
        for f, (d_sum, d_n) in field_deltas.items():
            s0, n0 = fstats.get(f, [0.0, 0])
            s1, n1 = float(s0) + float(d_sum), int(n0) + int(d_n)
            fstats[f] = [s1, n1]
            favg[f] = (s1 / n1) if n1 else 0.0
        meta["field_dl_stats"] = fstats
        meta["field_avgdl"] = favg
    segs = [list(s) for s in meta.get("segments", [])]
    if not segs or int(new_segment[0]) > segs[-1][1]:
        segs.append([int(new_segment[0]), int(new_segment[1])])
        seg_ts = list(meta.get("segment_ts") or [])
        while len(seg_ts) < len(segs) - 1:
            seg_ts.append(None)
        seg_ts.append([str(new_segment_ts[0]), str(new_segment_ts[1])])
        meta["segment_ts"] = seg_ts
    meta["segments"] = segs
    # opt-in merge policy: once the segment list outgrows the knob,
    # coalesce the time-ordered runs in METADATA (free — the physical
    # bucket consolidation stays an explicit merge_segments call)
    thresh = getattr(builder.cfg, "auto_merge_segments", None)
    if thresh is not None and len(meta["segments"]) > int(thresh):
        coalesce_segments(meta)

    if moved_files:  # a batch whose docs all tokenize empty moves none
        delta = (
            spark.read.parquet(*moved_files)
            .groupBy("term")
            .agg(
                F.sum("n_docs").alias("_df_d"),
                F.count("*").alias("_ns_d"),
            )
        )
        old = spark.read.parquet(builder.term_stats_path)
        merged = (
            old.join(delta, "term", "full_outer")
            .select(
                "term",
                (F.coalesce(F.col("df"), F.lit(0))
                 + F.coalesce(F.col("_df_d"), F.lit(0))).alias("df"),
                (F.coalesce(F.col("n_shards"), F.lit(0))
                 + F.coalesce(F.col("_ns_d"), F.lit(0))).alias("n_shards"),
            )
            .repartition(builder.cfg.shuffle_partitions, "term")
            .sortWithinPartitions("term")
            .localCheckpoint()  # breaks lineage to the path being rewritten
        )
        merged.write.mode("overwrite").parquet(builder.term_stats_path)
    builder._write_meta(meta)
    return meta


def append_conversations(
    spark: SparkSession,
    index_path: str,
    new_turns: DataFrame,
    cfg: EngineConfig = DEFAULT,
    rules: KeywordRules | None = None,
    _fail_before_commit: bool = False,
) -> dict:
    """Append complete new conversations to an existing index.

    Two-phase commit (idempotent under crash/retry at any point):

      1. postings shards are built into a staging dir, then moved into
         the live postings/ tree under names recorded in a PENDING
         MARKER (``_meta/pending_append_<id>.json``);
      2. the docs-table append is the transaction point — it is what
         the conv-id dedup anti-join sees;
      3. meta + term_stats recompute, marker removed.

    A retry after a crash first rolls back (or completes) the pending
    append via the marker, so postings are never double-appended — the
    batch build's write-data-first / commit-checkpoint-last discipline
    (build.py) applied to the incremental path.

    ``_fail_before_commit``: test kill-switch — crash after the
    postings move, before the docs commit.

    All control-plane I/O (marker, moves, rollback) goes through the
    fsio shim, so the append runs against any Hadoop-visible path
    (hdfs://, s3a://, file://) as well as local disk.  On object
    stores without atomic rename, the marker-before-moves ordering is
    what keeps a crash recoverable — recovery re-reads the marker and
    reconciles, it never depends on a move being atomic.

    With a configured Iceberg catalog (cfg.iceberg_table_prefix + the
    runtime on the classpath) the append routes to the catalog-native
    two-phase protocol instead: pending row + snapshot-id rollback
    points, no marker files (index/catalog_build.py).
    """
    from sotohp_spark.index.build import recover_pending_compact
    from sotohp_spark.sources.catalog import resolve_store

    _store = resolve_store(spark, index_path, cfg)
    if _store.kind != "parquet":
        from sotohp_spark.index.catalog_build import CatalogIndexBuilder

        return CatalogIndexBuilder(
            spark, _store, cfg, rules
        ).append_conversations(
            new_turns, _fail_before_commit=_fail_before_commit
        )
    recover_pending_compact(spark, index_path)
    builder = IndexBuilder(spark, index_path, cfg, rules)
    meta = builder._read_meta()
    if meta is None:
        raise ValueError(f"no index at {index_path}; run IndexBuilder.build first")
    from sotohp_spark.index.build import SCHEMA_VERSION

    if int(meta.get("schema_version", 1)) != SCHEMA_VERSION:
        # appending v3 hive-partitioned docs into a pre-v3 FLAT docs dir
        # would leave parquet files at mixed depths — partition
        # discovery then rejects the table forever ('Conflicting
        # directory structures'), wedging every later open
        raise ValueError(
            f"index at {index_path} is schema "
            f"v{meta.get('schema_version', 1)}, appends write "
            f"v{SCHEMA_VERSION}; run index.migrate_index first"
        )
    # appended shards must bucket against the INDEX's geometry — fixed
    # in meta at first build (the compact_buckets rule; a caller cfg's
    # default is now auto/None and must never re-bucket an append)
    from dataclasses import replace as _cfg_replace

    cfg = _cfg_replace(
        cfg,
        range_size=int(meta["range_size"]),
        block_size=int(meta["block_size"]),
        ranges_per_batch=int(meta.get("ranges_per_batch", 8)),
    )
    builder.cfg = cfg
    _recover_pending_bucket_compact(spark, builder)
    _recover_pending_append(spark, builder)

    fresh_turns = new_turns.join(
        _live_conv_ids(spark, builder), "conv_id", "left_anti"
    )

    # pre-append snapshot read from the TABLE (not meta): crash-safe
    # doc-id allocation even if a prior run died before its meta write
    pre_max_doc = spark.read.parquet(builder.docs_path).agg(
        F.max("doc_id")
    ).collect()[0][0]
    pre_max_doc = -1 if pre_max_doc is None else int(pre_max_doc)

    # appends MUST match the index's field/positional layout (meta,
    # not cfg): a positionless batch appended into a positional index
    # would make phrase_match silently miss its docs, and a fieldless
    # batch appended into a multi-field index would make multi_match
    # silently miss them
    idx_fields = tuple(meta.get("fields") or ())
    docs = materialize_documents(fresh_turns, extra_fields=idx_fields)
    docs = assign_doc_ids(docs, num_ranges=cfg.shuffle_partitions).withColumn(
        "doc_id", F.col("doc_id") + F.lit(pre_max_doc + 1)
    )
    docs = apply_term_freqs(
        docs, rules, with_positions=bool(meta.get("positions")),
        extra_fields=idx_fields,
    )
    docs = docs.localCheckpoint()
    # one distributed aggregate: batch size, an order-independent
    # content digest for the batch id (no O(batch) driver collect —
    # the verify_parity crc32-sum pattern), and the segment's event-
    # time bounds for meta["segment_ts"] (time-windowed search prunes
    # whole segments from these without a docs scan)
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

    # ---- phase 1: postings -> staging, then move under the marker ----
    from sotohp_spark.index.build import explode_doc_terms

    doc_tf = explode_doc_terms(docs, bool(meta.get("positions")),
                               fields=tuple(meta.get("fields") or ()))
    shards = build_postings_df(doc_tf, meta["avgdl"], cfg)
    bucket_span = cfg.range_size * cfg.ranges_per_batch
    shards = shards.withColumn(
        "range_bucket",
        (F.col("range_id").cast("long") * cfg.range_size / bucket_span).cast("int"),
    )
    staging = f"{builder.path}/_staging/append_{batch_id}"
    (
        shards.repartition(cfg.shuffle_partitions, "term")
        .sortWithinPartitions("term", "range_id")
        .write.mode("overwrite")
        .partitionBy("range_bucket")
        .parquet(staging)
    )
    moves = []
    for src in fsio.glob(spark, f"{staging}/range_bucket=*/*.parquet"):
        bucket_dir = os.path.basename(os.path.dirname(src))
        dst_dir = f"{builder.postings_path}/{bucket_dir}"
        fsio.mkdirs(spark, dst_dir)
        moves.append((src, f"{dst_dir}/append-{batch_id}-{os.path.basename(src)}"))
    marker_path = f"{builder.path}/_meta/pending_append_{batch_id}.json"
    fsio.write_text_atomic(
        spark,
        marker_path,
        json.dumps(
            {
                "batch_id": batch_id,
                "pre_max_doc": pre_max_doc,
                "n_new": n_new,
                "moved_files": [dst for _, dst in moves],
            }
        ),
    )
    for src, dst in moves:
        fsio.rename_overwrite(spark, src, dst)
    fsio.rmtree(spark, staging)

    if _fail_before_commit:
        raise RuntimeError("test kill-switch: crash before docs commit")

    # ---- phase 2: docs-table append = the transaction point ----
    from sotohp_spark.index.build import write_docs

    write_docs(docs, builder.docs_path, cfg, mode="append")

    # ---- phase 3: derived state + marker removal ----
    # incremental (O(batch + vocab)) in the happy path; the recovery
    # path after a crash uses the full recompute, which also bounds
    # any drift this arithmetic could ever accumulate
    meta = _apply_append_derived_state(
        spark, builder,
        moved_files=[dst for _, dst in moves],
        n_new=n_new,
        dl_sum=int(agg["dl_sum"]),
        new_segment=(pre_max_doc + 1, pre_max_doc + n_new),
        new_segment_ts=(agg["ts_lo"], agg["ts_hi"]),
        field_deltas={
            f: (float(agg[f"dl_sum_{f}"] or 0), int(agg[f"dl_n_{f}"] or 0))
            for f in idx_fields
        },
    )
    fsio.remove(spark, marker_path)
    fsio.rmtree(spark, f"{builder.path}/_staging")
    # ---- background-merge policy (on by default): the append is fully
    # committed above, so the physical consolidation below is plain
    # maintenance — a crash mid-merge is recovered by the
    # compact_buckets marker protocol, never by replaying the append.
    # Buckets fragmented past the threshold (each append adds its own
    # file set) are rewritten bucket-locally; amortized, a bucket is
    # rewritten about once per `threshold` appends that touch it, which
    # is what keeps the streaming steady state's warm p95 flat instead
    # of degrading ~4.8x over 100 small appends
    # (BENCH/segments_sf0.1.md).  cfg.auto_merge_segments=None = off.
    thresh = getattr(cfg, "auto_merge_segments", None)
    if thresh is not None:
        frag = fragmented_buckets(spark, builder, int(thresh))
        if frag:
            meta = compact_buckets(
                spark, index_path, cfg, rules, buckets=frag
            )
    return meta


def append_tombstones(
    spark: SparkSession, builder: IndexBuilder, doc_ids: DataFrame,
    _recovered: bool = False,
) -> int:
    """THE tombstone-append sink — single definition shared by
    delete_conversations and the storage adapter
    (sources/catalog.ParquetIndexStore.delete_doc_ids):

    - pending-compact recovery FIRST: tombstones appended over a
      crashed swap would be destroyed when the next open promotes the
      staged dir (the retired live dir — deletes included — is
      rmtree'd);
    - legacy hive-partitioned tombstone dirs normalized before a flat
      append can create the mixed-depth state partition discovery
      rejects forever;
    - bucket span from META when it exists (the compact_buckets rule:
      bucket geometry never comes from a caller's cfg) with the
      builder cfg as the bare-directory fallback;
    - empty batches write NOTHING (an empty deletes dir would flip
      every reader onto the deletes-filtering path for no reason).

    ``_recovered``: the caller already ran both recovery passes this
    operation (delete_conversations does, before reading docs) — skip
    re-probing the markers.

    Returns the number of tombstoned doc ids."""
    from sotohp_spark.index.build import recover_pending_compact

    if not _recovered:
        recover_pending_compact(spark, builder.path)
        _recover_pending_bucket_compact(spark, builder)
    _normalize_deletes_layout(spark, builder)
    meta = builder._read_meta()
    if meta is not None:
        span = meta["range_size"] * meta.get("ranges_per_batch", 8)
    else:
        from sotohp_spark.config import RANGE_SIZE_MAX

        span = (
            builder.cfg.range_size or RANGE_SIZE_MAX
        ) * builder.cfg.ranges_per_batch
    doomed = doc_ids.select(
        "doc_id",
        (F.col("doc_id") / F.lit(span)).cast("int").alias("range_bucket"),
    ).localCheckpoint()  # one scan: count + write read the same rows
    n = doomed.count()
    if n == 0:
        return 0
    # FLAT files with range_bucket as a plain sorted column (NOT a hive
    # partition): parquet min/max stats on doc_id/range_bucket give the
    # same file-level pruning, and flat layout stays read-compatible
    # with tombstone files written before the column existed (hive
    # subdirs next to flat files would break partition discovery).
    (
        doomed.sortWithinPartitions("doc_id")
        .write.mode("append")
        .parquet(f"{builder.path}/deletes")
    )
    return n


def delete_conversations(
    spark: SparkSession, index_path: str, conv_ids,
    cfg: EngineConfig = DEFAULT,
) -> int:
    """Delete-by-id sink (the reference's ES delete routing,
    ElasticOperations.scala:113-130) as TOMBSTONES: the immutable
    postings are untouched; deleted doc ids land in <index>/deletes/
    and every query path filters against them.  Like Lucene, global
    stats (N, avgdl, df) keep counting deleted docs until a compaction
    (reindex_all) — scores of surviving docs are unchanged by a
    delete, only membership changes.  Append-only and idempotent.

    ``conv_ids``: a Python list (interactive path: an IN-list filter
    the parquet scan prunes on) OR a DataFrame with a ``conv_id``
    column (bulk path: a distributed semi join — the ids NEVER touch
    the driver, so a 100 M-conversation re-enrichment batch stays
    O(partition) per task)."""
    from sotohp_spark.index.build import recover_pending_compact
    from sotohp_spark.sources.catalog import resolve_store

    _store = resolve_store(spark, index_path, cfg)
    if _store.kind != "parquet":
        from sotohp_spark.index.catalog_build import CatalogIndexBuilder

        return CatalogIndexBuilder(
            spark, _store, cfg
        ).delete_conversations(conv_ids)
    recover_pending_compact(spark, index_path)
    builder = IndexBuilder(spark, index_path)
    _recover_pending_bucket_compact(spark, builder)
    docs = spark.read.parquet(builder.docs_path).select("doc_id", "conv_id")
    if isinstance(conv_ids, DataFrame):
        matched = docs.join(
            conv_ids.select("conv_id").distinct(), "conv_id", "left_semi"
        )
    else:
        matched = docs.where(F.col("conv_id").isin(list(conv_ids)))
    return append_tombstones(
        spark, builder, matched.select("doc_id"), _recovered=True
    )


def update_conversations(
    spark: SparkSession,
    index_path: str,
    new_turns: DataFrame,
    cfg: EngineConfig = DEFAULT,
    rules: KeywordRules | None = None,
) -> dict:
    """Upsert: re-index conversations that already exist, append the
    rest — the reference's continuous re-enrichment of already-synced
    Media (MediaServiceLive.scala:1351-1383: Media are updated after
    first sync as events/keywords/starred change).

    Implemented as tombstone-then-append in one call: conv_ids present
    in the batch AND live in the index are tombstoned first, then the
    whole batch goes through `append_conversations` (whose anti-join
    now sees the old versions as deleted).  The new version gets fresh
    doc_ids at the top of the id space; the old one disappears from
    results immediately and physically at the next compaction."""
    from sotohp_spark.index.build import recover_pending_compact
    from sotohp_spark.sources.catalog import resolve_store

    _store = resolve_store(spark, index_path, cfg)
    if _store.kind != "parquet":
        from sotohp_spark.index.catalog_build import CatalogIndexBuilder

        return CatalogIndexBuilder(
            spark, _store, cfg, rules
        ).update_conversations(new_turns)
    recover_pending_compact(spark, index_path)
    builder = IndexBuilder(spark, index_path, cfg, rules)
    _recover_pending_bucket_compact(spark, builder)
    if builder._read_meta() is None:
        raise ValueError(f"no index at {index_path}; run IndexBuilder.build first")
    live = _live_conv_ids(spark, builder)
    # stale ids stay a DATAFRAME end-to-end: collecting them to a
    # Python list put O(distinct convs in the batch) on the driver — a
    # 100 M-conversation re-enrichment batch died right there.  The
    # tombstone write is already distributed; delete_conversations'
    # DataFrame overload keeps the whole upsert that way (it also
    # skips the write when the semi join matches nothing).
    stale = new_turns.select("conv_id").distinct().join(
        live, "conv_id", "left_semi"
    )
    delete_conversations(spark, index_path, stale)
    return append_conversations(spark, index_path, new_turns, cfg, rules)


def compact_index(
    spark: SparkSession, index_path: str, cfg: EngineConfig = DEFAULT,
    rules: KeywordRules | None = None,
    _fail_during_swap: str | None = None,
) -> dict:
    """Compaction: physically drop tombstoned docs and recompute global
    stats — after this, scores reflect the surviving corpus exactly
    (fresh-build equivalence is pytest-enforced).  Implemented as a
    FULL rebuild from the surviving docs' stored tf maps — no
    re-tokenize, no re-read of the raw turns.  Doc ids are re-densified
    so the result is byte-equivalent to a fresh build (the invariant
    the tests pin) and global stats are refreshed to the surviving
    corpus.  For the cheap low-delete-ratio path that keeps sparse ids
    and EXACT pre-compaction scores, use `compact_buckets` — it
    rewrites only the tombstoned buckets.

    With a configured Iceberg catalog the compaction routes to the
    catalog-native protocol: REPLACE TABLE commits with snapshot-id
    abort points instead of a staging-dir rename swap
    (index/catalog_build.CatalogIndexBuilder.compact)."""
    from sotohp_spark.index.build import SCHEMA_VERSION, recover_pending_compact
    from sotohp_spark.sources.catalog import resolve_store

    _store = resolve_store(spark, index_path, cfg)
    if _store.kind != "parquet":
        from sotohp_spark.index.catalog_build import CatalogIndexBuilder

        return CatalogIndexBuilder(spark, _store, cfg, rules).compact()
    recover_pending_compact(spark, index_path)
    builder = IndexBuilder(spark, index_path, cfg, rules)
    _recover_pending_bucket_compact(spark, builder)
    meta = builder._read_meta()
    deletes_path = f"{builder.path}/deletes"
    try:
        doomed = spark.read.parquet(deletes_path).select("doc_id").distinct()
    except Exception:
        return meta  # nothing to compact
    # the staged rewrite must bucket against the index's geometry
    # (meta), not a caller cfg's (default auto/None)
    from dataclasses import replace as _cfg_replace

    if meta is not None:
        cfg = _cfg_replace(
            cfg,
            range_size=int(meta["range_size"]),
            block_size=int(meta["block_size"]),
            ranges_per_batch=int(meta.get("ranges_per_batch", 8)),
        )

    docs = spark.read.parquet(builder.docs_path)
    survivors = docs.join(doomed, "doc_id", "left_anti").drop("doc_id")

    # reassign dense time-ordered doc ids over the survivors and
    # rebuild postings from the retained tf maps
    from sotohp_spark.operators.docs import assign_doc_ids

    survivors = assign_doc_ids(
        survivors, num_ranges=cfg.shuffle_partitions
    ).localCheckpoint()
    idx_fields = tuple(meta.get("fields") or ())
    field_aggs = []
    for f in idx_fields:
        field_aggs += [
            F.sum(F.col(f"doc_len_{f}")).alias(f"dl_sum_{f}"),
            F.count(F.when(F.col(f"doc_len_{f}") > 0, 1)).alias(f"dl_n_{f}"),
        ]
    stats = survivors.agg(
        F.count("*").alias("n"),
        F.avg("doc_len").alias("avgdl"),
        F.max("doc_id").alias("max_doc"),
        F.min("doc_ts").alias("ts_lo"),
        F.max("doc_ts").alias("ts_hi"),
        *field_aggs,
    ).collect()[0]

    from sotohp_spark.index.build import write_docs

    tmp = builder.path + "_compact_tmp"
    fsio.rmtree(spark, tmp)
    new_builder = IndexBuilder(spark, tmp, cfg, rules)
    write_docs(survivors, new_builder.docs_path, cfg)
    new_meta = dict(
        meta,
        n_docs=int(stats["n"]),
        avgdl=float(stats["avgdl"]),
        max_doc=int(stats["max_doc"]),
        fingerprint=meta["fingerprint"] + "+compact",
        # re-densified ids are globally time-ordered again: one segment
        segments=[[0, int(stats["max_doc"])]],
        segment_ts=[[str(stats["ts_lo"]), str(stats["ts_hi"])]],
        # the staging docs were just written in the CURRENT layout —
        # carrying a pre-v3 source's version forward would trip the
        # build()'s layout guard after the full rewrite
        schema_version=SCHEMA_VERSION,
        postings_done=False,
    )
    if idx_fields:
        fstats = {
            f: [float(stats[f"dl_sum_{f}"] or 0), int(stats[f"dl_n_{f}"] or 0)]
            for f in idx_fields
        }
        new_meta["field_dl_stats"] = fstats
        new_meta["field_avgdl"] = {
            f: (s / n if n else 0.0) for f, (s, n) in fstats.items()
        }
    new_builder._write_meta(new_meta)
    new_meta = new_builder.build(turns=None, input_fingerprint=new_meta["fingerprint"])

    # crash-safe swap: the marker is written only once the staging index
    # is COMPLETE; the rename chain (retire live -> promote tmp ->
    # cleanup) is resumable from any crash point by
    # recover_pending_compact, which every engine/builder open runs.
    # The recovery lease serializes the swap against concurrent opens
    # (a reader seeing the marker waits instead of racing the renames).
    from sotohp_spark.index.build import (
        _complete_compact_swap,
        compact_marker_path,
        recovery_lock,
        require_atomic_rename,
    )

    require_atomic_rename(builder.path, "compact_index swap")
    with recovery_lock(spark, builder.path):
        fsio.write_text_atomic(
            spark,
            compact_marker_path(builder.path),
            json.dumps({"tmp": tmp, "n_docs": int(stats["n"])}),
        )
        _complete_compact_swap(spark, builder.path, _fail_after=_fail_during_swap)
    return new_meta


def _bucket_compact_marker(builder: IndexBuilder) -> str:
    return f"{builder.path}/_meta/pending_compact_buckets.json"


def _apply_bucket_swap(spark: SparkSession, builder: IndexBuilder, marker: dict,
                       only_sub: str | None = None):
    """Per-bucket staged swap, resumable from any crash point.

    For every affected bucket of docs/ and postings/: if its staged dir
    still exists -> delete the live bucket dir and rename the staged one
    in; if the marker recorded the bucket as EMPTY (zero survivors) ->
    delete the live dir; otherwise the bucket was already swapped by a
    previous run -> leave it.  The explicit empty-bucket lists are what
    make re-runs safe: without them, "staged dir missing" would be
    ambiguous between already-swapped and zero-survivors, and recovery
    could delete freshly-swapped data.

    ``only_sub``: restrict to one of 'docs'/'postings' — used by the
    mid-swap kill-switch so the crash test exercises the SAME code the
    real recovery runs."""
    staging = marker["staging"]
    for sub, base in (
        ("docs", builder.docs_path),
        ("postings", builder.postings_path),
    ):
        if only_sub is not None and sub != only_sub:
            continue
        empty = set(marker[f"empty_{sub}"])
        for b in marker["affected"]:
            staged = f"{staging}/{sub}/range_bucket={b}"
            live = f"{base}/range_bucket={b}"
            if fsio.exists(spark, staged):
                fsio.rmtree(spark, live)
                try:
                    fsio.move_dir(spark, staged, live)
                except OSError:
                    # belt over the recovery lease's braces: a
                    # concurrent completer may have consumed the
                    # staged dir between our existence check and the
                    # rename — if the bucket IS live and staging is
                    # gone, the swap is done; anything else is real
                    if fsio.exists(spark, staged) or not fsio.exists(
                        spark, live
                    ):
                        raise
            elif b in empty:
                fsio.rmtree(spark, live)


def _finish_bucket_compact(spark: SparkSession, builder: IndexBuilder,
                           marker: dict, marker_path: str):
    _apply_bucket_swap(spark, builder, marker)
    fsio.rmtree(spark, f"{builder.path}/deletes")
    fsio.rmtree(spark, marker["staging"])
    fsio.remove(spark, marker_path, missing_ok=True)


def _recover_pending_bucket_compact(spark: SparkSession, builder: IndexBuilder):
    """Crash recovery for compact_buckets — run on engine/builder open.
    A torn swap can leave a live bucket dir deleted with its replacement
    still in staging (docs temporarily missing from results), so READERS
    recover too, not just writers.  Serialized by the recovery lease: a
    reader opening while the WRITER is mid-swap (marker present by
    design) must wait it out, not run the swap concurrently — the
    interleaving rmtree(live) -> move(staged) x2 can consume the staged
    copy and lose the bucket on both sides."""
    from sotohp_spark.index.build import recovery_lock

    marker_path = _bucket_compact_marker(builder)
    if not fsio.exists(spark, marker_path):
        return False  # fast path: no lease traffic on a healthy open
    with recovery_lock(spark, builder.path):
        if not fsio.exists(spark, marker_path):
            return False  # the holder we waited for finished the swap
        log.warning("recovering interrupted bucket compaction at %s",
                    builder.path)
        marker = json.loads(fsio.read_text(spark, marker_path))
        _finish_bucket_compact(spark, builder, marker, marker_path)
    return True


def compact_buckets(
    spark: SparkSession, index_path: str, cfg: EngineConfig = DEFAULT,
    rules: KeywordRules | None = None,
    _fail_after: str | None = None,
    buckets: list | None = None,
) -> dict:
    """BUCKET-LOCAL compaction: physically drop tombstoned docs from
    only the range buckets that contain them.

    ``buckets``: optional EXTRA range buckets to rewrite even if they
    hold no tombstones — the physical half of segment merging
    (merge_segments): a bucket fragmented by many small appends is
    re-encoded from its docs' stored tf maps into one consolidated
    file set / one shard per (term, range), with identical scores.

    Contract (vs `compact_index`, the full re-densify):
    - doc ids stay SPARSE (never reused; max_doc/segments unchanged);
    - global stats are NOT recomputed — meta (n_docs, avgdl) and
      term_stats (df) keep counting the removed docs, exactly as the
      tombstone-filtered index did, so every query's ranks AND scores
      are IDENTICAL before and after (pytest-pinned).  Lucene has the
      same behavior between a per-segment merge and a full optimize;
    - only affected bucket directories of docs/ and postings/ are
      rewritten — at a 0.1% delete ratio this touches ~0.1% of a
      100 TB index instead of rewriting all of it.

    Protocol (crash-safe; _recover_pending_bucket_compact on open):
      1. stage survivors of the affected buckets (docs + rebuilt
         postings from the stored tf maps) under _staging/ — durable
         before anything live is touched;
      2. write the marker (affected buckets + explicit empty-bucket
         lists);
      3. per-bucket swap: delete live dir, rename staged dir in;
      4. drop the tombstone table, staging, and marker.
    A crash before 3 leaves the live index untouched; a crash inside
    3/4 is finished idempotently by recovery.

    `partition_state` rows are NOT rewritten: like Lucene segment
    metadata, they describe the batch that originally built each
    bucket (fingerprint, wall share); post-compaction postings counts
    are recomputable from the live postings table when needed.

    ``_fail_after``: test kill-switch ('stage' = after the marker,
    before any swap; 'docs_swap' = after docs swapped, before
    postings).
    """
    from sotohp_spark.index.build import (
        SCHEMA_VERSION,
        recover_pending_compact,
        require_atomic_rename,
        write_docs,
    )
    from sotohp_spark.sources.catalog import resolve_store

    _store = resolve_store(spark, index_path, cfg)
    if _store.kind != "parquet":
        from sotohp_spark.index.catalog_build import CatalogIndexBuilder

        return CatalogIndexBuilder(
            spark, _store, cfg, rules
        ).compact_buckets()
    require_atomic_rename(index_path, "compact_buckets swap")
    recover_pending_compact(spark, index_path)
    builder = IndexBuilder(spark, index_path, cfg, rules)
    _recover_pending_bucket_compact(spark, builder)
    meta = builder._read_meta()
    if meta is None:
        raise ValueError(f"no index at {index_path}")
    if int(meta.get("schema_version", 1)) != SCHEMA_VERSION:
        raise ValueError(
            f"index at {index_path} is schema "
            f"v{meta.get('schema_version', 1)}; bucket compaction rewrites "
            f"the v{SCHEMA_VERSION} layout — run index.migrate_index first"
        )
    if buckets is None and not builder.has_deletes():
        return meta

    # bucket geometry comes from META, never from the caller's cfg: a
    # cfg whose range_size/ranges_per_batch differ from the build's
    # would bucket the staged survivors differently from `affected`
    # and the swap would delete live buckets it never staged
    cfg = EngineConfig(
        k1=meta["k1"],
        b=meta["b"],
        range_size=meta["range_size"],
        block_size=meta["block_size"],
        ranges_per_batch=meta.get("ranges_per_batch", 8),
        shuffle_partitions=cfg.shuffle_partitions,
    )
    span = meta["range_size"] * meta.get("ranges_per_batch", 8)
    if builder.has_deletes():
        doomed = (
            spark.read.parquet(f"{builder.path}/deletes")
            .select("doc_id")
            .distinct()
            .localCheckpoint()
        )
    else:  # merge_segments path: rewrite without any tombstones
        doomed = spark.createDataFrame([], "doc_id long").limit(0)
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
        return meta

    # ---- 1. stage survivors (docs + postings) for affected buckets ----
    staging = f"{builder.path}/_staging/compact_buckets"
    fsio.rmtree(spark, staging)
    surv = (
        spark.read.parquet(builder.docs_path)
        .where(F.col("range_bucket").isin(affected))
        .join(doomed, "doc_id", "left_anti")
    )
    write_docs(surv, f"{staging}/docs", cfg)
    surv_staged = spark.read.parquet(f"{staging}/docs")
    from sotohp_spark.index.build import explode_doc_terms

    doc_tf = explode_doc_terms(surv_staged, bool(meta.get("positions")),
                              fields=tuple(meta.get("fields") or ()))
    # avgdl passed UNCHANGED: stored block-max metadata is avgdl-free
    # and scores must keep the pre-compaction collection stats
    shards = build_postings_df(doc_tf, meta["avgdl"], cfg)
    shards = shards.withColumn(
        "range_bucket",
        (F.col("range_id").cast("long") * meta["range_size"] / span).cast("int"),
    )
    (
        shards.repartition(cfg.shuffle_partitions, "term")
        .sortWithinPartitions("term", "range_id")
        .write.mode("overwrite")
        .partitionBy("range_bucket")
        .parquet(f"{staging}/postings")
    )

    # ---- 2. marker with explicit empty-bucket lists ----
    def _staged_buckets(sub):
        return {
            int(p.rsplit("range_bucket=", 1)[1])
            for p in fsio.glob(spark, f"{staging}/{sub}/range_bucket=*")
        }

    marker = {
        "staging": staging,
        "affected": affected,
        "empty_docs": sorted(set(affected) - _staged_buckets("docs")),
        "empty_postings": sorted(set(affected) - _staged_buckets("postings")),
    }
    marker_path = _bucket_compact_marker(builder)
    # the lease covers marker-write through swap: an engine OPENING
    # during this window sees the marker, waits on the lease, and on
    # acquiring re-checks — finding the marker gone (we finished)
    # instead of racing our renames bucket by bucket
    from sotohp_spark.index.build import recovery_lock

    with recovery_lock(spark, builder.path):
        fsio.write_text_atomic(spark, marker_path, json.dumps(marker))
        if _fail_after == "stage":
            raise RuntimeError("test kill-switch: crash after staging+marker")

        # ---- 3+4. swap and clean up ----
        if _fail_after == "docs_swap":
            # swap ONLY docs (through the real swap code), then crash —
            # postings still carry the doomed docs while the docs table
            # no longer does
            _apply_bucket_swap(spark, builder, marker, only_sub="docs")
            raise RuntimeError("test kill-switch: crash after docs swap")
        _finish_bucket_compact(spark, builder, marker, marker_path)
    return meta


def stream_ingest_available_now(
    spark: SparkSession,
    turns_source_dir: str,
    index_path: str,
    checkpoint_dir: str,
    cfg: EngineConfig = DEFAULT,
    rules: KeywordRules | None = None,
    max_files_per_trigger: int | None = None,
):
    """Structured Streaming AvailableNow ingest: watch a directory of
    turn parquet files; each micro-batch appends its complete new
    conversations via foreachBatch -> append_conversations.  Source
    progress is tracked by the streaming checkpoint (exactly-once per
    file), dedup by conv_id anti-join makes re-delivery idempotent.

    ``max_files_per_trigger`` bounds each micro-batch's file count
    (availableNow honors it as the batch partitioning): at a 100 TB
    backlog one giant catch-up batch would hold the whole backlog's
    shuffle state at once — bounded triggers commit progress
    incrementally, and each append's derived-state refresh is
    O(batch + vocabulary), never a full postings recompute
    (_apply_append_derived_state; the remaining per-batch index-side
    work is the column-pruned conv-id anti-join and a max-doc-id
    aggregate).  Returns the query; ``q.recentProgress`` carries the
    per-batch evidence.

    DATA CONTRACT under bounded triggers: source FILES must be
    conversation-aligned (write them with
    ``repartition(n, "conv_id")``).  A conversation whose turns
    straddle two micro-batches would be indexed PARTIAL by the first
    batch, and the second batch's remainder anti-joined away as
    already-indexed — silent truncation.  (Unbounded availableNow
    processes the whole backlog as one batch, so only bounded
    triggers carry this requirement; it is the engine's form of the
    reference's "Originals are immutable once scanned" model —
    a conversation enters the stream only when complete.)"""
    from sotohp_spark.generator import TRANSCRIPT_SCHEMA

    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(turns_source_dir)

    def process(batch_df: DataFrame, epoch_id: int):
        from sotohp_spark.sources.catalog import resolve_store

        n_convs = batch_df.select("conv_id").distinct().count()
        # store-resolved meta read: on the catalog leg the parquet
        # meta.json does not exist (append_conversations itself routes
        # either way)
        before = resolve_store(spark, index_path, cfg).read_meta()
        meta = append_conversations(spark, index_path, batch_df, cfg, rules)
        appended = meta["n_docs"] - (before["n_docs"] if before else 0)
        if appended < n_convs:
            # the contract violation (a conversation split across two
            # micro-batches) is indistinguishable from legitimate
            # redelivery at this layer — SURFACE the count so an
            # unexpectedly nonzero skip under bounded triggers is
            # visible instead of silent truncation
            log.warning(
                "micro-batch %s: %d/%d conv_ids skipped as already "
                "indexed — redelivery, or a conversation-alignment "
                "violation if source files are not conv-aligned",
                epoch_id, n_convs - appended, n_convs,
            )

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
