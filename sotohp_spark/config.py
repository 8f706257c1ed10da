"""Engine-wide constants and configuration.

BM25 parameters match the reference's effective scorer: the reference
delegates relevance to Elasticsearch whose default similarity is Okapi
BM25 with k1=1.2, b=0.75 (reference wiring:
modules/search/src/main/scala/fr/janalyse/sotohp/search/ElasticOperations.scala:32-76).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    # --- BM25 (Okapi, Lucene-default parameters) ---
    k1: float = 1.2
    b: float = 0.75

    # --- physical layout ---
    # Global doc-id range size: postings are sharded on
    # range_id = doc_id // range_size.  Fixed global ranges make every
    # term's posting shards align on the same doc-id boundaries, so
    # query-time intersection is local to a shard.  A Zipf-hot term's
    # postings spread across many ranges (bounded <= range_size rows
    # per (term, range) group) — this IS the explicit skew salting.
    #
    # None (default) = AUTO: derived at build time from the observed
    # corpus size (derive_range_size below) so a mid-size corpus never
    # ships as one serial doc-id range (the measured sf100 span_near
    # artifact: a fixed 2^17 exceeded the 100k-doc corpus, so every
    # per-range positional kernel ran on ONE task).  The derived value
    # is FIXED in meta.json at build; every later open/append/compact/
    # migrate adopts geometry from meta, never from a caller cfg.  An
    # explicit int here is honored verbatim (tests pin tiny ranges;
    # operators replaying a known-good geometry pin it too).
    range_size: int | None = None

    # Posting-list scoring blocks: per `block_size` docs inside one
    # (term, range) list we store the max attainable BM25 partial
    # score, enabling block-max WAND pruning at query time.
    block_size: int = 128

    # Number of term-hash write partitions inside a range directory
    # (keeps file counts bounded; term predicate still prunes via
    # parquet min/max + dictionary filters because files are sorted
    # by term).
    shuffle_partitions: int = 32

    # Index build: how many doc-id ranges are committed per checkpoint
    # batch (resume granularity).
    ranges_per_batch: int = 8

    # Store positional postings (Lucene-style .pos data): per posting,
    # the varbyte-compressed token positions of the term, in a payload
    # column separate from the doc/tf stream so positionless queries
    # never read a byte of it.  Enables index-only exact phrase search
    # (QueryEngine.phrase_match_doc_ids) — phrase_search then uses the
    # positional candidates (a strict subset of the conjunctive set)
    # before its raw-text verify.  Off by default: costs index size
    # and build time; the text-verify path needs no positions.
    store_positions: bool = False

    # tie-break and float determinism: scores are float64; ties broken
    # by ascending doc_id everywhere (engine, oracle, tests).

    # Segment-merge policy (streaming.incremental.merge_segments):
    # when set, append_conversations (and therefore streaming ingest,
    # which appends per micro-batch):
    #   1. coalesces adjacent TIME-ORDERED segments in metadata once
    #      the segment count exceeds this — free (one meta rewrite),
    #      keeps time-window planning O(1) under continuous in-order
    #      ingest;
    #   2. physically rewrites any range bucket whose postings
    #      directory fragmented past this many data files (the
    #      crash-safe compact_buckets protocol) — Lucene-style
    #      background merging, amortized: a bucket is rewritten about
    #      once per `threshold` appends that touch it.
    # Default 8 = the threshold the segments bench measured (without
    # it, 100 small appends degrade warm p95 ~4.8x from file
    # fragmentation; one 1.6 s bucket-local merge restores the
    # single-build shape — BENCH/segments_sf0.1.md).  None = off
    # (both halves become explicit merge_segments maintenance calls).
    auto_merge_segments: int | None = 8

    # Additional analyzed, SCORABLE text fields (multi-field BM25 —
    # the reference's SaoMedia multi-field search doc,
    # SaoMedia.scala:17-47, scored by ES multi_match).  Each name is a
    # turns column (e.g. "tool", "role"); its per-conversation stream
    # is analyzed with the same chain and indexed as FIELD-TAGGED
    # postings: term key = "<field>\\x1f<term>" in the SAME postings
    # layout/dictionary (a tagged term is just another term — layout,
    # not a new engine), with the FIELD's doc length in the posting
    # stream and the field's avgdl in meta, so per-field BM25
    # normalization is exact.  The default "text" stream stays
    # UNTAGGED: single-field queries scan only their own terms (term
    # IN pushdown) and are unaffected.  Query with
    # QueryEngine.top_k_multi_match.  () (default) = single-field.
    extra_fields: tuple = ()

    # Optional Iceberg catalog table prefix (e.g. "local.db.myindex").
    # When set AND the Iceberg runtime is on the classpath,
    # sources/catalog.resolve_store yields IcebergIndexStore and the
    # WHOLE lifecycle — build, append, delete, compact, query —
    # routes through the catalog-native pipeline
    # (index/catalog_build.CatalogIndexBuilder): every state mutation
    # is an atomic snapshot commit, with pending rows + snapshot ids
    # replacing the parquet leg's marker files.  Unset (default) =
    # the hive-partitioned-parquet protocol.
    iceberg_table_prefix: str | None = None

    extra_spark_conf: dict = field(default_factory=dict)


DEFAULT = EngineConfig()

# ---- automatic range geometry (cfg.range_size is None) ----
# Bounds on the derived range size:
#   floor 4096  — below this the per-(term, range) bookkeeping
#     (shard rows, block-max metadata, per-range task overhead)
#     dominates the postings themselves; 4096 is the hand-tuned sf100
#     value that restored positional parallelism
#     (BENCH/p95_es_surfaces_sf100.md);
#   cap 2^17    — the legacy fixed default; at the north-star 10^10
#     docs it yields ~76k ranges, already far wider than any cluster.
RANGE_SIZE_MIN = 4096
RANGE_SIZE_MAX = 1 << 17
# Target number of ranges relative to the session's task slots: 4
# waves of per-range work per core keeps the positional kernels and
# the per-range conjunction load-balanced without fragmenting the
# postings layout.
RANGES_PER_CORE = 4
RANGES_FLOOR = 64


def derive_range_size(n_docs: int, parallelism: int) -> int:
    """Range size for a corpus of ``n_docs``: the power of two that
    yields ~max(parallelism * RANGES_PER_CORE, RANGES_FLOOR) doc-id
    ranges, clamped to [RANGE_SIZE_MIN, RANGE_SIZE_MAX].

    Power of two keeps range boundaries stable as corpora grow
    (appended segments re-derive nothing — geometry is fixed in meta
    at first build); the clamp keeps tiny corpora from fragmenting
    and huge ones from exceeding the proven 2^17 layout.  Pinned
    values: 100k docs @ 32 cores -> 4096 (the hand-tuned sf100
    number, ~25 ranges); >=10^9 docs -> 2^17.
    """
    target = max(int(parallelism) * RANGES_PER_CORE, RANGES_FLOOR)
    per_range = max(1, -(-int(n_docs) // target))  # ceil div
    pow2 = 1 << (per_range - 1).bit_length()
    return min(max(pow2, RANGE_SIZE_MIN), RANGE_SIZE_MAX)
