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
    range_size: int = 1 << 17

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
    # when set, append_conversations coalesces adjacent TIME-ORDERED
    # segments in metadata once the segment count exceeds this —
    # free (one meta rewrite), keeps time-window planning O(1) under
    # continuous in-order ingest.  The PHYSICAL half (bucket-local
    # consolidation of fragmented buckets) stays an explicit
    # maintenance call, like Lucene's background merges vs optimize.
    # None (default) = no automatic coalescing.
    auto_merge_segments: int | None = None

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
