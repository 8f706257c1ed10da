"""sotohp_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch re-expression of the query/data-processing capabilities
of the reference system (dacr/sotohp, read-only at /root/reference):
an incremental, checkpointed index build over conversation-transcript
tables, a compressed posting-list index with skew-aware doc-range
sharding, and Okapi BM25 (k1=1.2, b=0.75) top-k retrieval with
block-max WAND pruning — all on the public PySpark DataFrame API.

The reference delegates scoring to Elasticsearch/Lucene
(modules/search/.../ElasticOperations.scala); this engine internalizes
that tier.  Everything here derives from public knowledge only: the
Apache Spark API, the reference repo's observable behavior, and the
published BM25 / block-max WAND literature.
"""

__version__ = "0.1.0"

from sotohp_spark.config import EngineConfig  # noqa: F401
