"""Golden-SQL conformance for the 8 Iceberg storage primitives
(round-5 directive #5): the sandbox ships no Iceberg jars, so
`tests/test_catalog_store.py::test_iceberg_leg_lifecycle` permanently
skips and the genuine SQL strings / DataFrameWriterV2 chains in
`sources/catalog.IcebergIndexStore` never execute here.  These tests
pin the EXACT statements and writer chains each primitive would issue
against recorder doubles, so a syntax or table-name regression cannot
hide behind that environment skip.

Everything ABOVE the primitives (pending rows, snapshot rollback,
recovery ordering) runs for real in CI via tests/fake_catalog.py;
this file covers the last mile the fake store replaces.

Recorder objects stand in for spark/DataFrame; the session
fixture is only needed where F.col() requires an active context.
"""

import pytest

from sotohp_spark.config import EngineConfig
from sotohp_spark.sources.catalog import IcebergIndexStore

PREFIX = "local.db.idx"


class _Writer:
    """Records a DataFrameWriterV2 chain."""

    def __init__(self, log, name):
        self.log = log
        self.name = name
        self.partition_cols = []

    def partitionedBy(self, col):
        self.partition_cols.append(str(col))
        return self

    def append(self):
        self.log.append(("append", self.name, tuple(self.partition_cols)))

    def create(self):
        self.log.append(("create", self.name, tuple(self.partition_cols)))

    def createOrReplace(self):
        self.log.append(
            ("createOrReplace", self.name, tuple(self.partition_cols))
        )

    def overwritePartitions(self):
        self.log.append(
            ("overwritePartitions", self.name, tuple(self.partition_cols))
        )


class _DF:
    def __init__(self, log):
        self.log = log

    def writeTo(self, name):
        return _Writer(self.log, name)


class _Result:
    def __init__(self, rows):
        self._rows = rows

    def collect(self):
        return self._rows


class _Catalog:
    def __init__(self, existing):
        self.existing = existing
        self.checked = []

    def tableExists(self, name):
        self.checked.append(name)
        return name in self.existing


class _Spark:
    """Records every spark.sql / spark.table call."""

    def __init__(self, existing=(), sql_results=None):
        self.catalog = _Catalog(set(existing))
        self.sql_log = []
        self.table_log = []
        self._sql_results = sql_results or {}

    def sql(self, q):
        self.sql_log.append(q)
        for frag, rows in self._sql_results.items():
            if frag in q:
                return _Result(rows)
        return _Result([])

    def table(self, name):
        self.table_log.append(name)
        return f"<table {name}>"


def _store(spark):
    return IcebergIndexStore(spark, PREFIX, EngineConfig())


# ------------------------------------------------------ name derivation
def test_table_names_derive_from_prefix():
    s = _store(_Spark())
    assert s.docs_table == "local.db.idx_docs"
    assert s.postings_table == "local.db.idx_postings"
    assert s.term_stats_table == "local.db.idx_term_stats"
    assert s.meta_table == "local.db.idx_meta"
    assert s.state_table == "local.db.idx_state"
    assert s.deletes_table == "local.db.idx_deletes"


# -------------------------------------------------- primitives 1+2:
def test_table_exists_and_read_table_hit_the_catalog():
    sp = _Spark(existing=["local.db.idx_docs"])
    s = _store(sp)
    assert s.table_exists("local.db.idx_docs") is True
    assert s.table_exists("local.db.idx_postings") is False
    assert sp.catalog.checked == ["local.db.idx_docs", "local.db.idx_postings"]
    s.read_table("local.db.idx_docs")
    assert sp.table_log == ["local.db.idx_docs"]


# ----------------------------------------------------- primitive 3:
def test_append_table_appends_when_exists_creates_otherwise(spark):
    log = []
    sp = _Spark(existing=["local.db.idx_docs"])
    s = _store(sp)
    s.append_table("local.db.idx_docs", _DF(log), partition_col="range_bucket")
    assert log == [("append", "local.db.idx_docs", ())]  # no re-partitioning
    log.clear()
    s.append_table("local.db.idx_state", _DF(log), partition_col="range_bucket")
    assert len(log) == 1
    op, name, parts = log[0]
    assert op == "create" and name == "local.db.idx_state"
    assert len(parts) == 1 and "range_bucket" in parts[0]
    log.clear()
    s.append_table("local.db.idx_meta", _DF(log))  # unpartitioned create
    assert log == [("create", "local.db.idx_meta", ())]


# ----------------------------------------------------- primitive 4:
def test_replace_table_is_create_or_replace(spark):
    log = []
    s = _store(_Spark(existing=["local.db.idx_term_stats"]))
    s.replace_table("local.db.idx_term_stats", _DF(log))
    assert log == [("createOrReplace", "local.db.idx_term_stats", ())]
    log.clear()
    s.replace_table("local.db.idx_docs", _DF(log), partition_col="range_bucket")
    op, name, parts = log[0]
    assert op == "createOrReplace" and "range_bucket" in parts[0]


# ----------------------------------------------------- primitive 5:
def test_overwrite_partitions_never_falls_back_to_replace(spark):
    """overwritePartitions when the table exists; explicit partitioned
    CREATE when it does not — and NEVER createOrReplace (which would
    silently wipe previously committed buckets on a transient
    failure)."""
    log = []
    sp = _Spark(existing=["local.db.idx_postings"])
    s = _store(sp)
    s.overwrite_partitions_table(
        "local.db.idx_postings", _DF(log), partition_col="range_bucket"
    )
    assert log == [("overwritePartitions", "local.db.idx_postings", ())]
    log.clear()
    s.overwrite_partitions_table(
        "local.db.idx_docs", _DF(log), partition_col="range_bucket"
    )
    op, name, parts = log[0]
    assert op == "create" and "range_bucket" in parts[0]
    assert not any(op == "createOrReplace" for op, _, _ in log)


# ----------------------------------------------------- primitive 6:
def test_delete_where_pushes_the_predicate_verbatim():
    sp = _Spark()
    s = _store(sp)
    s.delete_where("local.db.idx_deletes", "true")
    s.delete_where(
        "local.db.idx_meta", "key = 'pending::append::abc123'"
    )
    s.delete_where("local.db.idx_docs", "range_bucket = 7")
    assert sp.sql_log == [
        "DELETE FROM local.db.idx_deletes WHERE true",
        "DELETE FROM local.db.idx_meta WHERE "
        "key = 'pending::append::abc123'",
        "DELETE FROM local.db.idx_docs WHERE range_bucket = 7",
    ]


# ----------------------------------------------------- primitive 7:
def test_current_snapshot_reads_history_not_snapshots():
    """Regression pin for the round-5 ADVICE finding: .snapshots lists
    orphaned snapshots (rollback leaves them behind, committed_at can
    tie), so the current pointer MUST come from .history by
    made_current_at."""
    sp = _Spark(
        existing=["local.db.idx_docs"],
        sql_results={".history": [{"snapshot_id": 42}]},
    )
    s = _store(sp)
    assert s.current_snapshot("local.db.idx_docs") == 42
    assert sp.sql_log == [
        "SELECT snapshot_id FROM local.db.idx_docs.history "
        "ORDER BY made_current_at DESC LIMIT 1"
    ]
    assert not any(".snapshots" in q for q in sp.sql_log)
    # missing table -> None, no SQL issued
    sp2 = _Spark()
    assert _store(sp2).current_snapshot("local.db.idx_docs") is None
    assert sp2.sql_log == []


# ----------------------------------------------------- primitive 8:
def test_rollback_call_shapes():
    sp = _Spark()
    s = _store(sp)
    s.rollback("local.db.idx_docs", 42)
    s.rollback("local.db.idx_postings", None)  # didn't exist -> drop
    assert sp.sql_log == [
        "CALL local.system.rollback_to_snapshot('db.idx_docs', 42)",
        "DROP TABLE IF EXISTS local.db.idx_postings",
    ]
    # a non-catalog-qualified name must refuse loudly, not emit a CALL
    with pytest.raises(ValueError, match="catalog-qualified"):
        s.rollback("idx_docs", 42)


# ------------------------------------------------ composite sanity:
def test_clear_pending_routes_through_delete_where():
    sp = _Spark()
    s = _store(sp)
    s.clear_pending("append", "deadbeef")
    assert sp.sql_log == [
        "DELETE FROM local.db.idx_meta WHERE "
        "key = 'pending::append::deadbeef'"
    ]
