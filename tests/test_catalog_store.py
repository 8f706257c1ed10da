"""Storage adapter: parquet leg (what this environment runs) and the
Iceberg leg (skipped unless the Iceberg Spark runtime is present).

The parquet leg is also exercised implicitly by every index-build test
(stage 2 routes through resolve_store); these tests pin the adapter
contract directly, including the dynamic-partition-overwrite semantics
the Iceberg leg maps onto overwritePartitions.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from sotohp_spark.config import EngineConfig
from sotohp_spark.sources.catalog import (
    IcebergIndexStore,
    ParquetIndexStore,
    iceberg_available,
    resolve_store,
)

CFG = EngineConfig(range_size=8, block_size=4, ranges_per_batch=2,
                   shuffle_partitions=4)
TS = datetime.datetime(2025, 1, 1)


def _docs_df(spark, ids):
    rows = [
        (i, f"c{i}", TS, 1, 2, {"hot": 2}) for i in ids
    ]
    return spark.createDataFrame(
        rows,
        "doc_id long, conv_id string, doc_ts timestamp, n_turns long, "
        "doc_len int, tfs map<string,int>",
    )


def _shards_df(spark, buckets, tag):
    rows = [
        (f"t{tag}", b * 2, 1, b) for b in buckets
    ]
    return spark.createDataFrame(
        rows, "term string, range_id int, n_docs long, range_bucket int"
    )


def test_resolve_store_defaults_to_parquet(spark, tmp_path):
    s = resolve_store(spark, str(tmp_path / "idx"), CFG)
    assert isinstance(s, ParquetIndexStore) and s.kind == "parquet"
    # prefix set but no Iceberg runtime in this sandbox -> parquet leg
    cfg2 = EngineConfig(iceberg_table_prefix="local.db.t")
    s2 = resolve_store(spark, str(tmp_path / "idx"), cfg2)
    if not iceberg_available(spark):
        assert isinstance(s2, ParquetIndexStore)
    else:  # pragma: no cover - jar-present environments
        assert isinstance(s2, IcebergIndexStore)


def test_parquet_leg_docs_roundtrip_and_layout(spark, tmp_path):
    store = ParquetIndexStore(spark, str(tmp_path / "idx"), CFG)
    store.write_docs(_docs_df(spark, range(40)))
    got = store.read_docs()
    assert got.count() == 40
    # hive-partitioned by range_bucket = doc_id // (8*2)
    import glob

    parts = sorted(glob.glob(f"{tmp_path}/idx/docs/range_bucket=*"))
    assert [p.rsplit("=", 1)[1] for p in parts] == ["0", "1", "2"]
    store.write_docs(_docs_df(spark, range(40, 50)), mode="append")
    assert store.read_docs().count() == 50


def test_parquet_leg_dynamic_partition_overwrite(spark, tmp_path):
    """Rewriting bucket 0 must leave bucket 1 untouched — the exact
    semantics the Iceberg leg gets from overwritePartitions."""
    store = ParquetIndexStore(spark, str(tmp_path / "idx"), CFG)
    store.overwrite_postings_partitions(_shards_df(spark, [0, 1], "a"))
    assert store.read_postings().count() == 2
    store.overwrite_postings_partitions(_shards_df(spark, [0], "b"))
    got = {
        (r["term"], r["range_bucket"]) for r in store.read_postings().collect()
    }
    assert got == {("tb", 0), ("ta", 1)}


def test_parquet_leg_delete_doc_ids_tombstones(spark, tmp_path):
    store = ParquetIndexStore(spark, str(tmp_path / "idx"), CFG)
    ids = spark.createDataFrame([(3,), (17,)], "doc_id long")
    store.delete_doc_ids(ids)
    t = spark.read.parquet(f"{tmp_path}/idx/deletes").collect()
    assert {(r["doc_id"], r["range_bucket"]) for r in t} == {(3, 0), (17, 1)}


def test_iceberg_leg_lifecycle(spark, tmp_path):
    """Full catalog lifecycle: createOrReplace -> append ->
    overwritePartitions -> MERGE INTO delete.  Runs only where the
    Iceberg Spark runtime is on the classpath (not this sandbox)."""
    if not iceberg_available(spark):
        pytest.skip("Iceberg runtime not on classpath")
    spark.conf.set(
        "spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.local.type", "hadoop")
    spark.conf.set(
        "spark.sql.catalog.local.warehouse", str(tmp_path / "wh")
    )
    store = IcebergIndexStore(spark, "local.db.t", CFG)
    store.write_docs(_docs_df(spark, range(40)))
    assert store.read_docs().count() == 40
    store.write_docs(_docs_df(spark, range(40, 50)), mode="append")
    assert store.read_docs().count() == 50
    store.overwrite_postings_partitions(_shards_df(spark, [0, 1], "a"))
    store.overwrite_postings_partitions(_shards_df(spark, [0], "b"))
    got = {
        (r["term"], r["range_bucket"]) for r in store.read_postings().collect()
    }
    assert got == {("tb", 0), ("ta", 1)}
    store.delete_doc_ids(spark.createDataFrame([(3,)], "doc_id long"))
    assert store.read_docs().where(F.col("doc_id") == 3).count() == 0
    assert store.read_docs().count() == 49


def test_builder_refuses_half_wired_iceberg_config(spark, tmp_path,
                                                   monkeypatch):
    """Until the FULL builder pipeline is catalog-backed, a configured
    Iceberg prefix must fail fast instead of producing an index whose
    postings live in the catalog while docs/meta stay parquet — a
    state no reader could open."""
    import sotohp_spark.sources.catalog as cat
    from sotohp_spark.index import IndexBuilder

    monkeypatch.setattr(cat, "iceberg_available", lambda s: True)
    cfg = EngineConfig(iceberg_table_prefix="local.db.idx")
    turns = spark.createDataFrame(
        [("c1", 0, TS, "hello world")],
        "conv_id string, turn_idx int, ts timestamp, text string",
    )
    with pytest.raises(NotImplementedError, match="iceberg_table_prefix"):
        IndexBuilder(spark, str(tmp_path / "iidx"), cfg).build(
            turns, input_fingerprint="x"
        )


def test_store_delete_doc_ids_empty_is_noop(spark, tmp_path):
    import os as _os

    store = ParquetIndexStore(spark, str(tmp_path / "idx"), CFG)
    store.delete_doc_ids(spark.createDataFrame([], "doc_id long"))
    assert not _os.path.exists(f"{tmp_path}/idx/deletes")
