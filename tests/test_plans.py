"""Physical-plan regression tests: pushdown, pruning, broadcast, no
row-at-a-time Python — optimizer properties asserted like results."""

import pytest

from pyspark.sql import functions as F

from sotohp_spark.config import EngineConfig
from sotohp_spark.generator import transcripts_df
from sotohp_spark.index import IndexBuilder, QueryEngine
from sotohp_spark.plans.checks import (
    assert_broadcast_join,
    assert_column_pruned,
    assert_no_cartesian,
    assert_no_python_row_udf,
    assert_pushed_filter,
    assert_whole_stage_codegen,
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("planidx"))
    cfg = EngineConfig(range_size=32, block_size=8, ranges_per_batch=4,
                       shuffle_partitions=4)
    IndexBuilder(spark, path, cfg).build(
        transcripts_df(spark, 0.03), input_fingerprint="plans"
    )
    return QueryEngine(spark, path)


def test_postings_scan_pushes_term_filter(engine):
    df = engine._postings.where(F.col("term").isin(["error", "retry"]))
    assert_pushed_filter(df, "In(term")


def test_docs_scan_prunes_tf_maps(engine):
    assert_column_pruned(engine._docs, "tfs")


def test_topk_plan_no_row_python_no_cartesian(engine):
    engine.LOCAL_PATH_MAX_POSTINGS = 0  # force the distributed plan
    df = engine.top_k("error retry", 5, with_docs=True)
    assert_no_python_row_udf(df)
    assert_no_cartesian(df)


def test_flagship_bm25_broadcasts_and_codegens(spark, sf_dir):
    from sotohp_spark.operators.topk import bm25_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = bm25_topk(docs, ["shuffle", "join"], k=10)
    assert_broadcast_join(df, 2)
    assert_whole_stage_codegen(df)
    assert_no_python_row_udf(df)


def test_star_join_broadcasts_dims(spark, sf_dir):
    from sotohp_spark.operators.analytics import order_customer_nation

    df = order_customer_nation(
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        spark.read.parquet(f"{sf_dir}/customer.parquet"),
        spark.read.parquet(f"{sf_dir}/nation.parquet"),
    )
    assert_broadcast_join(df, 2)
    assert_no_cartesian(df)


def test_q1_is_pure_jvm(spark, sf_dir):
    from sotohp_spark.operators.analytics import pricing_summary

    df = pricing_summary(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
    assert_whole_stage_codegen(df)
    assert_no_python_row_udf(df)
    # the shipdate filter reaches the scan
    assert_pushed_filter(df, "l_shipdate")
