"""SparkSession factory.

Local sessions pin UTC, AQE, and Arrow so results are comparable with
the DuckDB oracle and pandas UDFs run vectorized.  On a real cluster
the same builder is used via ``spark-submit --py-files``; only
master/partition counts change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _ensure_pythonpath() -> str:
    """Make the package importable in Python workers regardless of the
    driver's cwd.  Local mode workers inherit the driver environment;
    on a real cluster ship the package with spark-submit --py-files
    (the cluster-side equivalent of this)."""
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    current = os.environ.get("PYTHONPATH", "")
    if pkg_root not in current.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{current}" if current else pkg_root
        )
    return pkg_root


def get_spark(
    app_name: str = "sotohp-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    _ensure_pythonpath()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv6Addresses=false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
