"""Sources & sinks beyond parquet (SURVEY §2.1).

- NDJSON sink/source (S9): the reference streams entities as JSON
  lines over HTTP (ApiApp.scala:725-741); here: df.write.json /
  spark.read.json with an explicit schema (never inferSchema in prod).
- Binary file source (S10): the reference streams original/miniature
  bytes (MediaServiceLive.scala:301-371); here:
  spark.read.format("binaryFile") with path glob + pushdown-able
  modificationTime/length columns.
- Scan masks (P3/S3): include/ignore regexes on the file path applied
  BEFORE row building, like SearchFilter + FileSystemSearch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def write_ndjson(df: DataFrame, path: str, n_files: int = 1) -> str:
    df.coalesce(n_files).write.mode("overwrite").json(path)
    return path


def read_ndjson(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def to_json_lines(df: DataFrame, limit: int = 1000) -> list:
    """Driver-side NDJSON page (the HTTP streaming shape, capped like
    the reference's mediaStreamMaxLimit)."""
    return [r for r in df.limit(min(limit, 1000)).toJSON().collect()]


def read_binary_files(
    spark: SparkSession,
    path_glob: str,
    include_mask: str | None = None,
    ignore_mask: str | None = None,
    modified_after=None,
) -> DataFrame:
    """Binary scan with include/ignore path masks + time pushdown.

    `modifiedAfter` is handled by the binaryFile source itself
    (pushdown, the reference's fileLastModifiedCriteria S3); the regex
    masks mirror FileSystemSearch.scala:56-77.
    """
    reader = spark.read.format("binaryFile")
    if modified_after is not None:
        reader = reader.option("modifiedAfter", str(modified_after))
    df = reader.load(path_glob)
    if include_mask:
        df = df.where(F.col("path").rlike(include_mask))
    if ignore_mask:
        df = df.where(~F.col("path").rlike(ignore_mask))
    return df
