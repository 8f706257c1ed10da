"""Versioned-directory test double for the Iceberg catalog leg.

Overrides ONLY the eight storage primitives of IcebergIndexStore
(table_exists / read_table / append_table / replace_table /
overwrite_partitions_table / delete_where / current_snapshot /
rollback) with copy-on-write parquet version directories + an atomic
pointer file — a miniature snapshot store.  Everything above the
primitives (the catalog control plane: versioned meta rows, pending
commit points, snapshot-id rollback recovery, the whole
CatalogIndexBuilder lifecycle) is the REAL production code, executed
in CI without Iceberg jars.  The genuine Iceberg SQL surface is
covered by the jars-conditional integration leg in
test_catalog_store.py.

Copy-on-write appends are O(table) per commit — fine at test scale,
NOT a model of Iceberg's O(delta) manifests."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sotohp_spark.config import EngineConfig, DEFAULT
from sotohp_spark.sources.catalog import IcebergIndexStore


class FakeCatalogStore(IcebergIndexStore):
    def __init__(self, spark: SparkSession, root: str,
                 cfg: EngineConfig = DEFAULT,
                 prefix: str = "fakecat.db.idx"):
        super().__init__(spark, prefix, cfg)
        self.root = root
        os.makedirs(root, exist_ok=True)

    # --- version bookkeeping -----------------------------------------
    def _dir(self, name: str) -> str:
        d = os.path.join(self.root, name.split(".")[-1])
        os.makedirs(d, exist_ok=True)
        return d

    def _cur(self, name: str) -> int | None:
        p = os.path.join(self._dir(name), "_current")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def _set_cur(self, name: str, v: int | None) -> None:
        p = os.path.join(self._dir(name), "_current")
        if v is None:
            if os.path.exists(p):
                os.remove(p)
            return
        fd, tmp = tempfile.mkstemp(dir=self._dir(name))
        with os.fdopen(fd, "w") as f:
            f.write(str(v))
        os.replace(tmp, p)  # atomic pointer flip = the snapshot commit

    def _write_version(self, name: str, df: DataFrame) -> None:
        d = self._dir(name)
        versions = [
            int(e[1:]) for e in os.listdir(d)
            if e.startswith("v") and e[1:].isdigit()
        ]
        v = (max(versions) + 1) if versions else 1
        df.write.parquet(os.path.join(d, f"v{v}"))
        self._set_cur(name, v)

    # --- the eight primitives ----------------------------------------
    def table_exists(self, name: str) -> bool:
        return self._cur(name) is not None

    def read_table(self, name: str) -> DataFrame:
        v = self._cur(name)
        if v is None:
            raise ValueError(f"fake catalog table {name} does not exist")
        return self.spark.read.parquet(os.path.join(self._dir(name), f"v{v}"))

    def append_table(self, name: str, df: DataFrame,
                     partition_col: str | None = None) -> None:
        if self.table_exists(name):
            df = self.read_table(name).unionByName(df)
        self._write_version(name, df)

    def replace_table(self, name: str, df: DataFrame,
                      partition_col: str | None = None) -> None:
        self._write_version(name, df)

    def overwrite_partitions_table(self, name: str, df: DataFrame,
                                   partition_col: str) -> None:
        if self.table_exists(name):
            touched = [
                r[0]
                for r in df.select(partition_col).distinct().collect()
            ]
            kept = self.read_table(name).where(
                ~F.col(partition_col).isin(touched)
            )
            df = kept.unionByName(df)
        self._write_version(name, df)

    def delete_where(self, name: str, cond_sql: str) -> None:
        self._write_version(
            name, self.read_table(name).where(~F.expr(cond_sql))
        )

    def current_snapshot(self, name: str) -> int | None:
        return self._cur(name)

    def rollback(self, name: str, snapshot_id: int | None) -> None:
        self._set_cur(
            name, int(snapshot_id) if snapshot_id is not None else None
        )
