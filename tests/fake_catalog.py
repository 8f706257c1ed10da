"""Versioned-manifest test double for the Iceberg catalog leg.

Overrides ONLY the eight storage primitives of IcebergIndexStore
(table_exists / read_table / append_table / replace_table /
overwrite_partitions_table / delete_where / current_snapshot /
rollback) with a miniature snapshot store that works the way Iceberg
does: IMMUTABLE data directories plus a per-version MANIFEST listing
which directories a snapshot reads, and an atomic pointer file for
the current snapshot.  Everything above the primitives (the catalog
control plane: versioned meta rows, pending commit points,
snapshot-id rollback recovery, the whole CatalogIndexBuilder
lifecycle) is the REAL production code, executed in CI without
Iceberg jars.  The genuine Iceberg SQL surface is covered by the
jars-conditional integration leg in test_catalog_store.py.

Appends are O(delta) — a new data dir + a one-line-longer manifest —
matching Iceberg's commit cost.  (The first version of this double
rewrote the whole table per append; at sf100 that added a ~45 s
core-count-independent serial component and dragged the catalog-leg
1v4 scaling record to 0.69 vs the parquet leg's 0.95 — an artifact of
the double, not the control plane.)  delete_where and partition
overwrites still rewrite the surviving rows into one new dir, like an
Iceberg copy-on-write delete.  Rollback flips the pointer; data dirs
of rolled-back snapshots stay on disk unreferenced, exactly like
Iceberg files awaiting GC.
"""

from __future__ import annotations

import json
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

    def _manifest(self, name: str, v: int) -> dict:
        with open(os.path.join(self._dir(name), f"m{v}.json")) as f:
            return json.load(f)

    def _commit(self, name: str, df: DataFrame | None,
                base_dirs: list[str]) -> None:
        """Write df (if any) as a NEW immutable data dir, then commit a
        new version whose manifest = base_dirs (+ the new dir).  The
        manifest also pins the schema's column order so later appends
        can align columns the way unionByName would."""
        d = self._dir(name)
        versions = [
            int(e[1:-5]) for e in os.listdir(d)
            if e.startswith("m") and e.endswith(".json")
            and e[1:-5].isdigit()
        ]
        v = (max(versions) + 1) if versions else 1
        dirs = list(base_dirs)
        cols = None
        if df is not None:
            data = os.path.join(d, f"data{v}")
            df.write.parquet(data)
            dirs.append(f"data{v}")
            cols = df.columns
        if cols is None:
            cur = self._cur(name)
            cols = self._manifest(name, cur)["columns"] if cur else []
        with open(os.path.join(d, f"m{v}.json"), "w") as f:
            json.dump({"dirs": dirs, "columns": cols}, f)
        self._set_cur(name, v)

    # --- the eight primitives ----------------------------------------
    def table_exists(self, name: str) -> bool:
        return self._cur(name) is not None

    def read_table(self, name: str) -> DataFrame:
        v = self._cur(name)
        if v is None:
            raise ValueError(f"fake catalog table {name} does not exist")
        m = self._manifest(name, v)
        d = self._dir(name)
        if not m["dirs"]:
            return self.spark.createDataFrame(
                [], ", ".join(f"`{c}` string" for c in m["columns"])
            )
        df = self.spark.read.parquet(
            *[os.path.join(d, sub) for sub in m["dirs"]]
        )
        return df.select(*m["columns"])

    def append_table(self, name: str, df: DataFrame,
                     partition_col: str | None = None) -> None:
        v = self._cur(name)
        if v is None:
            self._commit(name, df, [])
            return
        m = self._manifest(name, v)
        # align to the table's committed column order (unionByName)
        self._commit(name, df.select(*m["columns"]), m["dirs"])

    def replace_table(self, name: str, df: DataFrame,
                      partition_col: str | None = None) -> None:
        self._commit(name, df, [])

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
        self._commit(name, df, [])

    def delete_where(self, name: str, cond_sql: str) -> None:
        self._commit(
            name, self.read_table(name).where(~F.expr(cond_sql)), []
        )

    def current_snapshot(self, name: str) -> int | None:
        return self._cur(name)

    def rollback(self, name: str, snapshot_id: int | None) -> None:
        self._set_cur(
            name, int(snapshot_id) if snapshot_id is not None else None
        )
