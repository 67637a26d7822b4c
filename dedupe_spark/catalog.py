"""Snapshot catalog: Iceberg-semantics table store.

The pipeline is written against this thin interface. On a real cluster
with the Iceberg runtime jar on the classpath, ``IcebergCatalog`` routes
to ``df.writeTo(...).createOrReplace()/append()`` (snapshot-atomic
commits, hidden bucket partitioning, time travel). This sandbox has no
Iceberg jar, so ``SnapshotCatalog`` reproduces the three semantics the
pipeline relies on over plain parquet:

  * atomic publish  — write to a new snapshot dir, then atomically
    repoint a small pointer file (the reference's tmp-file + rename,
    /root/reference/src/deduplication.cpp:639-640; Iceberg's metadata
    pointer swap)
  * snapshot history / time travel — every commit is retained and
    readable by snapshot id
  * resumability — readers always see the last committed snapshot,
    never a partial write

The reference's package header (global catalog stats,
include/deduplication.h:59-70) maps to the per-snapshot ``summary``.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession


class SnapshotCatalog:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    # -- paths ---------------------------------------------------------
    def _table_dir(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def _pointer(self, table: str) -> str:
        return os.path.join(self._table_dir(table), "CURRENT")

    # -- commits -------------------------------------------------------
    def write(
        self,
        table: str,
        df: DataFrame,
        mode: str = "overwrite",
        summary: dict | None = None,
        partition_by: list[str] | None = None,
    ) -> int:
        """Commit ``df`` as a new snapshot of ``table``; returns snapshot id.

        mode="overwrite" replaces table contents; mode="append" writes a
        snapshot whose read view is the union of the previous snapshot
        and the new data (copy-free: snapshots list their parquet dirs).
        """
        tdir = self._table_dir(table)
        os.makedirs(tdir, exist_ok=True)
        sid = self.current_snapshot_id(table) + 1
        data_dir = os.path.join(tdir, f"snap-{sid:06d}")
        df.write.mode("overwrite").parquet(data_dir)

        dirs = [data_dir]
        if mode == "append" and sid > 1:
            prev = self._read_meta(table, sid - 1)
            dirs = prev["data_dirs"] + dirs

        meta = {
            "snapshot_id": sid,
            "mode": mode,
            "data_dirs": dirs,
            "committed_at_unix": int(time.time()),
            "summary": summary or {},
        }
        with open(os.path.join(tdir, f"meta-{sid:06d}.json"), "w") as f:
            json.dump(meta, f)
        # atomic pointer swap = the commit
        fd, tmp = tempfile.mkstemp(dir=tdir)
        with os.fdopen(fd, "w") as f:
            f.write(str(sid))
        os.replace(tmp, self._pointer(table))
        return sid

    # -- reads ---------------------------------------------------------
    def current_snapshot_id(self, table: str) -> int:
        p = self._pointer(table)
        if not os.path.exists(p):
            return 0
        with open(p) as f:
            return int(f.read().strip())

    def _read_meta(self, table: str, sid: int) -> dict:
        with open(os.path.join(self._table_dir(table), f"meta-{sid:06d}.json")) as f:
            return json.load(f)

    def read(self, table: str, snapshot_id: int | None = None) -> DataFrame:
        sid = snapshot_id or self.current_snapshot_id(table)
        if sid == 0:
            raise FileNotFoundError(f"table {table} has no committed snapshot")
        meta = self._read_meta(table, sid)
        dfs = [self.spark.read.parquet(d) for d in meta["data_dirs"]]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def snapshots(self, table: str) -> list[dict]:
        tdir = self._table_dir(table)
        if not os.path.isdir(tdir):
            return []
        out = []
        for name in sorted(os.listdir(tdir)):
            if name.startswith("meta-"):
                with open(os.path.join(tdir, name)) as f:
                    out.append(json.load(f))
        return out

    def exists(self, table: str) -> bool:
        return self.current_snapshot_id(table) > 0
