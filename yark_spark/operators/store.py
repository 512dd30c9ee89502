"""Parquet-backed table store — the at-rest layer (SURVEY.md §1.3).

The reference's single SQLite file becomes a directory of Parquet tables.
Writes are staged-then-swapped (write to a new versioned dir, flip a
pointer file) so readers never see a half-written table — the batch
analogue of the reference's per-video `db.commit()` transaction points
(`cmds/archive.py:134,195,312,343`), coarsened to per-batch as SURVEY §3.3
prescribes. A JDBC sink can replace this layer 1:1 (same upsert dataflow
inside foreachBatch, with the DB providing atomicity).

Scale notes: facts should be written partitioned (partitionBy date/key) so
cascades and key-scoped overwrites rewrite only affected partitions;
local tests use unpartitioned tiny tables.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from yark_spark.schemas import ALL_TABLES


class ParquetStore:
    """Versioned parquet tables under ``root/<table>/v<N>``, with a
    ``_current`` pointer file per table."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _table_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _current_version(self, name: str) -> int | None:
        ptr = os.path.join(self._table_dir(name), "_current")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            return int(f.read().strip())

    def exists(self, name: str) -> bool:
        return self._current_version(name) is not None

    def read(self, name: str) -> DataFrame:
        v = self._current_version(name)
        if v is None:
            if name in ALL_TABLES:  # empty archive table with proper schema
                return self.spark.createDataFrame([], ALL_TABLES[name])
            raise FileNotFoundError(f"table {name} not initialized")
        return self.spark.read.parquet(os.path.join(self._table_dir(name), f"v{v}"))

    def write(self, name: str, df: DataFrame, partition_by: list[str] | None = None) -> None:
        """Stage to v<N+1>, then atomically flip the pointer; old version
        removed after the flip (readers holding the old DataFrame keep a
        consistent snapshot until they re-resolve)."""
        tdir = self._table_dir(name)
        os.makedirs(tdir, exist_ok=True)
        old = self._current_version(name)
        new = 0 if old is None else old + 1
        target = os.path.join(tdir, f"v{new}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target)
        tmp_ptr = os.path.join(tdir, "_current.tmp")
        with open(tmp_ptr, "w") as f:
            f.write(str(new))
        os.replace(tmp_ptr, os.path.join(tdir, "_current"))  # atomic flip
        if old is not None:
            shutil.rmtree(os.path.join(tdir, f"v{old}"), ignore_errors=True)

    def upsert(self, name: str, incoming: DataFrame, keys: list[str], guard=None) -> None:
        """Read-merge-swap upsert (W2 dataflow + store atomicity)."""
        from yark_spark.operators.writes import upsert as merge

        current = self.read(name)
        self.write(name, merge(current, incoming, keys, update_guard=guard))
