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
    ``_current`` pointer file per table.

    ``retain`` controls version GC: the newest ``retain`` versions of each
    table survive a write (default 2 — current + previous), so a lazy
    DataFrame obtained from ``read()`` before a write stays readable across
    ``retain - 1`` subsequent writes to the same table. Multi-table
    commands that read a whole store, transform, then write each table
    (archive, replay, cascade delete) rely on exactly that window. Call
    ``vacuum()`` to reclaim old versions once no readers remain."""

    def __init__(self, spark: SparkSession, root: str, retain: int = 2):
        self.spark = spark
        self.root = root
        self.retain = max(1, retain)
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

    def _versions(self, name: str) -> list[int]:
        tdir = self._table_dir(name)
        if not os.path.isdir(tdir):
            return []
        return sorted(
            int(d[1:]) for d in os.listdir(tdir) if d.startswith("v") and d[1:].isdigit()
        )

    def write(
        self,
        name: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        sort_by: list[str] | None = None,
    ) -> None:
        """Stage to v<N+1>, then atomically flip the pointer. Versions older
        than the newest ``retain`` are GC'd after the flip, so DataFrames
        holding the immediately-previous version stay readable (see class
        docstring).

        ``sort_by`` clusters the staged files on those keys
        (operators/layout.write_sorted shape: range partition + in-file
        sort) so subsequent range/point predicates on the leading key prune
        parquet row groups — worth it for big fact tables re-read by key,
        skip for small dims."""
        tdir = self._table_dir(name)
        os.makedirs(tdir, exist_ok=True)
        old = self._current_version(name)
        new = 0 if old is None else old + 1
        target = os.path.join(tdir, f"v{new}")
        if sort_by:
            from pyspark.sql import functions as F

            n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
            df = df.repartitionByRange(n, *[F.col(c) for c in sort_by]).sortWithinPartitions(
                *sort_by
            )
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target)
        tmp_ptr = os.path.join(tdir, "_current.tmp")
        with open(tmp_ptr, "w") as f:
            f.write(str(new))
        os.replace(tmp_ptr, os.path.join(tdir, "_current"))  # atomic flip
        for v in self._versions(name):
            if v <= new - self.retain:
                shutil.rmtree(os.path.join(tdir, f"v{v}"), ignore_errors=True)

    def vacuum(self, name: str | None = None) -> None:
        """Drop every non-current version (all tables, or one). Only safe
        once no lazy DataFrames from older reads remain un-consumed."""
        names = [name] if name else [d for d in os.listdir(self.root) if os.path.isdir(os.path.join(self.root, d))]
        for n in names:
            cur = self._current_version(n)
            for v in self._versions(n):
                if v != cur:
                    shutil.rmtree(os.path.join(self._table_dir(n), f"v{v}"), ignore_errors=True)

    def upsert(self, name: str, incoming: DataFrame, keys: list[str], guard=None) -> None:
        """Read-merge-swap upsert (W2 dataflow + store atomicity)."""
        from yark_spark.operators.writes import upsert as merge

        current = self.read(name)
        self.write(name, merge(current, incoming, keys, update_guard=guard))
