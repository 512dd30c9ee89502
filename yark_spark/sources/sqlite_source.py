"""Partition-parallel SQLite reader as a Spark 4 Python DataSource.

The reference's entire storage layer is one SQLite file
(`/root/reference/schema.sql`, opened per-command in
`cmds/archive.py`); operators/db_sink.py writes that format back. This
source completes the loop: ``spark.read.format("sqlite")`` scans an
archive DB straight into a DataFrame, split into ROWID ranges so the
scan parallelizes across executors instead of funneling through one
driver-side cursor.

100 TB posture: SQLite itself is the small end of the pipeline (an
ingest/export edge, not the lake), but the connector shape is the
general one — cheap min/max key probe at planning time, one embedded
connection per partition on the executor, predicate-free range cursors
that stream rows without materializing the table. ``num_partitions``
bounds planning fan-out exactly like JDBC's partitionColumn machinery.

Usage::

    spark.dataSource.register(SQLiteDataSource)
    df = (spark.read.format("sqlite")
          .option("path", "/data/archive.db")
          .option("table", "videos")
          .option("num_partitions", "8")
          .load())
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: SQLite declared-type affinity → Spark type (TEXT affinity is the
#: fallback, matching SQLite's own affinity rules).
_AFFINITY = (
    ("INT", LongType()),
    ("CHAR", StringType()),
    ("CLOB", StringType()),
    ("TEXT", StringType()),
    ("BLOB", BinaryType()),
    ("REAL", DoubleType()),
    ("FLOA", DoubleType()),
    ("DOUB", DoubleType()),
)


def _qident(name: str) -> str:
    """Quote a SQLite identifier, escaping embedded double quotes
    (``"`` → ``""``). Archive DBs are untrusted input — a table or
    column name containing a quote must not break out of the
    identifier context in any of the query sites below."""
    return '"' + name.replace('"', '""') + '"'


def _spark_type(declared: str):
    up = (declared or "").upper()
    for marker, t in _AFFINITY:
        if marker in up:
            return t
    return StringType()


class _RowidRange(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo = lo
        self.hi = hi


class SQLiteDataSource(DataSource):
    """``format("sqlite")`` batch source. Options: ``path`` (DB file),
    ``table``, ``num_partitions`` (default 4)."""

    @classmethod
    def name(cls) -> str:
        return "sqlite"

    def schema(self):
        import sqlite3

        path = self.options["path"]
        table = self.options["table"]
        with sqlite3.connect(path) as conn:
            cols = conn.execute(f'PRAGMA table_info({_qident(table)})').fetchall()
        if not cols:
            raise ValueError(f"sqlite source: no such table {table!r} in {path}")
        return StructType(
            [StructField(c[1], _spark_type(c[2]), True) for c in cols]
        )

    def reader(self, schema: StructType) -> "SQLiteReader":
        return SQLiteReader(self.options, schema)

    def simpleStreamReader(self, schema: StructType) -> "SQLiteStreamReader":
        return SQLiteStreamReader(self.options, schema)


class SQLiteReader(DataSourceReader):
    def __init__(self, options, schema: StructType):
        self.path = options["path"]
        self.table = options["table"]
        self.n = int(options.get("num_partitions", "4"))
        self.columns = [f.name for f in schema.fields]

    def partitions(self):
        import sqlite3

        # One cheap planning probe: rowid bounds → N contiguous ranges.
        # (rowid is SQLite's implicit clustered key, so every range scan
        # is a sequential B-tree walk, not a scatter.)
        with sqlite3.connect(self.path) as conn:
            row = conn.execute(
                f'SELECT min(rowid), max(rowid) FROM {_qident(self.table)}'
            ).fetchone()
        lo, hi = row if row and row[0] is not None else (0, -1)
        if hi < lo:
            return [_RowidRange(0, -1)]
        n = max(1, min(self.n, hi - lo + 1))
        step = (hi - lo + 1 + n - 1) // n
        return [
            _RowidRange(lo + i * step, min(lo + (i + 1) * step - 1, hi))
            for i in range(n)
        ]

    def read(self, partition: _RowidRange):
        import sqlite3

        if partition.hi < partition.lo:
            return
        cols = ", ".join(_qident(c) for c in self.columns)
        with sqlite3.connect(self.path) as conn:
            cur = conn.execute(
                f'SELECT {cols} FROM {_qident(self.table)} WHERE rowid BETWEEN ? AND ?',
                (partition.lo, partition.hi),
            )
            yield from cur


class SQLiteStreamReader(SimpleDataSourceStreamReader):
    """Incremental tail-read of a SQLite table: the stream offset is the
    last ROWID seen, so each micro-batch reads exactly the rows appended
    since the previous one (SQLite assigns monotonically increasing
    rowids to appends unless rows are deleted and ids recycled — append-
    only archive tables, the reference's write pattern, satisfy this).

    This is the steady-state ingest twin of the batch reader: checkpoint
    the query and re-running it ships only new rows — per-micro-batch
    exactly-once into any of the repo's sinks (foreachBatch upsert,
    parquet append)."""

    def __init__(self, options, schema: StructType):
        self.path = options["path"]
        self.table = options["table"]
        self.columns = [f.name for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"rowid": 0}

    def read(self, start: dict):
        import sqlite3

        with sqlite3.connect(self.path) as conn:
            row = conn.execute(
                f'SELECT max(rowid) FROM {_qident(self.table)}'
            ).fetchone()
        hi = row[0] if row and row[0] is not None else 0
        lo = int(start["rowid"])
        if hi <= lo:
            return [], {"rowid": lo}
        return self._scan(lo, hi), {"rowid": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._scan(int(start["rowid"]), int(end["rowid"]))

    def _scan(self, lo: int, hi: int):
        # materialized, not a generator: the SimpleStreamReader wrapper
        # pickles the prefetched batch into its offset cache, and a
        # micro-batch is bounded by the appends since the last trigger
        import sqlite3

        cols = ", ".join(_qident(c) for c in self.columns)
        with sqlite3.connect(self.path) as conn:
            return conn.execute(
                f'SELECT {cols} FROM {_qident(self.table)} '
                "WHERE rowid > ? AND rowid <= ?",
                (lo, hi),
            ).fetchall()
