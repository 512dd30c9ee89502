"""Partition-parallel SQLite DataSource (sources/sqlite_source): schema
inference from declared affinities, rowid-range partitioning, roundtrip
with the db_sink writer's DDL."""

import sqlite3

import pytest


@pytest.fixture()
def db(tmp_path):
    path = str(tmp_path / "archive.db")
    with sqlite3.connect(path) as conn:
        conn.execute(
            "CREATE TABLE videos (id TEXT PRIMARY KEY, title TEXT, "
            "duration INTEGER, rating REAL, thumb BLOB)"
        )
        conn.executemany(
            "INSERT INTO videos VALUES (?, ?, ?, ?, ?)",
            [
                (f"vid{i:05d}", f"title {i}", 60 + i, i / 10.0, bytes([i % 256, 1]))
                for i in range(500)
            ],
        )
        conn.commit()
    return path


def _register(spark):
    from yark_spark.sources.sqlite_source import SQLiteDataSource

    spark.dataSource.register(SQLiteDataSource)


def test_schema_inference_by_affinity(spark, db):
    _register(spark)
    df = spark.read.format("sqlite").option("path", db).option("table", "videos").load()
    assert dict(df.dtypes) == {
        "id": "string",
        "title": "string",
        "duration": "bigint",
        "rating": "double",
        "thumb": "binary",
    }


def test_partitioned_read_covers_all_rows(spark, db):
    _register(spark)
    df = (
        spark.read.format("sqlite")
        .option("path", db)
        .option("table", "videos")
        .option("num_partitions", "8")
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    rows = df.collect()
    assert len(rows) == 500
    got = {r["id"]: (r["duration"], r["rating"], bytes(r["thumb"])) for r in rows}
    assert got["vid00042"] == (102, 4.2, bytes([42, 1]))


def test_empty_table_reads_zero_rows(spark, tmp_path):
    path = str(tmp_path / "empty.db")
    with sqlite3.connect(path) as conn:
        conn.execute("CREATE TABLE t (a INTEGER)")
        conn.commit()
    _register(spark)
    df = spark.read.format("sqlite").option("path", path).option("table", "t").load()
    assert df.count() == 0


def test_missing_table_raises(spark, db):
    _register(spark)
    with pytest.raises(Exception, match="no such table"):
        spark.read.format("sqlite").option("path", db).option("table", "nope").load().count()


def test_roundtrip_with_db_sink_ddl(spark, tmp_path):
    """The reference-schema tables written by operators/db_sink read back
    through the source with matching row counts."""
    from yark_spark.operators.db_sink import apply_schema

    path = str(tmp_path / "ref.db")
    with sqlite3.connect(path) as conn:
        apply_schema(conn)
        conn.executemany(
            "INSERT INTO channels (channel_id, name) VALUES (?, ?)",
            [(f"c{i}", f"chan {i}") for i in range(25)],
        )
        conn.commit()
    _register(spark)
    df = (
        spark.read.format("sqlite")
        .option("path", path)
        .option("table", "channels")
        .option("num_partitions", "3")
        .load()
    )
    assert df.count() == 25
    assert "channel_id" in df.columns and "name" in df.columns


def test_streaming_tail_reads_only_new_rows(spark, tmp_path):
    """round 7: the streaming reader's offset is the last rowid — a
    checkpointed query re-run after appends ships ONLY the new rows
    (incremental exactly-once ingest from the reference DB format)."""
    path = str(tmp_path / "stream.db")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    with sqlite3.connect(path) as conn:
        conn.execute("CREATE TABLE hist (video TEXT, pos INTEGER)")
        conn.executemany(
            "INSERT INTO hist VALUES (?, ?)", [(f"v{i}", i) for i in range(10)]
        )
        conn.commit()
    _register(spark)

    def drain():
        q = (
            spark.readStream.format("sqlite")
            .option("path", path)
            .option("table", "hist")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert spark.read.parquet(out).count() == 10

    with sqlite3.connect(path) as conn:
        conn.executemany(
            "INSERT INTO hist VALUES (?, ?)", [(f"v{i}", i) for i in range(10, 13)]
        )
        conn.commit()
    drain()
    got = spark.read.parquet(out)
    assert got.count() == 13  # 10 + 3 new, nothing re-read
    assert got.filter("pos >= 10").count() == 3


def test_partition_clamp_when_fewer_rows_than_partitions(spark, tmp_path):
    """num_partitions > row count clamps to the rowid span instead of
    emitting empty or out-of-range partitions."""
    path = str(tmp_path / "tiny.db")
    with sqlite3.connect(path) as conn:
        conn.execute("CREATE TABLE t (a INTEGER)")
        conn.executemany("INSERT INTO t VALUES (?)", [(i,) for i in range(3)])
        conn.commit()
    _register(spark)
    df = (
        spark.read.format("sqlite")
        .option("path", path)
        .option("table", "t")
        .option("num_partitions", "16")
        .load()
    )
    assert sorted(r["a"] for r in df.collect()) == [0, 1, 2]
    assert df.rdd.getNumPartitions() <= 3


def test_quoted_identifiers_in_untrusted_table_and_column_names(spark, tmp_path):
    """Archive DBs are untrusted input: a table/column name containing a
    double quote must stay inside the identifier context (escaped as "")
    at every query site — schema probe, partition probe, and range scan."""
    path = str(tmp_path / "evil.db")
    with sqlite3.connect(path) as conn:
        conn.execute('CREATE TABLE "t""x" ("a""b" INTEGER, c TEXT)')
        conn.executemany(
            'INSERT INTO "t""x" VALUES (?, ?)', [(i, f"r{i}") for i in range(5)]
        )
        conn.commit()
    _register(spark)
    df = (
        spark.read.format("sqlite")
        .option("path", path)
        .option("table", 't"x')
        .option("num_partitions", "2")
        .load()
    )
    assert df.columns == ['a"b', "c"]
    assert sorted(r['a"b'] for r in df.collect()) == [0, 1, 2, 3, 4]
