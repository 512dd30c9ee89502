"""Transactional DB sink — the JDBC-sink posture of the north-star
(SURVEY.md §1.3, §4 'foreachBatch transactional JDBC writes') with an
injectable DB-API connection so tests exercise a real ACID store (stdlib
sqlite3 — fittingly, the reference's own storage engine).

DDL is GENERATED from yark_spark.schemas StructTypes plus a declarative
constraint map (PKs, FKs with CASCADE/RESTRICT — semantics surveyed from
the reference DDL, `/root/reference/schema.sql:3-92`); nothing is copied.

Batch flow per micro-batch (replaces the reference's per-row commits,
`cmds/archive.py:195,343`):
  1. collect the (small) micro-batch arrow-side,
  2. one executemany per table in FK order inside ONE transaction,
  3. commit — idempotent via INSERT OR IGNORE / guarded UPDATE, so Spark's
     at-least-once foreachBatch replays converge.

On a cluster the same SQL runs per-partition against a real JDBC pool;
SQLite is single-writer, so the driver-side variant used here is the honest
local shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from yark_spark.schemas import ALL_TABLES, WRITE_ORDER

#: Primary keys per table (reference parity: `schema.sql` PK columns).
PRIMARY_KEYS: dict[str, tuple[str, ...]] = {
    "users": ("user_id",),
    "channels": ("channel_id",),
    "tags": ("name",),
    "video_tags": ("id",),
    "comments": ("comment_id",),
    "videos": ("video_id",),
    "history": ("history_id",),
    "playlists": ("playlist_id",),
    "playlist_videos": ("pl",),
}

#: FKs: table → [(column, ref_table, ref_column, on_delete)].
FOREIGN_KEYS: dict[str, list[tuple[str, str, str, str]]] = {
    "channels": [("uploader_id", "users", "user_id", "RESTRICT")],
    "video_tags": [
        ("video", "videos", "video_id", "CASCADE"),
        ("tag", "tags", "name", "CASCADE"),
    ],
    "comments": [
        ("video", "videos", "video_id", "CASCADE"),
        ("author", "users", "user_id", "CASCADE"),
        ("parent", "comments", "comment_id", "CASCADE"),
    ],
    "videos": [("channel", "channels", "channel_id", "RESTRICT")],
    "playlist_videos": [("playlist", "playlists", "playlist_id", "CASCADE")],
    # history.video deliberately has NO FK (schema.sql:72)
}

_SQL_TYPES = {
    "string": "TEXT",
    "long": "INTEGER",
    "bigint": "INTEGER",
    "double": "REAL",
    "boolean": "INTEGER",
    "timestamp": "INTEGER",  # epoch seconds at rest, like the reference
    "binary": "BLOB",
}


def generate_ddl() -> list[str]:
    """CREATE TABLE statements derived from the Spark StructTypes."""
    stmts = []
    for table in WRITE_ORDER:
        schema = ALL_TABLES[table]
        pk = PRIMARY_KEYS[table]
        cols = []
        for f in schema.fields:
            sql_t = _SQL_TYPES[f.dataType.typeName()]
            null = "" if f.nullable else " NOT NULL"
            pk_inline = " PRIMARY KEY" if pk == (f.name,) else ""
            cols.append(f"{f.name} {sql_t}{null}{pk_inline}")
        for col, rt, rc, action in FOREIGN_KEYS.get(table, []):
            cols.append(f"FOREIGN KEY ({col}) REFERENCES {rt}({rc}) ON DELETE {action}")
        stmts.append(f"CREATE TABLE IF NOT EXISTS {table} (\n  " + ",\n  ".join(cols) + "\n)")
    return stmts


def apply_schema(conn) -> None:
    conn.execute("PRAGMA foreign_keys = ON")
    for stmt in generate_ddl():
        conn.execute(stmt)
    conn.commit()


def _to_rows(df: DataFrame, table: str):
    """Micro-batch → python rows with epoch/int coercions for the DB."""
    import datetime as dt

    schema = ALL_TABLES[table]
    out = []
    for r in df.select(*[f.name for f in schema.fields]).collect():
        row = []
        for f in schema.fields:
            v = r[f.name]
            if isinstance(v, dt.datetime):
                v = int(v.timestamp())
            elif isinstance(v, bool):
                v = int(v)
            elif isinstance(v, bytearray):
                v = bytes(v)
            row.append(v)
        out.append(tuple(row))
    return out


def write_batch(conn, tables: dict[str, DataFrame]) -> None:
    """One transaction: INSERT OR IGNORE every table in FK order (first-
    writer-wins keyed dedup — W1 — which also makes replays no-ops)."""
    try:
        for table in WRITE_ORDER:
            if table not in tables:
                continue
            schema = ALL_TABLES[table]
            cols = ", ".join(f.name for f in schema.fields)
            ph = ", ".join("?" for _ in schema.fields)
            conn.executemany(
                f"INSERT OR IGNORE INTO {table} ({cols}) VALUES ({ph})",
                _to_rows(tables[table], table),
            )
        conn.commit()
    except Exception:
        conn.rollback()
        raise


def db_history_sink(
    connection_factory: Callable[[], "object"], deduped: DataFrame, checkpoint: str
):
    """foreachBatch streaming sink: per-micro-batch transactional insert of
    history rows through the DB connection (per-batch commit replaces the
    reference's per-row commit at `cmds/archive.py:343`)."""
    from pyspark.sql import functions as F

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        conn = connection_factory()
        try:
            apply_schema(conn)
            incoming = batch_df.withColumn(
                "history_id", F.xxhash64("video", "watched")
            ).select("history_id", "video", "watched")
            write_batch(conn, {"history": incoming})
        finally:
            conn.close()

    return (
        deduped.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
