"""Google-Takeout ingestion: watch-history JSON and playlist CSV
(`cmds/archive.py:224-352`, SURVEY.md §3.3).

The reference loops per entry with a per-row commit; here each file becomes
one DataFrame, deduped with an anti-join, written as one batch — the single
biggest semantic-preserving performance change (SURVEY §3.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from yark_spark.functions.scalar import normalize_spaces, video_id_from_title_url

WATCH_HISTORY_SCHEMA = StructType(
    [
        StructField("titleUrl", StringType()),
        StructField("time", StringType()),
    ]
)

PLAYLIST_CSV_SCHEMA = StructType(
    [
        StructField("Video ID", StringType()),
        StructField("Time Added", StringType()),
    ]
)


def read_watch_history(spark: SparkSession, path: str) -> DataFrame:
    """S6 (`cmds/archive.py:317-327`): Takeout watch-history.json array →
    history-shaped rows. Entries without titleUrl are the 'unavailable'
    count (P5, `:333-335`) — kept with video=NULL so callers can count and
    drop them."""
    from yark_spark.session import tune

    tune(spark)
    raw = spark.read.schema(WATCH_HISTORY_SCHEMA).option("multiLine", "true").json(path)
    return raw.select(
        F.when(
            F.col("titleUrl").isNotNull(), video_id_from_title_url(F.col("titleUrl"))
        ).alias("video"),
        F.to_timestamp(F.col("time")).alias("watched"),
    )


def dedupe_history(history: DataFrame, existing: DataFrame | None = None) -> DataFrame:
    """F4 (`cmds/archive.py:340-341`): exact-duplicate suppression on the
    compound key (video, watched) — in-batch via distinct, vs the store via
    anti-join. Streaming variant: withWatermark + dropDuplicates
    (yark_spark.streaming.pipelines)."""
    out = history.filter(F.col("video").isNotNull()).dropDuplicates(["video", "watched"])
    if existing is not None:
        out = out.join(
            existing.select("video", "watched"), ["video", "watched"], "left_anti"
        )
    return out


def with_history_ids(history: DataFrame, start_id: int = 0) -> DataFrame:
    """Surrogate history_id (AUTOINCREMENT stand-in, `schema.sql:71`):
    deterministic dense ids via the DISTRIBUTED global row number (range
    partition → per-partition cumsum → broadcast offsets) — no single-task
    global window, so the id assignment scales with the history size. Use
    monotonically_increasing_id instead when ids only need uniqueness, not
    density."""
    from yark_spark.operators.packing import global_row_number

    numbered = global_row_number(history, ["watched", "video"], "history_id")
    return numbered.withColumn(
        "history_id", (F.col("history_id") + F.lit(start_id)).cast("long")
    ).select("history_id", "video", "watched")


def playlist_title_from_filename(path: str) -> str:
    """X11 (`cmds/archive.py:233,236`): Takeout names playlist files
    '<title> videos.csv' — strip the suffix."""
    stem = os.path.splitext(os.path.basename(path))[0]
    return stem[:-7] if stem.endswith(" videos") else stem


def read_playlist_csv(
    spark: SparkSession, path: str, ingested_at=None
) -> tuple[DataFrame, DataFrame]:
    """S5 (`cmds/archive.py:229-247`): playlist CSV → (playlists,
    playlist_videos) with the synthetic PK 'PLLOCAL_<title>' (:236), ids
    space-stripped (X10, :304), surrogate pl ids.

    visibility='Local' matches the reference's Takeout ingest (:238).
    ``ingested_at`` (a datetime) fills the reference's Time Updated=now()
    (:239); the default None keeps 'updated' NULL — a deliberate
    divergence so reruns are byte-identical (callers wanting reference
    parity inject the ingest time)."""
    from yark_spark.session import tune

    tune(spark)
    title = playlist_title_from_filename(path)
    playlist_id = "PLLOCAL_" + title.replace(" ", "_")
    raw = spark.read.schema(PLAYLIST_CSV_SCHEMA).option("header", "true").csv(path)
    videos = raw.select(
        normalize_spaces(F.col("Video ID")).alias("video"),
        F.to_timestamp(F.col("Time Added")).alias("added"),
    ).filter(F.col("video").isNotNull() & (F.col("video") != ""))
    playlists = videos.sparkSession.createDataFrame(
        [(playlist_id, None, None, ingested_at, title, None, "Local")],
        "playlist_id string, channel string, created timestamp, updated timestamp, "
        "title string, description string, visibility string",
    )
    # bounded-input contract: a single Takeout playlist CSV is at most a few
    # thousand rows (one user's playlist), so the unpartitioned ordering
    # window is safe here; bulk id assignment at scale goes through
    # with_history_ids' distributed row number instead.
    w = Window.orderBy("added", "video")
    playlist_videos = videos.select(
        F.row_number().over(w).cast("long").alias("pl"),
        F.lit(playlist_id).alias("playlist"),
        "video",
        "added",
    )
    return playlists, playlist_videos


def read_json_with_quarantine(
    spark: SparkSession, path: str, schema, corrupt_col: str = "_corrupt_record"
):
    """Error-tolerant JSON-lines ingest: PERMISSIVE mode captures rows the
    parser rejects into ``corrupt_col`` instead of failing the job (or
    silently dropping, as DROPMALFORMED would). Returns (clean, quarantine)
    DataFrames — the quarantine carries the raw line for replay after a
    parser fix, the archive.quarantine pattern applied at the SOURCE edge.

    At 100 TB malformed rows are a certainty, not an edge case; failing a
    12-hour job on row 3 billion is not an option, and dropping rows
    silently corrupts downstream counts. Spark requires the corrupt
    column to be part of the declared schema; callers keep their schema
    corrupt-free and this adds/strips it.

    Memory contract: the raw scan must be persisted before the split
    (SPARK-21610 — filtering on the corrupt column alone over the raw
    scan is disallowed/unreliable without materialization), but pinning
    the full input in executor MEMORY for the session is not a 100 TB
    posture. So the persist is DISK_ONLY (sequential parquet-speed
    re-read, no memory pressure, no LRU eviction churn), and the handle
    is returned so the CALLER unpersists once both splits are
    materialized: ``clean, quarantine, raw = ...; <write both>;
    raw.unpersist()``."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    full = StructType(list(schema.fields) + [StructField(corrupt_col, StringType())])
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )
    raw = raw.persist(StorageLevel.DISK_ONLY)
    clean = raw.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    quarantine = raw.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return clean, quarantine, raw
