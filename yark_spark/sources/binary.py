"""Binary-file ingestion (E4 multimodal, SURVEY.md §1.3/§2.8): the inverse
of the thumbnail dump (K2, `cmds/archive.py:201-221`).

Spark's built-in ``binaryFile`` format reads a directory of opaque files as
(path, modificationTime, length, content BINARY) — distributed, no driver
collect, partition-parallel by file. At 100 TB the pattern is the same:
binary payloads stay opaque BinaryType columns; typed metadata (id,
extension) is derived from the path with native expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Directory of opaque files → (file_id, ext, length, content).

    file_id = filename stem, ext = suffix — the layout ``dump-thumbnails``
    writes (``<video_id>.<ext>``), so a dumped archive round-trips."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path)
    name = F.element_at(F.split(F.col("path"), "/"), -1)
    return files.select(
        F.regexp_extract(name, r"^(.*)\.[^.]+$", 1).alias("file_id"),
        F.regexp_extract(name, r"\.([^.]+)$", 1).alias("ext"),
        F.col("length"),
        F.col("content"),
    )


def restore_thumbnails(videos: DataFrame, files: DataFrame) -> DataFrame:
    """Re-attach dumped thumbnail bytes to the videos table (K2 inverse):
    left join on video_id, dumped bytes win over whatever is stored (the
    dump is the fresher copy by construction). File table is small relative
    to videos at archive scale → broadcast."""
    f = F.broadcast(
        files.select(F.col("file_id").alias("video_id"), F.col("content").alias("__thumb"))
    )
    merged = videos.join(f, "video_id", "left")
    return merged.withColumn(
        "thumbnail", F.coalesce(F.col("__thumb"), F.col("thumbnail"))
    ).drop("__thumb")
