"""yt-dlp info-dict ingestion — the reference's flagship write path
(`cmds/archive.py:58-120` fetch+refine, §3.2) re-expressed as dataflow.

The reference fetches one video at a time over HTTP and refines it with
driver-side Python. Here the *fetch* is an injectable source (tests replay
JSON files; production plugs a `mapInPandas` HTTP fetcher with per-partition
retry/backoff — S1/S2/P3), and the *refine* step is one `select` of native
Column expressions over the raw info-dict DataFrame, producing the five
FK-ordered table DataFrames (users, channels, videos, comments,
tags/video_tags).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from yark_spark.functions.scalar import (
    parse_upload_date,
    scrub_default_description,
    sentinel_to_null,
    strip_url_query,
    valid_video_id,
)

#: Raw yt-dlp info-dict shape (subset the reference consumes,
#: `cmds/archive.py:106-119`; comment fields `:178-187`).
COMMENT_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("author_id", StringType()),
        StructField("author", StringType()),
        StructField("text", StringType()),
        StructField("like_count", LongType()),
        StructField("is_favorited", BooleanType()),
        StructField("author_is_uploader", BooleanType()),
        StructField("parent", StringType()),
        StructField("timestamp", LongType()),
    ]
)

INFODICT_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("fulltitle", StringType()),
        StructField("description", StringType()),
        StructField("channel_id", StringType()),
        StructField("channel", StringType()),
        StructField("uploader", StringType()),
        StructField("uploader_id", StringType()),
        StructField("channel_url", StringType()),
        StructField("channel_follower_count", LongType()),
        StructField("thumbnail", StringType()),
        StructField("duration", LongType()),
        StructField("view_count", LongType()),
        StructField("like_count", LongType()),
        StructField("age_limit", LongType()),
        StructField("live_status", StringType()),
        StructField("upload_date", StringType()),
        StructField("availability", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("fps", DoubleType()),
        StructField("audio_channels", LongType()),
        StructField("categories", ArrayType(StringType())),
        StructField("tags", ArrayType(StringType())),
        StructField("filesize_approx", LongType()),
        StructField("comments", ArrayType(COMMENT_SCHEMA)),
        # enrichment columns the RYD join provides (`cmds/archive.py:97-103`)
        StructField("ryd_likes", LongType()),
        StructField("ryd_dislikes", LongType()),
        StructField("ryd_rating", DoubleType()),
        StructField("ryd_viewCount", LongType()),
    ]
)


def read_infodicts(spark: SparkSession, path: str) -> DataFrame:
    """Info-dict JSON file(s) → raw DataFrame (tests replay fixtures;
    S1's network fetch is injected upstream of this)."""
    from yark_spark.session import tune

    tune(spark)
    return spark.read.schema(INFODICT_SCHEMA).option("multiLine", "true").json(path)


def split_valid(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """X3 id validation: (valid, quarantined). The reference raises on a bad
    id (`utils.py:24`); distributed ingest quarantines instead (P4)."""
    ok = valid_video_id(F.col("id"))
    return raw.filter(ok), raw.filter(~ok | F.col("id").isNull())


def refine_videos(raw: DataFrame) -> DataFrame:
    """`__refine_metadata` (`cmds/archive.py:82-120`) as one native select.
    Column-by-column parity, each citing the reference line:

    - description scrub (:105), filesize_approx→filesize rename (:111),
      upload_date parse (:112), category = categories[0] (:113),
      likes/views RYD coalesce (:114-116), thumbnail URL query strip (:88).
    """
    return raw.select(
        F.col("id").alias("video_id"),
        F.col("fulltitle").alias("title"),
        scrub_default_description(F.col("description")).alias("description"),
        F.col("channel_id").alias("channel"),
        F.lit(None).cast("binary").alias("thumbnail"),  # bytes filled by S4 fetcher
        strip_url_query(F.col("thumbnail")).alias("thumbnail_url"),
        F.col("duration"),
        F.coalesce(F.col("ryd_viewCount"), F.col("view_count")).alias("views"),
        F.col("age_limit"),
        F.col("live_status"),
        F.coalesce(F.col("ryd_likes"), F.col("like_count")).alias("likes"),
        F.col("ryd_dislikes").alias("dislikes"),
        F.col("ryd_rating").alias("rating"),
        parse_upload_date(F.col("upload_date")).alias("upload_timestamp"),
        F.col("availability"),
        F.col("width"),
        F.col("height"),
        F.col("fps"),
        F.col("audio_channels"),
        F.element_at(F.col("categories"), 1).alias("category"),
        F.col("filesize_approx").alias("filesize"),
        F.lit(None).cast("timestamp").alias("archived"),  # stamped at write (X15)
    )


def extract_users(raw: DataFrame) -> DataFrame:
    """users rows from uploader info (`cmds/archive.py:144-146`) and comment
    authors (`:180-181`); username fallback chain X1 (:145)."""
    uploaders = raw.select(
        F.col("uploader_id").alias("user_id"),
        F.coalesce(F.col("uploader"), F.col("channel"), F.col("uploader_id")).alias("username"),
    ).filter(F.col("user_id").isNotNull())
    authors = (
        raw.select(F.explode("comments").alias("c"))
        .select(F.col("c.author_id").alias("user_id"), F.col("c.author").alias("username"))
        .filter(F.col("user_id").isNotNull())
    )
    return uploaders.unionByName(authors)


def extract_channels(raw: DataFrame) -> DataFrame:
    """channels rows (`cmds/archive.py:147-150`)."""
    return raw.select(
        F.col("channel_id").alias("channel_id"),
        F.col("uploader_id"),
        F.coalesce(F.col("channel"), F.col("uploader"), F.col("channel_id")).alias("name"),
        F.col("channel_follower_count"),
        F.col("channel_url").alias("url"),
    ).filter(F.col("channel_id").isNotNull())


def extract_comments(raw: DataFrame) -> DataFrame:
    """comments rows (`cmds/archive.py:178-187`): explode the thread,
    "root" parent → NULL (X9, :183), epoch seconds → timestamp."""
    c = raw.select(F.col("id").alias("video"), F.explode("comments").alias("c"))
    return c.select(
        F.col("c.id").alias("comment_id"),
        F.col("video"),
        F.col("c.author_id").alias("author"),
        F.col("c.text").alias("content"),
        F.col("c.like_count").alias("likes"),
        F.col("c.is_favorited").alias("is_favorited"),
        F.col("c.author_is_uploader").alias("author_is_uploader"),
        sentinel_to_null(F.col("c.parent")).alias("parent"),
        F.timestamp_seconds(F.col("c.timestamp")).alias("timestamp"),
    )


def extract_tags(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(tags, video_tags) from the tags array (`cmds/archive.py:190-192`).
    video_tags surrogate ids via monotonically_increasing_id (SURVEY §1.2)."""
    vt = raw.select(F.col("id").alias("video"), F.explode("tags").alias("tag"))
    tags = vt.select(F.col("tag").alias("name")).distinct()
    video_tags = vt.select(
        F.monotonically_increasing_id().alias("id"), "video", "tag"
    )
    return tags, video_tags


def lost_stub(ids: DataFrame, id_col: str = "id") -> DataFrame:
    """P4 quarantine stub (`cmds/archive.py:131-134`): a videos-shaped row
    with availability='lost' and every attribute NULL, for unfetchable ids."""
    from yark_spark.schemas import VIDEOS

    cols = []
    for f in VIDEOS.fields:
        if f.name == "video_id":
            cols.append(F.col(id_col).alias("video_id"))
        elif f.name == "availability":
            cols.append(F.lit("lost").alias("availability"))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return ids.select(*cols)
