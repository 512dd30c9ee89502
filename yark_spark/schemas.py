"""Spark StructTypes for the 9 yark archive tables.

Transcribed from the reference DDL (`/root/reference/schema.sql:3-92`) per
the mapping in SURVEY.md §1.2: epoch-int timestamps → TimestampType,
INTEGER bools → BooleanType, BLOB → BinaryType, REAL → DoubleType.
Constraint semantics (PK dedup, FK cascade/restrict) are enforced by the
operators in yark_spark.operators.writes, not by the schema.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _f(name, dtype, nullable=True):
    return StructField(name, dtype, nullable)


# schema.sql:3-6
USERS = StructType([_f("user_id", StringType(), False), _f("username", StringType(), False)])

# schema.sql:8-15
CHANNELS = StructType(
    [
        _f("channel_id", StringType(), False),
        _f("uploader_id", StringType()),   # →users RESTRICT (schema.sql:14)
        _f("name", StringType(), False),
        _f("channel_follower_count", LongType()),
        _f("url", StringType()),           # UNIQUE
    ]
)

# schema.sql:17-19
TAGS = StructType([_f("name", StringType(), False)])

# schema.sql:21-27
VIDEO_TAGS = StructType(
    [
        _f("id", LongType(), False),       # surrogate
        _f("video", StringType(), False),  # →videos CASCADE (schema.sql:25)
        _f("tag", StringType(), False),    # →tags CASCADE (schema.sql:26)
    ]
)

# schema.sql:29-42
COMMENTS = StructType(
    [
        _f("comment_id", StringType(), False),
        _f("video", StringType()),         # →videos CASCADE
        _f("author", StringType()),        # →users CASCADE
        _f("content", StringType()),
        _f("likes", LongType()),
        _f("is_favorited", BooleanType()),
        _f("author_is_uploader", BooleanType()),
        _f("parent", StringType()),        # self-FK, NULL = thread root (schema.sql:37,41)
        _f("timestamp", TimestampType()),
    ]
)

# schema.sql:44-68
VIDEOS = StructType(
    [
        _f("video_id", StringType(), False),  # 11-char [0-9A-Za-z_-] (utils.py:19-24)
        _f("title", StringType()),
        _f("description", StringType()),
        _f("channel", StringType()),          # →channels RESTRICT (schema.sql:67)
        _f("thumbnail", BinaryType()),        # BLOB (schema.sql:49)
        _f("thumbnail_url", StringType()),
        _f("duration", LongType()),
        _f("views", LongType()),
        _f("age_limit", LongType()),
        _f("live_status", StringType()),
        _f("likes", LongType()),
        _f("dislikes", LongType()),
        _f("rating", DoubleType()),
        _f("upload_timestamp", TimestampType()),
        _f("availability", StringType()),     # NULL | 'lost' | 'recovered'
        _f("width", LongType()),
        _f("height", LongType()),
        _f("fps", DoubleType()),
        _f("audio_channels", LongType()),
        _f("category", StringType()),
        _f("filesize", LongType()),
        _f("archived", TimestampType()),      # DEFAULT now (schema.sql:66)
    ]
)

# schema.sql:70-74
HISTORY = StructType(
    [
        _f("history_id", LongType(), False),
        _f("video", StringType()),            # deliberately no FK (schema.sql:72)
        _f("watched", TimestampType(), False),
    ]
)

# schema.sql:76-84
PLAYLISTS = StructType(
    [
        _f("playlist_id", StringType(), False),
        _f("channel", StringType()),
        _f("created", TimestampType()),
        _f("updated", TimestampType()),
        _f("title", StringType()),
        _f("description", StringType()),
        _f("visibility", StringType()),
    ]
)

# schema.sql:86-92
PLAYLIST_VIDEOS = StructType(
    [
        _f("pl", LongType(), False),
        _f("playlist", StringType(), False),  # →playlists CASCADE
        _f("video", StringType()),            # deliberately no FK (schema.sql:89)
        _f("added", TimestampType()),
    ]
)

ALL_TABLES: dict[str, StructType] = {
    "users": USERS,
    "channels": CHANNELS,
    "tags": TAGS,
    "video_tags": VIDEO_TAGS,
    "comments": COMMENTS,
    "videos": VIDEOS,
    "history": HISTORY,
    "playlists": PLAYLISTS,
    "playlist_videos": PLAYLIST_VIDEOS,
}

#: FK topological order for writes: dimensions before facts before bridges
#: (the reference encodes this by statement order, `cmds/archive.py:144-192`).
WRITE_ORDER = (
    "users",
    "channels",
    "videos",
    "tags",
    "video_tags",
    "comments",
    "playlists",
    "playlist_videos",
    "history",
)
