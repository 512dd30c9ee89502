"""Unit tests for write semantics (SURVEY.md §2.4 / §5.2) — the reference's
edge cases on tiny literal DataFrames."""

import pytest
from pyspark.sql import functions as F

from yark_spark.operators.writes import (
    RestrictViolation,
    cascade_delete,
    delete_insert,
    insert_ignore,
    restrict_guard,
    stamp_archived,
    upsert,
)


def rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_insert_ignore_first_writer_wins(spark):
    existing = spark.createDataFrame([("u1", "alice")], "user_id string, username string")
    incoming = spark.createDataFrame(
        [("u1", "ALICE-NEW"), ("u2", "bob"), ("u2", "bobby")],
        "user_id string, username string",
    )
    out = insert_ignore(existing, incoming, ["user_id"])
    got = rows(out, "user_id", "username")
    # u1 keeps the existing value; u2 inserted once (deterministic min rep)
    assert got == [("u1", "alice"), ("u2", "bob")]


def test_insert_ignore_idempotent(spark):
    existing = spark.createDataFrame([("t1",), ("t2",)], "name string")
    incoming = spark.createDataFrame([("t2",), ("t3",)], "name string")
    once = insert_ignore(existing, incoming, ["name"])
    twice = insert_ignore(once, incoming, ["name"])
    assert rows(once, "name") == rows(twice, "name") == [("t1",), ("t2",), ("t3",)]


def test_upsert_guard_refuses_partial_data(spark):
    """`cmds/archive.py:162-175`: an update candidate with NULL filesize must
    NOT clobber the existing good row."""
    target = spark.createDataFrame(
        [("v1", "Good Title", 100, 42)],
        "video_id string, title string, filesize long, duration long",
    )
    partial = spark.createDataFrame(
        [("v1", "Partial", None, 42), ("v2", "New", 7, 7)],
        "video_id string, title string, filesize long, duration long",
    )
    guard = F.col("s.filesize").isNotNull() & F.col("s.duration").isNotNull()
    out = upsert(target, partial, ["video_id"], update_guard=guard)
    got = {r["video_id"]: r for r in out.collect()}
    assert got["v1"]["title"] == "Good Title"  # refused
    assert got["v1"]["filesize"] == 100
    assert got["v2"]["title"] == "New"  # insert path unaffected by guard


def test_upsert_updates_when_guard_passes(spark):
    target = spark.createDataFrame([("v1", "Old", 1, 1)], "video_id string, title string, filesize long, duration long")
    full = spark.createDataFrame([("v1", "New", 2, 2)], "video_id string, title string, filesize long, duration long")
    guard = F.col("s.filesize").isNotNull() & F.col("s.duration").isNotNull()
    out = upsert(target, full, ["video_id"], update_guard=guard)
    assert out.collect()[0]["title"] == "New"


def test_delete_insert_overwrites_scope_only(spark):
    target = spark.createDataFrame(
        [("p1", "a"), ("p1", "b"), ("p2", "c")], "playlist string, video string"
    )
    replacement = spark.createDataFrame([("p1", "z")], "playlist string, video string")
    out = delete_insert(target, replacement, F.col("playlist") == "p1")
    assert rows(out, "playlist", "video") == [("p1", "z"), ("p2", "c")]


def test_cascade_delete_wipes_children(spark):
    """`schema.sql:25-26,39-41`: deleting a video cascades to comments and
    video_tags."""
    videos = spark.createDataFrame([("v1",), ("v2",)], "video_id string")
    comments = spark.createDataFrame(
        [("c1", "v1"), ("c2", "v2")], "comment_id string, video string"
    )
    video_tags = spark.createDataFrame([(1, "v1", "t"), (2, "v2", "t")], "id long, video string, tag string")
    doomed = spark.createDataFrame([("v1",)], "video_id string")
    surviving, kids = cascade_delete(
        videos, doomed, {"comments": (comments, "video", "video_id"), "video_tags": (video_tags, "video", "video_id")}
    )
    assert rows(surviving, "video_id") == [("v2",)]
    assert rows(kids["comments"], "comment_id") == [("c2",)]
    assert rows(kids["video_tags"], "id") == [(2,)]


def test_delete_all_empties_parent_and_cascades(spark):
    """W6 (`cmds/archive.py:421-425`): DELETE FROM playlists; empties the
    parent; CASCADE children lose referencing rows, danglers survive
    (the SQLite end-state with `schema.sql:91`)."""
    from yark_spark.operators.writes import delete_all

    playlists = spark.createDataFrame([("p1",), ("p2",)], "playlist_id string")
    pv = spark.createDataFrame(
        [(1, "p1", "v1"), (2, "p2", "v2"), (3, "pX", "v3")],
        "pl long, playlist string, video string",
    )
    surviving, kids = delete_all(
        playlists, "playlist_id", {"playlist_videos": (pv, "playlist", "playlist_id")}
    )
    assert surviving.count() == 0
    assert rows(kids["playlist_videos"], "pl") == [(3,)]  # dangling FK kept
    # idempotent: running it on the already-empty state is a no-op
    surviving2, kids2 = delete_all(
        surviving, "playlist_id", {"playlist_videos": (kids["playlist_videos"], "playlist", "playlist_id")}
    )
    assert surviving2.count() == 0 and kids2["playlist_videos"].count() == 1


def test_restrict_guard_blocks_and_allows(spark):
    """`schema.sql:14,67`: channel delete blocked while videos reference it."""
    videos = spark.createDataFrame([("v1", "ch1")], "video_id string, channel string")
    with pytest.raises(RestrictViolation):
        restrict_guard(videos, "channel", spark.createDataFrame([("ch1",)], "channel_id string"))
    # no dependents → no raise
    restrict_guard(videos, "channel", spark.createDataFrame([("ch9",)], "channel_id string"))


def test_stamp_archived_fills_only_nulls(spark):
    import datetime

    t = datetime.datetime(2020, 1, 1)
    df = spark.createDataFrame([("v1", t), ("v2", None)], "video_id string, archived timestamp")
    out = stamp_archived(df).collect()
    by_id = {r["video_id"]: r["archived"] for r in out}
    assert by_id["v1"] == t
    assert by_id["v2"] is not None
