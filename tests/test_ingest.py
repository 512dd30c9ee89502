"""End-to-end ingest tests (SURVEY.md §5.3): replay fixture files shaped
like the reference's three sources and assert final table states, including
every FIXTURES.md §B edge case."""

import json

import pytest
from pyspark.sql import functions as F

from yark_spark.operators.archive import archive_batch, empty_store, lost_ids, replay_lost
from yark_spark.sources.infodict import read_infodicts
from yark_spark.sources.takeout import (
    dedupe_history,
    read_playlist_csv,
    read_watch_history,
    with_history_ids,
)

FULL_RECORD = {
    "id": "abcdefghij1",
    "fulltitle": "A Video",
    "description": (
        "Enjoy the videos and music you love, upload original content, and share "
        "it all with friends, family, and the world on YouTube."
    ),
    "channel_id": "ch1",
    "channel": "Chan",
    "uploader": "Upl",
    "uploader_id": "u1",
    "channel_url": "https://youtube.com/ch1",
    "channel_follower_count": 10,
    "thumbnail": "https://i.ytimg.com/vi/abc/default.jpg?sqp=xyz",
    "duration": 100,
    "view_count": 500,
    "like_count": 5,
    "age_limit": 0,
    "live_status": "not_live",
    "upload_date": "20240102",
    "availability": "public",
    "width": 1920,
    "height": 1080,
    "fps": 30.0,
    "audio_channels": 2,
    "categories": ["Music", "Other"],
    "tags": ["rock", "live"],
    "filesize_approx": 12345,
    "comments": [
        {
            "id": "c1",
            "author_id": "u2",
            "author": "commenter",
            "text": "first!",
            "like_count": 3,
            "is_favorited": False,
            "author_is_uploader": False,
            "parent": "root",
            "timestamp": 1704200000,
        },
        {
            "id": "c2",
            "author_id": "u3",
            "author": "replier",
            "text": "reply",
            "like_count": 1,
            "is_favorited": True,
            "author_is_uploader": False,
            "parent": "c1",
            "timestamp": 1704200100,
        },
    ],
    "ryd_likes": 7,
    "ryd_dislikes": 2,
    "ryd_rating": 4.5,
    "ryd_viewCount": None,
}

SPARSE_RECORD = {"id": "sparse00000"}  # exercises .get() fallbacks (cmds/archive.py:106-119)
BAD_ID_RECORD = {"id": "short"}        # fails the 11-char regex (utils.py:19-24)


@pytest.fixture(scope="module")
def infodict_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("ingest") / "infodicts.json"
    p.write_text(json.dumps([FULL_RECORD, SPARSE_RECORD, BAD_ID_RECORD]))
    return str(p)


@pytest.fixture(scope="module")
def archived(spark, infodict_path):
    raw = read_infodicts(spark, infodict_path)
    return archive_batch(empty_store(spark), raw)


def test_refine_metadata_parity(archived):
    v = {r["video_id"]: r for r in archived["videos"].collect()}
    full = v["abcdefghij1"]
    assert full["description"] == ""  # default blurb scrubbed (X7, :105)
    assert full["thumbnail_url"].endswith("default.jpg")  # query stripped (X2, :88)
    assert full["likes"] == 7 and full["dislikes"] == 2  # RYD coalesce (X1, :114)
    assert full["views"] == 500  # ryd_viewCount NULL → fallback (X1, :116)
    assert full["category"] == "Music"  # categories[0] (X6, :113)
    assert full["filesize"] == 12345  # rename (X8, :111)
    assert full["upload_timestamp"].year == 2024  # YYYYMMDD parse (X5, :112)
    assert full["archived"] is not None  # default stamp (X15, schema.sql:66)
    sparse = v["sparse00000"]
    assert sparse["title"] is None and sparse["filesize"] is None


def test_bad_id_quarantined_as_lost(archived):
    v = {r["video_id"]: r for r in archived["videos"].collect()}
    assert v["short"]["availability"] == "lost"  # P4 stub (:131-134)
    assert v["short"]["title"] is None


def test_comment_tree_and_sentinel(archived):
    c = {r["comment_id"]: r for r in archived["comments"].collect()}
    assert c["c1"]["parent"] is None  # "root" → NULL (X9, :183)
    assert c["c2"]["parent"] == "c1"
    assert c["c2"]["is_favorited"] is True


def test_fk_graph_tables(archived):
    users = {r["user_id"] for r in archived["users"].collect()}
    assert users == {"u1", "u2", "u3"}  # uploader + comment authors
    tags = {r["name"] for r in archived["tags"].collect()}
    assert tags == {"rock", "live"}
    vt = [(r["video"], r["tag"]) for r in archived["video_tags"].collect()]
    assert sorted(vt) == [("abcdefghij1", "live"), ("abcdefghij1", "rock")]
    ch = archived["channels"].collect()
    assert len(ch) == 1 and ch[0]["name"] == "Chan"


def test_skip_guard_idempotent(spark, archived, infodict_path):
    """P2 (`cmds/archive.py:126-129`): re-archiving the same batch with
    force=False changes nothing."""
    raw = read_infodicts(spark, infodict_path)
    again = archive_batch(archived, raw, force=False)
    for t in ("videos", "users", "channels", "comments", "tags", "video_tags"):
        assert again[t].count() == archived[t].count(), t


def test_lost_replay_recovers(spark, archived):
    """P4/S2 (`cmds/archive.py:355-366`): replaying a lost id with a good
    fetch marks it recovered and fills attributes."""
    assert [r["video_id"] for r in lost_ids(archived).collect()] == ["short"]
    import tempfile, os

    d = tempfile.mkdtemp()
    p = os.path.join(d, "refetch.json")
    with open(p, "w") as f:
        f.write(json.dumps([FULL_RECORD]))
    # build a store with one lost stub for a valid-shaped id
    from yark_spark.sources.infodict import lost_stub
    from yark_spark.operators.writes import insert_ignore

    stub_ids = spark.createDataFrame([("lostvideo01",)], "id string")
    store = dict(empty_store(spark))
    store["videos"] = insert_ignore(store["videos"], lost_stub(stub_ids), ["video_id"])
    refetched = read_infodicts(spark, p).withColumn("id", F.lit("lostvideo01"))
    out, recovered = replay_lost(store, refetched)
    v = {r["video_id"]: r for r in out["videos"].collect()}
    assert v["lostvideo01"]["availability"] == "recovered"
    assert v["lostvideo01"]["title"] == "A Video"
    assert recovered.collect()[0]["recovered"] == 1


WATCH_HISTORY = [
    {"titleUrl": "https://www.youtube.com/watch?v=abcdefghij1", "time": "2024-04-09T12:34:56Z"},
    {"titleUrl": "https://www.youtube.com/watch?v=abcdefghij1", "time": "2024-04-09T12:34:56Z"},  # exact dup (F4)
    {"titleUrl": "https://www.youtube.com/watch?v=danglingvid", "time": "2024-04-10T00:00:00Z"},  # no videos row
    {"time": "2024-04-11T00:00:00Z"},  # missing titleUrl → unavailable (P5)
]


def test_watch_history_ingest(spark, tmp_path):
    p = tmp_path / "watch-history.json"
    p.write_text(json.dumps(WATCH_HISTORY))
    h = read_watch_history(spark, str(p))
    assert h.count() == 4
    unavailable = h.filter(F.col("video").isNull()).count()
    assert unavailable == 1  # P5 counter (:333-335)
    deduped = dedupe_history(h)
    assert deduped.count() == 2  # dup suppressed (F4, :340-341)
    with_ids = with_history_ids(deduped)
    ids = [r["history_id"] for r in with_ids.orderBy("history_id").collect()]
    assert ids == [1, 2]
    # dangling id survives by design (schema.sql:72)
    assert deduped.filter(F.col("video") == "danglingvid").count() == 1


def test_playlist_csv_ingest(spark, tmp_path):
    p = tmp_path / "My Mix videos.csv"
    p.write_text(
        "Video ID,Time Added\n"
        "abcdefghij1,2024-01-01 10:00:00\n"
        " spacedid001,2024-01-02 10:00:00\n"   # leading space stripped (X10, :304)
        "novaluetime,\n"                        # empty timestamp
    )
    playlists, playlist_videos = read_playlist_csv(spark, str(p))
    pl = playlists.collect()[0]
    assert pl["playlist_id"] == "PLLOCAL_My_Mix"  # suffix stripped + synthetic PK (X11)
    assert pl["title"] == "My Mix"
    vids = {r["video"]: r for r in playlist_videos.collect()}
    assert set(vids) == {"abcdefghij1", "spacedid001", "novaluetime"}
    assert vids["novaluetime"]["added"] is None
