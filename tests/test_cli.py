"""CLI command tests (P7 surface) — driven through main(argv) with the
shared session (subprocess startup is ~10 s/command; the verify recipe
covers one real subprocess run)."""

import json

import pytest
from pyspark.sql import functions as F

from yark_spark import cli
from yark_spark.operators.store import ParquetStore

INFODICTS = [
    {
        "id": "abcdefghij1",
        "fulltitle": "T1",
        "channel_id": "ch1",
        "channel": "Chan",
        "uploader_id": "u1",
        "uploader": "U",
        "duration": 5,
        "filesize_approx": 9,
        "thumbnail": "https://img/x.jpg?sig=1",
        "tags": ["x"],
        "comments": [],
    },
    {"id": "bad"},
]


@pytest.fixture()
def store_dir(tmp_path):
    return str(tmp_path / "store")


def _archive(spark, tmp_path, store_dir):
    p = tmp_path / "batch.json"
    p.write_text(json.dumps(INFODICTS))
    rc = cli.main(["archive-video", str(p), "--store", store_dir], spark=spark)
    assert rc == 0


def test_archive_and_lost_roundtrip(spark, tmp_path, store_dir, capsys):
    _archive(spark, tmp_path, store_dir)
    rc = cli.main(["lost", "--store", store_dir], spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert "bad" in out


def test_history_command(spark, tmp_path, store_dir):
    p = tmp_path / "wh.json"
    p.write_text(
        json.dumps(
            [
                {"titleUrl": "https://youtube.com/watch?v=abcdefghij1", "time": "2024-01-01T10:00:00Z"},
                {"titleUrl": "https://youtube.com/watch?v=abcdefghij1", "time": "2024-01-01T10:00:00Z"},
            ]
        )
    )
    rc = cli.main(["archive-history", str(p), "--store", store_dir], spark=spark)
    assert rc == 0
    store = ParquetStore(spark, store_dir)
    assert store.read("history").count() == 1  # F4 dedup
    # re-run: idempotent (anti-join vs store)
    rc = cli.main(["archive-history", str(p), "--store", store_dir], spark=spark)
    assert rc == 0
    assert store.read("history").count() == 1


def test_playlist_overwrite_gate(spark, tmp_path, store_dir, capsys):
    p = tmp_path / "My Mix videos.csv"
    p.write_text("Video ID,Time Added\nabcdefghij1,2024-01-01 10:00:00\n")
    assert cli.main(["archive-playlist", str(p), "--store", store_dir], spark=spark) == 0
    # second run without --yes → refused (P6 confirm barrier)
    assert cli.main(["archive-playlist", str(p), "--store", store_dir], spark=spark) == cli.RC_PLAYLIST_EXISTS
    assert "--yes" in capsys.readouterr().err
    assert (
        cli.main(["archive-playlist", str(p), "--store", store_dir, "--yes"], spark=spark) == 0
    )
    store = ParquetStore(spark, store_dir)
    assert store.read("playlist_videos").count() == 1  # overwrite, not append


def test_delete_video_cascades(spark, tmp_path, store_dir):
    _archive(spark, tmp_path, store_dir)
    store = ParquetStore(spark, store_dir)
    assert store.read("video_tags").count() == 1
    assert cli.main(["delete-video", "abcdefghij1", "--store", store_dir], spark=spark) == 1  # no --yes
    assert (
        cli.main(["delete-video", "abcdefghij1", "--store", store_dir, "--yes"], spark=spark) == 0
    )
    assert store.read("videos").filter(F.col("video_id") == "abcdefghij1").count() == 0
    assert store.read("video_tags").count() == 0  # cascaded


def test_delete_playlist_star_deletes_all(spark, tmp_path, store_dir, capsys):
    """W6 `delete-playlist '*' --yes` (`cmds/archive.py:421-425`)."""
    for name in ("A videos.csv", "B videos.csv"):
        p = tmp_path / name
        p.write_text("Video ID,Time Added\nabcdefghij1,2024-01-01 10:00:00\n")
        assert cli.main(["archive-playlist", str(p), "--store", store_dir], spark=spark) == 0
    store = ParquetStore(spark, store_dir)
    assert store.read("playlists").count() == 2
    # confirm gate (P6)
    assert cli.main(["delete-playlist", "*", "--store", store_dir], spark=spark) == 1
    assert "--yes" in capsys.readouterr().err
    # single-id delete cascades only that playlist's rows
    pid = store.read("playlists").orderBy("playlist_id").collect()[0]["playlist_id"]
    assert cli.main(["delete-playlist", pid, "--store", store_dir, "--yes"], spark=spark) == 0
    assert store.read("playlists").count() == 1
    assert store.read("playlist_videos").count() == 1
    # star wipes the rest
    assert cli.main(["delete-playlist", "*", "--store", store_dir, "--yes"], spark=spark) == 0
    assert store.read("playlists").count() == 0
    assert store.read("playlist_videos").count() == 0


def test_delete_channel_restricted(spark, tmp_path, store_dir, capsys):
    _archive(spark, tmp_path, store_dir)
    rc = cli.main(["delete-channel", "ch1", "--store", store_dir, "--yes"], spark=spark)
    assert rc == 1  # RESTRICT: videos still reference ch1
    assert "refused" in capsys.readouterr().err


def test_query_command(spark, tmp_path, store_dir, capsys):
    _archive(spark, tmp_path, store_dir)
    rc = cli.main(
        ["query", "SELECT count(*) AS n FROM videos", "--store", store_dir], spark=spark
    )
    assert rc == 0
    assert "2" in capsys.readouterr().out  # good row + lost stub


def test_load_fetcher_resolves_and_rejects():
    from yark_spark.sources.fetch import load_fetcher

    assert load_fetcher("json:dumps")("x") == '"x"'
    with pytest.raises(ValueError):
        load_fetcher("no-colon")
    with pytest.raises(TypeError):
        load_fetcher("json:__name__")


def test_replay_command_streams_lost_queue(spark, tmp_path, store_dir, capsys):
    """The replay path is DataFrames end-to-end (VERDICT r1 item 7): lost
    ids -> fetch -> re-archive without collecting the id set. json:dumps is
    a picklable 'fetcher' whose payload fails infodict parsing, so the lost
    stub stays lost — the wiring (fetch join, counts, store writes) is what
    this pins."""
    _archive(spark, tmp_path, store_dir)
    rc = cli.main(
        ["replay", "--store", store_dir, "--fetcher", "json:dumps"], spark=spark
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "recovered: 0" in out
    # json:dumps "succeeds" at fetch level (payload present), so the fetch
    # quarantine is empty; the invalid payload is re-quarantined by
    # archive_batch, which the store-level assertion below pins.
    assert "still lost: 0" in out
    store = ParquetStore(spark, store_dir)
    assert store.read("videos").filter(F.col("availability") == "lost").count() == 1
