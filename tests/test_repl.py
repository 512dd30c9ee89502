"""REPL dispatch tests (P7, `yark.py:18-34`) — scripted input, captured
output, shared session."""

import json

import pytest

from yark_spark.operators.store import ParquetStore
from yark_spark.repl import Repl

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
    }
]


@pytest.fixture()
def repl(spark, tmp_path):
    lines_in: list[str] = []
    lines_out: list[str] = []
    r = Repl(
        spark,
        str(tmp_path / "store"),
        config_path=str(tmp_path / "configs.json"),
        input_fn=lambda _prompt="": lines_in.pop(0),
        print_fn=lambda *a: lines_out.append(" ".join(str(x) for x in a)),
    )
    r._in, r._out = lines_in, lines_out
    return r


def test_unknown_command_and_subcommand(repl):
    with pytest.raises(NameError, match="Command Frobnicate does not exist."):
        repl.dispatch("frobnicate now")
    with pytest.raises(ValueError, match='Invalid sub-command: "nope"'):
        repl.dispatch("archive nope")


def test_help_surfaces(repl):
    repl.dispatch("help")
    assert any("Command structure" in line for line in repl._out)
    repl.dispatch("help unarchive")
    assert any("DELETES things" in line for line in repl._out)
    with pytest.raises(NameError, match="Command Zap does not exist."):
        repl.dispatch("help zap")
    # no sub-command → the command's own doc (`cmds/__init__.py:8`)
    repl.dispatch("archive")
    assert any("archive video" in line for line in repl._out)


def test_confirm_fuzzy_classification(repl):
    """X16 (`utils.py:45-50`): yes → True; maybe/unknown/no → False with
    the reference's replies."""
    repl._in.extend(["sure", "maybe", "xyzzy", "no"])
    assert repl.confirm("Delete ?") is True
    assert repl.confirm("Delete ?") is False
    assert "I'll let you think about it." in repl._out
    assert repl.confirm("Delete ?") is False
    assert "What ?" in repl._out
    assert repl.confirm("Delete ?") is False


def test_archive_and_unarchive_roundtrip(spark, tmp_path, repl):
    p = tmp_path / "batch.json"
    p.write_text(json.dumps(INFODICTS))
    assert repl.dispatch(f"archive video {p}") == 0
    store = ParquetStore(spark, repl.store)
    assert store.read("videos").count() == 1
    # confirmation gate: declining leaves the row in place
    repl._in.append("nah")
    repl.dispatch("unarchive video abcdefghij1")
    assert store.read("videos").count() == 1
    assert "Aborting ..." in repl._out
    repl._in.append("yes")
    assert repl.dispatch("unarchive video abcdefghij1") == 0
    assert store.read("videos").count() == 0


def test_unarchive_all_playlists(spark, tmp_path, repl):
    # the REPL tokenizes on whitespace with no quoting, exactly like the
    # reference (`yark.py:20`), so the path must be space-free
    csv = tmp_path / "Mix.csv"
    csv.write_text("Video ID,Time Added\nabcdefghij1,2024-01-01 10:00:00\n")
    assert repl.dispatch(f"archive playlist {csv}") == 0
    repl._in.append("yes")
    assert repl.dispatch("unarchive playlist *") == 0
    store = ParquetStore(spark, repl.store)
    assert store.read("playlists").count() == 0
    assert store.read("playlist_videos").count() == 0


def test_config_show_and_get(repl):
    repl.dispatch("config")
    assert any(line.startswith("get_comments:") for line in repl._out)
    repl.dispatch("config get get_comments false")
    assert any("set to <False>" in line for line in repl._out)
    repl._out.clear()
    repl.dispatch("config")
    assert any(line == "get_comments: False" for line in repl._out)
    with pytest.raises(ValueError, match="does not exist"):
        repl.dispatch("config get bogus true")
    with pytest.raises(ValueError, match="True or False \\?"):
        repl.dispatch("config get get_comments")


def test_exit_and_loop_error_recovery(repl):
    with pytest.raises(SystemExit):
        repl.dispatch("exit")
    # run(): bad command prints the error and the loop continues to exit
    repl._in.extend(["frobnicate", "exit"])
    repl.run()
    assert any("does not exist" in line for line in repl._out)


def test_playlist_failure_does_not_prompt_overwrite(tmp_path, repl):
    """ADVICE r2 #4: a failure other than already-exists (here: missing
    file) must NOT trigger the overwrite confirmation / --yes retry."""
    import pytest

    with pytest.raises(Exception):
        repl.dispatch(f"archive playlist {tmp_path}/nope.csv")
    assert not any("confirm" in line for line in repl._out)


def test_playlist_exists_prompts_then_overwrites(tmp_path, repl):
    csv = tmp_path / "Mix2.csv"
    csv.write_text("Video ID,Time Added\nabcdefghij1,2024-01-01 10:00:00\n")
    assert repl.dispatch(f"archive playlist {csv}") == 0
    repl._in.append("yes")
    assert repl.dispatch(f"archive playlist {csv}") == 0
