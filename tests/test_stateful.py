"""applyInPandasWithState session-tracker tests: custom per-key state with
gap-based session closing and event-time timeouts across micro-batches."""

import json
import os

from pyspark.sql.types import LongType, StringType, StructField, StructType, TimestampType

from yark_spark.streaming.pipelines import read_event_stream
from yark_spark.streaming.stateful import track_sessions

SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("video", StringType()),
        StructField("watched", TimestampType()),
    ]
)


def _write(d, name, rows):
    with open(os.path.join(d, name), "w") as f:
        for user, video, watched in rows:
            f.write(json.dumps({"user_id": user, "video": video, "watched": watched}) + "\n")


def _drain(spark, src, ckpt, out_dir):
    # parquet sink: the only sink supporting checkpoint recovery, which the
    # cross-run state assertions need
    q = (
        track_sessions(read_event_stream(spark, str(src), SCHEMA))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not terminate"
    return spark.read.parquet(out_dir).collect()


def test_sessions_close_on_gap_and_timeout(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _write(
        src,
        "b1.json",
        [
            (1, "v1", "2024-01-01T10:00:00Z"),
            (1, "v2", "2024-01-01T10:10:00Z"),
            (1, "v2", "2024-01-01T12:00:00Z"),  # >30min gap → closes session 1
            (2, "v9", "2024-01-01T10:00:00Z"),  # will close via event-time timeout
        ],
    )
    out_dir = str(tmp_path / "out")
    rows = _drain(spark, src, ckpt, out_dir)
    closed1 = [r for r in rows if r["user_id"] == 1 and r["status"] == "closed"]
    assert len(closed1) == 1
    s = closed1[0]
    assert s["n_events"] == 2 and s["n_videos"] == 2
    assert str(s["session_start"]).startswith("2024-01-01 10:00:00")
    assert str(s["session_end"]).startswith("2024-01-01 10:10:00")

    # batch 2: user 1 continues (12:00→12:20 within gap), then 14:00 opens a
    # new session, closing 12:00-12:20. user 2's 10:00 session times out as
    # the watermark (14:00 − 10 min) passes 10:30.
    _write(src, "b2.json", [(1, "v3", "2024-01-01T12:20:00Z"), (1, "v4", "2024-01-01T14:00:00Z")])
    rows2 = _drain(spark, src, ckpt, out_dir)
    u1 = [r for r in rows2 if r["user_id"] == 1 and r["status"] == "closed"]
    assert any(
        r["n_events"] == 2 and str(r["session_start"]).startswith("2024-01-01 12:00:00")
        and str(r["session_end"]).startswith("2024-01-01 12:20:00")
        for r in u1
    ), rows2

    # user 2's timeout-closed session arrives in run 1 or 2 depending on
    # when the cleanup batch fires — by the end of run 2 it must exist
    # (rows2 re-reads the whole output dir, so it includes run-1 rows)
    all_rows = rows2
    u2 = [r for r in all_rows if r["user_id"] == 2 and r["status"] == "closed"]
    assert len(u2) >= 1, all_rows
    assert u2[0]["n_events"] == 1 and str(u2[0]["session_end"]).startswith("2024-01-01 10:00:00")
