"""transformWithStateInPandas sessionizer (Spark 4 arbitrary stateful
streaming): named ValueState + explicit event-time timers in the RocksDB
state store. Pins (1) state persistence and timer eviction across >=3
micro-batches and (2) exact equivalence with the ORACLE-CHECKED batch
sessionizer q_sessionize on the real events fixture."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from yark_spark.io import load_table
from yark_spark.queries import QUERIES
from yark_spark.streaming.pipelines import read_event_stream
from yark_spark.streaming.stateful import track_sessions_tws

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
            f.write(
                json.dumps({"user_id": user, "video": video, "watched": watched})
                + "\n"
            )


def _drain(spark, src, ckpt, out_dir, fmt="json"):
    q = (
        track_sessions_tws(read_event_stream(spark, str(src), SCHEMA, fmt=fmt))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not terminate"
    return spark.read.parquet(out_dir).collect()


def test_state_persists_and_evicts_across_microbatches(spark, tmp_path):
    """Four sequential checkpointed runs (>= 4 micro-batches): batch 1
    opens sessions; batch 2 continues one (state PERSISTED across the
    batch boundary) while the watermark passes another's deadline (timer
    EVICTS it); batches 3-4 prove the evicted key's state is truly gone —
    its next event starts a fresh session with a reset count.

    Timer firing is asserted with one-run slack (a run's final watermark
    advance may fire timers in that run's cleanup batch or at the start
    of the next run — both are correct event-time semantics)."""
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    _write(
        src,
        "b1.json",
        [
            (1, "v1", "2024-01-01T10:00:00Z"),
            (1, "v2", "2024-01-01T10:10:00Z"),
            (2, "v9", "2024-01-01T10:00:00Z"),
        ],
    )
    rows1 = _drain(spark, src, ckpt, out_dir)
    # watermark ends at 10:10-10min = 10:00 < every deadline: nothing closes
    assert rows1 == []

    # user 1 continues within the gap (10:10 -> 10:20: state must have
    # survived the batch boundary, deadline moves to 10:50); user 3's
    # 10:45 event pushes the watermark to 10:35 — past user 2's 10:30
    # deadline, NOT past user 1's
    _write(
        src,
        "b2.json",
        [
            (1, "v3", "2024-01-01T10:20:00Z"),
            (3, "vx", "2024-01-01T10:45:00Z"),
        ],
    )
    rows2 = _drain(spark, src, ckpt, out_dir)
    # user 1 must NOT have closed (watermark 10:35 < deadline 10:50): a
    # missing-state bug would emit a partial session here
    assert [r for r in rows2 if r["user_id"] == 1] == []

    # batch 3: user 2 returns AFTER its eviction; 20:00 pushes the
    # watermark to 19:50, past user 1's 10:50 deadline
    _write(
        src,
        "b3.json",
        [
            (2, "vz", "2024-01-01T16:00:00Z"),
            (3, "vy", "2024-01-01T20:00:00Z"),
        ],
    )
    rows3 = _drain(spark, src, ckpt, out_dir)
    # user 2's FIRST session must have fired by now (deadline 10:30 was
    # passed back in run 2): exactly one event, original timestamps. The
    # 16:00 return MAY also have closed already (run 3's own cleanup
    # batch sees watermark 19:50 > deadline 16:30) — run 4 asserts it
    # definitively.
    u2 = [(str(r["session_start"])[:19], r["n_events"]) for r in rows3 if r["user_id"] == 2]
    assert ("2024-01-01 10:00:00", 1) in u2
    assert set(u2) <= {("2024-01-01 10:00:00", 1), ("2024-01-01 16:00:00", 1)}

    # batch 4: pure watermark push (23:00 -> 22:50) so every pre-16:30
    # deadline has certainly fired
    _write(src, "b4.json", [(3, "vw", "2024-01-01T23:00:00Z")])
    rows4 = _drain(spark, src, ckpt, out_dir)
    u1 = [r for r in rows4 if r["user_id"] == 1]
    assert len(u1) == 1 and u1[0]["n_events"] == 3
    assert str(u1[0]["session_start"]).startswith("2024-01-01 10:00:00")
    assert str(u1[0]["session_end"]).startswith("2024-01-01 10:20:00")
    # user 2's 16:00 return started a FRESH session (start 16:00, count 1,
    # not a resumed 10:00/2-event one): eviction removed state, not just
    # output
    u2_all = [r for r in rows4 if r["user_id"] == 2]
    assert sorted(
        (str(r["session_start"])[:19], r["n_events"]) for r in u2_all
    ) == [("2024-01-01 10:00:00", 1), ("2024-01-01 16:00:00", 1)]


def test_tws_sessions_equal_oracle_checked_batch_sessionize(spark, sf_dir, tmp_path):
    """Twin equivalence on the real events fixture: stream the fixture
    through the transformWithState sessionizer, push the watermark past
    every real deadline with sentinel events, and the closed sessions
    must EXACTLY equal the sessions derived from the oracle-checked
    q_sessionize (same 30-min gap semantics)."""
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    # parquet source, not JSON: Spark's JSON writer truncates timestamps
    # to milliseconds, which would corrupt the microsecond gap arithmetic
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.lit("v").alias("video"), F.col("ts").alias("watched")
    )
    ev.coalesce(1).write.parquet(str(src / "fixture"))
    _drain(spark, src / "fixture", ckpt, out_dir, fmt="parquet")

    # two sentinel batches: the first advances the watermark past every
    # real session deadline; the second makes the first's timers fire even
    # if no cleanup batch ran at the end of the previous drain
    for ts in ("2024-03-01T00:00:00Z", "2024-03-02T00:00:00Z"):
        spark.createDataFrame(
            [(-1, "s", ts)], "user_id long, video string, watched string"
        ).select(
            "user_id", "video", F.to_timestamp("watched").alias("watched")
        ).write.mode("append").parquet(str(src / "fixture"))
        rows = _drain(spark, src / "fixture", ckpt, out_dir, fmt="parquet")

    got = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in rows
        if r["user_id"] >= 0
    }
    idx = QUERIES["q_sessionize"](spark, sf_dir)
    expected = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in (
            idx.join(
                load_table(spark, sf_dir, "events").select("event_id", "ts"),
                "event_id",
            )
            .groupBy("user_id", "session_idx")
            .agg(
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .collect()
        )
    }
    assert got == expected


def test_tws_burst_dedup_equals_oracle_checked_batch_twin(spark, sf_dir, tmp_path):
    """MapState variant: stream the real events fixture through the
    transformWithState burst dedup (per-user map type → last-seen, 5-min
    horizon) and the surviving event_ids must EXACTLY equal the
    oracle-checked q_event_dedup_burst. Every verdict depends only on
    earlier rows, so a single drained batch reproduces the batch result
    with no sentinel/watermark games."""
    from yark_spark.streaming.stateful import dedup_bursts_tws

    src = tmp_path / "src"
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    ev.coalesce(1).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        dedup_bursts_tws(stream)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {r.event_id for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    expected = {r.event_id for r in QUERIES["q_event_dedup_burst"](spark, sf_dir).collect()}
    assert got == expected


def test_tws_burst_dedup_state_prunes_and_reemits_across_batches(spark, tmp_path):
    """Across checkpointed runs: a type re-appearing INSIDE the horizon is
    suppressed (map state persisted), a type re-appearing AFTER the
    horizon re-emits as a fresh first (and its old entry is prunable
    without changing semantics)."""
    import json
    import os

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from yark_spark.streaming.pipelines import read_event_stream
    from yark_spark.streaming.stateful import dedup_bursts_tws

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    src = tmp_path / "src"
    src.mkdir()

    def write(name, rows):
        with open(os.path.join(src, name), "w") as f:
            for eid, uid, et, ts in rows:
                f.write(
                    json.dumps(
                        {"event_id": eid, "user_id": uid, "event_type": et, "ts": ts}
                    )
                    + "\n"
                )

    def drain():
        q = (
            dedup_bursts_tws(read_event_stream(spark, str(src), schema))
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
        return {r.event_id for r in spark.read.parquet(str(tmp_path / "out")).collect()}

    write(
        "b1.json",
        [
            (1, 7, "view", "2024-01-01T10:00:00Z"),
            (2, 7, "view", "2024-01-01T10:02:00Z"),  # within 5 min: suppressed
            (3, 7, "click", "2024-01-01T10:00:30Z"),
        ],
    )
    assert drain() == {1, 3}
    # batch 2: view at 10:04 still inside the run (gap 2 min from 10:02 -
    # state survived the restart); click at 11:00 is past the horizon
    write(
        "b2.json",
        [
            (4, 7, "view", "2024-01-01T10:04:00Z"),
            (5, 7, "click", "2024-01-01T11:00:00Z"),
        ],
    )
    assert drain() == {1, 3, 5}
    # batch 3: far future event advances the watermark beyond every
    # horizon (timer prunes the map), then a final view re-emits as first
    write("b3.json", [(6, 99, "tick", "2024-01-02T00:00:00Z")])
    write("b4.json", [(7, 7, "view", "2024-01-02T01:00:00Z")])
    assert drain() == {1, 3, 5, 6, 7}
