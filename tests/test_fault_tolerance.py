"""Streaming fault tolerance (VERDICT r6 next-round item 3): checkpoint
kill/restart recovery and foreachBatch replay idempotence.

Crash simulation: Structured Streaming's recovery contract is that a batch
whose offsets are written but whose commit marker is missing gets RE-RUN
on restart (at-least-once into the sink). Deleting the newest
``<checkpoint>/commits/N`` file reproduces exactly the crash window
"sink side effects may have happened, checkpoint commit lost", so the
replay path runs for real — the sink must converge, not duplicate.
"""

import glob
import json
import os
import sqlite3

from pyspark.sql.types import LongType, StringType, StructField, StructType, TimestampType

from yark_spark.streaming.pipelines import (
    interval_join,
    read_event_stream,
    watermarked_dedup,
)

HISTORY_SCHEMA = StructType(
    [StructField("video", StringType()), StructField("watched", TimestampType())]
)


def _write_history(d, name, rows):
    with open(os.path.join(d, name), "w") as f:
        for video, watched in rows:
            f.write(json.dumps({"video": video, "watched": watched}) + "\n")


def _drop_last_commits(ckpt: str, n: int = 1) -> int:
    """Delete the newest ``n`` commit markers (and their Hadoop .crc
    sidecars — ChecksumFileSystem refuses the re-commit rename over a
    stale sidecar) — the crash between sink write and checkpoint commit.
    Offsets stay intact, so restart re-runs those batches with the SAME
    batch ids. Returns the oldest replayed batch id. n=2 reaches past the
    trailing no-data watermark-commit batch availableNow appends, so the
    DATA batch actually replays."""
    commits = sorted(
        (
            p
            for p in glob.glob(os.path.join(ckpt, "commits", "*"))
            if os.path.basename(p).isdigit()
        ),
        key=lambda p: int(os.path.basename(p)),
    )
    assert len(commits) >= n, "not enough committed batches to drop"
    for p in commits[-n:]:
        os.remove(p)
        crc = os.path.join(os.path.dirname(p), f".{os.path.basename(p)}.crc")
        if os.path.exists(crc):
            os.remove(crc)
    return int(os.path.basename(commits[-n]))


def test_db_sink_replayed_batch_is_noop(spark, tmp_path):
    """foreachBatch idempotence by batch replay: after dropping the last
    commit marker, restart re-runs the same micro-batch into the DB sink;
    INSERT OR IGNORE on the natural key makes the replay a no-op, and
    subsequent fresh batches still land."""
    from yark_spark.operators.db_sink import db_history_sink

    db_path = str(tmp_path / "replay.db")
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _write_history(
        src, "b1.json",
        [("v1", "2024-01-01T10:00:00Z"), ("v2", "2024-01-01T11:00:00Z")],
    )

    def drain():
        stream = watermarked_dedup(
            read_event_stream(spark, str(src), HISTORY_SCHEMA),
            ["video", "watched"], "watched",
        )
        sink = db_history_sink(
            lambda: sqlite3.connect(db_path, timeout=60), stream, ckpt
        )
        q = sink.trigger(availableNow=True).start()
        q.awaitTermination()

    drain()
    with sqlite3.connect(db_path) as conn:
        assert conn.execute("SELECT count(*) FROM history").fetchone()[0] == 2

    # crash window: sink wrote, commit marker lost -> restart replays batch
    _drop_last_commits(ckpt, n=2)
    drain()
    with sqlite3.connect(db_path) as conn:
        rows = conn.execute(
            "SELECT video, count(*) FROM history GROUP BY video"
        ).fetchall()
    assert dict(rows) == {"v1": 1, "v2": 1}  # replay was a no-op, no dups

    # recovery done: fresh data still flows through the same checkpoint
    _write_history(src, "b2.json", [("v3", "2024-01-01T11:30:00Z")])
    drain()
    with sqlite3.connect(db_path) as conn:
        vids = sorted(r[0] for r in conn.execute("SELECT video FROM history"))
    assert vids == ["v1", "v2", "v3"]


def test_dedup_state_survives_restart_and_replay(spark, tmp_path):
    """Kill/restart for the stateful dedup pipeline: dropping the last
    commit and restarting must re-emit the replayed batch to the FILE sink
    exactly once (the sink's _spark_metadata log dedups the re-run), and
    the dedup state restored from the checkpoint still suppresses
    cross-restart duplicates afterwards."""
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _write_history(
        src, "b1.json",
        [("v1", "2024-01-01T10:00:00Z"), ("v2", "2024-01-01T11:00:00Z")],
    )

    def drain():
        deduped = watermarked_dedup(
            read_event_stream(spark, str(src), HISTORY_SCHEMA),
            ["video", "watched"], "watched", "10 minutes",
        )
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert spark.read.parquet(out).count() == 2

    _drop_last_commits(ckpt, n=2)
    drain()  # replayed batches: file-sink txn log must dedup the re-run
    assert spark.read.parquet(out).count() == 2

    # state recovered: an in-horizon duplicate from before the crash is
    # still suppressed; a fresh row passes
    _write_history(
        src, "b2.json",
        [("v2", "2024-01-01T11:00:00Z"), ("v3", "2024-01-01T11:05:00Z")],
    )
    drain()
    vids = sorted(r.video for r in spark.read.parquet(out).collect())
    assert vids == ["v1", "v2", "v3"]


def test_interval_join_state_survives_restart(spark, tmp_path):
    """Stream-stream join state recovery: a view consumed BEFORE the
    restart can only match a purchase arriving AFTER the restart if the
    join state store was restored from the checkpoint."""
    src_v = tmp_path / "views"
    src_p = tmp_path / "purchases"
    src_v.mkdir()
    src_p.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    v_schema = StructType(
        [
            StructField("view_id", LongType()),
            StructField("user_id", LongType()),
            StructField("v_ts", TimestampType()),
        ]
    )
    p_schema = StructType(
        [
            StructField("purchase_id", LongType()),
            StructField("user_id", LongType()),
            StructField("p_ts", TimestampType()),
        ]
    )

    def write_rows(d, name, key, idc, rows):
        with open(d / name, "w") as f:
            for eid, uid, ts in rows:
                f.write(json.dumps({idc: eid, "user_id": uid, key: ts}) + "\n")

    def drain():
        sv = read_event_stream(spark, str(src_v), v_schema)
        sp = read_event_stream(spark, str(src_p), p_schema)
        q = (
            interval_join(sv, sp)
            .select("view_id", "purchase_id")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: view 1 enters join state; unrelated purchase keeps the
    # watermark low so the state is retained
    write_rows(src_v, "b1.json", "v_ts", "view_id", [(1, 100, "2024-01-01T10:00:00Z")])
    write_rows(
        src_p, "b1.json", "p_ts", "purchase_id", [(99, 999, "2024-01-01T10:01:00Z")]
    )
    drain()
    assert spark.read.parquet(out).count() == 0  # nothing matched yet

    # run 2 (fresh query object, same checkpoint): the matching purchase
    # arrives — pairing requires view 1's row restored from state
    write_rows(
        src_p, "b2.json", "p_ts", "purchase_id", [(10, 100, "2024-01-01T10:30:00Z")]
    )
    drain()
    got = {(r.view_id, r.purchase_id) for r in spark.read.parquet(out).collect()}
    assert got == {(1, 10)}

    # crash+replay on the joined output: no duplicate pairs
    _drop_last_commits(ckpt, n=1)
    drain()
    pairs = [(r.view_id, r.purchase_id) for r in spark.read.parquet(out).collect()]
    assert pairs == [(1, 10)]


def test_multi_table_commit_killed_midway_keeps_old_snapshot(spark, tmp_path):
    """Cross-table ingest atomicity (ParquetStore.commit_tables): a job
    killed between one table's staging and another's must leave readers
    on the PREVIOUS consistent snapshot of every table — no dims without
    facts. The kill is simulated by failing the second table's staging
    write; the commit manifest is the single atomic flip, so nothing
    staged before the failure is visible."""
    import pytest

    from yark_spark.operators.store import ParquetStore

    store = ParquetStore(spark, str(tmp_path / "store"))
    # consistent snapshot 0: one parent (channels) + one child (videos)
    store.commit_tables(
        {
            "channels": spark.createDataFrame([(1, "c1")], "id long, name string"),
            "videos": spark.createDataFrame([(10, 1)], "vid long, channel long"),
        }
    )

    real_stage = store._stage

    def failing_stage(name, df, partition_by=None, sort_by=None):
        if name == "videos":
            raise RuntimeError("killed between dim and fact writes")
        return real_stage(name, df, partition_by, sort_by)

    store._stage = failing_stage
    with pytest.raises(RuntimeError, match="killed"):
        store.commit_tables(
            {
                "channels": spark.createDataFrame(
                    [(1, "c1"), (2, "c2")], "id long, name string"
                ),
                "videos": spark.createDataFrame(
                    [(10, 1), (20, 2)], "vid long, channel long"
                ),
            }
        )
    store._stage = real_stage

    # readers (fresh store handle = fresh manifest read) see snapshot 0 for
    # BOTH tables: the staged channels v-dir exists on disk but is invisible
    fresh = ParquetStore(spark, str(tmp_path / "store"))
    assert [r.id for r in fresh.read("channels").collect()] == [1]
    assert [r.vid for r in fresh.read("videos").collect()] == [10]

    # a successful retry commits BOTH tables together
    fresh.commit_tables(
        {
            "channels": spark.createDataFrame(
                [(1, "c1"), (2, "c2")], "id long, name string"
            ),
            "videos": spark.createDataFrame(
                [(10, 1), (20, 2)], "vid long, channel long"
            ),
        }
    )
    assert sorted(r.id for r in fresh.read("channels").collect()) == [1, 2]
    assert sorted(r.vid for r in fresh.read("videos").collect()) == [10, 20]


def test_streaming_archive_sink_atomic_and_recovers_exactly_once(spark, tmp_path):
    """Round 9 (VERDICT r8 next-round #3): the streaming archive sink
    commits each micro-batch's whole table graph through
    ParquetStore.commit_tables. A kill between the dimension stagings and
    the videos fact staging inside a micro-batch must leave readers on
    the previous consistent multi-table snapshot (no new channels without
    their videos); restarting the query from the checkpoint replays the
    batch and converges to exactly-once table state."""
    import json as _json

    import pytest

    from yark_spark.operators.store import ParquetStore
    from yark_spark.sources.infodict import INFODICT_SCHEMA
    from yark_spark.streaming.pipelines import archive_sink, read_event_stream, run_available_now

    def infodict(i):
        return {
            "id": f"vid{i:08d}",
            "fulltitle": f"title {i}",
            "description": "d",
            "channel_id": f"chan{i}",
            "channel": f"Channel {i}",
            "uploader": f"Uploader {i}",
            "uploader_id": f"user{i}",
            "duration": 100 + i,
            "view_count": 10 * i,
            "like_count": i,
            "upload_date": "20240102",
            "availability": "public",
            "filesize_approx": 1000 + i,
            "tags": ["t"],
            "categories": ["Music"],
        }

    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    store = ParquetStore(spark, str(tmp_path / "store"))

    def write_file(name, ids):
        with open(src / name, "w") as f:
            for i in ids:
                f.write(_json.dumps(infodict(i)) + "\n")

    def drain():
        raw = read_event_stream(
            spark, str(src), INFODICT_SCHEMA, fmt="json", max_files_per_trigger=1
        )
        run_available_now(archive_sink(store, raw, ckpt))

    # micro-batch 0: a consistent first snapshot
    write_file("b0.json", [0, 1])
    drain()
    assert store.read("videos").count() == 2
    assert store.read("channels").count() == 2

    # micro-batch 1 is killed between dims and the videos fact: channels
    # stage before videos in the commit (ALL_TABLES order), so the staged
    # dims exist on disk but no manifest flip happened
    write_file("b1.json", [2, 3])
    real_stage = store._stage

    def failing_stage(name, df, partition_by=None, sort_by=None):
        if name == "videos":
            raise RuntimeError("killed between dim and fact writes")
        return real_stage(name, df, partition_by, sort_by)

    store._stage = failing_stage
    with pytest.raises(Exception, match="killed between dim and fact"):
        drain()
    store._stage = real_stage

    fresh = ParquetStore(spark, str(tmp_path / "store"))
    assert sorted(r.channel_id for r in fresh.read("channels").collect()) == [
        "chan0",
        "chan1",
    ]
    assert fresh.read("videos").count() == 2  # old snapshot, fully consistent

    # round 14: the killed batch must not have advanced the Delta-shaped
    # time-travel log either (no manifest flip → no log commit)
    log_after_kill = fresh.log_version()

    # restart from the checkpoint: the replayed batch converges to
    # exactly-once state AND exactly-once LOG VERSIONS — the log
    # advances once for the replayed batch, then a full re-drain of the
    # same files is a no-op at both layers
    store._stage = real_stage
    drain()
    assert store.read("videos").count() == 4
    v_after_recover = store.log_version()
    assert v_after_recover > log_after_kill
    drain()  # nothing new: neither tables nor log may move
    assert store.read("videos").count() == 4
    assert store.log_version() == v_after_recover

    # the pre-kill snapshot stays time-travelable: log version as of
    # batch 0 resolves to the 2-video state
    assert store.read_at("videos", log_after_kill).count() == 2

    # restart from the checkpoint: the uncommitted batch replays and the
    # insert-ignore/guarded-upsert graph converges exactly-once
    drain()
    final = ParquetStore(spark, str(tmp_path / "store"))
    vids = [r.video_id for r in final.read("videos").collect()]
    assert sorted(vids) == [f"vid{i:08d}" for i in range(4)]
    assert len(vids) == len(set(vids)) == 4
    chans = [r.channel_id for r in final.read("channels").collect()]
    assert sorted(chans) == [f"chan{i}" for i in range(4)]


def test_streaming_iceberg_sink_snapshots_and_exactly_once(spark, tmp_path):
    """Round 15 (VERDICT r14 item #5): each micro-batch becomes a real
    Iceberg v2 snapshot with the batch id stamped in its summary; a
    crash between sink write and checkpoint commit replays the batch,
    and the sink must SKIP it (the id is already in the lineage) —
    snapshot lineage equality across kill/replay, resolved through the
    spec-hardened reader."""
    import json as _json

    from yark_spark.operators.containers import tar_build
    from yark_spark.operators.iceberg import iceberg_snapshot_rows
    from yark_spark.streaming.pipelines import (
        _iceberg_dir_members,
        iceberg_sink,
        read_event_stream,
        run_available_now,
    )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    tdir = str(tmp_path / "iceberg_table")

    def write_file(name, ids):
        with open(src / name, "w") as f:
            for i in ids:
                f.write(_json.dumps({"doc_id": i, "text": f"t{i}"}) + "\n")

    def drain():
        raw = read_event_stream(
            spark, str(src), schema, fmt="json", max_files_per_trigger=1
        )
        run_available_now(
            iceberg_sink(
                tdir, raw, ckpt,
                types={"doc_id": "INT64", "text": "BYTE_ARRAY"},
                schema_fields=[
                    {"id": 1, "name": "doc_id", "required": False,
                     "type": "long"},
                    {"id": 2, "name": "text", "required": False,
                     "type": "string"},
                ],
            )
        )

    def resolve():
        members = _iceberg_dir_members(tdir)
        tar = tar_build(sorted(members.items()))
        rows = iceberg_snapshot_rows(tar, ["doc_id", "text"])
        meta_name = [n for n in members if n.endswith(".metadata.json")][0]
        meta = _json.loads(members[meta_name].decode("utf-8"))
        return rows, meta

    write_file("b0.json", [0, 1, 2])
    drain()
    rows, meta = resolve()
    assert sorted(r["doc_id"] for _, r in rows) == [0, 1, 2]
    assert len(meta["snapshots"]) == 1
    assert all(r["text"] == f"t{r['doc_id']}" for _, r in rows)

    # second batch, then simulate the crash window: sink effects
    # committed, checkpoint commit marker lost → restart REPLAYS the
    # batch with the same id
    write_file("b1.json", [3, 4])
    drain()
    rows, meta = resolve()
    assert sorted(r["doc_id"] for _, r in rows) == [0, 1, 2, 3, 4]
    n_snaps = len(meta["snapshots"])
    lineage_before = [
        (s["snapshot-id"], s["summary"].get("streaming-batch-id"))
        for s in meta["snapshots"]
    ]
    replayed = _drop_last_commits(ckpt, 1)
    assert replayed is not None
    drain()  # replays the last batch
    rows, meta = resolve()
    # exactly-once: no duplicate rows, no extra snapshot
    assert sorted(r["doc_id"] for _, r in rows) == [0, 1, 2, 3, 4]
    assert len(meta["snapshots"]) == n_snaps
    assert [
        (s["snapshot-id"], s["summary"].get("streaming-batch-id"))
        for s in meta["snapshots"]
    ] == lineage_before
    # batch ids in the lineage are distinct and present
    ids = [s["summary"]["streaming-batch-id"] for s in meta["snapshots"]]
    assert len(set(ids)) == len(ids)
    # and the stream keeps going after recovery
    write_file("b2.json", [5])
    drain()
    rows, meta = resolve()
    assert sorted(r["doc_id"] for _, r in rows) == [0, 1, 2, 3, 4, 5]
    assert len(meta["snapshots"]) == n_snaps + 1


def test_iceberg_sink_dir_recovery_prefers_newest_metadata(tmp_path):
    """A kill between writing the new vN metadata and retiring the old
    one leaves two *.metadata.json; the loader keeps the newest (the
    commit point was its write) and drops the stale file."""
    import os

    from yark_spark.streaming.pipelines import _iceberg_dir_members

    d = tmp_path / "t"
    (d / "metadata").mkdir(parents=True)
    (d / "metadata" / "v1.metadata.json").write_bytes(b'{"v":1}')
    (d / "metadata" / "v2.metadata.json").write_bytes(b'{"v":2}')
    members = _iceberg_dir_members(str(d))
    assert list(members) == ["metadata/v2.metadata.json"]
    assert not os.path.exists(d / "metadata" / "v1.metadata.json")


def test_streaming_delta_sink_txn_exactly_once(spark, tmp_path):
    """Round 15 (the Iceberg sink's twin): each micro-batch is one
    Delta JSON commit carrying the protocol's txn action {appId,
    version: batch_id} — real Spark-Delta streaming's idempotency
    marker. Kill/replay (commit marker deleted) must leave both the
    row set and the commit count unchanged, resolved through the
    spec-hardened delta reader over the table directory."""
    import json as _json
    import os

    from yark_spark.operators.containers import tar_build
    from yark_spark.operators.deltalog import delta_snapshot_rows
    from yark_spark.streaming.pipelines import (
        delta_sink,
        read_event_stream,
        run_available_now,
    )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    tdir = str(tmp_path / "delta_table")
    fields = [
        {"name": "doc_id", "type": "long", "nullable": True, "metadata": {}},
        {"name": "text", "type": "string", "nullable": True, "metadata": {}},
    ]

    def write_file(name, ids):
        with open(src / name, "w") as f:
            for i in ids:
                f.write(_json.dumps({"doc_id": i, "text": f"t{i}"}) + "\n")

    def drain():
        raw = read_event_stream(
            spark, str(src), schema, fmt="json", max_files_per_trigger=1
        )
        run_available_now(
            delta_sink(
                tdir, raw, ckpt,
                types={"doc_id": "INT64", "text": "BYTE_ARRAY"},
                schema_fields=fields,
            )
        )

    def resolve():
        members = []
        for root, _d, files in os.walk(tdir):
            for fn in files:
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, tdir).replace(os.sep, "/")
                members.append((rel, open(full, "rb").read()))
        tar = tar_build(sorted(members))
        rows = delta_snapshot_rows(tar, ["doc_id", "text"])
        n_commits = len(
            [f for f in os.listdir(os.path.join(tdir, "_delta_log"))
             if f.endswith(".json")]
        )
        return rows, n_commits

    write_file("b0.json", [0, 1, 2])
    drain()
    rows, n = resolve()
    assert sorted(r["doc_id"] for _, r in rows) == [0, 1, 2]
    assert n == 1

    write_file("b1.json", [3, 4])
    drain()
    rows, n = resolve()
    assert sorted(r["doc_id"] for _, r in rows) == [0, 1, 2, 3, 4]
    n_before = n

    replayed = _drop_last_commits(ckpt, 1)
    assert replayed is not None
    drain()  # the batch replays; the txn marker makes it a no-op
    rows, n = resolve()
    assert sorted(r["doc_id"] for _, r in rows) == [0, 1, 2, 3, 4]
    assert n == n_before
    write_file("b2.json", [5])
    drain()
    rows, n = resolve()
    assert sorted(r["doc_id"] for _, r in rows) == [0, 1, 2, 3, 4, 5]
    assert n == n_before + 1


def test_sink_manifest_carries_no_data_bytes():
    """Round 16 (VERDICT r15 item #2): the streaming sinks collect ONLY
    (path, size, rows) manifest tuples — a BinaryType column in the
    collected schema would put every data byte in driver memory."""
    from pyspark.sql.types import BinaryType

    from yark_spark.streaming.pipelines import _part_manifest_schema

    schema = _part_manifest_schema()
    assert [f.name for f in schema.fields] == ["path", "size", "rows"]
    assert not any(isinstance(f.dataType, BinaryType) for f in schema.fields)
    # and the sink modules no longer build any blob-collecting plan
    import inspect

    import yark_spark.streaming.pipelines as pl

    src = inspect.getsource(pl.iceberg_sink) + inspect.getsource(pl.delta_sink)
    assert "BinaryType" not in src and "blob" not in src


def test_delta_sink_commit_is_put_if_absent(spark, tmp_path):
    """A version collision with a concurrent/external writer must
    RAISE (Delta's put-if-absent commit), never overwrite; and the
    next version is max(existing)+1 even on a log with gaps."""
    import json as _json
    import os

    from pyspark.sql.types import LongType, StructField, StructType

    from yark_spark.streaming.pipelines import (
        delta_sink,
        read_event_stream,
        run_available_now,
    )

    schema = StructType([StructField("doc_id", LongType())])
    src = tmp_path / "in"
    src.mkdir()
    tdir = str(tmp_path / "t")
    log_dir = os.path.join(tdir, "_delta_log")
    os.makedirs(log_dir)
    # a pre-existing log WITH A GAP: versions 0 and 5 (checkpoint-trimmed
    # shape); len(commits)=2 would wrongly mint version 2
    meta_actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "ext", "format": {"provider": "parquet"},
                      "schemaString": _json.dumps(
                          {"type": "struct", "fields": [
                              {"name": "doc_id", "type": "long",
                               "nullable": True, "metadata": {}}]}),
                      "partitionColumns": [], "configuration": {}}},
    ]
    with open(os.path.join(log_dir, f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(_json.dumps(a) for a in meta_actions) + "\n")
    sentinel = _json.dumps({"commitInfo": {"note": "external-v5"}}) + "\n"
    with open(os.path.join(log_dir, f"{5:020d}.json"), "w") as fh:
        fh.write(sentinel)

    with open(src / "b0.json", "w") as f:
        f.write(_json.dumps({"doc_id": 1}) + "\n")
    raw = read_event_stream(spark, str(src), schema, fmt="json",
                            max_files_per_trigger=1)
    run_available_now(
        delta_sink(tdir, raw, str(tmp_path / "ckpt"),
                   types={"doc_id": "INT64"},
                   schema_fields=[{"name": "doc_id", "type": "long",
                                   "nullable": True, "metadata": {}}])
    )
    # gap-safe: the new commit is version 6, and version 5 is untouched
    names = sorted(os.listdir(log_dir))
    assert f"{6:020d}.json" in names
    assert f"{2:020d}.json" not in names
    with open(os.path.join(log_dir, f"{5:020d}.json")) as fh:
        assert fh.read() == sentinel


def test_delta_sink_periodic_log_checkpoint(spark, tmp_path):
    """Round 16: after log_checkpoint_every commits the sink writes a
    classic checkpoint (txn rows preserved!) and trims the JSON log —
    replay stays O(every), the table still resolves, and a replayed
    batch whose txn marker now lives ONLY in the checkpoint is still
    skipped (exactly-once across trimming)."""
    import json as _json
    import os

    from yark_spark.operators.containers import tar_build
    from yark_spark.operators.deltalog import delta_snapshot_rows
    from yark_spark.streaming.pipelines import (
        delta_sink,
        read_event_stream,
        run_available_now,
    )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    tdir = str(tmp_path / "t")
    fields = [
        {"name": "doc_id", "type": "long", "nullable": True, "metadata": {}},
        {"name": "text", "type": "string", "nullable": True, "metadata": {}},
    ]

    def drain():
        raw = read_event_stream(
            spark, str(src), schema, fmt="json", max_files_per_trigger=1
        )
        run_available_now(
            delta_sink(tdir, raw, ckpt,
                       types={"doc_id": "INT64", "text": "BYTE_ARRAY"},
                       schema_fields=fields, log_checkpoint_every=4)
        )

    def resolve():
        members = []
        for root, _d, files in os.walk(tdir):
            for fn in files:
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, tdir).replace(os.sep, "/")
                members.append((rel, open(full, "rb").read()))
        return delta_snapshot_rows(tar_build(sorted(members)), ["doc_id"])

    for b in range(6):
        with open(src / f"b{b}.json", "w") as f:
            f.write(_json.dumps({"doc_id": b, "text": f"t{b}"}) + "\n")
    drain()
    log_dir = os.path.join(tdir, "_delta_log")
    names = sorted(os.listdir(log_dir))
    # a checkpoint happened: _last_checkpoint + trimmed JSON log
    assert "_last_checkpoint" in names
    assert any(n.endswith(".checkpoint.parquet") for n in names)
    n_json = [n for n in names if n.endswith(".json") and n[:-5].isdigit()]
    assert len(n_json) < 6
    assert sorted(r["doc_id"] for _, r in resolve()) == list(range(6))

    # kill/replay across the trim: the txn marker for the replayed
    # batch may now live only in the checkpoint
    replayed = _drop_last_commits(ckpt, 1)
    assert replayed is not None
    drain()
    assert sorted(r["doc_id"] for _, r in resolve()) == list(range(6))

    # and the stream continues, versions stay monotonic past the trim
    with open(src / "b6.json", "w") as f:
        f.write(_json.dumps({"doc_id": 6, "text": "t6"}) + "\n")
    drain()
    assert sorted(r["doc_id"] for _, r in resolve()) == list(range(7))
