"""Structured Streaming tests (SURVEY.md §5.4): file-source streams driven
with availableNow, asserting watermark dedup, windowed aggs, late-data drop,
and the foreachBatch store upsert."""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType, TimestampType

from yark_spark.operators.store import ParquetStore
from yark_spark.streaming.pipelines import (
    history_sink,
    read_event_stream,
    tumbling_counts,
    watermarked_dedup,
)

HISTORY_SCHEMA = StructType(
    [StructField("video", StringType()), StructField("watched", TimestampType())]
)


def _write_batch(d, name, rows):
    with open(os.path.join(d, name), "w") as f:
        for video, watched in rows:
            f.write(json.dumps({"video": video, "watched": watched}) + "\n")


def test_stream_dedup_and_late_drop(spark, tmp_path):
    """F4 streaming (`cmds/archive.py:340`): in-horizon duplicates drop;
    rows older than the watermark drop as late (documented divergence from
    the reference's unbounded probe)."""
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _write_batch(
        src,
        "b1.json",
        [
            ("v1", "2024-01-01T10:00:00Z"),
            ("v1", "2024-01-01T10:00:00Z"),  # exact dup → suppressed
            ("v1", "2024-01-01T10:05:00Z"),  # same video, new time → kept
            ("v2", "2024-01-01T11:00:00Z"),  # advances watermark to 10:50
        ],
    )
    out = str(tmp_path / "out")
    stream = read_event_stream(spark, str(src), HISTORY_SCHEMA)
    deduped = watermarked_dedup(stream, ["video", "watched"], "watched", "10 minutes")

    def drain_to_files():
        # file sink: the only sink that supports checkpoint *recovery*, which
        # the cross-run stateful assertions below need
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain_to_files()
    assert spark.read.parquet(out).count() == 3

    # batch 2: a replay of an already-seen in-horizon row + a very late row
    _write_batch(
        src,
        "b2.json",
        [
            ("v2", "2024-01-01T11:00:00Z"),  # dup within state → suppressed
            ("v0", "2024-01-01T09:00:00Z"),  # older than watermark → dropped late
            ("v3", "2024-01-01T11:30:00Z"),  # fresh → kept
        ],
    )
    drain_to_files()
    final = spark.read.parquet(out)
    vids = [r.video for r in final.collect()]
    assert final.count() == 4  # only v3 added
    assert vids.count("v3") == 1
    assert "v0" not in vids           # late drop
    assert vids.count("v2") == 1      # stateful dedup across micro-batches


def test_stream_tumbling_watermark_finalizes(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _write_batch(
        src,
        "b1.json",
        [
            ("a", "2024-01-01T10:05:00Z"),
            ("b", "2024-01-01T10:20:00Z"),
            ("c", "2024-01-01T12:00:00Z"),  # watermark → 11:50, closes 10:00 window
        ],
    )
    stream = read_event_stream(spark, str(src), HISTORY_SCHEMA)
    agg = tumbling_counts(stream, ts_col="watched", width="1 hour", delay="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumb")
        .outputMode("append")  # append emits only watermark-finalized windows
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {str(r.window_start): r.n_events for r in spark.sql("SELECT * FROM tumb").collect()}
    assert rows.get("2024-01-01 10:00:00") == 2  # finalized window emitted
    assert "2024-01-01 12:00:00" not in rows     # still-open window withheld


def test_foreachbatch_history_sink_idempotent(spark, tmp_path):
    """§3.3: per-micro-batch transactional upsert; duplicate rows across
    batches collapse via the store-side anti-join."""
    src = tmp_path / "src"
    src.mkdir()
    store = ParquetStore(spark, str(tmp_path / "store"))
    _write_batch(src, "b1.json", [("v1", "2024-01-01T10:00:00Z"), ("v2", "2024-01-01T10:30:00Z")])
    stream = read_event_stream(spark, str(src), HISTORY_SCHEMA)
    deduped = watermarked_dedup(stream, ["video", "watched"], "watched", "10 minutes")
    sink = history_sink(store, deduped, str(tmp_path / "ckpt"))
    q = sink.trigger(availableNow=True).start()
    q.awaitTermination()
    assert store.read("history").count() == 2

    # second run: one overlapping row (store-level dedup) + one new
    _write_batch(src, "b2.json", [("v2", "2024-01-01T10:30:00Z"), ("v9", "2024-01-01T11:00:00Z")])
    q = sink.trigger(availableNow=True).start()
    q.awaitTermination()
    hist = store.read("history")
    assert hist.count() == 3
    assert hist.filter(F.col("video") == "v2").count() == 1


def test_parquet_store_versioned_swap(spark, tmp_path):
    store = ParquetStore(spark, str(tmp_path / "store"))
    df1 = spark.createDataFrame([("a", 1)], "k string, v long")
    store.write("t", df1)
    assert store.read("t").count() == 1
    df2 = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long")
    store.write("t", df2)
    assert store.read("t").count() == 2
    # archive tables read as empty-with-schema before first write
    empty = store.read("videos")
    assert empty.count() == 0 and "video_id" in empty.columns


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join (pipelines.interval_join): the streamed
    result over a drained file source equals the batch join with the same
    interval predicate — proving the watermark/state bounds don't change
    the join algebra for in-horizon data."""
    from yark_spark.streaming.pipelines import interval_join

    src_v = tmp_path / "views"
    src_p = tmp_path / "purchases"
    src_v.mkdir()
    src_p.mkdir()
    views = [
        (1, 100, "2024-01-01T10:00:00Z"),
        (2, 100, "2024-01-01T12:00:00Z"),
        (3, 200, "2024-01-01T10:00:00Z"),
    ]
    purchases = [
        (10, 100, "2024-01-01T10:30:00Z"),  # joins view 1 (within 1h)
        (11, 100, "2024-01-01T12:59:00Z"),  # joins view 2
        (12, 200, "2024-01-01T11:30:00Z"),  # >1h after view 3 → no match
        (13, 300, "2024-01-01T10:15:00Z"),  # no view for user 300
    ]
    with open(src_v / "b1.json", "w") as f:
        for eid, uid, ts in views:
            f.write(json.dumps({"view_id": eid, "user_id": uid, "v_ts": ts}) + "\n")
    with open(src_p / "b1.json", "w") as f:
        for eid, uid, ts in purchases:
            f.write(json.dumps({"purchase_id": eid, "user_id": uid, "p_ts": ts}) + "\n")

    from pyspark.sql.types import LongType

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
    sv = read_event_stream(spark, str(src_v), v_schema)
    sp = read_event_stream(spark, str(src_p), p_schema)
    joined = interval_join(sv, sp)
    q = (
        joined.writeStream.format("memory")
        .queryName("ivj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.view_id, r.purchase_id)
        for r in spark.sql("SELECT view_id, purchase_id FROM ivj").collect()
    }

    bv = spark.createDataFrame([(e, u, ts.replace("Z", "")) for e, u, ts in views],
                               "view_id long, user_id long, v_ts string").withColumn(
        "v_ts", F.to_timestamp("v_ts"))
    bp = spark.createDataFrame([(e, u, ts.replace("Z", "")) for e, u, ts in purchases],
                               "purchase_id long, p_user long, p_ts string").withColumn(
        "p_ts", F.to_timestamp("p_ts"))
    batch = {
        (r.view_id, r.purchase_id)
        for r in bv.join(
            bp,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("v_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    assert got == batch == {(1, 10), (2, 11)}


def test_stream_interval_join_left_outer_emits_unmatched(spark, tmp_path):
    """leftOuter interval join: matched pairs equal the inner join, and an
    unmatched view EMITS with a null purchase once the watermark passes its
    join horizon. A late second batch advances the watermark so the
    unmatched row from batch 1 can be finalized; views at the stream tail
    may legitimately stay in state (their horizon never closes) — the
    assertion covers only watermark-closed rows."""
    from yark_spark.streaming.pipelines import interval_join

    src_v = tmp_path / "views"
    src_p = tmp_path / "purchases"
    src_v.mkdir()
    src_p.mkdir()
    # the global watermark is the MIN across both streams, so BOTH sides
    # need far-future events (unrelated user 90x) to advance it past view
    # 2's join horizon; the final batch then flushes the unmatched row
    view_batches = [
        [(1, 100, "2024-01-01T10:00:00Z"), (2, 200, "2024-01-01T10:00:00Z")],
        [(3, 901, "2024-01-02T10:00:00Z")],
        [(4, 901, "2024-01-03T10:00:00Z")],
    ]
    purchase_batches = [
        [(10, 100, "2024-01-01T10:30:00Z")],
        [(98, 900, "2024-01-02T10:00:00Z")],
        [(99, 900, "2024-01-03T10:00:00Z")],
    ]
    for i, batch in enumerate(view_batches, start=1):
        with open(src_v / f"b{i}.json", "w") as f:
            for eid, uid, ts in batch:
                f.write(json.dumps({"view_id": eid, "user_id": uid, "v_ts": ts}) + "\n")
    for i, batch in enumerate(purchase_batches, start=1):
        with open(src_p / f"b{i}.json", "w") as f:
            for eid, uid, ts in batch:
                f.write(json.dumps({"purchase_id": eid, "user_id": uid, "p_ts": ts}) + "\n")

    from pyspark.sql.types import LongType

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
    sv = read_event_stream(spark, str(src_v), v_schema, max_files_per_trigger=1)
    sp = read_event_stream(spark, str(src_p), p_schema, max_files_per_trigger=1)
    joined = interval_join(sv, sp, how="leftOuter")
    q = (
        joined.writeStream.format("memory")
        .queryName("ivj_left")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.view_id, r.purchase_id)
        for r in spark.sql("SELECT view_id, purchase_id FROM ivj_left").collect()
    }
    assert (1, 10) in got  # the match
    assert (2, None) in got  # unmatched view finalized as a null row


def test_dedup_within_watermark_suppresses_restamped_retries(spark, tmp_path):
    """dropDuplicatesWithinWatermark (round 7): a retry that RE-STAMPS its
    timestamp is still suppressed (keys-only state), and after the
    watermark passes first-seen + delay the key is re-admitted.
    maxFilesPerTrigger=1 forces batch-by-batch progression so the
    watermark actually advances between files; mtimes are stamped
    strictly increasing because the file source orders by modification
    time and same-tick writes otherwise interleave batches (observed
    flake under load: b4 before b2 → late-drops + no eviction)."""
    import os
    import time

    from yark_spark.streaming.pipelines import watermarked_dedup_within

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _base_t = time.time()

    def _stamp(name, offset):
        p = str(src / name)
        os.utime(p, (_base_t + offset, _base_t + offset))
    _write_batch(
        src,
        "b1.json",
        [
            ("v1", "2024-01-01T10:00:00Z"),
            ("v1", "2024-01-01T10:03:00Z"),  # re-stamped retry → suppressed
        ],
    )
    _stamp("b1.json", 0)
    # Eviction uses the EVICTION watermark, which trails the data by one
    # batch (a batch's watermark is computed from the PREVIOUS batch's max
    # event time): b2 raises max event time to 11:00, b3 runs with
    # watermark 10:50 (> v1's 10:10 expiry) whose end-of-batch cleanup
    # evicts v1, and only b4 sees the state gone.
    _write_batch(src, "b2.json", [("v2", "2024-01-01T11:00:00Z")])
    _stamp("b2.json", 10)
    _write_batch(src, "b3.json", [("v3", "2024-01-01T11:05:00Z")])
    _stamp("b3.json", 20)
    _write_batch(
        src,
        "b4.json",
        [
            ("v1", "2024-01-01T13:00:00Z"),  # state evicted → re-admitted
            ("v1", "2024-01-01T13:04:00Z"),  # fresh retry → suppressed again
        ],
    )
    _stamp("b4.json", 30)
    stream = read_event_stream(
        spark, str(src), HISTORY_SCHEMA, max_files_per_trigger=1
    )
    deduped = watermarked_dedup_within(stream, ["video"], "watched", "10 minutes")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["video"], r["watched"].isoformat()) for r in spark.read.parquet(out).collect()
    )
    assert [v for v, _ in got] == ["v1", "v1", "v2", "v3"]
    # the kept v1 rows are the FIRST arrival of each admission window
    assert got[0][1].startswith("2024-01-01T10:00")
    assert got[1][1].startswith("2024-01-01T13:00")


def test_stream_static_enrichment_join(spark, tmp_path):
    """Stream-static join: dim attributes attach per micro-batch with no
    state store; a key with no dim row survives with nulls (left join);
    a dim refreshed between batches is visible to the NEXT batch."""
    from pyspark.sql.types import LongType

    from yark_spark.streaming.pipelines import enrich_stream, run_available_now

    src = tmp_path / "events"
    src.mkdir()
    dim_path = str(tmp_path / "dim")
    schema = StructType(
        [StructField("video", StringType()), StructField("channel_id", LongType())]
    )
    with open(src / "b1.json", "w") as f:
        f.write(json.dumps({"video": "a", "channel_id": 1}) + "\n")
        f.write(json.dumps({"video": "b", "channel_id": 2}) + "\n")
        f.write(json.dumps({"video": "c", "channel_id": 3}) + "\n")

    spark.createDataFrame(
        [(1, "chan-one"), (2, "chan-two")], ["channel_id", "channel_name"]
    ).write.mode("overwrite").parquet(dim_path)

    stream = read_event_stream(spark, str(src), schema)
    dim = spark.read.parquet(dim_path)
    enriched = enrich_stream(stream, dim, key="channel_id")
    run_available_now(
        enriched, checkpoint=str(tmp_path / "ck"), query_name="enriched1"
    )
    rows = {r.video: r.channel_name for r in spark.sql("SELECT * FROM enriched1").collect()}
    assert rows == {"a": "chan-one", "b": "chan-two", "c": None}

    # refresh the dim on disk; the next batch of the SAME pipeline sees it
    spark.createDataFrame(
        [(1, "chan-one"), (2, "chan-two"), (3, "chan-three")],
        ["channel_id", "channel_name"],
    ).write.mode("overwrite").parquet(dim_path)
    with open(src / "b2.json", "w") as f:
        f.write(json.dumps({"video": "d", "channel_id": 3}) + "\n")
    # an overwritten dim's file listing is pinned inside the old plan —
    # rebuild the static side (the enrich_stream docstring caveat)
    enriched2 = enrich_stream(stream, spark.read.parquet(dim_path), key="channel_id")
    # memory sinks don't recover from a checkpoint — drain a fresh query
    # over the same source (b1 reprocesses; only b2's row is asserted)
    run_available_now(
        enriched2, checkpoint=str(tmp_path / "ck2"), query_name="enriched2"
    )
    rows2 = {r.video: r.channel_name for r in spark.sql("SELECT * FROM enriched2").collect()}
    assert rows2["d"] == "chan-three"
