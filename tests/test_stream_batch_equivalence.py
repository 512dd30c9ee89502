"""Batch–stream equivalence on the real events fixture: the streaming
tumbling aggregation must produce exactly the oracle-checked batch result
when the stream is drained with availableNow (closed windows) + the final
open windows."""

import os

from pyspark.sql import functions as F

from yark_spark.io import load_table, normalize_timestamps
from yark_spark.queries import QUERIES
from yark_spark.streaming.pipelines import tumbling_counts


def test_stream_tumbling_equals_batch(spark, sf_dir, tmp_path):
    # stream the actual fixture parquet file; ts arrives as nanos-long or
    # TIMESTAMP_NTZ depending on fixture generation — normalize exactly
    # like io.load_table does for the batch side
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    stream = normalize_timestamps(stream, ("ts",))
    agg = tumbling_counts(stream, ts_col="ts", width="1 hour", delay="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("stream_tumb")
        .outputMode("complete")  # complete mode: every window's current value
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        str(r["window_start"]): r["n_events"]
        for r in spark.sql("SELECT * FROM stream_tumb").collect()
    }
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )
    expected = {str(r["window_start"]): r["n_events"] for r in batch.collect()}
    assert streamed == expected


def test_session_window_equals_oracle_checked_sessionize(spark, sf_dir):
    """Cross-check the rows-only q_stream_session against the ORACLE-CHECKED
    q_sessionize (VERDICT r6 next-round item 2c): both implement 'new
    session after >30 min per-user inactivity', so the sessions derived
    from q_sessionize's per-event session_idx — n_events per (user,
    session), session_start = min ts, session_end = max ts + gap — must be
    exactly q_stream_session's rows. This transitively pins
    session_window's gap semantics to the DuckDB oracle."""
    sessions = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"])): r["n_events"]
        for r in QUERIES["q_stream_session"](spark, sf_dir).collect()
    }
    idx = QUERIES["q_sessionize"](spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    derived = (
        idx.join(ev, "event_id")
        .groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            (F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    expected = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"])): r["n_events"]
        for r in derived.collect()
    }
    assert sessions == expected


def test_stream_tar_shard_listing_equals_batch(spark, sf_dir, tmp_path):
    """Streaming shard ingest (r11): dropping tar shards into a watched
    dir and draining with availableNow must yield exactly the batch
    tar_member_listing of the same shards."""
    from yark_spark.operators.multimodal import tar_member_listing, with_tar_shards
    from yark_spark.streaming.pipelines import tar_shard_listing_stream

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 64)
    shards = with_tar_shards(docs).collect()
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    for r in shards:
        (shard_dir / f"shard-{r.shard_id}.tar").write_bytes(bytes(r.payload))

    out = tar_shard_listing_stream(spark, str(shard_dir))
    q = (
        out.writeStream.format("memory")
        .queryName("stream_shards")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_shards"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = sorted(
        map(tuple, spark.sql("SELECT * FROM stream_shards").collect())
    )
    batch_df = spark.createDataFrame(shards)
    batch = sorted(map(tuple, tar_member_listing(batch_df).collect()))
    assert streamed == batch and len(streamed) == 128  # 64 docs x 2 members


def test_stream_warc_listing_equals_batch(spark, sf_dir, tmp_path):
    """Streaming .warc.gz ingest (r11): the availableNow drain of a
    watched segment directory must equal the batch record listing."""
    from yark_spark.operators.multimodal import warc_record_listing, with_warc_shards
    from yark_spark.streaming.pipelines import warc_shard_listing_stream

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 48)
    shards = with_warc_shards(docs).collect()
    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()
    for r in shards:
        (seg_dir / f"shard-{r.shard_id}.warc.gz").write_bytes(bytes(r.payload))

    out = warc_shard_listing_stream(spark, str(seg_dir))
    q = (
        out.writeStream.format("memory")
        .queryName("stream_warc")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_warc"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = sorted(map(tuple, spark.sql("SELECT * FROM stream_warc").collect()))
    batch = sorted(
        map(tuple, warc_record_listing(spark.createDataFrame(shards)).collect())
    )
    assert streamed == batch and len(streamed) == 48


def test_stream_jsonl_zst_listing_equals_batch(spark, sf_dir, tmp_path):
    """Streaming .jsonl.zst ingest (r12): the availableNow drain of a
    watched shard directory must equal the batch listing — the whole
    from-scratch zstd decode path running inside Structured Streaming."""
    from yark_spark.operators.multimodal import (
        jsonl_zst_listing,
        with_jsonl_zst_shards,
    )
    from yark_spark.streaming.pipelines import jsonl_zst_listing_stream

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 48)
    shards = with_jsonl_zst_shards(docs).collect()
    shard_dir = tmp_path / "zst"
    shard_dir.mkdir()
    for r in shards:
        (shard_dir / f"shard-{r.shard_id}.jsonl.zst").write_bytes(bytes(r.payload))

    out = jsonl_zst_listing_stream(spark, str(shard_dir))
    q = (
        out.writeStream.format("memory")
        .queryName("stream_zst")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_zst"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = sorted(map(tuple, spark.sql("SELECT * FROM stream_zst").collect()))
    batch = sorted(
        map(tuple, jsonl_zst_listing(spark.createDataFrame(shards)).collect())
    )
    assert streamed == batch and len(streamed) == 48


def test_stream_tfrecord_listing_equals_batch(spark, sf_dir, tmp_path):
    """Streaming TFRecord ingest (r12): the availableNow drain of a
    watched shard directory must equal the batch listing, with the
    codec dispatched from the filename suffix (.tfrecord vs
    .tfrecord.gz) exactly as tf.data declares compression_type."""
    from yark_spark.operators.multimodal import (
        tfrecord_listing,
        with_tfrecord_shards,
    )
    from yark_spark.streaming.pipelines import tfrecord_listing_stream

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 48)
    shards = with_tfrecord_shards(docs).collect()  # alternate: even plain, odd gz
    shard_dir = tmp_path / "tfr"
    shard_dir.mkdir()
    for r in shards:
        suffix = ".tfrecord.gz" if r.codec == "gzip" else ".tfrecord"
        (shard_dir / f"shard-{r.shard_id}{suffix}").write_bytes(bytes(r.payload))

    out = tfrecord_listing_stream(spark, str(shard_dir))
    q = (
        out.writeStream.format("memory")
        .queryName("stream_tfr")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_tfr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = sorted(map(tuple, spark.sql("SELECT * FROM stream_tfr").collect()))
    batch = sorted(
        map(tuple, tfrecord_listing(spark.createDataFrame(shards)).collect())
    )
    assert streamed == batch and len(streamed) == 48


def test_stream_avro_listing_equals_batch(spark, sf_dir, tmp_path):
    """Streaming Avro ingest (r12): the availableNow drain of a watched
    shard directory must equal the batch listing — the self-describing
    header (embedded schema + codec) means the stream needs no codec
    hint, unlike TFRecord's suffix dispatch."""
    from yark_spark.operators.multimodal import avro_listing, with_avro_shards
    from yark_spark.streaming.pipelines import avro_listing_stream

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 48)
    shards = with_avro_shards(docs).collect()  # codecs cycle null/deflate/snappy
    shard_dir = tmp_path / "avro"
    shard_dir.mkdir()
    for r in shards:
        (shard_dir / f"shard-{r.shard_id}.avro").write_bytes(bytes(r.payload))

    out = avro_listing_stream(spark, str(shard_dir))
    q = (
        out.writeStream.format("memory")
        .queryName("stream_avro")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_avro"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = sorted(map(tuple, spark.sql("SELECT * FROM stream_avro").collect()))
    batch = sorted(
        map(
            tuple,
            avro_listing(
                spark.createDataFrame([(r.shard_id, r.payload) for r in shards],
                                      "shard_id LONG, payload BINARY")
            ).collect(),
        )
    )
    assert streamed == batch and len(streamed) == 48


def test_stream_jsonl_xz_listing_equals_batch(spark, sf_dir, tmp_path):
    """Streaming .jsonl.xz ingest (r13): decompress_auto speaks the xz
    magic, so the r12 shard stream drains the fifth codec's shards
    unchanged — availableNow must equal the batch listing."""
    from yark_spark.operators.multimodal import (
        jsonl_zst_listing,
        with_jsonl_xz_shards,
    )
    from yark_spark.streaming.pipelines import jsonl_zst_listing_stream

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 48)
    shards = with_jsonl_xz_shards(docs).collect()
    shard_dir = tmp_path / "xz"
    shard_dir.mkdir()
    for r in shards:
        (shard_dir / f"shard-{r.shard_id}.jsonl.xz").write_bytes(bytes(r.payload))

    out = jsonl_zst_listing_stream(spark, str(shard_dir), glob="*.jsonl.xz")
    q = (
        out.writeStream.format("memory")
        .queryName("stream_xz")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_xz"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = sorted(map(tuple, spark.sql("SELECT * FROM stream_xz").collect()))
    batch = sorted(
        map(tuple, jsonl_zst_listing(spark.createDataFrame(shards)).collect())
    )
    assert streamed == batch and len(streamed) == 48
