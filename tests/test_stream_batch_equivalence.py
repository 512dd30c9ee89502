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
