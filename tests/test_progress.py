"""X13 ETA parity (`utils.py:41-43`) — estimator arithmetic + a live
listener over a real micro-batch stream."""

import time

import pytest

from yark_spark.streaming.progress import (
    LISTENER_AVAILABLE,
    IngestProgressListener,
    ProgressSnapshot,
    eta_seconds,
)


def test_eta_matches_reference_arithmetic():
    # elapsed * (length/position - 1), `utils.py:41-43`
    assert eta_seconds(10.0, 25, 100) == pytest.approx(30.0)
    assert eta_seconds(10.0, 100, 100) == 0.0
    assert eta_seconds(5.0, 0, 100) == float("inf")
    # reference clamps negative time to 0 (`utils.py:29`)
    assert eta_seconds(10.0, 200, 100) == 0.0


def test_snapshot_eta_uses_elapsed():
    snap = ProgressSnapshot()
    snap.rows_processed = 50
    snap.started_at = time.monotonic() - 8.0
    assert snap.eta(total_rows=100) == pytest.approx(8.0, rel=0.1)


@pytest.mark.skipif(not LISTENER_AVAILABLE, reason="listener API unavailable")
def test_listener_accumulates_live_stream(spark, tmp_path):
    from pyspark.sql import functions as F

    listener = IngestProgressListener()
    spark.streams.addListener(listener)
    try:
        src = str(tmp_path / "in")
        import os

        os.makedirs(src)
        spark.range(0, 500).select(
            F.col("id"), (F.col("id") % 7).alias("k")
        ).write.mode("overwrite").parquet(src)

        stream = (
            spark.readStream.schema("id long, k long").parquet(src)
            .groupBy("k").count()
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("prog_test")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        qid = str(q.id)
        # listener bus is async; poll briefly for delivery
        for _ in range(50):
            if listener.snapshot(qid).rows_processed >= 500:
                break
            time.sleep(0.2)
        snap = listener.snapshot(qid)
        assert snap.rows_processed == 500
        assert snap.batches >= 1
        assert snap.eta(total_rows=500) == 0.0
    finally:
        spark.streams.removeListener(listener)
