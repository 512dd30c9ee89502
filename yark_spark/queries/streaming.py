"""Batch-equivalent streaming query keys (SURVEY.md §2.7 streaming rows).

The real Structured Streaming pipelines live in yark_spark/streaming/ and
are exercised by tests (the driver collects a batch DataFrame, so streaming
DataFrames can't be returned here). These keys run the *same tumbling /
session logic* through the batch engine so the DuckDB oracle can check the
window algebra.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yark_spark.io import load_table
from yark_spark.registry import query


@query(
    "q_stream_tumbling",
    oracle=(
        "SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS n_events, "
        "round(sum(value), 4) AS sum_value FROM events GROUP BY 1, 2"
    ),
)
def q_stream_tumbling(spark, sf_dir):
    """Tumbling 1-hour windowed aggregation — identical expression runs
    under readStream+withWatermark in yark_spark.streaming.pipelines."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


@query(
    "q_stream_sliding",
    oracle=(
        "WITH offsets AS (SELECT unnest([0, 30]) AS off_min), "
        "windowed AS (SELECT date_trunc('hour', ts - to_minutes(off_min)) "
        "+ to_minutes(off_min) AS window_start, value FROM events, offsets "
        "WHERE ts >= date_trunc('hour', ts - to_minutes(off_min)) + to_minutes(off_min)) "
        "SELECT window_start, count(*) AS n_events, round(sum(value), 4) AS sum_value "
        "FROM windowed GROUP BY 1"
    ),
)
def q_stream_sliding(spark, sf_dir):
    """Sliding window (1 h length, 30 min slide): every event lands in 2
    overlapping windows. Spark's window() emits both assignments natively;
    the oracle reproduces them by unioning the two phase offsets."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


@query("q_stream_session")  # rows-only: session_window gap semantics are engine-specific
def q_stream_session(spark, sf_dir):
    """Session windows (30-minute inactivity gap) per user — the batch twin
    of the streaming session aggregation."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
