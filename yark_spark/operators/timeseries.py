"""Time-series shaping over event streams: dense time grids and
distribution-tail trimming.

The reference's only time handling is per-item ETA printing
(``utils.py:41-43`` in /root/reference); these are the batch analytics a
real event store needs on top of the sessionize/funnel/retention family
(queries/round3.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gap_fill_counts(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Per-key event counts on a DENSE time grid: every bucket between a
    key's first and last event appears, zero-filled — the shape a
    forecasting/anomaly job consumes (sparse groupBy output silently
    hides dead periods).

    Buckets are integer epoch buckets (``floor(epoch/bucket_seconds)``),
    not timestamps, so the result is timezone-proof and joins cheaply.

    100 TB design: one (key, bucket) partial-agg shuffle for the counts,
    one per-key min/max agg, and the grid is generated DISTRIBUTED via
    ``sequence()`` + ``explode`` on the keyed bounds — per-key output is
    bounded by that key's active span, the join back is an equi-join on
    the same (key, bucket) shuffle key, and nothing touches the driver.
    A key spanning the whole retention window emits span/bucket_seconds
    rows; pick ``bucket_seconds`` so that stays ≪ executor memory.
    """
    bucket = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(bucket_seconds)).cast("long")
    keyed = events.select(F.col(key_col), bucket.alias("bucket"))
    counts = keyed.groupBy(key_col, "bucket").agg(F.count(F.lit(1)).alias("n_events"))
    bounds = keyed.groupBy(key_col).agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = bounds.select(
        F.col(key_col), F.explode(F.sequence("lo", "hi")).alias("bucket")
    )
    return (
        grid.join(counts, [key_col, "bucket"], "left")
        .select(
            key_col,
            "bucket",
            F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        )
    )


def percentile_trim(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Keep rows whose ``value_col`` lies within the [lo, hi] interpolated
    percentile band OF THEIR GROUP — the standard outlier trim a curation
    pipeline applies to document lengths per source (a length that is
    normal for code is an outlier for chat transcripts).

    100 TB design: the per-group exact percentiles are one partial-agg
    shuffle producing |groups| rows, broadcast back onto the fact scan —
    the fact side is never shuffled. Exact interpolated percentiles (not
    approx) so the band is deterministic and oracle-checkable; swap in
    ``approx_percentile`` for cheaper bands when |group| rows explode.
    """
    bands = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(lo)).alias("_lo"),
        F.percentile(value_col, F.lit(hi)).alias("_hi"),
    )
    return (
        df.join(F.broadcast(bands), group_col)
        .filter((F.col(value_col) >= F.col("_lo")) & (F.col(value_col) <= F.col("_hi")))
        .drop("_lo", "_hi")
    )
