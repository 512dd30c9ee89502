"""Unit semantics of operators/timeseries (gap fill, percentile trim) on
hand-built frames — the oracle keys cover the corpus shapes."""

import datetime

from yark_spark.operators.timeseries import gap_fill_counts, percentile_trim


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


def test_gap_fill_dense_grid_with_zeros(spark):
    events = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(10, 30)), (1, _ts(13)), (2, _ts(11))],
        ["user_id", "ts"],
    )
    got = {
        (r["user_id"], r["bucket"]): r["n_events"]
        for r in gap_fill_counts(events, bucket_seconds=3600).collect()
    }
    base = int(_ts(10).replace(tzinfo=datetime.timezone.utc).timestamp()) // 3600
    # user 1: hours 10..13 -> 4 buckets, zeros at 11 and 12
    assert got[(1, base)] == 2
    assert got[(1, base + 1)] == 0
    assert got[(1, base + 2)] == 0
    assert got[(1, base + 3)] == 1
    # user 2: single event -> exactly one bucket, no padding beyond span
    assert got[(2, base + 1)] == 1
    assert len([k for k in got if k[0] == 2]) == 1
    assert len([k for k in got if k[0] == 1]) == 4


def test_percentile_trim_keeps_inner_band(spark):
    rows = [("a", v) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 100]]
    df = spark.createDataFrame(rows, ["g", "v"])
    kept = sorted(r["v"] for r in percentile_trim(df, "g", "v", 0.1, 0.9).collect())
    assert 100 not in kept       # the outlier is cut
    assert kept[0] >= 1 and len(kept) >= 7  # the band keeps the bulk
