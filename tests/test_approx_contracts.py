"""Error-bound contracts for the approximate sketches (SURVEY.md §5.1):
the rows-only keys q_approx_count_distinct / q_approx_percentile can't
hash-match a DuckDB oracle (HLL/KLL internals are engine-specific), so
these tests pin their ACCURACY against the exact twins instead — the
contract a user of the sketch actually relies on."""

from pyspark.sql import functions as F

from yark_spark.io import load_table


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    """HLL++ at rsd=0.05 must land within ~3 standard errors of the exact
    count-distinct on every group (15% — generous, so the test is not
    flaky across Spark versions, while still catching a broken sketch)."""
    li = load_table(spark, sf_dir, "lineitem")
    got = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.05).alias("approx"),
            F.countDistinct("l_orderkey").alias("exact"),
        )
        .collect()
    )
    assert got, "no groups"
    for r in got:
        err = abs(r["approx"] - r["exact"]) / max(r["exact"], 1)
        assert err <= 0.15, (r["l_returnflag"], r["approx"], r["exact"], err)


def test_approx_percentile_within_rank_error(spark, sf_dir):
    """approx_percentile(accuracy=10000) guarantees rank error ≤ 1/accuracy;
    verify the returned value's TRUE rank is within 1% of the target —
    the rank-error contract, not a value tolerance (value gaps can be
    huge in skewed data even when rank error is tiny)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    n = li.count()
    for p in (0.5, 0.95):
        v = li.agg(
            F.percentile_approx("l_extendedprice", p, 10000).alias("v")
        ).collect()[0]["v"]
        rank = li.filter(F.col("l_extendedprice") <= v).count() / n
        assert abs(rank - p) <= 0.01, (p, v, rank)
