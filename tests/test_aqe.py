"""AQE behavior pins (VERDICT r6 next-round item 7): which skew the
runtime handles automatically vs when the explicit salt recipe
(operators/skew.salted_join) is required.

The division of labor, asserted below:
- AQE coalesces over-partitioned small shuffles (always on).
- AQE splits a skewed SORT-MERGE join partition only past
  skewedPartitionThresholdInBytes (256 MB default) — moderate local skew
  rides under it untouched, which is why bench.py's skew_join row shows
  the naive SMJ paying the hot reducer at default settings.
- The explicit salt spreads ANY hot key regardless of byte thresholds or
  join strategy; its shuffle key is (key, __salt).
"""

import pytest
from pyspark.sql import functions as F

from yark_spark.operators.skew import salted_join
from yark_spark.plans.explain import formatted_plan


def _run_and_plan(df):
    """Execute ``df``'s OWN queryExecution (collect — count() would build
    a separate plan instance and leave this one isFinalPlan=false) and
    return (rows, final adaptive plan string)."""
    rows = df.collect()
    return rows, df._jdf.queryExecution().executedPlan().toString()


def _skewed_pair(spark, n_big=400_000, n_keys=5_000):
    big = spark.range(n_big).select(
        F.when(F.col("id") % 3 < 2, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
        .alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("blob"),
    )
    small = spark.range(n_keys).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    return big, small


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_session_pins_aqe_on(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true"


def test_aqe_skew_split_inactive_at_default_threshold(spark, no_broadcast):
    """A hot key owning 2/3 of a local-scale fact side stays UNDER the
    256 MB skew threshold: AQE leaves the SMJ partitioning alone (no
    skew=true), so the hot reducer cost is real — the case bench.py's
    skew_join row measures and salted_join exists for."""
    big, small = _skewed_pair(spark)
    rows, plan = _run_and_plan(big.join(small, "k").agg(F.count("blob")))
    assert rows[0][0] == 400_000
    assert "SortMergeJoin" in plan, plan
    assert "skew=true" not in plan, plan


def test_aqe_skew_split_activates_when_threshold_lowered(spark, no_broadcast):
    """The same join WITH the thresholds sized to the data (the knobs a
    100 TB deployment would set per-partition-size) gets its hot
    partition split by OptimizeSkewedJoin: skew=true in the executed
    plan. Pinning this keeps AQE regressions visible locally."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1MB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1MB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        big, small = _skewed_pair(spark)
        # count("blob") keeps the wide column flowing through the join:
        # with it pruned the shuffled partitions fall under even the 1MB
        # threshold and the detector never sees the skew. (Also note:
        # grouping the join output BY the join key would block the split
        # — duplicated partitions would violate the downstream
        # hashpartitioning(k) requirement.)
        rows, plan = _run_and_plan(big.join(small, "k").agg(F.count("blob")))
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    assert rows[0][0] == 400_000
    assert "skew=true" in plan, plan


def test_aqe_coalesces_over_partitioned_shuffle(spark):
    """A tiny aggregate shuffled across 32 partitions is coalesced by
    AQEShuffleRead — the knob that keeps task counts sane when a stage's
    output is far smaller than its configured partitioning."""
    df = spark.range(1_000).groupBy((F.col("id") % 7).alias("g")).count()
    rows, plan = _run_and_plan(df)
    assert len(rows) == 7
    assert "AQEShuffleRead" in plan and "coalesced" in plan, plan


def test_salted_join_shuffles_on_key_and_salt(spark, no_broadcast):
    """The salt must actually reach the shuffle: the salted plan's
    exchange partitions on (k, __salt) — spreading a hot key over `salt`
    reducers — while the naive plan partitions on k alone."""
    big, small = _skewed_pair(spark)
    naive_plan = formatted_plan(big.join(small, "k"))
    salted_plan = formatted_plan(salted_join(big, small, "k", salt=8))
    assert "__salt" not in naive_plan
    assert "hashpartitioning(k" in salted_plan and "__salt" in salted_plan, salted_plan
