"""Skew mitigation — salting for hot join keys (SURVEY.md §7 '100 TB
posture': skewed channels/users would pin single reducers).

AQE's skew-join splitting (enabled in session.py) handles moderate skew
automatically for sort-merge joins; explicit salting is the tool when one
key dominates so heavily that even split partitions overflow, or when the
join is hash-based. The salted form trades a ×salt replication of the
small side for an even spread of the hot side."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the big side salted into ``salt`` sub-keys.

    Each big row's salt bucket is ``pmod(xxhash64(all columns, seed), salt)``
    — a pure function of the row's content, so the assignment is identical
    under retries, repartitioning, and speculative re-execution (``F.rand``
    is seeded per-partition: the same row lands in a different bucket when
    the partitioning changes). Hashing the whole row, not the join key: a
    key-only hash would send every row of a hot key to one bucket and
    defeat the salt. The small side is replicated across all buckets so
    every (key, salt) pair finds its match. The shuffle key becomes
    (on, salt) — a hot key now spreads over ``salt`` reducers instead of
    one.
    """
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*big.columns, F.lit(seed)), F.lit(salt)).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_big.join(salted_small, [on, "__salt"], how)
    return out.drop("__salt")


def key_skew_profile(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts + share of total for the heaviest
    keys — the input to a salting decision. One aggregation pass."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(key, "n", F.round(F.col("n") / F.col("t"), 6).alias("share"))
        .orderBy(F.desc("n"))
        .limit(top)
    )
