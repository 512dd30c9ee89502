"""Data-quality validation and table profiling (Deequ-style, public
pattern: Schelter et al., "Automating Large-Scale Data Quality
Verification", VLDB 2018).

A 100 TB curation pipeline gates every snapshot on mechanical checks —
uniqueness, nullability, referential integrity, ranges, set membership —
and records a per-column profile next to each snapshot. Both are plain
aggregations here: one scan per table (checks against the same table
fuse into conditional aggregates), tiny result sets, nothing collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unique_violations(df: DataFrame, keys: "list[str]") -> DataFrame:
    """Key tuples that occur more than once (one row per violating key)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") > 1)
    )


def not_null_violations(df: DataFrame, col: str) -> DataFrame:
    return df.filter(F.col(col).isNull())


def referential_violations(
    child: DataFrame, parent: DataFrame, fk: str, pk: str
) -> DataFrame:
    """Child rows whose foreign key has no parent — an ANTI equi-join, so
    the probe is one shuffle (or zero with a broadcast parent dim)."""
    return child.join(parent.select(F.col(pk).alias(fk)), fk, "left_anti")


def range_violations(df: DataFrame, col: str, lo, hi) -> DataFrame:
    return df.filter((F.col(col) < lo) | (F.col(col) > hi))


def membership_violations(df: DataFrame, col: str, allowed: "list[str]") -> DataFrame:
    return df.filter(~F.col(col).isin(allowed))


def quality_report(checks: "dict[str, DataFrame]") -> DataFrame:
    """One (check_name, n_violations) row per check. Each violation frame
    collapses to a count before the union, so the report is |checks| rows
    regardless of table size."""
    out = None
    for name, df in checks.items():
        row = df.agg(F.count(F.lit(1)).alias("n_violations")).select(
            F.lit(name).alias("check_name"), F.col("n_violations").cast("long")
        )
        out = row if out is None else out.unionByName(row)
    if out is None:
        raise ValueError("quality_report: no checks given")
    return out


def profile_table(df: DataFrame, columns: "list[str] | None" = None) -> DataFrame:
    """Per-column profile: row count, null count, exact distinct count,
    min/max (stringified for a uniform schema) — the snapshot metadata a
    catalog stores. All columns profile in ONE aggregate pass over the
    table (count-distincts expand map-side; swap in approx_count_distinct
    when exactness isn't required at extreme cardinality), then the wide
    row pivots to long form driver-free via explode of a literal array.
    """
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("_rows").cast("long").alias("n_rows"),
                (F.col("_rows") - F.col(f"_nn_{c}")).cast("long").alias("n_nulls"),
                F.col(f"_nd_{c}").cast("long").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")
