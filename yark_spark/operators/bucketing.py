"""Bucketed tables — shuffle-free co-located joins (SURVEY.md §4 join row;
the 100 TB path for recurring fact-fact joins).

Writing both join sides bucketed (+sorted) on the join key lets sort-merge
joins skip BOTH the shuffle and the sort: each task zips bucket i of one
table with bucket i of the other. The one-time bucketed write amortizes
over every subsequent join/agg on the key — the right trade for tables
joined repeatedly (orders ⋈ lineitem; videos ⋈ comments)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a bucketed managed table (bucket metadata only exists in
    the catalog — plain parquet paths can't carry it)."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def cobucket_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — plans with zero
    Exchange nodes when bucket counts match (asserted in tests)."""
    return read_table(spark, left_table).join(read_table(spark, right_table), on, how)
