"""Partitioned-fact layout tests (SURVEY.md §7 100 TB posture: 'partition
facts by date'): date-partitioned writes must give partition-pruned scans."""

from pyspark.sql import functions as F

from yark_spark.io import load_table
from yark_spark.operators.store import ParquetStore
from yark_spark.plans.explain import formatted_plan


def test_date_partitioned_write_prunes(spark, sf_dir, tmp_path):
    store = ParquetStore(spark, str(tmp_path / "store"))
    events = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    store.write("events_by_day", events, partition_by=["event_date"])

    df = store.read("events_by_day").filter(F.col("event_date") == "2024-01-03")
    plan = formatted_plan(df)
    # partition pruning: the filter must appear as a PartitionFilters entry
    # on the scan, and the scan must read only matching partition dirs
    assert "PartitionFilters" in plan
    assert "event_date" in plan.split("PartitionFilters")[1].split("]")[0]
    n = df.count()
    assert n > 0
    # pruned scan reads exactly the one partition's rows
    full = store.read("events_by_day")
    assert n == full.filter(F.col("event_date") == "2024-01-03").count()


def test_partitioned_overwrite_scopes_to_partition(spark, sf_dir, tmp_path):
    """Key-scoped overwrite on a partitioned table = rewrite one partition,
    not the table (the W4 delete-insert at scale)."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out = str(tmp_path / "t")
        events = load_table(spark, sf_dir, "events").withColumn(
            "event_date", F.to_date("ts")
        )
        events.write.partitionBy("event_date").parquet(out)
        before = spark.read.parquet(out)
        before_count = before.count()
        target_day = before.selectExpr("min(event_date) AS d").collect()[0]["d"]
        # materialize the replacement before overwriting the files it reads
        replacement_rows = (
            before.filter(F.col("event_date") == target_day)
            .withColumn("event_type", F.lit("REWRITTEN"))
            .collect()
        )
        replacement = spark.createDataFrame(replacement_rows, before.schema)
        # dynamic partition overwrite touches only the partitions present in
        # the written data
        replacement.write.mode("overwrite").partitionBy("event_date").parquet(out)
        spark.catalog.refreshByPath(out)
        after = spark.read.parquet(out)
        assert after.count() == before_count
        assert (
            after.filter(F.col("event_date") == target_day)
            .filter(F.col("event_type") != "REWRITTEN")
            .count()
            == 0
        )
        # other partitions untouched
        assert (
            after.filter(F.col("event_date") != target_day)
            .filter(F.col("event_type") == "REWRITTEN")
            .count()
            == 0
        )
    finally:
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
