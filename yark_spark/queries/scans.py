"""Scans, filters, projections, existence checks — SURVEY.md §2.1/§2.3.

Reference parity: every SELECT in the reference is a point lookup, filter
scan, projection, or existence probe (`cmds/archive.py:126,180,209,282,340,
356,362,397`). All are plain DataFrame ops here so Catalyst pushes the
predicate and prunes columns at the Parquet scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yark_spark.io import load_table
from yark_spark.queries.fixtures import FIXTURES_DIR
from yark_spark.registry import query


@query(
    "q_full_scan",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def q_full_scan(spark, sf_dir):
    """S8 full table scan (`cmds/archive.py:209,356`)."""
    return load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")


@query(
    "q_projection",
    oracle="SELECT o_orderkey, o_custkey, o_totalprice FROM orders",
)
def q_projection(spark, sf_dir):
    """F6 projection / column pruning (`cmds/archive.py:209`)."""
    return load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")


@query(
    "q_point_lookup",
    oracle="SELECT o_orderkey, o_custkey, o_orderstatus FROM orders WHERE o_orderkey = 7",
)
def q_point_lookup(spark, sf_dir):
    """F1 PK point lookup (`cmds/archive.py:126-129`) — pushdown-able equality."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") == F.lit(7))
        .select("o_orderkey", "o_custkey", "o_orderstatus")
    )


@query(
    "q_filter_scan",
    oracle=(
        "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_returnflag = 'R'"
    ),
)
def q_filter_scan(spark, sf_dir):
    """F5 non-key predicate scan (`cmds/archive.py:356` availability='lost')."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "q_not_null_filter",
    oracle="SELECT event_id, props FROM events WHERE props IS NOT NULL",
)
def q_not_null_filter(spark, sf_dir):
    """K2's `thumbnail IS NOT NULL` dump filter (`cmds/archive.py:201-221`)."""
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("props").isNotNull())
        .select("event_id", "props")
    )


@query(
    "q_semi_join",
    oracle=(
        "SELECT c_custkey, c_name FROM customer "
        "WHERE c_custkey IN (SELECT o_custkey FROM orders)"
    ),
)
def q_semi_join(spark, sf_dir):
    """F2 existence probe (`cmds/archive.py:180`) as a left-semi join.

    Scale: the probe side is an aggregated key set — Catalyst broadcasts it
    when small, else shuffles on the key; either way no row multiplication.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "q_anti_join",
    oracle=(
        "SELECT c_custkey, c_name FROM customer "
        "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)"
    ),
)
def q_anti_join(spark, sf_dir):
    """F3 insert-only-novel-rows probe (`cmds/archive.py:180-181,282`)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "q_multi_key_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q_multi_key_dedup(spark, sf_dir):
    """F4 compound-key duplicate suppression (`cmds/archive.py:340` —
    (video, watched) probe). Map-side partial distinct then shuffle on both
    keys; streaming variant in yark_spark.streaming uses
    withWatermark+dropDuplicates."""
    return load_table(spark, sf_dir, "events").select("user_id", "event_type").distinct()


@query(
    "q_csv_scan",
    oracle=(
        f"SELECT playlist_id, video, added FROM read_csv('{FIXTURES_DIR}/playlist.csv', "
        "header=true, columns={'playlist_id':'VARCHAR','video':'VARCHAR','added':'BIGINT'})"
    ),
)
def q_csv_scan(spark, sf_dir):
    """S5 Takeout playlist CSV source (`cmds/archive.py:229-247`)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from yark_spark.io import read_csv_source
    from yark_spark.queries.fixtures import fixture_path

    schema = StructType(
        [
            StructField("playlist_id", StringType()),
            StructField("video", StringType()),
            StructField("added", LongType()),
        ]
    )
    return read_csv_source(spark, fixture_path("playlist.csv"), schema=schema).select(
        "playlist_id", "video", "added"
    )


@query(
    "q_json_scan",
    oracle=(
        f"SELECT titleUrl, time, unavailable FROM read_json('{FIXTURES_DIR}/watch-history.json', "
        "columns={'titleUrl':'VARCHAR','time':'VARCHAR','unavailable':'BOOLEAN'}, "
        "format='array')"
    ),
)
def q_json_scan(spark, sf_dir):
    """S6 watch-history JSON source (`cmds/archive.py:317-327`)."""
    from pyspark.sql.types import BooleanType, StringType, StructField, StructType

    from yark_spark.io import read_json_source
    from yark_spark.queries.fixtures import fixture_path

    schema = StructType(
        [
            StructField("titleUrl", StringType()),
            StructField("time", StringType()),
            StructField("unavailable", BooleanType()),
        ]
    )
    return read_json_source(spark, fixture_path("watch-history.json"), schema=schema).select(
        "titleUrl", "time", "unavailable"
    )
