"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (smoke, sf0.001); ``queries()`` /
``oracle_sql()`` expose every implemented SURVEY.md §2 query key for the
DuckDB differential check at sf0.01. Implementations live in
yark_spark/queries/ (one module per §2 section); the registry guarantees a
1:1 key mapping between the Spark form and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7 minimum slice): revenue per nation —
    scan → broadcast-dim join chain → hash agg → top-k. Exercises the full
    Catalyst path the rest of the surface builds on."""
    from pyspark.sql import functions as F

    from yark_spark.io import load_table

    customer = load_table(spark, SF0001, "customer")
    orders = load_table(spark, SF0001, "orders")
    lineitem = load_table(spark, SF0001, "lineitem")
    nation = F.broadcast(load_table(spark, SF0001, "nation"))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from yark_spark.queries import QUERIES, driver_ordered

    return driver_ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    from yark_spark.queries import ORACLES, driver_ordered

    return driver_ordered(ORACLES)
