"""Query keys exercising the write-semantics operators (SURVEY.md §2.4).

Each key applies a yark_spark.operators.writes function to a base fixture
table plus a *derived* incoming batch (pure function of the same table, so
the DuckDB oracle can reproduce it), and returns the resulting table state.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yark_spark.io import load_table
from yark_spark.operators.writes import (
    cascade_delete,
    delete_all,
    delete_insert,
    insert_ignore,
    upsert,
)
from yark_spark.registry import query


@query(
    "q_insert_ignore",
    oracle=(
        "WITH incoming AS ("
        "  SELECT c_custkey + 100 AS c_custkey, 'new_' || c_name AS c_name"
        "  FROM customer WHERE c_custkey <= 60) "
        "SELECT c_custkey, c_name FROM customer "
        "UNION ALL "
        "SELECT i.c_custkey, i.c_name FROM incoming i "
        "WHERE i.c_custkey NOT IN (SELECT c_custkey FROM customer)"
    ),
)
def q_insert_ignore(spark, sf_dir):
    """W1 INSERT OR IGNORE (`cmds/archive.py:144-150`): keys 101..160 collide
    with existing customers and are ignored; the rest insert."""
    existing = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    incoming = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 60)
        .select(
            (F.col("c_custkey") + 100).alias("c_custkey"),
            F.concat(F.lit("new_"), F.col("c_name")).alias("c_name"),
        )
    )
    return insert_ignore(existing, incoming, ["c_custkey"])


@query(
    "q_upsert_merge",
    oracle=(
        "WITH src AS ("
        "  SELECT c_custkey, 'upd_' || c_name AS c_name, c_acctbal + 10.0 AS c_acctbal"
        "  FROM customer WHERE c_custkey % 3 = 0"
        "  UNION ALL"
        "  SELECT c_custkey + 1000, 'ins_' || c_name, c_acctbal"
        "  FROM customer WHERE c_custkey % 5 = 0) "
        "SELECT coalesce(t.c_custkey, s.c_custkey) AS c_custkey, "
        "CASE WHEN t.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL AND s.c_acctbal > 0 "
        "     THEN s.c_name "
        "     WHEN t.c_custkey IS NOT NULL THEN t.c_name ELSE s.c_name END AS c_name, "
        "CASE WHEN t.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL AND s.c_acctbal > 0 "
        "     THEN s.c_acctbal "
        "     WHEN t.c_custkey IS NOT NULL THEN t.c_acctbal ELSE s.c_acctbal END AS c_acctbal "
        "FROM customer t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey"
    ),
)
def q_upsert_merge(spark, sf_dir):
    """W2 guarded MERGE (`cmds/archive.py:152-175`): matched rows update only
    when the incoming row passes the quality guard (positive balance here,
    mirroring the reference's refuse-partial-data condition at `:162`)."""
    customer = load_table(spark, sf_dir, "customer")
    target = customer.select("c_custkey", "c_name", "c_acctbal")
    updates = customer.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.concat(F.lit("upd_"), F.col("c_name")).alias("c_name"),
        (F.col("c_acctbal") + F.lit(10.0)).alias("c_acctbal"),
    )
    inserts = customer.filter(F.col("c_custkey") % 5 == 0).select(
        (F.col("c_custkey") + 1000).alias("c_custkey"),
        F.concat(F.lit("ins_"), F.col("c_name")).alias("c_name"),
        "c_acctbal",
    )
    source = updates.unionByName(inserts)
    return upsert(target, source, ["c_custkey"], update_guard=F.col("s.c_acctbal") > 0)


@query(
    "q_delete_insert",
    oracle=(
        "SELECT c_custkey, c_name, c_mktsegment FROM customer "
        "WHERE c_mktsegment <> 'BUILDING' "
        "UNION ALL "
        "SELECT c_custkey + 10000, c_name, 'REBUILT' FROM customer "
        "WHERE c_mktsegment = 'BUILDING'"
    ),
)
def q_delete_insert(spark, sf_dir):
    """W4 delete-then-insert overwrite (playlist replacement,
    `cmds/archive.py:282-294`)."""
    customer = load_table(spark, sf_dir, "customer")
    target = customer.select("c_custkey", "c_name", "c_mktsegment")
    replacement = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        (F.col("c_custkey") + 10000).alias("c_custkey"),
        "c_name",
        F.lit("REBUILT").alias("c_mktsegment"),
    )
    return delete_insert(target, replacement, F.col("c_mktsegment") == "BUILDING")


@query(
    "q_delete_all",
    oracle=(
        "SELECT 'nation' AS tbl, n_nationkey AS id FROM nation WHERE 1 = 0 "
        "UNION ALL "
        "SELECT 'customer' AS tbl, c_custkey AS id FROM customer "
        "WHERE c_nationkey + 20 NOT IN (SELECT n_nationkey FROM nation)"
    ),
)
def q_delete_all(spark, sf_dir):
    """W6 delete-all (`cmds/archive.py:421-425`): the parent empties; the
    CASCADE child keeps only rows whose FK referenced no parent (the +20
    shift makes nationkeys 5..24 dangle past the 0..24 key space, mirroring
    playlist_videos' keep-dangling-videos-by-design posture)."""
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer").withColumn(
        "fk", F.col("c_nationkey") + 20
    )
    empty_parent, kids = delete_all(
        nation, "n_nationkey", {"customer": (customer, "fk", "n_nationkey")}
    )
    out = empty_parent.select(
        F.lit("nation").alias("tbl"), F.col("n_nationkey").cast("long").alias("id")
    )
    return out.unionByName(
        kids["customer"].select(
            F.lit("customer").alias("tbl"), F.col("c_custkey").cast("long").alias("id")
        )
    )


@query(
    "q_cascade_delete",
    oracle=(
        "SELECT 'nation' AS tbl, n_nationkey AS id FROM nation "
        "WHERE n_nationkey NOT IN (1, 2, 3) "
        "UNION ALL SELECT 'customer', c_custkey FROM customer "
        "WHERE c_nationkey NOT IN (1, 2, 3) "
        "UNION ALL SELECT 'supplier', s_suppkey FROM supplier "
        "WHERE s_nationkey NOT IN (1, 2, 3)"
    ),
)
def q_cascade_delete(spark, sf_dir):
    """W5 ON DELETE CASCADE (`schema.sql:25-26,39-41,91`): deleting nations
    {1,2,3} wipes dependent customers and suppliers via left-anti rewrites;
    output is all surviving (table, id) pairs."""
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    doomed = nation.filter(F.col("n_nationkey").isin(1, 2, 3)).select("n_nationkey")
    surviving_nation, kids = cascade_delete(
        nation,
        doomed,
        {
            "customer": (customer, "c_nationkey", "n_nationkey"),
            "supplier": (supplier, "s_nationkey", "n_nationkey"),
        },
    )
    out = surviving_nation.select(
        F.lit("nation").alias("tbl"), F.col("n_nationkey").cast("long").alias("id")
    )
    out = out.unionByName(
        kids["customer"].select(F.lit("customer").alias("tbl"), F.col("c_custkey").cast("long").alias("id"))
    )
    out = out.unionByName(
        kids["supplier"].select(F.lit("supplier").alias("tbl"), F.col("s_suppkey").cast("long").alias("id"))
    )
    return out
