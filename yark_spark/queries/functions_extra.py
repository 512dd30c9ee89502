"""Additional cross-engine function batteries: hashes, edit distance,
comparisons, bit manipulation — the remaining scalar surface a full engine
offers (SURVEY.md §2.5 widened)."""

from __future__ import annotations

from pyspark.sql import functions as F

from yark_spark.io import load_table
from yark_spark.registry import query


@query(
    "q_hash_functions",
    oracle=(
        "SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256 "
        "FROM documents WHERE doc_id < 100"
    ),
)
def q_hash_functions(spark, sf_dir):
    """Cryptographic digests — identical hex across engines; the content-
    address primitives behind exact dedup and fingerprinting."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.md5("text").alias("h_md5"),
            F.sha2("text", 256).alias("h_sha256"),
        )
    )


@query(
    "q_levenshtein",
    oracle=(
        "WITH base AS (SELECT doc_id, substring(text, 1, 40) AS prefix "
        "FROM documents WHERE doc_id < 15) "
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        "levenshtein(a.prefix, b.prefix) AS edit_dist "
        "FROM base a JOIN base b ON a.doc_id < b.doc_id"
    ),
)
def q_levenshtein(spark, sf_dir):
    """Edit-distance near-dup scoring on bounded prefixes (levenshtein is
    O(len²) per pair — at scale it runs only on LSH candidate pairs, never
    the cross product; bounded here so the oracle stays cheap)."""
    base = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 15)
        .select("doc_id", F.substring("text", 1, 40).alias("prefix"))
    )
    a = base.select(F.col("doc_id").alias("id_a"), F.col("prefix").alias("pa"))
    b = base.select(F.col("doc_id").alias("id_b"), F.col("prefix").alias("pb"))
    return a.join(b, F.col("id_a") < F.col("id_b")).select(
        "id_a", "id_b", F.levenshtein("pa", "pb").alias("edit_dist")
    )


@query(
    "q_greatest_least",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "greatest(l_quantity, l_discount * 100) AS hi, "
        "least(l_quantity, l_tax * 100) AS lo FROM lineitem"
    ),
)
def q_greatest_least(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias("hi"),
        F.least(F.col("l_quantity"), F.col("l_tax") * 100).alias("lo"),
    )


@query(
    "q_bit_ops",
    oracle=(
        "SELECT o_orderkey, o_orderkey & 255 AS low_byte, "
        "xor(o_orderkey, 42) AS xored, o_orderkey % 16 AS bucket FROM orders"
    ),
)
def q_bit_ops(spark, sf_dir):
    """Bit manipulation — the primitive layer under hash partitioning,
    bloom filters, and simhash banding."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("o_orderkey").bitwiseXOR(F.lit(42)).alias("xored"),
        (F.col("o_orderkey") % 16).alias("bucket"),
    )
