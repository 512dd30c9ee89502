"""Extended relational surface: the long tail of SQL-analytics operators a
user of the reference's archive would expect from a full engine
(SURVEY.md §2.7 categories, widened). All built-ins; same hash-match
discipline as relational.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from yark_spark.io import load_table
from yark_spark.registry import query


@query(
    "q_cube",
    oracle=(
        "SELECT o_orderstatus, o_orderpriority, count(*) AS n, "
        "round(sum(o_totalprice), 2) AS total "
        "FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)"
    ),
)
def q_cube(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@query(
    "q_grouping_sets",
    oracle=(
        "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty "
        "FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))"
    ),
)
def q_grouping_sets(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupingSets([["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


@query(
    "q_pivot",
    oracle=(
        "SELECT l_returnflag, "
        "round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O, "
        "round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F "
        "FROM lineitem GROUP BY l_returnflag"
    ),
)
def q_pivot(spark, sf_dir):
    """Pivot with pinned values (open-ended pivot needs a collect for the
    value set — pinned keeps it one pass, the 100 TB-safe form)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


@query(
    "q_exists_subquery",
    oracle=(
        "SELECT c_custkey, c_name FROM customer c WHERE EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        "AND o.o_totalprice > 300000)"
    ),
)
def q_exists_subquery(spark, sf_dir):
    """Correlated EXISTS through the SQL entry point (decorrelates to a
    semi join — same plan as q_semi_join)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        "SELECT c_custkey, c_name FROM v_customer c WHERE EXISTS "
        "(SELECT 1 FROM v_orders o WHERE o.o_custkey = c.c_custkey "
        "AND o.o_totalprice > 300000)"
    )


@query(
    "q_scalar_subquery",
    oracle=(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)"
    ),
)
def q_scalar_subquery(spark, sf_dir):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_sc")
    return spark.sql(
        "SELECT o_orderkey, o_totalprice FROM v_orders_sc "
        "WHERE o_totalprice > (SELECT avg(o_totalprice) FROM v_orders_sc)"
    )


@query(
    "q_cross_join",
    oracle=(
        "SELECT r_name, n_name FROM region CROSS JOIN nation WHERE n_regionkey < 2"
    ),
)
def q_cross_join(spark, sf_dir):
    """Explicit cartesian (tiny dims only — a guarded op at scale)."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") < 2)
    return region.crossJoin(nation).select("r_name", "n_name")


@query(
    "q_union_all",
    oracle=(
        "SELECT c_custkey AS id FROM customer UNION ALL SELECT user_id FROM events"
    ),
)
def q_union_all(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("id"))
    e = load_table(spark, sf_dir, "events").select(F.col("user_id").alias("id"))
    return c.union(e)


@query(
    "q_intersect_all",
    oracle=(
        "SELECT o_custkey AS id FROM orders INTERSECT ALL SELECT user_id FROM events"
    ),
)
def q_intersect_all(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("id"))
    e = load_table(spark, sf_dir, "events").select(F.col("user_id").alias("id"))
    return o.intersectAll(e)


@query(
    "q_except_all",
    oracle=(
        "SELECT o_custkey AS id FROM orders EXCEPT ALL SELECT user_id FROM events"
    ),
)
def q_except_all(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("id"))
    e = load_table(spark, sf_dir, "events").select(F.col("user_id").alias("id"))
    return o.exceptAll(e)


@query(
    "q_stats_agg",
    oracle=(
        "SELECT o_orderstatus, round(stddev_samp(o_totalprice), 4) AS sd, "
        "round(var_samp(o_totalprice), 4) AS var, "
        "round(min(o_totalprice), 2) AS lo, round(max(o_totalprice), 2) AS hi "
        "FROM orders GROUP BY o_orderstatus"
    ),
)
def q_stats_agg(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.stddev_samp("o_totalprice"), 4).alias("sd"),
            F.round(F.var_samp("o_totalprice"), 4).alias("var"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@query(
    "q_minmax_by",
    oracle=(
        "SELECT o_orderstatus, max_by(o_orderkey, o_totalprice) AS top_order, "
        "min_by(o_orderkey, o_totalprice) AS bottom_order "
        "FROM orders GROUP BY o_orderstatus"
    ),
)
def q_minmax_by(spark, sf_dir):
    """argmax/argmin aggregation. NOTE: assumes unique o_totalprice per
    group for determinism (holds for the fixture data; ties would need a
    struct-ordering max instead)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("top_order"),
            F.min_by("o_orderkey", "o_totalprice").alias("bottom_order"),
        )
    )


@query(
    "q_percentile",
    oracle=(
        "SELECT l_returnflag, round(quantile_cont(l_quantity, 0.5), 4) AS p50, "
        "round(quantile_cont(l_quantity, 0.9), 4) AS p90 "
        "FROM lineitem GROUP BY l_returnflag"
    ),
)
def q_percentile(spark, sf_dir):
    """Exact percentiles (linear interpolation — same method both engines).
    The 100 TB substitute is approx_percentile (t-digest sketch), which has
    no cross-engine oracle; declared separately as rows-only."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", 0.5), 4).alias("p50"),
            F.round(F.percentile("l_quantity", 0.9), 4).alias("p90"),
        )
    )


@query("q_approx_percentile")  # rows-only: sketch internals are engine-specific
def q_approx_percentile(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_percentile("l_quantity", 0.5, 1000).alias("p50_approx"))
    )


@query(
    "q_window_dense",
    oracle=(
        "SELECT event_id, user_id, "
        "dense_rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS dr, "
        "ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS quartile, "
        "round(percent_rank() OVER (PARTITION BY user_id ORDER BY value, event_id), 6) AS pr "
        "FROM events"
    ),
)
def q_window_dense(spark, sf_dir):
    w_val = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    w_ts = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_pr = Window.partitionBy("user_id").orderBy("value", "event_id")
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.dense_rank().over(w_val).alias("dr"),
        F.ntile(4).over(w_ts).alias("quartile"),
        F.round(F.percent_rank().over(w_pr), 6).alias("pr"),
    )


@query(
    "q_window_sliding_frame",
    oracle=(
        "SELECT event_id, user_id, "
        "round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS avg3, "
        "first_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_event "
        "FROM events"
    ),
)
def q_window_sliding_frame(spark, sf_dir):
    w3 = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w3), 4).alias("avg3"),
        F.first("event_id").over(wf).alias("first_event"),
    )


@query(
    "q_window_lead",
    oracle=(
        "SELECT event_id, user_id, "
        "lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_event, "
        "lag(event_id, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev2_event "
        "FROM events"
    ),
)
def q_window_lead(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.lead("event_id").over(w).alias("next_event"),
        F.lag("event_id", 2).over(w).alias("prev2_event"),
    )


@query(
    "q_date_functions",
    oracle=(
        "SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m, "
        "day(o_orderdate) AS d, dayofweek(o_orderdate) AS dow, "
        "strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30, "
        "strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end "
        "FROM orders"
    ),
)
def q_date_functions(spark, sf_dir):
    """Calendar functions; computed dates serialized as strings so both
    engines hash identically. NOTE dow: DuckDB dayofweek is 0=Sunday,
    Spark dayofweek is 1=Sunday → Spark side subtracts 1."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.date_format(F.date_add("o_orderdate", 30), "yyyy-MM-dd").alias("plus30"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
    )


@query(
    "q_string_functions",
    oracle=(
        "SELECT p_partkey, upper(p_name) AS up, length(p_name) AS len, "
        "lpad(p_brand, 12, '*') AS padded, substring(p_type, 1, 5) AS prefix, "
        "instr(p_type, 'BRASS') AS brass_pos, trim('  x  ') AS trimmed "
        "FROM part"
    ),
)
def q_string_functions(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.length("p_name").alias("len"),
        F.lpad("p_brand", 12, "*").alias("padded"),
        F.substring("p_type", 1, 5).alias("prefix"),
        F.instr(F.col("p_type"), "BRASS").cast("long").alias("brass_pos"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
    )


@query(
    "q_posexplode",
    oracle=(
        "SELECT doc_id, unnest(range(len(string_split(text, ' ')))) AS pos, "
        "unnest(string_split(text, ' ')) AS tok "
        "FROM documents WHERE doc_id < 50"
    ),
)
def q_posexplode(spark, sf_dir):
    """Positional explode (DuckDB zips parallel unnests; Spark posexplode)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "tok")


@query(
    "q_array_functions",
    oracle=(
        "SELECT vec_id, len(embedding) AS dim, "
        "round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_dim, "
        "list_contains(list_transform(embedding, x -> x > 0), true) AS has_positive "
        "FROM embeddings"
    ),
)
def q_array_functions(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_dim"),
        F.exists("embedding", lambda x: x > 0).alias("has_positive"),
    )


@query(
    "q_tpch_q3_shape",
    oracle=(
        "SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
        "strftime(o_orderdate, '%Y-%m-%d') AS orderdate "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "GROUP BY l_orderkey, o_orderdate "
        "ORDER BY revenue DESC, l_orderkey LIMIT 10"
    ),
)
def q_tpch_q3_shape(spark, sf_dir):
    """Shipping-priority analytic shape (TPC-H Q3): selective dim filter →
    fact join chain → agg → top-k. The customer filter prunes before the
    join; top-k avoids a global sort."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q_tpch_q5_shape",
    oracle=(
        "SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'ASIA' "
        "GROUP BY n_name"
    ),
)
def q_tpch_q5_shape(spark, sf_dir):
    """Local-volume shape (TPC-H Q5): multi-join star with region filter,
    dims broadcast."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
