"""Joins, aggregations, windows, set ops, sort/limit — SURVEY.md §2.7.

These are the queries latent in the reference's FK graph
(`schema.sql:8-92`: comments→videos→channels→users etc.) made first-class.
All pure DataFrame built-ins: Catalyst chooses broadcast-hash for small
dimensions and sort-merge for fact-fact joins; AQE re-plans at runtime.

Hash-match notes: aggregates over doubles are rounded identically on both
sides (summation order differs across engines/partitions); every ranked or
limited result carries an explicit tie-break so the row *set* is
deterministic.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from yark_spark.io import load_table
from yark_spark.registry import query


@query(
    "q_join_inner",
    oracle=(
        "SELECT l_orderkey, l_linenumber, l_extendedprice, o_orderstatus, o_orderdate "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ),
)
def q_join_inner(spark, sf_dir):
    """Inner equi-join on the fact FK (videos→channels analogue,
    `schema.sql:67`). Fact-fact: sort-merge on the key at scale; AQE
    converts to broadcast if the build side turns out small."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "o_orderstatus", "o_orderdate"
    )


@query(
    "q_join_3way",
    oracle=(
        "SELECT c_custkey, c_name, n_name, r_name "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey"
    ),
)
def q_join_3way(spark, sf_dir):
    """Multi-way chain (comments→videos→channels→users analogue,
    `schema.sql:39-41,67,14`). nation/region are tiny dims → both joins
    broadcast; zero shuffles of the big side."""
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@query(
    "q_join_left",
    oracle=(
        "SELECT event_id, user_id, c_name "
        "FROM events LEFT JOIN customer ON user_id = c_custkey"
    ),
)
def q_join_left(spark, sf_dir):
    """Left outer join over a deliberately FK-less key (history.video,
    `schema.sql:72` — dangling watch events survive with NULLs)."""
    events = load_table(spark, sf_dir, "events")
    customer = F.broadcast(load_table(spark, sf_dir, "customer"))
    return events.join(customer, events.user_id == customer.c_custkey, "left").select(
        "event_id", "user_id", "c_name"
    )


@query(
    "q_left_join_enrich",
    oracle=(
        "SELECT o_orderkey, o_totalprice, c_name AS enriched_name, "
        "coalesce(c_acctbal, 0.0) AS enriched_acctbal "
        "FROM orders LEFT JOIN customer ON o_custkey = c_custkey"
    ),
)
def q_left_join_enrich(spark, sf_dir):
    """S3 RYD-ratings enrichment shape (`cmds/archive.py:97-103` — external
    attributes left-joined onto the fact, missing → default)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = F.broadcast(load_table(spark, sf_dir, "customer"))
    return orders.join(customer, orders.o_custkey == customer.c_custkey, "left").select(
        "o_orderkey",
        "o_totalprice",
        F.col("c_name").alias("enriched_name"),
        F.coalesce(F.col("c_acctbal"), F.lit(0.0)).alias("enriched_acctbal"),
    )


@query(
    "q_join_range",
    oracle=(
        "SELECT o_orderkey, l_linenumber, l_shipdate "
        "FROM orders JOIN lineitem ON l_orderkey = o_orderkey "
        "AND l_shipdate >= o_orderdate "
        "AND l_shipdate < o_orderdate + INTERVAL 30 DAY"
    ),
)
def q_join_range(spark, sf_dir):
    """Range join ('watched within N days of upload', SURVEY §2.7). The
    equi-key carries the shuffle; the range predicate evaluates post-match,
    so this stays a hash/sort-merge join — never a cross product."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cond = (
        (lineitem.l_orderkey == orders.o_orderkey)
        & (lineitem.l_shipdate >= orders.o_orderdate)
        & (lineitem.l_shipdate < orders.o_orderdate + F.expr("INTERVAL 30 DAY"))
    )
    return orders.join(lineitem, cond).select("o_orderkey", "l_linenumber", "l_shipdate")


@query(
    "q_asof_join",
    oracle=(
        "SELECT e.event_id, e.user_id, e.ts, "
        "(SELECT max(o_orderdate) FROM orders o "
        " WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) AS asof_orderdate "
        "FROM events e"
    ),
)
def q_asof_join(spark, sf_dir):
    """As-of join: latest order at-or-before each event, per user.

    Spark-first design (the 100 TB path): instead of a per-row correlated
    lookup, union both sides tagged by kind, sort within user by time, and
    carry the last seen order date forward with a running-window ``max`` —
    one shuffle on user_id, no row multiplication, no skew from hot users
    beyond what the window already implies. This is the standard
    distributed as-of pattern (a merge_asof via union+window).
    """
    from yark_spark.operators.asof import asof_join

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), F.col("o_orderdate")
    )
    return asof_join(
        events, orders, "user_id", "ts", "o_orderdate", "o_orderdate", "asof_orderdate"
    ).select("event_id", "user_id", "ts", "asof_orderdate")


@query(
    "q_groupby_agg",
    oracle=(
        "SELECT l_returnflag, l_linestatus, "
        "round(sum(l_quantity), 2) AS sum_qty, "
        "round(sum(l_extendedprice), 2) AS sum_base_price, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
        "round(avg(l_quantity), 6) AS avg_qty, "
        "count(*) AS count_order "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"
    ),
)
def q_groupby_agg(spark, sf_dir):
    """Hash aggregation (TPC-H Q1 shape; the reference's only aggregation is
    a Python counter, `cmds/archive.py:335` — P5). Partial (map-side)
    aggregation before the shuffle is automatic for these built-ins."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "q_count_filtered",
    oracle="SELECT count(*) AS n_returned FROM lineitem WHERE l_returnflag = 'R'",
)
def q_count_filtered(spark, sf_dir):
    """P5 recovered-count aggregation (`cmds/archive.py:335,357-363`)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .agg(F.count(F.lit(1)).alias("n_returned"))
    )


@query(
    "q_count_distinct",
    oracle=(
        "SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers "
        "FROM orders GROUP BY o_orderstatus"
    ),
)
def q_count_distinct(spark, sf_dir):
    """Distinct aggregation (PK-constraint role in the reference, W1)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
    )


@query("q_approx_count_distinct")  # rows-only: HLL sketches differ across engines
def q_approx_count_distinct(spark, sf_dir):
    """approx_count_distinct — the 100 TB substitute for exact distinct
    (no full shuffle of the distinct keys; fixed-size HLL sketch merge)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.approx_count_distinct("o_custkey", 0.01).alias("n_customers_approx"))
    )


@query(
    "q_rollup",
    oracle=(
        "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, "
        "count(*) AS n "
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"
    ),
)
def q_rollup(spark, sf_dir):
    """Grouping sets / rollup with margins (per-(channel,category) analogue)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_window_rank",
    oracle=(
        "SELECT o_custkey, o_orderkey, o_totalprice FROM ("
        "  SELECT o_custkey, o_orderkey, o_totalprice, "
        "  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn"
        "  FROM orders) t WHERE rn <= 3"
    ),
)
def q_window_rank(spark, sf_dir):
    """Ranking window — top-N orders per customer ('top video per channel').
    One shuffle on the partition key; o_orderkey tie-break makes the set
    deterministic."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "q_window_running",
    oracle=(
        "SELECT event_id, user_id, "
        "round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value, "
        "count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n "
        "FROM events"
    ),
)
def q_window_running(spark, sf_dir):
    """Analytic frame window — running totals over the watch-history event
    log (`schema.sql:70-74`). Partitioned by user so state never concentrates
    on one task (a global ORDER BY window would single-task at 100 TB)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


@query(
    "q_window_lag",
    oracle=(
        "SELECT event_id, user_id, "
        "date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) "
        "AS secs_since_prev FROM events"
    ),
)
def q_window_lag(spark, sf_dir):
    """lag/lead — time-between-watches (SURVEY §2.7)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        (F.unix_timestamp("ts") - F.unix_timestamp(prev)).alias("secs_since_prev"),
    )


@query(
    "q_topk",
    oracle=(
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
    ),
)
def q_topk(spark, sf_dir):
    """Sort/limit → Spark TakeOrderedAndProject: per-partition top-k then a
    k-row merge on the driver — no global sort at any scale."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q_union",
    oracle=(
        "SELECT c_custkey AS id FROM customer UNION SELECT user_id AS id FROM events"
    ),
)
def q_union(spark, sf_dir):
    """Set union (playlist ids vs history ids, `schema.sql:86-92,70-74`)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("id"))
    e = load_table(spark, sf_dir, "events").select(F.col("user_id").alias("id"))
    return c.union(e).distinct()


@query(
    "q_intersect",
    oracle=(
        "SELECT c_custkey AS id FROM customer INTERSECT SELECT user_id AS id FROM events"
    ),
)
def q_intersect(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("id"))
    e = load_table(spark, sf_dir, "events").select(F.col("user_id").alias("id"))
    return c.intersect(e)


@query(
    "q_except",
    oracle=(
        "SELECT c_custkey AS id FROM customer EXCEPT SELECT user_id AS id FROM events"
    ),
)
def q_except(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("id"))
    e = load_table(spark, sf_dir, "events").select(F.col("user_id").alias("id"))
    return c.subtract(e)


@query(
    "q_date_trunc",
    oracle=(
        "SELECT date_trunc('day', ts) AS day, count(*) AS n_events, "
        "round(sum(value), 4) AS sum_value FROM events GROUP BY 1"
    ),
)
def q_date_trunc(spark, sf_dir):
    """Date/time bucketing (`watched` by day, SURVEY §2.7)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


@query(
    "q_json_extract",
    oracle=(
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events"
    ),
)
def q_json_extract(spark, sf_dir):
    """JSON functions over the semi-structured props column (ingest-side
    JSON in the reference, S6)."""
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )


@query(
    "q_collect_explode",
    oracle=(
        "SELECT o_custkey, unnest(list_sort(list(o_orderkey))) AS o_orderkey "
        "FROM orders GROUP BY o_custkey"
    ),
)
def q_collect_explode(spark, sf_dir):
    """Array functions — re-nest then flatten (tags-per-video analogue,
    `schema.sql:21-27`): collect_list → array_sort → explode."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.array_sort(F.collect_list("o_orderkey")).alias("ids"))
        .select("o_custkey", F.explode("ids").alias("o_orderkey"))
    )
