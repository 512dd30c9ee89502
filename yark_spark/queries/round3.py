"""Round-3 extension keys: deeper TPC-H shapes, event analytics
(sessionization, funnels, cohorts), and further training-data-pipeline ops
(TF-IDF, containment dedup, embedding profiling, skew-salted aggregation).

Registered after extras (see queries/__init__) so the driver's 50-key
window — which fronts not-yet-verified keys — picks these up alongside the
round-2 leftovers without displacing anything queued.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from yark_spark.io import load_table
from yark_spark.registry import query

# ---------------------------------------------------------------------------
# TPC-H shapes (columns adapted to the fixture schemas; shapes per the spec)
# ---------------------------------------------------------------------------


@query(
    "q_tpch_q6_shape",
    oracle=(
        "SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, "
        "count(*) AS n_lines FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1997-01-01' "
        "AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24"
    ),
)
def q_tpch_q6_shape(spark, sf_dir):
    """TPC-H Q6 (forecast revenue change): the pure predicate-pushdown
    showcase — every filter reaches the Parquet scan (asserted in
    tests/test_plans.py), no join, map-side partial agg to one row."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.02, 0.04))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q_tpch_q12_shape",
    oracle=(
        "SELECT l_returnflag, "
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
        "CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count "
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
        "WHERE l_shipdate > o_orderdate GROUP BY l_returnflag"
    ),
)
def q_tpch_q12_shape(spark, sf_dir):
    """TPC-H Q12 (shipping priority split): fact-fact join + conditional
    aggregation (CASE inside sum) — shuffles once on the join key, partial
    aggs map-side."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q_tpch_q14_shape",
    oracle=(
        "SELECT round(100.0 * "
        "sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) "
        "ELSE 0 END) / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1996-04-01'"
    ),
)
def q_tpch_q14_shape(spark, sf_dir):
    """TPC-H Q14 (promotion effect): broadcast-dim join + conditional ratio
    aggregate — the part table broadcasts, lineitem never shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
        )
        .join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


@query(
    "q_tpch_q16_shape",
    oracle=(
        "SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt "
        "FROM part JOIN lineitem ON p_partkey = l_partkey "
        "WHERE p_brand <> 'Brand#1' AND p_size <= 10 "
        "GROUP BY p_brand, p_size"
    ),
)
def q_tpch_q16_shape(spark, sf_dir):
    """TPC-H Q16 (supplier-part relationship count): join + COUNT DISTINCT
    per group — Spark expands to a two-phase distinct aggregate (partial
    dedup map-side)."""
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter((F.col("p_brand") != "Brand#1") & (F.col("p_size") <= 10))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q18_shape",
    oracle=(
        "SELECT c_name, o_orderkey, round(sum(l_quantity), 2) AS total_qty "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON o_orderkey = l_orderkey "
        "WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem "
        "GROUP BY l_orderkey HAVING sum(l_quantity) > 250) "
        "GROUP BY c_name, o_orderkey"
    ),
)
def q_tpch_q18_shape(spark, sf_dir):
    """TPC-H Q18 (large-volume customers): HAVING subquery as a semi-join
    against the pre-aggregated order totals, then the 3-way join + final
    agg. The qualifying-order set is tiny → broadcast semi-join; lineitem
    aggregates once per stage, never twice over the full table."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big_orders), "l_orderkey", "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "o_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )


@query(
    "q_tpch_q19_shape",
    oracle=(
        "SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
        "count(*) AS n_lines "
        "FROM lineitem JOIN part ON l_partkey = p_partkey WHERE "
        "(p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 5 "
        " AND l_quantity BETWEEN 1 AND 11) "
        "OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10 "
        " AND l_quantity BETWEEN 10 AND 20) "
        "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 15 "
        " AND l_quantity BETWEEN 20 AND 30)"
    ),
)
def q_tpch_q19_shape(spark, sf_dir):
    """TPC-H Q19 (discounted revenue, OR-of-ANDs): the disjunctive
    predicate spans both tables, so it evaluates post-join while the
    single-table conjuncts Catalyst can extract still push to the scans."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    cond = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Window / aggregate breadth
# ---------------------------------------------------------------------------


@query(
    "q_first_last_value",
    oracle=(
        "SELECT c_custkey, "
        "first_value(c_name) OVER w AS poorest, "
        "last_value(c_name) OVER w AS richest, "
        "nth_value(c_name, 2) OVER w AS second_poorest "
        "FROM customer "
        "WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
    ),
)
def q_first_last_value(spark, sf_dir):
    """first/last/nth_value over a full-partition frame — per-nation
    extremes attached to every row; partitioned window, scales with the
    partition key's cardinality."""
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.first("c_name").over(w).alias("poorest"),
        F.last("c_name").over(w).alias("richest"),
        F.nth_value("c_name", 2).over(w).alias("second_poorest"),
    )


@query(
    "q_range_frame",
    oracle=(
        "SELECT o_orderkey, round(sum(o_totalprice) OVER ("
        "PARTITION BY o_orderpriority ORDER BY o_totalprice "
        "RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW), 2) AS near_sum "
        "FROM orders"
    ),
)
def q_range_frame(spark, sf_dir):
    """Value-based (RANGE) window frame: sum of order totals within $1000
    below each order, per priority class — completes the frame family
    (ROWS frames are covered by q_window_sliding_frame). Peer rows share
    the frame, so ties are deterministic without an id tie-break."""
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, Window.currentRow)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("near_sum")
    )


@query(
    "q_regr_stats",
    oracle=(
        "SELECT l_returnflag, "
        "round(regr_slope(l_extendedprice, l_quantity), 4) AS slope, "
        "round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept, "
        "round(regr_r2(l_extendedprice, l_quantity), 6) AS r2, "
        "regr_count(l_extendedprice, l_quantity) AS n "
        "FROM lineitem GROUP BY l_returnflag"
    ),
)
def q_regr_stats(spark, sf_dir):
    """Linear-regression aggregates (slope/intercept/R²) per group — the
    data-profiling family beyond corr/covar; single shuffle, partial aggs
    map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n"),
    )


@query(
    "q_median_by_group",
    oracle=(
        "SELECT o_orderpriority, round(median(o_totalprice), 4) AS median_price, "
        "count(*) AS n FROM orders GROUP BY o_orderpriority"
    ),
)
def q_median_by_group(spark, sf_dir):
    """Exact (interpolated) median per group — both engines interpolate at
    even counts; completes the percentile family with the exact form."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.median("o_totalprice"), 4).alias("median_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Event analytics: sessionization, burst dedup, funnel, retention cohorts
# ---------------------------------------------------------------------------

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min in microseconds (exact ints)
BURST_GAP_US = 5 * 60 * 1_000_000


@query(
    "q_sessionize",
    oracle=(
        "WITH flagged AS (SELECT event_id, user_id, ts, "
        "CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) "
        "- lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w "
        f"> {SESSION_GAP_US} THEN 1 ELSE 0 END AS new_s "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
        "SELECT event_id, user_id, "
        "CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx "
        "FROM flagged"
    ),
)
def q_sessionize(spark, sf_dir):
    """Batch sessionization (the batch twin of session_window, but with an
    oracle): a new session starts after >30 min of per-user inactivity;
    session_idx is the running count of session starts. Gap arithmetic in
    integer microseconds so both engines compare exactly. Windows partition
    by user — no global window, scales with user cardinality."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    new_s = F.when(us - F.lag(us).over(w) > SESSION_GAP_US, 1).otherwise(0)
    return ev.select(
        "event_id",
        "user_id",
        F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias(
            "session_idx"
        ),
    )


@query(
    "q_event_dedup_burst",
    oracle=(
        "WITH gapped AS (SELECT event_id, "
        "epoch_us(CAST(ts AS TIMESTAMP)) "
        "- lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER "
        "(PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap "
        "FROM events) "
        f"SELECT event_id FROM gapped WHERE gap IS NULL OR gap > {BURST_GAP_US}"
    ),
)
def q_event_dedup_burst(spark, sf_dir):
    """Burst dedup: keep only the FIRST event of any rapid-fire run (same
    user + type within 5 min) — the time-window dedup a click/impression
    pipeline applies. Partitioned lag, exact integer-microsecond gaps."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    return (
        ev.select("event_id", gap.alias("__gap"))
        .filter(F.col("__gap").isNull() | (F.col("__gap") > BURST_GAP_US))
        .select("event_id")
    )


@query(
    "q_funnel",
    oracle=(
        "WITH a AS (SELECT user_id, min(ts) AS first_view FROM events "
        "WHERE event_type = 'view' GROUP BY user_id), "
        "b AS (SELECT user_id, min(ts) AS first_purchase FROM events "
        "WHERE event_type = 'purchase' GROUP BY user_id) "
        "SELECT a.user_id, a.first_view, b.first_purchase "
        "FROM a JOIN b ON a.user_id = b.user_id "
        "WHERE b.first_purchase > a.first_view"
    ),
)
def q_funnel(spark, sf_dir):
    """Two-step funnel (view → purchase): users whose first purchase
    strictly follows their first view. Two partial-agg passes + one
    equi-join on user — no window, no per-user scan."""
    ev = load_table(spark, sf_dir, "events")
    a = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return a.join(b, "user_id").filter(
        F.col("first_purchase") > F.col("first_view")
    ).select("user_id", "first_view", "first_purchase")


@query(
    "q_retention_cohort",
    oracle=(
        "WITH firsts AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0 "
        "FROM events GROUP BY user_id), "
        "activity AS (SELECT e.user_id, "
        "CAST(floor(date_diff('day', f.d0, CAST(e.ts AS DATE)) / 7) AS BIGINT) AS week_offset, "
        "CAST(floor(date_diff('day', DATE '2024-01-01', f.d0) / 7) AS BIGINT) AS cohort_week "
        "FROM events e JOIN firsts f ON e.user_id = f.user_id) "
        "SELECT cohort_week, week_offset, count(DISTINCT user_id) AS active_users "
        "FROM activity GROUP BY cohort_week, week_offset"
    ),
)
def q_retention_cohort(spark, sf_dir):
    """Retention cohorts: users bucketed by first-activity week, activity
    counted per week offset — the standard triangle. Day arithmetic from a
    fixed epoch (no locale-dependent week truncation); the firsts table is
    tiny and broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    joined = ev.join(F.broadcast(firsts), "user_id")
    return (
        joined.select(
            "user_id",
            F.floor(F.datediff(F.to_date("ts"), F.col("d0")) / 7)
            .cast("long")
            .alias("week_offset"),
            F.floor(F.datediff(F.col("d0"), F.lit("2024-01-01").cast("date")) / 7)
            .cast("long")
            .alias("cohort_week"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


# ---------------------------------------------------------------------------
# Training-data pipeline: TF-IDF, containment dedup, embedding profiling
# ---------------------------------------------------------------------------

TFIDF_MAX_ID = 80
TFIDF_K = 5


@query(
    "q_tfidf",
    oracle=(
        "WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS tok "
        f"FROM documents WHERE doc_id < {TFIDF_MAX_ID}), "
        "tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY doc_id, tok), "
        "df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY tok), "
        "n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tok), "
        "scored AS (SELECT tf.doc_id, tf.tok, "
        "round(tf.tf * ln((1.0 + n_docs) / (1.0 + df.df)), 6) AS tfidf "
        "FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n), "
        "ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id "
        "ORDER BY tfidf DESC, tok) AS rn FROM scored) "
        f"SELECT doc_id, tok, tfidf FROM ranked WHERE rn <= {TFIDF_K}"
    ),
)
def q_tfidf(spark, sf_dir):
    """Top-k characteristic terms per document by TF-IDF (smoothed idf =
    ln((1+N)/(1+df))) over a bounded corpus slice. Explode → two partial
    aggs → broadcast df/N back → per-doc window top-k (partition = doc, so
    no global window; rows per partition = the doc's vocabulary)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < TFIDF_MAX_ID)
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.trim(F.col("text"))), "[ \\t\\n\\x0B\\f\\r]+")).alias("tok")
    )
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n = tok.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf") * F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= TFIDF_K)
        .select("doc_id", "tok", "tfidf")
    )


@query(
    "q_containment_pairs",
    oracle=(
        "WITH tok AS (SELECT doc_id, "
        "unnest(list_distinct(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'))) AS tok "
        "FROM documents WHERE doc_id < 40), "
        "sizes AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n "
        "FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id <> b.doc_id "
        "GROUP BY 1, 2) "
        "SELECT id_a, id_b, round(n / sa.sz, 6) AS containment FROM inter "
        "JOIN sizes sa ON sa.doc_id = id_a "
        "WHERE round(n / sa.sz, 6) >= 0.5"
    ),
)
def q_containment_pairs(spark, sf_dir):
    """Token-set CONTAINMENT (|A∩B| / |A|) — the asymmetric near-dup
    metric that catches a doc embedded inside a larger one, where Jaccard
    dilutes. Directed pairs (A⊂B ≠ B⊂A); token equi-join, never a cross
    join."""
    from yark_spark.operators.dedup import containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(docs, "doc_id", "text", max_id=40, threshold=0.5)


@query(
    "q_embedding_centroid",
    oracle=(
        "SELECT label, dim, round(avg(v), 6) AS centroid_v FROM ("
        "SELECT label, unnest(range(0, len(embedding))) AS dim, "
        "unnest(CAST(embedding AS DOUBLE[])) AS v FROM embeddings) "
        "GROUP BY label, dim"
    ),
)
def q_embedding_centroid(spark, sf_dir):
    """Per-label centroid vector — the class-prototype computation behind
    IVF quantizers and diversity sampling. posexplode → groupBy (label,
    dim): the shuffle key is (label, dim), so wide vectors spread across
    reducers instead of pinning one task per label."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode(F.col("embedding").cast("array<double>")))
        .groupBy("label", F.col("pos").alias("dim"))
        .agg(F.round(F.avg("col"), 6).alias("centroid_v"))
    )


@query(
    "q_embedding_normalize",
    oracle=(
        "WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e "
        "FROM embeddings WHERE vec_id < 50), "
        "norms AS (SELECT vec_id, e, sqrt(list_aggregate("
        "list_transform(e, x -> x * x), 'sum')) AS nrm FROM base) "
        "SELECT vec_id, unnest(range(0, len(e))) AS dim, "
        "round(unnest(e) / nrm, 6) AS v FROM norms"
    ),
)
def q_embedding_normalize(spark, sf_dir):
    """L2-normalization of embedding vectors (unit sphere — the standard
    prep before cosine ANN): norm via one JVM-side fold, then posexplode.
    Map-only until the explode; no shuffle at all."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    e = F.col("embedding").cast("array<double>")
    nrm = F.sqrt(
        F.aggregate(F.transform(e, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )
    return (
        emb.select("vec_id", e.alias("__e"), nrm.alias("__n"))
        .select("vec_id", F.posexplode("__e"), F.col("__n"))
        .select(
            "vec_id", F.col("pos").alias("dim"), F.round(F.col("col") / F.col("__n"), 6).alias("v")
        )
    )


@query(
    "q_array_stats",
    oracle=(
        "SELECT vec_id, "
        "round(list_aggregate(CAST(embedding AS DOUBLE[]), 'min'), 6) AS vmin, "
        "round(list_aggregate(CAST(embedding AS DOUBLE[]), 'max'), 6) AS vmax, "
        "round(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum') "
        "/ len(embedding), 6) AS vavg "
        "FROM embeddings"
    ),
)
def q_array_stats(spark, sf_dir):
    """Per-vector profiling (min/max/mean component) — embedding sanity
    stats computed entirely map-side with JVM array folds."""
    e = F.col("embedding").cast("array<double>")
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.round(F.array_min(e), 6).alias("vmin"),
        F.round(F.array_max(e), 6).alias("vmax"),
        F.round(
            F.aggregate(e, F.lit(0.0), lambda acc, v: acc + v) / F.size(e), 6
        ).alias("vavg"),
    )


@query(
    "q_salted_agg",
    oracle=(
        "SELECT o_orderpriority, count(*) AS n_lines, "
        "round(sum(l_quantity), 2) AS total_qty "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE o_orderpriority = '1-URGENT' "
        "GROUP BY o_orderpriority"
    ),
)
def q_salted_agg(spark, sf_dir):
    """Skew-salted join, driver-verified for CORRECTNESS: salted_join
    (content-hash salt on the big side, small side replicated per salt)
    must produce exactly the rows of the plain equi-join — the oracle IS
    the plain join. The deterministic pmod(xxhash64) salt keeps retries and
    speculative tasks consistent (VERDICT r1 item 6)."""
    from yark_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_quantity"
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("okey"), "o_orderpriority")
    )
    return (
        salted_join(li, o, on="okey", salt=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Training-data curation: deterministic splits, mixture sampling, quality
# rules, n-gram generation (all content-hash-driven so re-runs, retries and
# both engines agree bit-for-bit — no rand() anywhere)
# ---------------------------------------------------------------------------

# Content-hash bucket in [0, 65536): first 4 hex digits of md5(text).
# Spark: conv(hex, 16, 10); DuckDB: '0x'||hex cast. Same value both sides.
_BUCKET_SQL = "CAST('0x' || substr(md5(text), 1, 4) AS BIGINT)"


def _bucket_col() -> "F.Column":
    return F.conv(F.substring(F.md5(F.col("text")), 1, 4), 16, 10).cast("long")


@query(
    "q_train_test_split",
    oracle=(
        f"WITH b AS (SELECT doc_id, {_BUCKET_SQL} % 10 AS bucket FROM documents) "
        "SELECT doc_id, CASE WHEN bucket < 8 THEN 'train' "
        "WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split FROM b"
    ),
)
def q_train_test_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split keyed on a CONTENT hash
    (md5 of the text, not the row id) — duplicate texts land in the same
    split, so near-dup leakage across splits is impossible by construction,
    and the assignment is stable under re-partitioning, retries, and
    re-runs. Map-only; no shuffle, no rand()."""
    docs = load_table(spark, sf_dir, "documents")
    b = _bucket_col() % 10
    return docs.select(
        "doc_id",
        F.when(b < 8, "train").when(b == 8, "val").otherwise("test").alias("split"),
    )


@query(
    "q_mixture_sample",
    oracle=(
        "WITH rates AS (SELECT 'src' || i AS source, "
        "CASE i % 4 WHEN 0 THEN 1.0 WHEN 1 THEN 0.5 WHEN 2 THEN 0.25 "
        "ELSE 0.125 END AS rate FROM range(0, 20) t(i)) "
        f"SELECT doc_id, d.source FROM documents d JOIN rates USING (source) "
        f"WHERE {_BUCKET_SQL} < rate * 65536"
    ),
)
def q_mixture_sample(spark, sf_dir):
    """Source-weighted mixture sampling — the data-mixing step that
    up/down-weights corpora to a target training blend. Keep a doc iff its
    content-hash bucket falls under the source's rate: deterministic,
    exactly reproducible, and executed as a broadcast join + map-side
    filter (no rand(), no shuffle of the corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    rates = spark.createDataFrame(
        [(f"src{i}", [1.0, 0.5, 0.25, 0.125][i % 4]) for i in range(20)],
        "source string, rate double",
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(_bucket_col() < F.col("rate") * 65536)
        .select("doc_id", "source")
    )


@query(
    "q_gopher_quality",
    oracle=(
        "WITH w AS (SELECT doc_id, "
        "string_split(trim(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ') AS words, "
        "length(text) AS n_chars_raw FROM documents), "
        "m AS (SELECT doc_id, len(words) AS n_words, "
        "CAST(list_aggregate(list_transform(words, x -> length(x)), 'sum') AS DOUBLE) "
        "/ len(words) AS mean_wlen, "
        "len(list_filter(words, x -> x IN ('the','a','of','to','and','in','is'))) "
        "AS n_stop FROM w WHERE len(words) > 0) "
        "SELECT doc_id, n_words, round(mean_wlen, 4) AS mean_word_len, "
        "CAST(n_words BETWEEN 15 AND 100000 "
        "AND mean_wlen BETWEEN 2 AND 12 AND n_stop >= 1 AS BOOLEAN) AS keep "
        "FROM m"
    ),
)
def q_gopher_quality(spark, sf_dir):
    """Gopher-style rule-based quality filter (Rae et al. 2021 heuristics,
    thresholds adapted to the fixture corpus): word-count band, mean word
    length band, and a stopword-presence check. Pure Column expressions —
    one map-only pass, no Python in the row path; the keep flag composes
    with q_mixture_sample/q_train_test_split into a full curation plan."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")), " ")
    n_words = F.size(words)
    mean_wlen = (
        F.aggregate(
            F.transform(words, lambda x: F.length(x)), F.lit(0), lambda a, v: a + v
        ).cast("double")
        / n_words
    )
    n_stop = F.size(
        F.filter(words, lambda x: x.isin("the", "a", "of", "to", "and", "in", "is"))
    )
    return docs.filter(n_words > 0).select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(mean_wlen, 4).alias("mean_word_len"),
        (
            n_words.between(15, 100000)
            & mean_wlen.between(2, 12)
            & (n_stop >= 1)
        ).alias("keep"),
    )


NGRAM_N = 3
NGRAM_MAX_ID = 30


@query(
    "q_ngram_generate",
    oracle=(
        "WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS l "
        f"FROM documents WHERE doc_id < {NGRAM_MAX_ID}) "
        "SELECT doc_id, unnest(list_transform(range(1, len(l) - 1), "
        "i -> array_to_string(l[i:i+2], ' '))) AS gram "
        f"FROM t WHERE len(l) >= {NGRAM_N}"
    ),
)
def q_ngram_generate(spark, sf_dir):
    """Word n-gram generation (the shingling primitive under MinHash,
    decontamination, and fingerprinting) as a first-class op: JVM-side
    sequence+slice+explode, 1-based slice semantics identical in both
    engines. Map-only until the explode."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < NGRAM_MAX_ID)
    toks = F.split(F.lower(F.trim(F.col("text"))), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (NGRAM_N - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, NGRAM_N)),
    )
    return (
        docs.filter(F.size(toks) >= NGRAM_N)
        .select("doc_id", F.explode(grams).alias("gram"))
    )


@query(
    "q_unpivot",
    oracle=(
        "SELECT c_custkey, 'acctbal' AS metric, CAST(c_acctbal AS DOUBLE) AS v "
        "FROM customer "
        "UNION ALL "
        "SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS v "
        "FROM customer"
    ),
)
def q_unpivot(spark, sf_dir):
    """Unpivot/melt (wide → long) via the native unpivot operator — the
    inverse of q_pivot; generates rows with a single pass, no join, no
    shuffle."""
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            F.col("c_acctbal").cast("double").alias("acctbal"),
            F.col("c_nationkey").cast("double").alias("nationkey"),
        )
        .unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "v")
    )


# ---------------------------------------------------------------------------
# Streaming twins: stream-stream interval join + watermarked dedup.
# Real readStream versions live in yark_spark/streaming/pipelines.py and
# are proven batch-equivalent in tests/test_streaming.py; these batch twins
# carry the DuckDB oracle for the window/join algebra.
# ---------------------------------------------------------------------------

JOIN_MAX_USER = 400


@query(
    "q_stream_interval_join",
    oracle=(
        "SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id "
        "FROM events v JOIN events p ON v.user_id = p.user_id "
        "AND v.event_type = 'view' AND p.event_type = 'purchase' "
        "AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR "
        f"WHERE v.user_id < {JOIN_MAX_USER} AND p.user_id < {JOIN_MAX_USER}"
    ),
)
def q_stream_interval_join(spark, sf_dir):
    """Stream-stream interval join, batch twin: purchases attributed to any
    view by the same user in the preceding hour. The streaming form
    (yark_spark.streaming.pipelines.interval_join) watermarks both sides
    and bounds state by the same 1-hour interval; this twin carries the
    oracle. Equi-key on user_id → shuffle on user, interval predicate
    evaluated inside the joined partition — never a cross join."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < JOIN_MAX_USER)
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("v_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    return (
        v.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("v_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select("view_id", "purchase_id", "user_id")
    )


@query(
    "q_stream_interval_join_left",
    oracle=(
        "SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id "
        "FROM events v LEFT JOIN events p ON v.user_id = p.user_id "
        "AND p.event_type = 'purchase' "
        "AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR "
        f"WHERE v.event_type = 'view' AND v.user_id < {JOIN_MAX_USER}"
    ),
)
def q_stream_interval_join_left(spark, sf_dir):
    """LEFT-OUTER stream-stream interval join, batch twin: every view keeps
    a row — attributed purchases within the following hour, or NULL when
    the view never converted. The streaming form is
    pipelines.interval_join(how="leftOuter"): watermarks on both sides +
    the interval bound let Spark emit unmatched left rows once the
    watermark passes their horizon, with state still bounded. Same shuffle
    shape as the inner twin (equi-key on user, interval evaluated inside
    the joined partition)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < JOIN_MAX_USER)
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("v_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    return (
        v.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("v_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
            "left",
        )
        .select("view_id", "purchase_id", "user_id")
    )


@query(
    "q_stream_dedup",
    oracle=(
        "SELECT user_id, event_type, date_trunc('minute', ts) AS minute_bucket, "
        "min(event_id) AS keep_event_id FROM events "
        "GROUP BY user_id, event_type, date_trunc('minute', ts)"
    ),
)
def q_stream_dedup(spark, sf_dir):
    """Watermarked streaming dedup, batch twin: one representative per
    (user, type, minute). The streaming form uses
    withWatermark + dropDuplicates (pipelines.watermarked_dedup) whose
    keep-first-arrival is run-order-dependent; the twin pins min(event_id)
    so the oracle is deterministic. Single partial-agg shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "user_id", "event_type", F.date_trunc("minute", F.col("ts")).alias("minute_bucket")
    ).agg(F.min("event_id").alias("keep_event_id"))


TOKEN_BUDGET = 2000


@query(
    "q_token_budget_sample",
    oracle=(
        "WITH c AS (SELECT doc_id, source, "
        "CAST(sum(len(string_split(trim(text), ' '))) OVER ("
        "PARTITION BY source ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens "
        "FROM documents) "
        f"SELECT doc_id, source, cum_tokens FROM c WHERE cum_tokens <= {TOKEN_BUDGET}"
    ),
)
def q_token_budget_sample(spark, sf_dir):
    """Per-source token-budget sampling: take docs (in stable id order)
    until each source's running token count hits the budget — how a
    training run caps any one corpus's contribution. The cumsum window
    partitions BY SOURCE, so it scales with source cardinality; a global
    budget would go through the distributed prefix sum instead
    (operators/packing)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), " "))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select(
            "doc_id",
            "source",
            F.sum(n_tok).over(w).cast("long").alias("cum_tokens"),
        )
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET)
    )


@query(
    "q_attribution_last_touch",
    oracle=(
        "WITH ranked AS (SELECT p.event_id AS purchase_id, v.event_id AS view_id, "
        "row_number() OVER (PARTITION BY p.event_id "
        "ORDER BY v.ts DESC, v.event_id DESC) AS rn "
        "FROM events p JOIN events v ON p.user_id = v.user_id "
        "AND p.event_type = 'purchase' AND v.event_type = 'view' "
        "AND v.ts < p.ts AND v.ts >= p.ts - INTERVAL 24 HOUR "
        "WHERE p.user_id < 400) "
        "SELECT purchase_id, view_id FROM ranked WHERE rn = 1"
    ),
)
def q_attribution_last_touch(spark, sf_dir):
    """Last-touch attribution: each purchase credits the MOST RECENT view
    by the same user within a 24 h lookback — the event-analytics sibling
    of the as-of join. Equi-join on user + in-partition interval predicate,
    then a per-purchase window keeps one row; never a cross join, window
    partitions by purchase (no global ordering)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 400)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    joined = p.join(
        v,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") < F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 24 HOUR")),
    )
    w = Window.partitionBy("purchase_id").orderBy(F.desc("v_ts"), F.desc("view_id"))
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("purchase_id", "view_id")
    )


@query(
    "q_tpch_q4_shape",
    oracle=(
        "SELECT o_orderpriority, count(*) AS order_count FROM orders "
        "WHERE o_orderdate >= DATE '1996-01-01' "
        "AND o_orderdate < DATE '1996-04-01' "
        "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
        "AND l_returnflag = 'R') "
        "GROUP BY o_orderpriority"
    ),
)
def q_tpch_q4_shape(spark, sf_dir):
    """TPC-H Q4 shape (order priority checking): EXISTS decorrelates to a
    LEFT-SEMI join on the order key — the fixture lineitem carries no
    commit/receipt dates, so 'late lines' becomes 'returned lines'
    (l_returnflag = 'R'), preserving the spec's plan shape: lineitem is
    pre-filtered before the semi join so the probe side shrinks map-side;
    one shuffle for the semi join, partial agg after."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    late = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return (
        o.join(late, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )
