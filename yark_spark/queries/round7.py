"""Round-7 second-wave query keys (SURVEY.md §2.8 E31+ and the TPC-H
completions): retrieval (BM25, hybrid RRF), time series (gap fill,
outlier trim), privacy (pseudonymization), text curation (normalization,
top-bigram repetition, exact-substring coverage, incremental dedup,
quota sampling), ops tooling (snapshot diff, data-quality gate, column
profiling), join/SQL surface (full-outer, null-safe, lateral, Python
UDTF, salted-join contract, score calibration, audio decode), and the
TPC-H shapes Q2/Q7/Q8/Q10/Q13/Q15/Q17/Q20/Q21/Q22.

Every key here is oracle-checked (hash-match). The reference has no
retrieval/time-series/quality surface at all (its only query shapes are
PK lookups and predicate scans —
/root/reference/cmds/archive.py:126,356); these extend the
training-data-pipeline layer (SURVEY.md §2.8).
"""

from __future__ import annotations

from yark_spark.io import load_table
from yark_spark.registry import query

#: repo-wide tokenizer parity class (see operators/dedup.tokens).
_TOK = "string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')"

BM25_TERMS = ("spark", "window", "hash")
_BM25_K1 = 1.2
_BM25_B = 0.75

def _quality_cte() -> str:
    """DuckDB CTE text computing (doc_id, source, quality) — the SQL twin
    of functions/text.quality_score, shared by the calibration and
    hybrid-fusion oracles (same formula q_quality_score pins)."""
    from yark_spark.queries.text import _STOP_IN

    return (
        "t AS (SELECT doc_id, source, text, "
        "string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS toks FROM documents), "
        "feat AS (SELECT doc_id, source, "
        f"round(len(list_filter(toks, t -> t IN ({_STOP_IN}))) / greatest(len(toks), 1), 6) AS sw, "
        "round((length(text) - length(regexp_replace(text, '[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]', '', 'g')))"
        " / greatest(length(text), 1), 6) AS pr, "
        "round(list_aggregate(list_transform(toks, t -> length(t)), 'sum')"
        " / greatest(len(toks), 1), 6) AS mwl FROM t), "
        "q AS (SELECT doc_id, source, round("
        "least(sw * 4, 1.0) * 0.5 + (1 - least(pr * 5, 1.0)) * 0.3 "
        "+ (CASE WHEN mwl >= 3 AND mwl <= 10 THEN 1.0 ELSE 0.0 END) * 0.2, 6) AS quality "
        "FROM feat)"
    )


#: BM25 as CTE text ending in a `bm(doc_id, bm25)` relation, shared by
#: the standalone oracle and the hybrid-fusion oracle.
_BM25_CTE = (
    f"tokb AS (SELECT doc_id, {_TOK} AS t FROM documents), "
    "lenb AS (SELECT doc_id, len(t) AS dl FROM tokb), "
    "st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lenb), "
    "w AS (SELECT doc_id, unnest(t) AS tok FROM tokb), "
    "tf AS (SELECT doc_id, tok, count(*) AS tf FROM w "
    f"WHERE tok IN ('{BM25_TERMS[0]}', '{BM25_TERMS[1]}', '{BM25_TERMS[2]}') GROUP BY 1, 2), "
    "dfr AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1), "
    "bm AS (SELECT tf.doc_id, "
    f"round(sum(ln(1.0 + (st.n_docs - dfr.df + 0.5) / (dfr.df + 0.5)) "
    f"* tf.tf * ({_BM25_K1} + 1.0) "
    f"/ (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * lenb.dl / st.avgdl))), 6) AS bm25 "
    "FROM tf JOIN dfr USING (tok) JOIN lenb USING (doc_id) CROSS JOIN st "
    "GROUP BY tf.doc_id)"
)

_BM25_ORACLE = f"WITH {_BM25_CTE} SELECT doc_id, bm25 FROM bm"


@query("q_bm25", oracle=_BM25_ORACLE)
def q_bm25(spark, sf_dir):
    """Okapi BM25 keyword retrieval over the corpus for a fixed 3-term
    query. Postings are filtered to the query terms BEFORE any shuffle;
    document frequencies and corpus stats broadcast
    (operators/retrieval.bm25)."""
    from yark_spark.operators.retrieval import bm25

    docs = load_table(spark, sf_dir, "documents")
    return bm25(docs, list(BM25_TERMS), k1=_BM25_K1, b=_BM25_B)


def _hybrid_oracle() -> str:
    return (
        f"WITH {_quality_cte()}, {_BM25_CTE}, "
        "bmr AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r "
        "FROM bm ORDER BY bm25 DESC, doc_id LIMIT 100), "
        "qr AS (SELECT doc_id, row_number() OVER (ORDER BY quality DESC, doc_id) AS r "
        "FROM q ORDER BY quality DESC, doc_id LIMIT 100) "
        "SELECT coalesce(bmr.doc_id, qr.doc_id) AS doc_id, "
        "round(coalesce(1.0 / (60 + bmr.r), 0) + coalesce(1.0 / (60 + qr.r), 0), 6) AS rrf "
        "FROM bmr FULL OUTER JOIN qr ON bmr.doc_id = qr.doc_id"
    )


@query("q_hybrid_rrf", oracle=_hybrid_oracle())
def q_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval via reciprocal-rank fusion (Cormack et al. 2009):
    the BM25 keyword ranker fused with the quality ranker, top-100 each,
    Σ 1/(60 + rank). The RAG-stack shape — lexical + prior fused on
    bounded candidate lists (operators/retrieval.rrf_fuse); global
    ordering only ever touches the top-k, via TakeOrderedAndProject."""
    from pyspark.sql import functions as F

    from yark_spark.functions.text import quality_score
    from yark_spark.operators.retrieval import bm25, rrf_fuse

    docs = load_table(spark, sf_dir, "documents")
    bm = bm25(docs, list(BM25_TERMS), k1=_BM25_K1, b=_BM25_B)
    quality = docs.select("doc_id", quality_score(F.col("text")).alias("quality"))
    return rrf_fuse([(bm, "bm25"), (quality, "quality")], top=100)


_GAP_FILL_ORACLE = (
    "WITH b AS (SELECT user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket FROM events), "
    "c AS (SELECT user_id, bucket, count(*) AS n FROM b GROUP BY 1, 2), "
    "r AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM b GROUP BY 1), "
    "g AS (SELECT user_id, unnest(generate_series(lo, hi)) AS bucket FROM r) "
    "SELECT g.user_id, g.bucket, CAST(coalesce(c.n, 0) AS BIGINT) AS n_events "
    "FROM g LEFT JOIN c USING (user_id, bucket)"
)


@query("q_gap_fill", oracle=_GAP_FILL_ORACLE)
def q_gap_fill(spark, sf_dir):
    """Dense hourly event grid per user, zero-filled between each user's
    first and last event — integer epoch buckets, grid generated
    distributed via sequence()+explode (operators/timeseries
    .gap_fill_counts)."""
    from yark_spark.operators.timeseries import gap_fill_counts

    events = load_table(spark, sf_dir, "events")
    return gap_fill_counts(events, "user_id", "ts", bucket_seconds=3600)


_OUTLIER_TRIM_ORACLE = (
    f"WITH n AS (SELECT doc_id, source, len({_TOK}) AS n_tokens FROM documents), "
    "band AS (SELECT source, quantile_cont(n_tokens, 0.05) AS lo, "
    "quantile_cont(n_tokens, 0.95) AS hi FROM n GROUP BY source) "
    "SELECT n.doc_id, n.source, CAST(n.n_tokens AS BIGINT) AS n_tokens "
    "FROM n JOIN band USING (source) "
    "WHERE n.n_tokens >= band.lo AND n.n_tokens <= band.hi"
)


@query("q_outlier_trim", oracle=_OUTLIER_TRIM_ORACLE)
def q_outlier_trim(spark, sf_dir):
    """Per-source length-outlier trim: keep documents inside their
    source's exact interpolated [P05, P95] token-length band. Percentile
    table is |sources| rows, broadcast onto the fact scan
    (operators/timeseries.percentile_trim)."""
    from pyspark.sql import functions as F

    from yark_spark.operators.dedup import tokens
    from yark_spark.operators.timeseries import percentile_trim

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "source", F.size(tokens(docs)).cast("long").alias("n_tokens")
    )
    return percentile_trim(base, "source", "n_tokens", 0.05, 0.95)


_PSEUDONYMIZE_ORACLE = (
    "SELECT substr(sha256('yark:' || CAST(user_id AS VARCHAR)), 1, 16) AS pseudo_id, "
    "CAST(count(*) AS BIGINT) AS n_events, "
    "CAST(count(DISTINCT event_type) AS BIGINT) AS n_types "
    "FROM events GROUP BY 1"
)


@query("q_pseudonymize", oracle=_PSEUDONYMIZE_ORACLE)
def q_pseudonymize(spark, sf_dir):
    """GDPR-style pseudonymization: user ids replaced by salted-SHA-256
    pseudonyms (functions/scalar.pseudonymize) while per-user analytics
    still aggregate correctly — the groupBy on the pseudonym proves
    referential consistency survives the mapping. Map-only hash + one
    partial-agg shuffle."""
    from pyspark.sql import functions as F

    from yark_spark.functions.scalar import pseudonymize

    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            pseudonymize(F.col("user_id")).alias("pseudo_id"), "event_type"
        )
        .groupBy("pseudo_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
        )
    )


_TEXT_NORMALIZE_ORACLE = (
    "SELECT doc_id, "
    "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm_text "
    "FROM documents"
)


@query("q_text_normalize", oracle=_TEXT_NORMALIZE_ORACLE)
def q_text_normalize(spark, sf_dir):
    """Dedup-key normalization pre-pass: lowercase, collapse
    non-alphanumeric runs, trim (functions/text.normalize_text).
    Map-only, string output — zero float risk."""
    from pyspark.sql import functions as F

    from yark_spark.functions.text import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", normalize_text(F.col("text")).alias("norm_text"))


_JOIN_FULL_ORACLE = (
    "WITH c AS (SELECT user_id, count(*) AS n_clicks FROM events "
    "WHERE event_type = 'click' GROUP BY user_id), "
    "p AS (SELECT user_id, count(*) AS n_purchases FROM events "
    "WHERE event_type = 'purchase' GROUP BY user_id) "
    "SELECT coalesce(c.user_id, p.user_id) AS user_id, "
    "CAST(coalesce(c.n_clicks, 0) AS BIGINT) AS n_clicks, "
    "CAST(coalesce(p.n_purchases, 0) AS BIGINT) AS n_purchases "
    "FROM c FULL OUTER JOIN p ON c.user_id = p.user_id"
)


@query("q_join_full", oracle=_JOIN_FULL_ORACLE)
def q_join_full(spark, sf_dir):
    """FULL OUTER join (§2.7 join family's last uncovered type): per-user
    click vs purchase counts where either side may be absent. Both
    inputs pre-aggregate (map-side partial) before the join, so the
    outer join runs on |users|-bounded sides sharing one shuffle key."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")

    def _counts(etype, out):
        return (
            events.filter(F.col("event_type") == etype)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias(out))
        )

    clicks = _counts("click", "n_clicks")
    purchases = _counts("purchase", "n_purchases")
    return (
        clicks.join(purchases, "user_id", "full_outer")
        .select(
            "user_id",
            F.coalesce("n_clicks", F.lit(0)).cast("long").alias("n_clicks"),
            F.coalesce("n_purchases", F.lit(0)).cast("long").alias("n_purchases"),
        )
    )


def _salted_join_oracle() -> str:
    return (
        "WITH dim AS (SELECT DISTINCT l_returnflag AS flag, "
        "ascii(l_returnflag) AS w FROM lineitem) "
        "SELECT li.l_returnflag AS flag, CAST(count(*) AS BIGINT) AS n_rows, "
        "round(sum(li.l_quantity * dim.w), 4) AS weighted_qty "
        "FROM lineitem li JOIN dim ON li.l_returnflag = dim.flag "
        "GROUP BY li.l_returnflag"
    )


@query("q_salted_join", oracle=_salted_join_oracle())
def q_salted_join(spark, sf_dir):
    """Correctness key for the skew-salting JOIN recipe (the perf side is
    bench_stress.skew_join): lineitem joined to a 3-row dim on the
    heavily-skewed l_returnflag THROUGH operators/skew.salted_join — the
    oracle computes the plain join, so the driver proves the salt
    replication loses/duplicates nothing. The salt spreads each hot key
    over `salt` reducers; the small side replicates ×salt."""
    from pyspark.sql import functions as F

    from yark_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    dim = li.select(F.col("l_returnflag").alias("flag")).distinct().select(
        "flag", F.ascii(F.col("flag")).alias("w")
    )
    joined = salted_join(li, dim.withColumnRenamed("flag", "l_returnflag"), "l_returnflag", salt=8)
    return (
        joined.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("l_quantity") * F.col("w")), 4).alias("weighted_qty"),
        )
    )


def _calibration_oracle() -> str:
    return (
        f"WITH {_quality_cte()} "
        "SELECT doc_id, source, quality, "
        "round(percent_rank() OVER (PARTITION BY source ORDER BY quality, doc_id), 6) "
        "AS calibrated FROM q"
    )


@query("q_score_calibration", oracle=_calibration_oracle())
def q_score_calibration(spark, sf_dir):
    """Cross-source score calibration: raw quality scores are NOT
    comparable across sources (each source has its own distribution), so
    mixture weighting uses the within-source percentile instead —
    percent_rank over a window PARTITIONED by source with a (quality,
    doc_id) tie-break for determinism. One shuffle on source; no global
    sort."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from yark_spark.functions.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    q = docs.select("doc_id", "source", quality_score(F.col("text")).alias("quality"))
    w = Window.partitionBy("source").orderBy("quality", "doc_id")
    return q.select(
        "doc_id",
        "source",
        "quality",
        F.round(F.percent_rank().over(w), 6).alias("calibrated"),
    )


_NULL_SAFE_ORACLE = (
    "WITH a AS (SELECT nullif(event_type, 'error') AS k, count(*) AS n_even "
    "FROM events WHERE event_id % 2 = 0 GROUP BY 1), "
    "b AS (SELECT nullif(event_type, 'error') AS k, count(*) AS n_odd "
    "FROM events WHERE event_id % 2 = 1 GROUP BY 1) "
    "SELECT a.k, CAST(a.n_even AS BIGINT) AS n_even, CAST(b.n_odd AS BIGINT) AS n_odd "
    "FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k"
)


@query("q_null_safe_join", oracle=_NULL_SAFE_ORACLE)
def q_null_safe_join(spark, sf_dir):
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): the NULL
    group ('error' events nulled via nullif) must MATCH across sides
    instead of silently dropping — the semantics gap that loses rows when
    joining on nullable derived keys. Both sides pre-aggregate to
    \\|event types\\| rows before the join."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    k = F.nullif(F.col("event_type"), F.lit("error")).alias("k")

    def _half(parity, out):
        return (
            events.filter(F.col("event_id") % 2 == parity)
            .groupBy(k)
            .agg(F.count(F.lit(1)).alias(out))
        )

    a, b = _half(0, "n_even"), _half(1, "n_odd")
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(
        a["k"], F.col("n_even").cast("long"), F.col("n_odd").cast("long")
    )


_SUBSTRING_K = 10

_SUBSTRING_ORACLE = (
    f"WITH tok AS (SELECT doc_id, {_TOK} AS t FROM documents), "
    "l AS (SELECT doc_id, t, len(t) AS n FROM tok), "
    "g AS (SELECT doc_id, g.i - 1 AS pos, "
    f"md5(array_to_string(t[g.i : g.i + {_SUBSTRING_K - 1}], ' ')) AS gram "
    f"FROM l, unnest(generate_series(1, n - {_SUBSTRING_K - 1})) AS g(i) "
    f"WHERE n >= {_SUBSTRING_K}), "
    "c AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2), "
    "m AS (SELECT g.doc_id, g.pos FROM g JOIN c USING (gram)), "
    "w AS (SELECT doc_id, pos, lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM m), "
    "cov AS (SELECT doc_id, CAST(sum(CASE WHEN prev IS NULL "
    f"THEN {_SUBSTRING_K} ELSE least({_SUBSTRING_K}, pos - prev) END) AS BIGINT) AS covered "
    "FROM w GROUP BY doc_id) "
    "SELECT l.doc_id, CAST(l.n AS BIGINT) AS n_tokens, "
    "coalesce(cov.covered, 0) AS covered_tokens, "
    "round(coalesce(cov.covered, 0) / l.n, 6) AS dup_frac "
    "FROM l LEFT JOIN cov USING (doc_id)"
)


@query("q_substring_dedup", oracle=_SUBSTRING_ORACLE)
def q_substring_dedup(spark, sf_dir):
    """Exact-substring duplication coverage (Lee et al. 2022, k-gram-span
    form): fraction of each document covered by 10-token substrings that
    repeat anywhere in the corpus. Grams built map-side and
    md5-compressed; repeat filter in a partial agg before the join back;
    interval union via a per-doc lag window
    (operators/substring.duplicated_span_coverage)."""
    from yark_spark.operators.substring import duplicated_span_coverage

    docs = load_table(spark, sf_dir, "documents")
    return duplicated_span_coverage(docs, "doc_id", "text", k=_SUBSTRING_K)


def _incremental_oracle() -> str:
    sig = ", ".join(f"min(md5('{i}' || tok)) AS h{i}" for i in range(8))
    bands = " UNION ALL ".join(
        f"SELECT doc_id, idx, {j} AS b, h{2 * j} || h{2 * j + 1} AS v FROM sig"
        for j in range(4)
    )
    return (
        f"WITH tok AS (SELECT doc_id, doc_id % 4 = 0 AS idx, "
        f"unnest(list_distinct({_TOK})) AS tok FROM documents), "
        f"sig AS (SELECT doc_id, any_value(idx) AS idx, {sig} FROM tok GROUP BY doc_id), "
        f"band AS ({bands}), "
        "old AS (SELECT DISTINCT b, v FROM band WHERE idx), "
        "hit AS (SELECT DISTINCT n.doc_id FROM band n JOIN old USING (b, v) WHERE NOT n.idx) "
        "SELECT s.doc_id, h.doc_id IS NOT NULL AS is_dup "
        "FROM sig s LEFT JOIN hit h USING (doc_id) WHERE NOT s.idx"
    )


@query("q_dedup_incremental", oracle=_incremental_oracle())
def q_dedup_incremental(spark, sf_dir):
    """Steady-state incremental dedup: new batch (doc_id % 4 != 0)
    screened against the historical index (doc_id % 4 == 0) by shared
    MinHash LSH band — semi-join on the band bucket, no pair
    materialization (operators/incremental.incremental_minhash_flags)."""
    from pyspark.sql import functions as F

    from yark_spark.operators.incremental import incremental_minhash_flags

    docs = load_table(spark, sf_dir, "documents")
    return incremental_minhash_flags(
        docs, F.col("doc_id") % 4 == 0, num_hashes=8, bands=4
    )


_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")

_PROFILE_ORACLE = " UNION ALL ".join(
    f"SELECT '{c}' AS column_name, CAST(count(*) AS BIGINT) AS n_rows, "
    f"CAST(count(*) - count({c}) AS BIGINT) AS n_nulls, "
    f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
    f"CAST(min({c}) AS VARCHAR) AS min_value, CAST(max({c}) AS VARCHAR) AS max_value "
    "FROM documents"
    for c in _PROFILE_COLS
)


@query("q_profile_table", oracle=_PROFILE_ORACLE)
def q_profile_table(spark, sf_dir):
    """Catalog-grade column profile of the documents table (rows, nulls,
    exact distincts, stringified min/max) in ONE aggregate pass, pivoted
    long via explode — no driver loop
    (operators/validate.profile_table)."""
    from yark_spark.operators.validate import profile_table

    docs = load_table(spark, sf_dir, "documents")
    return profile_table(docs, list(_PROFILE_COLS))


_DQ_ORACLE = (
    "SELECT 'orders_pk_unique' AS check_name, CAST(count(*) AS BIGINT) AS n_violations "
    "FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1) "
    "UNION ALL "
    "SELECT 'lineitem_orderkey_unique', CAST(count(*) AS BIGINT) "
    "FROM (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1) "
    "UNION ALL "
    "SELECT 'customer_name_not_null', CAST(count(*) AS BIGINT) "
    "FROM customer WHERE c_name IS NULL "
    "UNION ALL "
    "SELECT 'orders_custkey_referential', CAST(count(*) AS BIGINT) "
    "FROM orders o WHERE NOT EXISTS "
    "(SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey) "
    "UNION ALL "
    "SELECT 'lineitem_quantity_range', CAST(count(*) AS BIGINT) "
    "FROM lineitem WHERE l_quantity < 1 OR l_quantity > 45 "
    "UNION ALL "
    "SELECT 'events_type_membership', CAST(count(*) AS BIGINT) "
    "FROM events WHERE event_type NOT IN ('signup', 'click', 'purchase', 'view')"
)


@query("q_data_quality", oracle=_DQ_ORACLE)
def q_data_quality(spark, sf_dir):
    """Deequ-style quality gate: six checks (uniqueness ×2, nullability,
    referential integrity, numeric range, set membership) each collapsing
    to a count before a |checks|-row union
    (operators/validate.quality_report). Mixed zero and non-zero
    violation counts by construction (lineitem keys repeat; 'error'
    events violate the membership set)."""
    from yark_spark.io import load_tables
    from yark_spark.operators.validate import (
        membership_violations,
        not_null_violations,
        quality_report,
        range_violations,
        referential_violations,
        unique_violations,
    )

    t = load_tables(spark, sf_dir, "orders", "lineitem", "customer", "events")
    return quality_report(
        {
            "orders_pk_unique": unique_violations(t["orders"], ["o_orderkey"]),
            "lineitem_orderkey_unique": unique_violations(t["lineitem"], ["l_orderkey"]),
            "customer_name_not_null": not_null_violations(t["customer"], "c_name"),
            "orders_custkey_referential": referential_violations(
                t["orders"], t["customer"], "o_custkey", "c_custkey"
            ),
            "lineitem_quantity_range": range_violations(
                t["lineitem"], "l_quantity", 1, 45
            ),
            "events_type_membership": membership_violations(
                t["events"], "event_type", ["signup", "click", "purchase", "view"]
            ),
        }
    )


_Q17_ORACLE = (
    "WITH lim AS (SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS cap "
    "FROM lineitem GROUP BY 1) "
    "SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly "
    "FROM lineitem JOIN part ON p_partkey = l_partkey "
    "JOIN lim ON lim.pk = l_partkey "
    "WHERE p_brand = 'Brand#13' AND l_quantity < lim.cap"
)


@query("q_tpch_q17_shape", oracle=_Q17_ORACLE)
def q_tpch_q17_shape(spark, sf_dir):
    """TPC-H Q17 shape (correlated average): revenue from small-quantity
    orders of one brand, where 'small' is relative to each PART's own
    average quantity — the per-part cap table joins back onto the fact
    scan (both engines compute the identical double cap, so the strict
    comparison is deterministic). Brand filter pushes to the part scan;
    part + cap tables broadcast."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    lim = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("cap")
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(lim, li["l_partkey"] == lim["pk"])
        .filter(F.col("l_quantity") < F.col("cap"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


_Q20_ORACLE = (
    "SELECT s_name FROM supplier WHERE s_suppkey IN ("
    "SELECT l_suppkey FROM lineitem WHERE l_partkey IN "
    "(SELECT p_partkey FROM part WHERE p_name LIKE 'small%') "
    "GROUP BY l_suppkey HAVING sum(l_quantity) > 300)"
)


@query("q_tpch_q20_shape", oracle=_Q20_ORACLE)
def q_tpch_q20_shape(spark, sf_dir):
    """TPC-H Q20 shape (nested IN-subqueries): suppliers who moved > 300
    units of 'small%'-named parts — part-filter semi-join inside an
    aggregate-HAVING inside a supplier semi-join. The inner part set
    broadcasts; the outer probe is a semi-join on the aggregated
    supplier list."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    )
    sup = load_table(spark, sf_dir, "supplier")
    movers = (
        li.join(
            F.broadcast(part.select("p_partkey")),
            li["l_partkey"] == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_suppkey")
    )
    return sup.join(
        movers, sup["s_suppkey"] == movers["l_suppkey"], "left_semi"
    ).select("s_name")


_Q22_ORACLE = (
    "WITH ab AS (SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0) "
    "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust, "
    "round(sum(c_acctbal), 4) AS totacctbal "
    "FROM customer, ab "
    "WHERE c_acctbal > ab.a AND NOT EXISTS "
    "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F') "
    "GROUP BY c_mktsegment"
)


@query("q_tpch_q22_shape", oracle=_Q22_ORACLE)
def q_tpch_q22_shape(spark, sf_dir):
    """TPC-H Q22 shape (scalar subquery + anti-join): rich-but-inactive
    customers per market segment — account balance above the global
    positive-balance average (1-row scalar, broadcast) AND no FULFILLED
    ('F') orders (anti equi-join on custkey over the filtered order set —
    every fixture customer has SOME order, so the plain variant would be
    a 0-row key), then a segment rollup."""
    from pyspark.sql import functions as F

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("a")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(
            orders.filter(F.col("o_orderstatus") == "F").select(
                F.col("o_custkey").alias("c_custkey")
            ),
            "c_custkey",
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
    )


_Q7_ORACLE = (
    "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
    "CAST(year(l_shipdate) AS BIGINT) AS l_year, "
    "round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue "
    "FROM lineitem JOIN supplier ON s_suppkey = l_suppkey "
    "JOIN orders ON o_orderkey = l_orderkey "
    "JOIN customer ON c_custkey = o_custkey "
    "JOIN nation n1 ON n1.n_nationkey = s_nationkey "
    "JOIN nation n2 ON n2.n_nationkey = c_nationkey "
    "WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') "
    "OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1') "
    "GROUP BY 1, 2, 3"
)


@query("q_tpch_q7_shape", oracle=_Q7_ORACLE)
def q_tpch_q7_shape(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping): bilateral trade volume between
    two nations by ship year — a 5-way join where BOTH nation dims
    broadcast and the symmetric pair predicate prunes before the
    aggregate."""
    from pyspark.sql import functions as F

    from yark_spark.io import load_tables

    t = load_tables(spark, sf_dir, "lineitem", "supplier", "orders", "customer", "nation")
    n1 = F.broadcast(t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    ))
    n2 = F.broadcast(t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    ))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nk") == F.col("s_nationkey"))
        .join(n2, F.col("c_nk") == F.col("c_nationkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


_Q8_ORACLE = (
    "WITH base AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, "
    "l_extendedprice * (1 - l_discount) AS vol, n2.n_name AS supp_nation "
    "FROM lineitem JOIN part ON p_partkey = l_partkey "
    "JOIN supplier ON s_suppkey = l_suppkey "
    "JOIN orders ON o_orderkey = l_orderkey "
    "JOIN customer ON c_custkey = o_custkey "
    "JOIN nation n1 ON n1.n_nationkey = c_nationkey "
    "JOIN region ON r_regionkey = n1.n_regionkey "
    "JOIN nation n2 ON n2.n_nationkey = s_nationkey "
    "WHERE r_name = 'ASIA' AND p_type = 'PROMO') "
    "SELECT o_year, round(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE 0 END) "
    "/ sum(vol), 6) AS mkt_share FROM base GROUP BY o_year"
)


@query("q_tpch_q8_shape", oracle=_Q8_ORACLE)
def q_tpch_q8_shape(spark, sf_dir):
    """TPC-H Q8 shape (market share): one nation's share of PROMO-part
    volume sold into ASIA, by order year — an 8-way star join with every
    dim broadcast and a conditional-sum ratio (numerator and denominator
    in one aggregate pass)."""
    from pyspark.sql import functions as F

    from yark_spark.io import load_tables

    t = load_tables(
        spark, sf_dir, "lineitem", "part", "supplier", "orders", "customer",
        "nation", "region",
    )
    n1 = F.broadcast(t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    ))
    n2 = F.broadcast(t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    ))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        t["lineitem"]
        .join(F.broadcast(t["part"].filter(F.col("p_type") == "PROMO")),
              F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("c_nk") == F.col("c_nationkey"))
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
              F.col("r_regionkey") == F.col("c_rk"))
        .join(n2, F.col("s_nk") == F.col("s_nationkey"))
        .select(F.year("o_orderdate").cast("long").alias("o_year"),
                vol.alias("vol"), "supp_nation")
    )
    return base.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("vol")).otherwise(0.0))
            / F.sum("vol"),
            6,
        ).alias("mkt_share")
    )


_Q10_ORACLE = (
    "SELECT c_custkey, c_name, "
    "round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue "
    "FROM customer JOIN orders ON o_custkey = c_custkey "
    "JOIN lineitem ON l_orderkey = o_orderkey "
    "WHERE l_returnflag = 'R' GROUP BY 1, 2 "
    "ORDER BY revenue DESC, c_custkey LIMIT 20"
)


@query("q_tpch_q10_shape", oracle=_Q10_ORACLE)
def q_tpch_q10_shape(spark, sf_dir):
    """TPC-H Q10 shape (returned-item revenue): top-20 customers by
    revenue lost to returns — returnflag filter pushed to the lineitem
    scan, aggregate then TakeOrderedAndProject on the ROUNDED revenue
    with a custkey tie-break (identical rounded doubles on both engines
    make the cutoff deterministic)."""
    from pyspark.sql import functions as F

    from yark_spark.io import load_tables

    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t["lineitem"].filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_Q13_ORACLE = (
    "WITH c_orders AS (SELECT c_custkey, count(o_orderkey) AS c_count "
    "FROM customer LEFT JOIN orders ON o_custkey = c_custkey GROUP BY c_custkey) "
    "SELECT CAST(c_count AS BIGINT) AS c_count, CAST(count(*) AS BIGINT) AS custdist "
    "FROM c_orders GROUP BY 1"
)


@query("q_tpch_q13_shape", oracle=_Q13_ORACLE)
def q_tpch_q13_shape(spark, sf_dir):
    """TPC-H Q13 shape (order-count distribution): per-customer order
    counts INCLUDING zero (left outer join — count(o_orderkey) skips the
    null), then the histogram of counts. Two partial aggs on different
    keys; the outer join shuffles once on custkey."""
    from pyspark.sql import functions as F

    from yark_spark.io import load_tables

    t = load_tables(spark, sf_dir, "customer", "orders")
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy(F.col("c_count").cast("long").alias("c_count")).agg(
        F.count(F.lit(1)).alias("custdist")
    )


_Q15_ORACLE = (
    "WITH rev AS (SELECT l_suppkey, "
    "round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue "
    "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
    "AND l_shipdate < TIMESTAMP '1997-01-01' GROUP BY 1) "
    "SELECT s_suppkey, s_name, total_revenue "
    "FROM supplier JOIN rev ON s_suppkey = l_suppkey "
    "WHERE total_revenue = (SELECT max(total_revenue) FROM rev)"
)


@query("q_tpch_q15_shape", oracle=_Q15_ORACLE)
def q_tpch_q15_shape(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): the supplier(s) whose 1996 revenue
    equals the maximum — revenue CTE reused for both the rows and the
    scalar max (broadcast), equality on the ROUNDED value so both
    engines agree bit-for-bit. Ship-date range pushes to the scan."""
    from pyspark.sql import functions as F

    from yark_spark.io import load_tables

    t = load_tables(spark, sf_dir, "lineitem", "supplier")
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        t["supplier"]
        .join(rev, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


_QUOTA_ORACLE = (
    "WITH r AS (SELECT doc_id, source, row_number() OVER ("
    "PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn "
    "FROM documents) "
    "SELECT doc_id, source FROM r WHERE rn <= 5"
)


@query("q_quota_sample", oracle=_QUOTA_ORACLE)
def q_quota_sample(spark, sf_dir):
    """Deterministic exact-N quota sampling: exactly 5 docs per source,
    chosen by md5-of-id order — a content-addressed shuffle that is
    reproducible across runs/engines and unbiased w.r.t. ingestion order
    (rate-based sampling, q_stratified_sample, cannot guarantee exact
    quotas). Per-source window, no global sort; at extreme per-group
    cardinality the WindowGroupLimit pushes the quota map-side."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "source")
    )


_UDTF_ORACLE = (
    f"WITH tok AS (SELECT doc_id, {_TOK} AS t FROM documents WHERE doc_id < 100) "
    "SELECT doc_id, CAST(g.i - 1 AS INTEGER) AS pos, "
    "array_to_string(t[(g.i - 1) * 10 + 1 : g.i * 10], ' ') AS piece "
    "FROM tok, unnest(generate_series(1, CAST(ceil(len(t) / 10.0) AS BIGINT))) AS g(i)"
)


@query("q_udtf_split", oracle=_UDTF_ORACLE)
def q_udtf_split(spark, sf_dir):
    """True Python UDTF (Spark 3.5+ ``@udtf`` class API, not a pandas
    variant): chunk each document into 10-token pieces with positions,
    invoked through a correlated LATERAL over the table. Row-at-a-time
    Python IS the slow path — this key documents the API on a bounded
    slice; the production equivalent of this exact computation is the
    vectorized column expression in q_line_dedup. Tokenization mirrors
    the oracle exactly: space-only strip (DuckDB ``trim`` default) then
    a split on the explicit ASCII whitespace class KEEPING boundary
    empties — Python ``str.strip()/split()`` would strip/split on
    Unicode whitespace and drop empty tokens, silently diverging on
    docs with leading tabs/newlines or whitespace-only text."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, piece string")
    class SplitPieces:
        def eval(self, text: str):
            if text is None:
                return  # oracle: generate_series(1, NULL) emits no rows
            toks = re.split(r"[ \t\n\x0b\f\r]+", text.lower().strip(" "))
            for i in range(0, len(toks), 10):
                yield i // 10, " ".join(toks[i : i + 10])

    spark.udtf.register("__split_pieces", SplitPieces)
    docs = load_table(spark, sf_dir, "documents")
    docs.filter("doc_id < 100").createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, s.pos, s.piece "
        "FROM __udtf_docs d, LATERAL __split_pieces(d.text) s"
    )


_LATERAL_SQL = (
    "SELECT s.source, l.doc_id, l.n_chars "
    "FROM (SELECT DISTINCT source FROM {tbl}) s, "
    "LATERAL (SELECT doc_id, n_chars FROM {tbl} d WHERE d.source = s.source "
    "ORDER BY n_chars DESC, doc_id LIMIT 2) l"
)


@query("q_lateral_topk", oracle=_LATERAL_SQL.format(tbl="documents"))
def q_lateral_topk(spark, sf_dir):
    """Correlated LATERAL subquery (per-source top-2 by n_chars,
    deterministic tie-break) — the SQL-surface twin of the window top-k:
    Spark decorrelates the lateral into a ranked join, so the same
    partitioned-window plan falls out of the correlated FORM. Identical
    SQL text runs on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("__lateral_docs")
    return spark.sql(_LATERAL_SQL.format(tbl="__lateral_docs"))


_Q2_ORACLE = (
    "WITH cost AS (SELECT l_partkey, l_suppkey, "
    "min(l_extendedprice / l_quantity) AS unit FROM lineitem GROUP BY 1, 2), "
    "r AS (SELECT l_partkey, l_suppkey, unit, "
    "row_number() OVER (PARTITION BY l_partkey ORDER BY unit, l_suppkey) AS rn FROM cost) "
    "SELECT r.l_partkey AS p_partkey, s.s_name, round(r.unit, 6) AS best_unit_cost "
    "FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey WHERE rn = 1"
)


@query("q_tpch_q2_shape", oracle=_Q2_ORACLE)
def q_tpch_q2_shape(spark, sf_dir):
    """TPC-H Q2 shape (min-within-group + join back): cheapest supplier
    per part by unit price (lineitem stands in for partsupp — the
    fixture set has no partsupp table). Ranking uses the RAW double (both
    engines compute the same division bit-exactly); rounding happens only
    on output. Per-part window after a (part, supp) partial agg; the
    supplier dim broadcasts."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit")
    )
    w = Window.partitionBy("l_partkey").orderBy("unit", "l_suppkey")
    best = cost.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return best.join(
        F.broadcast(sup), best["l_suppkey"] == sup["s_suppkey"]
    ).select(
        F.col("l_partkey").alias("p_partkey"),
        "s_name",
        F.round(F.col("unit"), 6).alias("best_unit_cost"),
    )


_Q21_ORACLE = (
    "WITH l AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem), "
    "bad AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R') "
    "SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait "
    "FROM bad b JOIN supplier s ON s.s_suppkey = b.l_suppkey "
    "WHERE EXISTS (SELECT 1 FROM l l2 WHERE l2.l_orderkey = b.l_orderkey "
    "AND l2.l_suppkey <> b.l_suppkey) "
    "AND NOT EXISTS (SELECT 1 FROM bad b2 WHERE b2.l_orderkey = b.l_orderkey "
    "AND b2.l_suppkey <> b.l_suppkey) "
    "GROUP BY s.s_name"
)


@query("q_tpch_q21_shape", oracle=_Q21_ORACLE)
def q_tpch_q21_shape(spark, sf_dir):
    """TPC-H Q21 shape (EXISTS + NOT EXISTS on the same key): suppliers
    solely responsible for a returned ('R') line on multi-supplier
    orders. Semi-join (another supplier exists on the order) + anti-join
    (no OTHER supplier has an 'R' line) on the orderkey with a suppkey
    inequality — the classic double-correlated pattern; both probe sides
    are distinct-reduced before the joins."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    bad = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    l2 = pairs.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    b2 = bad.select(F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3"))
    cand = bad.join(
        l2,
        (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    ).join(
        b2,
        (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    return (
        cand.join(F.broadcast(sup), cand["l_suppkey"] == sup["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


_AUDIO_ORACLE = (
    "WITH h AS (SELECT doc_id, md5(text) AS m FROM documents WHERE doc_id < 200), "
    "s AS (SELECT doc_id, ascii(substr(m, g.i, 1)) AS v "
    "FROM h, unnest(generate_series(1, 32)) AS g(i)) "
    "SELECT doc_id, CAST(256 AS INTEGER) AS n_samples, "
    "CAST(8000 AS INTEGER) AS sample_rate, "
    "round(256.0 / 8000, 6) AS duration_s, "
    "CAST(max(v) AS INTEGER) AS peak, "
    "round(sqrt(avg(CAST(v AS DOUBLE) * v)), 6) AS rms "
    "FROM s GROUP BY doc_id"
)


@query("q_audio_decode", oracle=_AUDIO_ORACLE)
def q_audio_decode(spark, sf_dir):
    """E4 audio twin of q_image_decode: deterministic PCM16 WAV per
    document (md5 hex ascii codes as samples, tiled 8× → 256 samples)
    ENCODED then DECODED by separate halves of the pure-numpy RIFF codec
    (operators/multimodal._make_wav_codec — generic chunk walk, not an
    offset assumption), with duration/peak/RMS hash-matched against the
    analytic oracle. The 256-sample mean is a power-of-two divide (exact
    in doubles) and the tiling leaves it equal to the 32-char mean, so
    sqrt parity is bit-exact. Compressed codecs remain
    NotImplementedError."""
    from pyspark.sql import functions as F

    from yark_spark.operators.multimodal import decode_audio_features, with_wav_payload

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return decode_audio_features(with_wav_payload(docs))


_TABLE_DIFF_ORACLE = (
    "WITH old AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id < 400), "
    "new AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN md5(text || ' v2') "
    "ELSE md5(text) END AS h FROM documents WHERE doc_id >= 100) "
    "SELECT coalesce(old.doc_id, new.doc_id) AS doc_id, "
    "CASE WHEN old.h IS NULL THEN 'added' WHEN new.h IS NULL THEN 'removed' "
    "WHEN old.h <> new.h THEN 'changed' ELSE 'unchanged' END AS status "
    "FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id"
)


@query("q_table_diff", oracle=_TABLE_DIFF_ORACLE)
def q_table_diff(spark, sf_dir):
    """Snapshot diff → change feed (operators/incremental.snapshot_diff):
    two corpus versions (overlapping id ranges; every 7th common doc
    'edited') full-outer-joined on the key, moving md5 digests rather
    than documents; statuses added/removed/changed/unchanged."""
    from pyspark.sql import functions as F

    from yark_spark.operators.incremental import snapshot_diff

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") < 400).select(
        "doc_id", F.md5(F.col("text")).alias("content_hash")
    )
    new = docs.filter(F.col("doc_id") >= 100).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.md5(F.concat(F.col("text"), F.lit(" v2")))
        )
        .otherwise(F.md5(F.col("text")))
        .alias("content_hash"),
    )
    return snapshot_diff(old, new, "doc_id")


_TOP_BIGRAM_ORACLE = (
    f"WITH tok AS (SELECT doc_id, {_TOK} AS t FROM documents), "
    "bg AS (SELECT doc_id, t[g.i] || ' ' || t[g.i + 1] AS bigram, len(t) - 1 AS n_bigrams "
    "FROM tok, unnest(generate_series(1, len(t) - 1)) AS g(i) WHERE len(t) >= 2), "
    "c AS (SELECT doc_id, bigram, n_bigrams, count(*) AS cnt FROM bg GROUP BY 1, 2, 3), "
    "r AS (SELECT doc_id, bigram, n_bigrams, cnt, "
    "row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, bigram) AS rn FROM c) "
    "SELECT doc_id, bigram AS top_bigram, "
    "round(cnt / n_bigrams, 6) AS top_bigram_frac FROM r WHERE rn = 1"
)


@query("q_top_bigram", oracle=_TOP_BIGRAM_ORACLE)
def q_top_bigram(spark, sf_dir):
    """Gopher-style repetition signal: the most frequent token bigram per
    document and the fraction of bigram slots it occupies (near 1 ⇒
    degenerate loops). Deterministic tie-break (count desc, bigram asc).
    One (doc, bigram) partial-agg shuffle, then a per-doc window on the
    same key — partitioned by doc, never global
    (operators/profiling.top_bigram)."""
    from yark_spark.operators.profiling import top_bigram

    docs = load_table(spark, sf_dir, "documents")
    return top_bigram(docs, "doc_id", "text")
