"""Round-8 second batch: curation/analytics operators that widen the
LLM-data-pipeline and relational surface beyond the round-8 closure keys.

New capabilities (each oracle-checked against DuckDB):

- ``q_semdedup``            — SemDeDup-style semantic dedup over embeddings
                              (Abbas et al. 2023): within-cluster cosine
                              pruning, clusters bound the pair join.
- ``q_scd2_intervals``      — slowly-changing-dimension (type 2) interval
                              build from an event stream via change-point
                              windows.
- ``q_anomaly_mad``         — robust outlier detection (median absolute
                              deviation), the rank-statistics twin of the
                              z-score trim in ``q_outlier_trim``.
- ``q_ewma_smooth``         — exponentially weighted moving average over
                              per-user event series with an exact bounded
                              8-lag form (no recursive state, no overflow).
- ``q_collocation_pmi``     — corpus-level PMI collocations (top bigrams by
                              pointwise mutual information), the
                              vocabulary-bounded shuffle form.
- ``q_fuzzy_match_join``    — blocked fuzzy entity resolution: block key
                              equi-join + Levenshtein filter, never
                              all-pairs.

Reference parity note: the reference archiver has no analytics surface
(/root/reference/cmds/archive.py is fetch/store only); these extend the
driver-mandated training-data-pipeline inventory in SURVEY.md §2.8.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from yark_spark.io import load_table
from yark_spark.operators.release import track
from yark_spark.registry import query

# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup)
# ---------------------------------------------------------------------------

#: Demo threshold tuned to the quasi-random synthetic embeddings (max
#: pairwise cosine ~0.51); a production run on real model embeddings uses
#: 0.95+. The OPERATOR is threshold-independent.
_SEMDEDUP_TAU = 0.3

_SEMDEDUP_ORACLE = (
    "WITH p AS (SELECT a.vec_id AS keep_id, b.vec_id AS vec_id, b.label AS label, "
    "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
    "CAST(b.embedding AS DOUBLE[])), 6) AS sim "
    "FROM embeddings a JOIN embeddings b "
    "ON a.label = b.label AND a.vec_id < b.vec_id), "
    f"q AS (SELECT * FROM p WHERE sim > {_SEMDEDUP_TAU}), "
    "r AS (SELECT vec_id, label, keep_id AS dup_of, sim, row_number() OVER ("
    "PARTITION BY vec_id ORDER BY sim DESC, keep_id) AS rn FROM q) "
    "SELECT vec_id, label, dup_of, sim FROM r WHERE rn = 1"
)


@query("q_semdedup", oracle=_SEMDEDUP_ORACLE)
def q_semdedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): drop embeddings that
    are semantic duplicates of an earlier-id vector in the SAME cluster.
    The fixture ``label`` column stands in for the fitted k-means
    assignment (the KMeans path itself is covered by ``q_ann_ivf``), which
    is exactly how SemDeDup runs: cluster first, then pairwise cosine ONLY
    within a cluster.

    Output: one row per dropped vector with its highest-similarity
    earlier-id cluster-mate (ties broken by lowest partner id —
    similarities rounded to 6dp BEFORE ranking so the argmax is
    deterministic across engines).

    Round 9: thin wrapper over ``operators/dedup.semantic_dedup`` (the
    body promoted to an operator with τ as a parameter — VERDICT r8
    next-round #8; a second-threshold unit test lives in
    tests/test_dedup_operators.py). Scale posture documented on the
    operator: cluster-equi-join (Σ_c n_c², never corpus-wide all-pairs,
    no broadcast of the growing side), hoisted norms, τ filter above the
    argmax window."""
    from yark_spark.operators.dedup import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, tau=_SEMDEDUP_TAU)


# ---------------------------------------------------------------------------
# SCD type-2 interval build
# ---------------------------------------------------------------------------

_SCD2_ORACLE = (
    "WITH ordered AS (SELECT user_id, event_type, ts, event_id, "
    "lag(event_type) OVER w AS prev_type "
    "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    "changes AS (SELECT user_id, event_type, ts FROM ordered "
    "WHERE prev_type IS NULL OR prev_type <> event_type), "
    "v AS (SELECT user_id, event_type, ts AS valid_from, "
    "lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to, "
    "CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS version "
    "FROM changes) "
    "SELECT user_id, event_type, valid_from, valid_to, version FROM v"
)


@query("q_scd2_intervals", oracle=_SCD2_ORACLE)
def q_scd2_intervals(spark, sf_dir):
    """Slowly-changing-dimension (type 2) build: collapse a per-user event
    stream into validity intervals — a new version opens whenever the
    tracked attribute (event_type) CHANGES, closes at the next change
    (NULL = current). The standard warehouse dimension-history op.

    Change-point detection via lag, interval close via lead, both over the
    same per-user window → ONE shuffle on user_id; no global window. Ties
    broken by event_id so both engines pick the same change rows. At 100 TB
    the shuffle keys on the entity id — exactly how dimension history is
    partitioned in production."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select("user_id", "event_type", "ts")
    )
    wv = Window.partitionBy("user_id").orderBy("ts")
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(wv).alias("valid_to"),
        F.row_number().over(wv).cast("bigint").alias("version"),
    )


# ---------------------------------------------------------------------------
# Robust (MAD) anomaly detection
# ---------------------------------------------------------------------------

#: 1.4826 ≈ 1/Φ⁻¹(3/4) rescales MAD to the σ-equivalent for normal data;
#: 3·1.4826 = the "3 sigma" robust fence.
_MAD_K = 4.4478

_ANOMALY_MAD_ORACLE = (
    "WITH med AS (SELECT event_type, round(median(value), 6) AS med "
    "FROM events GROUP BY event_type), "
    "dev AS (SELECT e.event_type, e.value, m.med FROM events e "
    "JOIN med m ON e.event_type = m.event_type), "
    "mad AS (SELECT event_type, any_value(med) AS med, "
    "round(median(abs(value - med)), 6) AS mad FROM dev GROUP BY event_type) "
    "SELECT d.event_type, any_value(m.med) AS med, any_value(m.mad) AS mad, "
    "CAST(count(*) AS BIGINT) AS n, "
    f"CAST(count(*) FILTER (abs(d.value - m.med) > {_MAD_K} * m.mad) AS BIGINT) "
    "AS n_anomalies "
    "FROM dev d JOIN mad m ON d.event_type = m.event_type "
    "GROUP BY d.event_type"
)


@query("q_anomaly_mad", oracle=_ANOMALY_MAD_ORACLE)
def q_anomaly_mad(spark, sf_dir):
    """Median-absolute-deviation outlier detection per event type — the
    robust twin of the z-score trim (``q_outlier_trim``): immune to the
    outliers it hunts, the fence a metrics pipeline actually uses.

    Two exact-median passes (group medians are tiny: one row per type,
    broadcast back), then a counting pass. Medians rounded to 6dp BEFORE
    the deviation compare so both engines fence identically. Group
    cardinality (event types) is small by construction, so the median
    state is bounded; the scans parallelize over events."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.round(F.median("value"), 6).alias("med"))
    dev = ev.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type").agg(
        F.any_value("med").alias("med"),
        F.round(F.median(F.abs(F.col("value") - F.col("med"))), 6).alias("mad"),
    )
    return (
        dev.select("event_type", "value")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("med").alias("med"),
            F.any_value("mad").alias("mad"),
            F.count(F.lit(1)).alias("n"),
            F.count_if(
                F.abs(F.col("value") - F.col("med")) > _MAD_K * F.col("mad")
            ).alias("n_anomalies"),
        )
    )


# ---------------------------------------------------------------------------
# EWMA smoothing (bounded-lag exact form)
# ---------------------------------------------------------------------------

_EWMA_ALPHA = 0.5
_EWMA_LAGS = 8

_ewma_w = [(1.0 - _EWMA_ALPHA) ** i for i in range(_EWMA_LAGS)]

_EWMA_ORACLE = (
    "WITH l AS (SELECT event_id, user_id, value, "
    + ", ".join(
        f"lag(value, {i}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v{i}"
        for i in range(1, _EWMA_LAGS)
    )
    + " FROM events) "
    "SELECT event_id, user_id, round(("
    + " + ".join(
        # the i=0 (current-row) term is coalesced like every lag so a NULL
        # reading degrades to "average of what's present" on BOTH engines
        f"coalesce(v{i} * {_ewma_w[i]!r}, 0)"
        if i
        else f"coalesce(value * {_ewma_w[0]!r}, 0)"
        for i in range(_EWMA_LAGS)
    )
    + ") / ("
    + " + ".join(
        f"(CASE WHEN v{i} IS NOT NULL THEN {_ewma_w[i]!r} ELSE 0 END)"
        if i
        else f"(CASE WHEN value IS NOT NULL THEN {_ewma_w[0]!r} ELSE 0 END)"
        for i in range(_EWMA_LAGS)
    )
    + "), 6) AS ewma FROM l"
)


@query("q_ewma_smooth", oracle=_EWMA_ORACLE)
def q_ewma_smooth(spark, sf_dir):
    """Exponentially weighted moving average over each user's value series
    — the smoothing a metrics/quality-score pipeline applies before
    thresholding. Exact bounded form: truncate the (recursive) EWMA to the
    last 8 observations and renormalize over the weights actually present,
    so the result is a closed-form weighted sum of 8 lags.

    Why not the recursive form: per-row recursion needs either a sequential
    scan (not distributed) or pow(1-α, -rn) rescaling that overflows
    doubles on long partitions. Eight lag columns share ONE window (one
    shuffle on user_id) and stay in whole-stage codegen; weights are
    Python-side float literals so both engines multiply identical doubles."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.col("value")] + [
        F.lag("value", i).over(w) for i in range(1, _EWMA_LAGS)
    ]
    num = sum(
        (F.coalesce(lags[i] * F.lit(_ewma_w[i]), F.lit(0.0)) for i in range(_EWMA_LAGS)),
        F.lit(0.0),
    )
    den = sum(
        (
            F.when(lags[i].isNotNull(), F.lit(_ewma_w[i])).otherwise(F.lit(0.0))
            for i in range(_EWMA_LAGS)
        ),
        F.lit(0.0),
    )
    return ev.select(
        "event_id", "user_id", F.round(num / den, 6).alias("ewma")
    )


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 5
_PMI_TOP = 50

_PMI_ORACLE = (
    "WITH tok AS (SELECT string_split(lower(text), ' ') AS l FROM documents), "
    "bg AS (SELECT unnest(list_transform(generate_series(1, len(l) - 1), "
    "i -> l[i] || ' ' || l[i + 1])) AS bigram, "
    "unnest(list_transform(generate_series(1, len(l) - 1), i -> l[i])) AS w1, "
    "unnest(list_transform(generate_series(1, len(l) - 1), i -> l[i + 1])) AS w2 "
    "FROM tok), "
    "bc AS (SELECT bigram, any_value(w1) AS w1, any_value(w2) AS w2, "
    "count(*) AS c_ab FROM bg GROUP BY bigram), "
    "n AS (SELECT sum(c_ab) AS total FROM bc), "
    "u1 AS (SELECT w1 AS w, sum(c_ab) AS c FROM bc GROUP BY w1), "
    "u2 AS (SELECT w2 AS w, sum(c_ab) AS c FROM bc GROUP BY w2), "
    "scored AS (SELECT bigram, c_ab, "
    "round(ln(c_ab * n.total / (u1.c * 1.0 * u2.c)), 6) AS pmi "
    "FROM bc, n JOIN u1 ON bc.w1 = u1.w JOIN u2 ON bc.w2 = u2.w "
    f"WHERE c_ab >= {_PMI_MIN_COUNT}) "
    "SELECT bigram, CAST(c_ab AS BIGINT) AS c_ab, pmi FROM scored "
    f"ORDER BY pmi DESC, bigram LIMIT {_PMI_TOP}"
)


@query("q_collocation_pmi", oracle=_PMI_ORACLE)
def q_collocation_pmi(spark, sf_dir):
    """Corpus-level collocation mining: top bigrams by pointwise mutual
    information pmi = ln(c_ab·N / (c_a·c_b)), counted over BIGRAM SLOTS
    (c_a = bigrams with first word a, c_b = with second word b — the
    standard contingency marginals), with a min-count floor against
    low-frequency noise. The phrase-detection pass a tokenizer/curation
    pipeline runs before vocabulary induction.

    Plan: bigrams built map-side from the token array (no explode of raw
    tokens before counting — ``transform`` + one partial-agg shuffle keyed
    by bigram, vocabulary-bounded). Marginals are two more
    vocabulary-bounded rollups of the already-aggregated bigram table,
    joined back BROADCAST (unigram tables are tiny relative to the
    corpus). Final top-k is TakeOrderedAndProject, never a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    idx = F.sequence(F.lit(0), F.size(F.col("l")) - 2)
    bg = (
        docs.select(toks.alias("l"))
        .filter(F.size("l") >= 2)
        .select(
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.concat(
                            F.element_at(F.col("l"), i + 1),
                            F.lit(" "),
                            F.element_at(F.col("l"), i + 2),
                        ).alias("bigram"),
                        F.element_at(F.col("l"), i + 1).alias("w1"),
                        F.element_at(F.col("l"), i + 2).alias("w2"),
                    ),
                )
            ).alias("s")
        )
        .select("s.bigram", "s.w1", "s.w2")
    )
    bc = bg.groupBy("bigram").agg(
        F.any_value("w1").alias("w1"),
        F.any_value("w2").alias("w2"),
        F.count(F.lit(1)).alias("c_ab"),
    )
    bc = track(bc.cache())  # released by harnesses via release_tracked()
    total = bc.agg(F.sum("c_ab").alias("total"))
    u1 = bc.groupBy(F.col("w1").alias("w")).agg(F.sum("c_ab").alias("c1"))
    u2 = bc.groupBy(F.col("w2").alias("w")).agg(F.sum("c_ab").alias("c2"))
    scored = (
        bc.filter(F.col("c_ab") >= _PMI_MIN_COUNT)
        .join(F.broadcast(u1), F.col("w1") == u1["w"])
        .join(F.broadcast(u2), F.col("w2") == u2["w"])
        .crossJoin(F.broadcast(total))
        .select(
            "bigram",
            F.col("c_ab").cast("bigint").alias("c_ab"),
            F.round(
                F.log(
                    F.col("c_ab")
                    * F.col("total")
                    / (F.col("c1") * F.lit(1.0) * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("bigram")).limit(_PMI_TOP)


# ---------------------------------------------------------------------------
# Blocked fuzzy entity resolution
# ---------------------------------------------------------------------------

_FUZZY_MAX_DIST = 2

_FUZZY_ORACLE = (
    # Both engines derive the same "dirty" registry: every third customer
    # gets a '#'→'=' glyph substitution (1 edit), every sixth additionally
    # 'C'→'K' (2 edits); the rest are verbatim. Substitution-only so name
    # LENGTH survives as a blocking key.
    "WITH dirty AS (SELECT c_custkey AS d_key, c_nationkey AS d_nat, "
    "CASE WHEN c_custkey % 6 = 0 THEN replace(replace(c_name, '#', '='), 'C', 'K') "
    "WHEN c_custkey % 3 = 0 THEN replace(c_name, '#', '=') "
    "ELSE c_name END AS d_name FROM customer), "
    "cand AS (SELECT d.d_key, c.c_custkey, "
    "CAST(levenshtein(d.d_name, c.c_name) AS BIGINT) AS lev "
    "FROM dirty d JOIN customer c ON d.d_nat = c.c_nationkey "
    "AND len(d.d_name) = len(c.c_name) "
    "AND substring(d.d_name, len(d.d_name) - 3, 4) "
    "= substring(c.c_name, len(c.c_name) - 3, 4)), "
    f"m AS (SELECT * FROM cand WHERE lev <= {_FUZZY_MAX_DIST}), "
    "r AS (SELECT d_key, c_custkey, lev, row_number() OVER ("
    "PARTITION BY d_key ORDER BY lev, c_custkey) AS rn FROM m) "
    "SELECT d_key, c_custkey AS matched_key, lev FROM r WHERE rn = 1"
)


@query("q_fuzzy_match_join", oracle=_FUZZY_ORACLE)
def q_fuzzy_match_join(spark, sf_dir):
    """Blocked fuzzy entity resolution: match a dirtied customer registry
    (deterministic glyph corruption — 1 substitution on every third name,
    2 on every sixth, derived identically in both engines) back to the
    clean table. The record-linkage op of every ingestion pipeline — and
    the shape matters: an EQUI-join on blocking keys with the edit-distance
    filter applied only WITHIN blocks, never an all-pairs similarity join.
    Blocking keys are chosen corruption-stable, the real design rule of
    record linkage: nation + name length + the 4-char name SUFFIX, which
    the expected glyph corruptions (head-of-string substitutions) cannot
    touch — without the suffix the uniform-length fixture names collapse
    every nation into one O(n²/25) block (measured 28 s → <1 s at sf0.1).

    Each dirty record keeps its best match (lowest distance, then lowest
    key). At 100 TB the block key is the unit of shuffle; block skew is
    the known failure mode and would be handled by salting hot blocks
    (``operators/skew.py``).

    Round 9: thin wrapper over ``operators/dedup.fuzzy_match_join`` (the
    body promoted to an operator with block keys and max distance as
    parameters — VERDICT r8 next-round #8; a second-threshold unit test
    lives in tests/test_dedup_operators.py)."""
    from yark_spark.operators.dedup import fuzzy_match_join

    cust = load_table(spark, sf_dir, "customer")
    dirty = cust.select(
        F.col("c_custkey").alias("d_key"),
        F.col("c_nationkey").alias("d_nat"),
        F.when(
            F.col("c_custkey") % 6 == 0,
            F.replace(
                F.replace(F.col("c_name"), F.lit("#"), F.lit("=")),
                F.lit("C"),
                F.lit("K"),
            ),
        )
        .when(
            F.col("c_custkey") % 3 == 0,
            F.replace(F.col("c_name"), F.lit("#"), F.lit("=")),
        )
        .otherwise(F.col("c_name"))
        .alias("d_name"),
    )
    matched = fuzzy_match_join(
        dirty,
        cust.select("c_custkey", "c_nationkey", "c_name"),
        "d_key",
        "c_custkey",
        "d_name",
        "c_name",
        block_on=[
            (F.col("d_nat"), F.col("c_nationkey")),
            (F.length("d_name"), F.length("c_name")),
            (
                F.col("d_name").substr(F.length("d_name") - 3, F.lit(4)),
                F.col("c_name").substr(F.length("c_name") - 3, F.lit(4)),
            ),
        ],
        max_dist=_FUZZY_MAX_DIST,
    )
    return matched.select("d_key", F.col("c_custkey").alias("matched_key"), "lev")


# ---------------------------------------------------------------------------
# Fill-forward imputation (LOCF)
# ---------------------------------------------------------------------------

_LOCF_ORACLE = (
    # Both engines derive the same deterministic gap set: 'error' events
    # report no usable value, the metric pipeline carries the last good one.
    "SELECT event_id, user_id, "
    "last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END "
    "IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled "
    "FROM events"
)


@query("q_fill_forward", oracle=_LOCF_ORACLE)
def q_fill_forward(spark, sf_dir):
    """Last-observation-carried-forward imputation: per-user running
    'last good value' (error events contribute NULL and inherit the
    previous reading; a leading error stays NULL). The standard sensor/
    metrics repair op — the running twin of the zero-filling grid in
    ``q_gap_fill``.

    ``last(..., ignorenulls=True)`` over ONE user-keyed running window —
    single shuffle on user_id, whole-stage-codegen window eval, no
    sequential scan."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    good = F.when(F.col("event_type") != "error", F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        F.last(good, ignorenulls=True).over(w).alias("value_filled"),
    )


# ---------------------------------------------------------------------------
# Running distinct count
# ---------------------------------------------------------------------------

_RUNNING_DISTINCT_ORACLE = (
    "WITH flagged AS (SELECT event_id, user_id, ts, "
    "CASE WHEN row_number() OVER (PARTITION BY user_id, event_type "
    "ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS first_seen "
    "FROM events) "
    "SELECT event_id, user_id, "
    "CAST(sum(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
    "AS distinct_types_so_far FROM flagged"
)


@query("q_running_distinct", oracle=_RUNNING_DISTINCT_ORACLE)
def q_running_distinct(spark, sf_dir):
    """Running DISTINCT count per user (how many distinct event types has
    this user produced so far) — COUNT(DISTINCT) OVER is unsupported in
    both engines, so this pins the scalable rewrite: flag each (user,
    type)'s FIRST occurrence with one fine-grained window, then a running
    sum of flags over the coarser user window. Two hierarchical shuffles
    (user+type, then user), both key-partitioned — the exact pattern for
    distinct-so-far funnels at scale."""
    ev = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    first_seen = F.when(F.row_number().over(w_first) == 1, 1).otherwise(0)
    return (
        ev.select("event_id", "user_id", "ts", first_seen.alias("first_seen"))
        .select(
            "event_id",
            "user_id",
            F.sum("first_seen").over(w_run).cast("bigint").alias(
                "distinct_types_so_far"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Per-dimension embedding statistics
# ---------------------------------------------------------------------------

_DIM_STATS_ORACLE = (
    "WITH x AS (SELECT unnest(CAST(embedding AS DOUBLE[])) AS v, "
    "generate_subscripts(embedding, 1) AS dim FROM embeddings) "
    "SELECT CAST(dim AS INTEGER) AS dim, CAST(count(*) AS BIGINT) AS n, "
    "round(avg(v), 6) AS mean, round(stddev_samp(v), 6) AS std, "
    "round(min(v), 6) AS lo, round(max(v), 6) AS hi "
    "FROM x GROUP BY dim"
)


@query("q_embedding_dim_stats", oracle=_DIM_STATS_ORACLE)
def q_embedding_dim_stats(spark, sf_dir):
    """Per-dimension profile of the embedding column (mean/std/min/max per
    coordinate) — the drift/collapse monitor a vector pipeline runs before
    trusting ANN recall (a dead or exploding dimension shows up here
    first).

    posexplode streams (dim, value) pairs map-side into a partial agg
    keyed by dim — shuffle width = embedding dimensionality (64), totally
    independent of corpus size. Elements cast float→double (exact) before
    aggregation so both engines accumulate the same doubles."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(F.posexplode("embedding").alias("pos", "v"))
        .select(
            (F.col("pos") + 1).cast("int").alias("dim"),
            F.col("v").cast("double").alias("v"),
        )
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("v"), 6).alias("mean"),
            F.round(F.stddev_samp("v"), 6).alias("std"),
            F.round(F.min("v"), 6).alias("lo"),
            F.round(F.max("v"), 6).alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# Int8 embedding quantization (round-trip error)
# ---------------------------------------------------------------------------

#: Error terms are accumulated as INTEGER picos (floor(v·1e12 + 0.5)) —
#: high-precision decimal ROUNDING diverges between engines (Spark rounds
#: the exact decimal expansion of the double via BigDecimal, DuckDB rounds
#: in float space), but x·1e12 and floor() are plain double ops that land
#: on identical values given identical inputs, and BIGINT sums are exact.
_QUANTIZE_ORACLE = (
    "WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, "
    "list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) / 127.0 "
    "AS scale FROM embeddings), "
    "err AS (SELECT vec_id, "
    "CAST(floor(scale * 1000000000 + 0.5) AS BIGINT) AS scale_nanos, "
    "list_sum(list_transform(e, x -> CAST(floor((x - round(x / scale) * scale) "
    "* (x - round(x / scale) * scale) * 1000000000000 + 0.5) AS BIGINT))) AS sse_picos, "
    "list_max(list_transform(e, x -> abs(round(x / scale)))) AS maxcode "
    "FROM q) "
    "SELECT vec_id, scale_nanos, CAST(sse_picos AS BIGINT) AS sse_picos, "
    "CAST(maxcode AS BIGINT) AS max_code FROM err"
)


@query("q_embedding_quantize", oracle=_QUANTIZE_ORACLE)
def q_embedding_quantize(spark, sf_dir):
    """Symmetric int8 quantization of the embedding column with its
    reconstruction error — the compression step a 100 TB vector store
    applies before ANN (4x smaller, dot products in integer space). Per
    vector: scale = max|x|/127, codes = round(x/scale), reported as the
    sum of squared reconstruction errors plus the max |code| (≤127 by
    construction — the oracle-checked invariant).

    Map-only: every quantity is a per-row fold over the array — no shuffle
    at all. Cross-engine exactness: error terms are accumulated as INTEGER
    picos (floor(v·1e12 + 0.5) per element, BIGINT sum) because decimal
    rounding at 12dp itself diverges between engines (Spark rounds the
    exact decimal expansion via BigDecimal, DuckDB rounds in float space);
    plain double multiply/floor on identical inputs is identical."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(e, lambda x: F.abs(x))) / F.lit(127.0)
    with_scale = emb.select("vec_id", e.alias("e"), scale.alias("scale"))

    def _err_picos(x):
        resid = x - F.round(x / F.col("scale"), 0) * F.col("scale")
        return F.floor(resid * resid * F.lit(1e12) + F.lit(0.5)).cast("bigint")

    sse = F.aggregate(
        F.transform(F.col("e"), _err_picos),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    maxcode = F.array_max(
        F.transform(F.col("e"), lambda x: F.abs(F.round(x / F.col("scale"), 0)))
    )
    return with_scale.select(
        "vec_id",
        F.floor(F.col("scale") * F.lit(1e9) + F.lit(0.5))
        .cast("bigint")
        .alias("scale_nanos"),
        sse.alias("sse_picos"),
        maxcode.cast("bigint").alias("max_code"),
    )


# ---------------------------------------------------------------------------
# Relative-threshold heavy hitters
# ---------------------------------------------------------------------------

#: report tokens holding ≥ 1/1000 of all token slots (integer compare —
#: no float threshold to drift between engines)
_HH_DENOM = 1000

_HEAVY_HITTERS_ORACLE = (
    "WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS tok "
    "FROM documents), "
    "c AS (SELECT tok, count(*) AS n FROM tok GROUP BY tok), "
    "t AS (SELECT sum(n) AS total FROM c) "
    "SELECT tok, CAST(n AS BIGINT) AS n, round(n * 1.0 / total, 6) AS frac "
    f"FROM c, t WHERE n * {_HH_DENOM} >= total"
)


@query("q_heavy_hitters", oracle=_HEAVY_HITTERS_ORACLE)
def q_heavy_hitters(spark, sf_dir):
    """Relative-threshold heavy hitters: every token holding at least
    1/1000 of all token slots — the frequency-fence form (boilerplate /
    stop-phrase detection) that a fixed top-k (``q_vocabulary``) can't
    express because the cutoff must scale with the corpus.

    One token-keyed partial-agg shuffle builds counts; the grand total is
    a one-row aggregate broadcast back (BroadcastNestedLoop on a single
    row — the sanctioned scalar pattern); the fence compares integers
    (n·1000 ≥ total) so no float threshold can flip between engines."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n") * _HH_DENOM >= F.col("total"))
        .select(
            "tok",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n") * 1.0 / F.col("total"), 6).alias("frac"),
        )
    )
