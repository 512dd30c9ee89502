"""Semantic invariants for the round-8b operator batch (oracle parity for
the same keys is covered by the registry-wide differential sweep in
tests/test_oracle_parity.py; these pin the properties the hash can't)."""

import pytest
from pyspark.sql import functions as F

from yark_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_semdedup_drops_are_valid(spark):
    rows = QUERIES["q_semdedup"](spark, SF).collect()
    from yark_spark.queries.round8b import _SEMDEDUP_TAU

    for r in rows:
        # a dropped vector always points at an EARLIER keeper above τ
        assert r.dup_of < r.vec_id
        assert r.sim > _SEMDEDUP_TAU
    # dropping is one row per vector (the argmax partner is unique)
    ids = [r.vec_id for r in rows]
    assert len(ids) == len(set(ids))


def test_semdedup_partner_shares_cluster(spark):
    df = QUERIES["q_semdedup"](spark, SF)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        F.col("vec_id").alias("dup_of"), F.col("label").alias("partner_label")
    )
    joined = df.join(emb, "dup_of")
    assert joined.filter(F.col("label") != F.col("partner_label")).count() == 0


def test_scd2_intervals_partition_the_timeline(spark):
    rows = QUERIES["q_scd2_intervals"](spark, SF).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r.version)
        # versions are consecutive from 1; intervals chain exactly
        assert [r.version for r in ivs] == list(range(1, len(ivs) + 1))
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from, user
            # a new version only opens on an attribute CHANGE
            assert a.event_type != b.event_type, user
        assert ivs[-1].valid_to is None  # current version is open-ended


def test_anomaly_mad_counts_bounded(spark):
    rows = QUERIES["q_anomaly_mad"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.mad >= 0
        assert 0 <= r.n_anomalies <= r.n
        # the robust fence should not flag the bulk of the data
        assert r.n_anomalies < 0.5 * r.n


def test_ewma_first_event_is_identity_and_bounded(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = QUERIES["q_ewma_smooth"](spark, SF)
    j = out.join(ev.select("event_id", "ts", "value"), "event_id")
    first = (
        j.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("user_id")
                .orderBy("ts", "event_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .filter(F.round(F.col("ewma"), 5) != F.round(F.col("value"), 5))
    )
    assert first.count() == 0
    # a convex combination of observed values stays inside their range
    lo, hi = ev.agg(F.min("value"), F.max("value")).first()
    bad = out.filter((F.col("ewma") < lo - 1e-6) | (F.col("ewma") > hi + 1e-6))
    assert bad.count() == 0


def test_collocation_pmi_ordering_and_floor(spark):
    from yark_spark.queries.round8b import _PMI_MIN_COUNT, _PMI_TOP

    rows = QUERIES["q_collocation_pmi"](spark, SF).collect()
    assert 0 < len(rows) <= _PMI_TOP
    for r in rows:
        assert r.c_ab >= _PMI_MIN_COUNT
        assert " " in r.bigram
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_fuzzy_match_resolves_every_corruption(spark):
    rows = QUERIES["q_fuzzy_match_join"](spark, SF).collect()
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert len(rows) == n_cust  # every dirty record resolves
    for r in rows:
        assert r.matched_key == r.d_key  # ...to the right entity
        expect = 2 if r.d_key % 6 == 0 else (1 if r.d_key % 3 == 0 else 0)
        assert r.lev == expect, r


@pytest.mark.parametrize(
    "key", ["q_semdedup", "q_collocation_pmi", "q_fuzzy_match_join"]
)
def test_round8b_plans_stay_joined_on_keys(spark, key):
    plan = (
        QUERIES[key](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan


def test_fill_forward_matches_sequential_replay(spark):
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr("event_id", "user_id", "ts", "event_type", "value")
        .collect()
    )
    expect = {}
    last = {}
    for r in sorted(ev, key=lambda r: (r.user_id, r.ts, r.event_id)):
        if r.event_type != "error":
            last[r.user_id] = r.value
        expect[r.event_id] = last.get(r.user_id)
    out = QUERIES["q_fill_forward"](spark, SF).collect()
    assert len(out) == len(expect)
    for r in out:
        assert r.value_filled == expect[r.event_id], r


def test_running_distinct_is_monotone_and_bounded(spark):
    out = QUERIES["q_running_distinct"](spark, SF)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_types = ev.select("event_type").distinct().count()
    assert out.filter(
        (F.col("distinct_types_so_far") < 1)
        | (F.col("distinct_types_so_far") > n_types)
    ).count() == 0
    # final value per user == that user's true distinct-type count
    truth = ev.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("t")
    )
    final = out.groupBy("user_id").agg(
        F.max("distinct_types_so_far").alias("m")
    )
    assert final.join(truth, "user_id").filter(
        F.col("m") != F.col("t")
    ).count() == 0


def test_embedding_dim_stats_shape(spark):
    rows = QUERIES["q_embedding_dim_stats"](spark, SF).collect()
    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    dims = sorted(r.dim for r in rows)
    assert dims == list(range(1, len(dims) + 1))
    for r in rows:
        assert r.n == n_vecs
        assert r.lo <= r.mean <= r.hi
        assert r.std >= 0


def test_embedding_quantize_codes_fit_int8(spark):
    rows = QUERIES["q_embedding_quantize"](spark, SF).collect()
    for r in rows:
        assert 0 <= r.max_code <= 127, r
        assert r.scale_nanos > 0
        assert r.sse_picos >= 0
        # SSE is bounded by n_dims * (scale/2)^2 (rounding residual bound)
        half = r.scale_nanos / 1e9 / 2
        assert r.sse_picos / 1e12 <= 64 * half * half * 1.001, r


def test_heavy_hitters_threshold_exact(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = docs.select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
    total = toks.count()
    truth = {
        r.tok: r.n
        for r in toks.groupBy("tok").agg(F.count("*").alias("n")).collect()
        if r.n * 1000 >= total
    }
    got = {r.tok: r.n for r in QUERIES["q_heavy_hitters"](spark, SF).collect()}
    assert got == truth
