"""Semantic invariants for the round-8c batch (oracle parity is covered by
the registry-wide sweep in tests/test_oracle_parity.py)."""

from pyspark.sql import functions as F

from yark_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_copurchase_rules_probability_axioms(spark):
    rows = QUERIES["q_copurchase_rules"](spark, SF).collect()
    from yark_spark.queries.round8c import _RULE_MIN_SUPPORT

    seen = set()
    for r in rows:
        assert r.support >= _RULE_MIN_SUPPORT
        assert 0 < r.confidence <= 1
        assert r.lift > 0
        seen.add((r.antecedent, r.consequent))
    # every rule's mirror is present (directed expansion is symmetric in
    # the pair set), never a self-rule
    for a, c in seen:
        assert a != c
        assert (c, a) in seen


def test_copurchase_support_matches_brute_force(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    baskets = {}
    for r in li.select("l_orderkey", "l_partkey").collect():
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    from collections import Counter

    c = Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                c[(a, b)] += 1
    rows = QUERIES["q_copurchase_rules"](spark, SF).collect()
    for r in rows:
        key = tuple(sorted((r.antecedent, r.consequent)))
        assert c[key] == r.support, r


def test_minhash_pr_confusion_is_complete(spark):
    row = QUERIES["q_minhash_pr"](spark, SF).first()
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter("doc_id < 20")
    n = docs.count()
    assert row.tp + row.fp + row.fn + row.tn == n * (n - 1) // 2
    assert min(row.tp, row.fp, row.fn, row.tn) >= 0


def test_time_weighted_avg_bounds_and_segments(spark):
    out = QUERIES["q_time_weighted_avg"](spark, SF)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    lo, hi = ev.agg(F.min("value"), F.max("value")).first()
    assert out.filter(
        (F.col("twa") < lo - 1e-6) | (F.col("twa") > hi + 1e-6)
    ).count() == 0
    # n_segments = events per user - 1 (the open last reading has no span)
    per_user = {r.user_id: r["count"] for r in ev.groupBy("user_id").count().collect()}
    for r in out.collect():
        assert r.n_segments == per_user[r.user_id] - 1


def test_time_weighted_avg_constant_series_is_identity(spark):
    from yark_spark.queries.round8c import q_time_weighted_avg  # noqa: F401

    df = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:00:00", 5.0), (2, 1, "2024-01-01 00:17:00", 5.0),
         (3, 1, "2024-01-02 03:00:00", 5.0)],
        ["event_id", "user_id", "ts_s", "value"],
    ).select("event_id", "user_id", F.to_timestamp("ts_s").alias("ts"), "value")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    g = df.select("user_id", "value", us.alias("us"), F.lead(us).over(w).alias("nxt")).filter(
        F.col("nxt").isNotNull()
    )
    twa = g.groupBy("user_id").agg(
        (F.sum(F.col("value") * (F.col("nxt") - F.col("us"))) / F.sum(F.col("nxt") - F.col("us"))).alias("twa")
    ).first()
    assert abs(twa.twa - 5.0) < 1e-12


def test_embedding_covariance_matches_numpy(spark):
    import numpy as np

    rows = spark.read.parquet(f"{SF}/embeddings.parquet").select("embedding").collect()
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    expect = np.cov(X, rowvar=False)  # sample covariance (ddof=1)
    got = QUERIES["q_embedding_covariance"](spark, SF).collect()
    assert len(got) == 64 * 65 // 2
    for r in got:
        assert abs(r.cov - expect[r.i - 1, r.j - 1]) < 2e-6, (r.i, r.j)


def test_pca_from_covariance_axioms(spark):
    import numpy as np

    from yark_spark.operators.pca import covariance_to_matrix, pca_from_covariance

    cov = QUERIES["q_embedding_covariance"](spark, SF)
    cov = cov.cache()
    m = covariance_to_matrix(cov)
    vals, vecs, ratio = pca_from_covariance(cov)
    assert abs(vals.sum() - np.trace(m)) < 1e-8  # eigvals sum to trace
    assert (np.diff(vals) <= 1e-12).all()  # descending
    assert abs(ratio.sum() - 1.0) < 1e-8
    # reconstruction: V diag(L) V^T == M
    assert np.abs(vecs @ np.diag(vals) @ vecs.T - m).max() < 1e-8
    # deterministic sign: largest coordinate of each component positive
    for c in range(vecs.shape[1]):
        assert vecs[np.argmax(np.abs(vecs[:, c])), c] > 0
    cov.unpersist()


def test_ks_test_matches_scipy_style_bruteforce(spark):
    import numpy as np

    ev = spark.read.parquet(f"{SF}/events.parquet")
    a = np.sort(
        [r.value for r in ev.filter("event_type = 'click'").select("value").collect()]
    )
    b = np.sort(
        [r.value for r in ev.filter("event_type = 'view'").select("value").collect()]
    )
    grid = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(a, grid, side="right") / len(a)
    f2 = np.searchsorted(b, grid, side="right") / len(b)
    d_expect = np.abs(f1 - f2).max()
    row = QUERIES["q_ks_test"](spark, SF).first()
    assert row.n1 == len(a) and row.n2 == len(b)
    assert abs(row.d_num / (row.n1 * row.n2) - d_expect) < 1e-12


def test_gini_matches_bruteforce_and_bounds(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    xs = sorted(r.n_chars for r in docs.select("n_chars").collect())
    n = len(xs)
    srx = sum((i + 1) * x for i, x in enumerate(xs))
    expect = (2.0 * srx) / (n * sum(xs)) - (n + 1.0) / n
    row = QUERIES["q_gini"](spark, SF).first()
    assert row.n == n
    assert abs(row.gini - expect) < 1e-6
    assert 0 <= row.gini < 1


def test_exact_median_matches_builtin(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    expect = li.agg(F.round(F.median("l_extendedprice"), 4)).first()[0]
    row = QUERIES["q_exact_median_global"](spark, SF).first()
    assert row.median_price == expect
    assert row.n == li.count()


def test_zipf_slope_axioms(spark):
    row = QUERIES["q_zipf_slope"](spark, SF).first()
    assert row.vocab > 0
    assert row.zipf_slope <= 0  # frequency never increases with rank
    assert 0 <= row.r2 <= 1
