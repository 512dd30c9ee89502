"""max_bucket cap in minhash_lsh_candidates (VERDICT.md round-1 item 2).

A pathological LSH bucket (boilerplate/identical docs) must not go quadratic:
buckets larger than the cap are dropped before the pair self-join, the drop
is observable via a pyspark Observation, and small buckets are unaffected.
"""

from pyspark.sql import Observation
from pyspark.sql import functions as F

from yark_spark.operators.dedup import (
    fuzzy_dedup_pairs,
    minhash_lsh_candidates,
    minhash_signature,
)


def _corpus(spark):
    # 30 identical boilerplate docs (one hot bucket per band) + 2 near-dups
    # + 2 unrelated docs.
    boiler = [(i, "lorem ipsum dolor sit amet consectetur") for i in range(30)]
    near = [
        (100, "the quick brown fox jumps over the lazy dog"),
        (101, "the quick brown fox jumps over the lazy cat"),
    ]
    other = [(200, "completely different text about spark plans"), (201, "qqq www eee rrr")]
    return spark.createDataFrame(boiler + near + other, ["doc_id", "text"])


def test_cap_drops_hot_bucket_keeps_small(spark):
    docs = _corpus(spark)
    sig = minhash_signature(docs, "doc_id", "text").persist()
    uncapped = minhash_lsh_candidates(sig, "doc_id", max_bucket=None).toPandas()
    capped = minhash_lsh_candidates(sig, "doc_id", max_bucket=10).toPandas()

    # Uncapped: the 30 boilerplate docs alone make 30*29/2 = 435 pairs.
    boiler_unc = uncapped[(uncapped.id_a < 30) & (uncapped.id_b < 30)]
    assert len(boiler_unc) == 435
    # Capped at 10: every boilerplate bucket has 30 members -> all dropped.
    boiler_cap = capped[(capped.id_a < 30) & (capped.id_b < 30)]
    assert len(boiler_cap) == 0
    # The small near-dup bucket survives the cap.
    assert ((capped.id_a == 100) & (capped.id_b == 101)).any()
    # Pair count is bounded: nothing quadratic in the hot bucket remains.
    assert len(capped) < len(uncapped)
    sig.unpersist()


def test_cap_noop_when_under_threshold(spark):
    docs = _corpus(spark)
    sig = minhash_signature(docs, "doc_id", "text").persist()
    wide = minhash_lsh_candidates(sig, "doc_id", max_bucket=1000)
    off = minhash_lsh_candidates(sig, "doc_id", max_bucket=None)
    a = {tuple(r) for r in wide.collect()}
    b = {tuple(r) for r in off.collect()}
    assert a == b
    sig.unpersist()


def test_cap_is_observable(spark):
    docs = _corpus(spark)
    obs = Observation("lsh_bucket_cap")
    pairs = fuzzy_dedup_pairs(
        docs, "doc_id", "text", threshold=0.0, max_bucket=10, observation=obs
    )
    pairs.count()
    got = obs.get
    # 30 boilerplate docs x 4 bands = 120 rows in capped buckets, 4 buckets.
    assert got["rows_in_capped_buckets"] == 120
    assert abs(got["capped_buckets"] - 4) < 1e-6


def test_end_to_end_still_finds_near_dups(spark):
    docs = _corpus(spark)
    pairs = fuzzy_dedup_pairs(docs, "doc_id", "text", threshold=0.5, max_bucket=10)
    rows = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (100, 101) in rows


def test_simhash_candidates_pigeonhole_complete(spark):
    """bands(4) > max_hamming(3) → every true pair within the Hamming
    radius shares at least one exact band key (pigeonhole), so banding
    loses nothing vs brute-force Hamming over the signatures."""
    import itertools

    from yark_spark.operators.dedup import simhash, simhash_candidates

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "the quick brown fox leaps over the lazy cat"),
            (4, "completely unrelated text about query planning"),
            (5, "another unrelated document mentioning shuffles"),
        ],
        ["doc_id", "text"],
    )
    sigs = {r.doc_id: r.simhash for r in simhash(docs, "doc_id", "text").collect()}
    for max_h in (2, 3):
        truth = {
            (a, b)
            for a, b in itertools.combinations(sorted(sigs), 2)
            if bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= max_h
        }
        got = {
            (r.id_a, r.id_b)
            for r in simhash_candidates(
                docs, "doc_id", "text", max_hamming=max_h
            ).collect()
        }
        assert got == truth


def test_simhash_candidates_each_pair_once(spark):
    """The first-band rule dedups multi-band matches without a distinct():
    identical docs share all 4 bands yet emit exactly one pair row."""
    from yark_spark.operators.dedup import simhash_candidates

    docs = spark.createDataFrame(
        [(1, "same text here"), (2, "same text here")], ["doc_id", "text"]
    )
    rows = simhash_candidates(docs, "doc_id", "text", max_hamming=0).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in rows] == [(1, 2, 0)]


def test_simhash_candidates_cap(spark):
    """Hot buckets (identical docs) are capped exactly like MinHash LSH."""
    from yark_spark.operators.dedup import simhash_candidates

    docs = _corpus(spark)
    capped = simhash_candidates(docs, "doc_id", "text", max_bucket=10).toPandas()
    assert len(capped[(capped.id_a < 30) & (capped.id_b < 30)]) == 0
    uncapped = simhash_candidates(docs, "doc_id", "text", max_bucket=None).toPandas()
    assert len(uncapped[(uncapped.id_a < 30) & (uncapped.id_b < 30)]) == 435


def test_banded_pairs_single_emission_matches_naive(spark):
    """Property: for random corpora, the first-band rule emits exactly the
    set of pairs the naive band-join + distinct would — each exactly once."""
    import random

    from yark_spark.operators.dedup import minhash_lsh_candidates, minhash_signature

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(3, 8)))) for i in range(60)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sig = minhash_signature(docs, "doc_id", "text").persist()
    got = [(r.id_a, r.id_b) for r in minhash_lsh_candidates(sig, "doc_id", max_bucket=None).collect()]
    assert len(got) == len(set(got))  # no pair emitted twice

    # naive reference: explode band keys, equi-join, distinct
    from pyspark.sql import functions as F

    bands, rpb = 4, 4
    keyed = sig.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.hash(F.slice("mhs", b * rpb + 1, rpb)) for b in range(bands)])
        ).alias("band", "key"),
    )
    naive = (
        keyed.alias("a")
        .join(
            keyed.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    assert set(got) == {(r.id_a, r.id_b) for r in naive.collect()}
    sig.unpersist()


def test_capped_plan_has_no_cartesian(spark):
    docs = _corpus(spark)
    plan = fuzzy_dedup_pairs(docs, "doc_id", "text", max_bucket=10)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
