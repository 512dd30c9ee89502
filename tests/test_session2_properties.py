"""Property-style invariants for round-7 session-2 operators (single
Spark actions over batched fuzz inputs — per-example Spark round trips
would be prohibitively slow)."""

import random
import string

from pyspark.sql import functions as F


def _fuzz_strings(n=120, seed=7):
    rng = random.Random(seed)
    alphabet = string.ascii_letters + string.digits + " \t\n\x0b\f\r!@#$%^&*()[]{};:'\",.<>/?\\|`~-_=+"
    return [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        for _ in range(n)
    ]


def test_normalize_text_idempotent_and_canonical(spark):
    from yark_spark.functions.text import normalize_text

    df = spark.createDataFrame([(i, s) for i, s in enumerate(_fuzz_strings())], ["i", "s"])
    out = df.select(
        normalize_text(F.col("s")).alias("n1"),
        normalize_text(normalize_text(F.col("s"))).alias("n2"),
    )
    assert out.filter(F.col("n1") != F.col("n2")).count() == 0
    # canonical form: lowercase alnum + single spaces, no edge spaces
    bad = out.filter(
        F.col("n1").rlike("[^a-z0-9 ]") | F.col("n1").rlike("^ | $|  ")
    ).count()
    assert bad == 0


def test_pseudonymize_deterministic_and_collision_free(spark):
    from yark_spark.functions.scalar import pseudonymize

    df = spark.range(5000).select(F.col("id"))
    a = df.select("id", pseudonymize(F.col("id")).alias("p"))
    # deterministic: recomputing yields the same mapping
    b = df.select("id", pseudonymize(F.col("id")).alias("p2"))
    joined = a.join(b, "id")
    assert joined.filter(F.col("p") != F.col("p2")).count() == 0
    # collision-free on this range; different salt -> disjoint mapping
    assert a.select("p").distinct().count() == 5000
    c = df.select(pseudonymize(F.col("id"), salt="other").alias("p"))
    assert a.select("p").intersect(c).count() == 0


def test_snapshot_diff_identity_and_disjoint(spark):
    from yark_spark.operators.incremental import snapshot_diff

    x = spark.createDataFrame(
        [(i, f"h{i}") for i in range(50)], ["k", "content_hash"]
    )
    same = snapshot_diff(x, x, "k")
    assert same.filter(F.col("status") != "unchanged").count() == 0
    assert same.count() == 50

    y = spark.createDataFrame(
        [(i + 100, f"h{i}") for i in range(30)], ["k", "content_hash"]
    )
    dj = snapshot_diff(x, y, "k")
    got = {r["status"]: 1 for r in dj.select("status").distinct().collect()}
    assert set(got) == {"added", "removed"}
    assert dj.filter(F.col("status") == "removed").count() == 50
    assert dj.filter(F.col("status") == "added").count() == 30
