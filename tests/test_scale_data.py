"""Invariants of the scale-up data generator (scripts/make_scale_data.py):
the lane's ratios are only meaningful if the derived corpus actually has
the properties BASELINE.md claims for it."""

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/scripts")

from make_scale_data import FIXED_TABLES, KEY_COLS, SHIFT, scaled_table

SRC = "/root/testdata/sf0.001"
COPIES = 3


def test_row_counts_scale_and_dims_stay_fixed(spark):
    for table in ("orders", "lineitem", "documents"):
        base = spark.read.parquet(f"{SRC}/{table}.parquet").count()
        assert scaled_table(spark, SRC, table, COPIES).count() == base * COPIES
    for table in FIXED_TABLES:
        base = spark.read.parquet(f"{SRC}/{table}.parquet").count()
        assert scaled_table(spark, SRC, table, COPIES).count() == base


def test_key_shift_preserves_referential_integrity(spark):
    """Every scaled lineitem.l_orderkey must still resolve against scaled
    orders — the copy offsets line up across tables."""
    orders = scaled_table(spark, SRC, "orders", COPIES)
    lineitem = scaled_table(spark, SRC, "lineitem", COPIES)
    dangling = lineitem.join(
        orders.select("o_orderkey"),
        lineitem.l_orderkey == orders.o_orderkey,
        "left_anti",
    ).count()
    assert dangling == 0
    # keys are globally unique across copies
    assert orders.select("o_orderkey").distinct().count() == orders.count()


def test_copies_occupy_disjoint_key_ranges(spark):
    docs = scaled_table(spark, SRC, "documents", COPIES)
    per_copy = (
        docs.groupBy((F.col("doc_id") / SHIFT).cast("int").alias("copy"))
        .count()
        .collect()
    )
    assert {r.copy for r in per_copy} == set(range(COPIES))
    assert len({r["count"] for r in per_copy}) == 1  # equal-size copies


def test_token_renaming_is_bijective_within_copy(spark):
    """The renaming must preserve within-copy token-set relations exactly:
    two docs' Jaccard in copy c equals their Jaccard in copy 0 (pairs
    scale LINEARLY), while the same doc across copies diverges below the
    0.5 dedup threshold (no quadratic cross-copy pair minting)."""
    from yark_spark.operators.dedup import tokens

    docs = scaled_table(spark, SRC, "documents", COPIES).filter(
        (F.col("doc_id") % SHIFT) < 30
    )
    rows = docs.select(
        "doc_id", F.array_distinct(tokens(docs)).alias("toks")
    ).collect()
    by_id = {r.doc_id: set(r.toks) for r in rows}

    def jac(a, b):
        return len(a & b) / len(a | b) if a | b else 1.0

    base_ids = sorted(i for i in by_id if i < SHIFT)
    for c in range(1, COPIES):
        # within-copy structure identical to copy 0
        for i in base_ids[:10]:
            for j in base_ids[:10]:
                if i < j:
                    got = jac(by_id[i + c * SHIFT], by_id[j + c * SHIFT])
                    want = jac(by_id[i], by_id[j])
                    assert got == pytest.approx(want, abs=1e-9), (i, j, c)
        # cross-copy self-similarity concentrates near (1-r)/(1+r) ≈ 0.43;
        # short docs have per-token selection variance, so a FEW pairs may
        # poke above the 0.5 dedup threshold — the lane only needs the
        # minted cross-copy pairs to be a small fraction of the (exactly
        # linear) within-copy pairs, not zero
        sims = sorted(jac(by_id[i], by_id[i + c * SHIFT]) for i in base_ids)
        median = sims[len(sims) // 2]
        above = sum(s >= 0.5 for s in sims) / len(sims)
        assert median < 0.5, median
        assert above < 0.15, (above, sims[-3:])


def test_embedding_labels_scale_cluster_count_not_size(spark):
    emb = scaled_table(spark, SRC, "embeddings", COPIES)
    base = spark.read.parquet(f"{SRC}/embeddings.parquet")
    n_labels = base.select("label").distinct().count()
    assert emb.select("label").distinct().count() == n_labels * COPIES
    # per-cluster size distribution identical to the base corpus
    base_sizes = sorted(
        r["count"] for r in base.groupBy("label").count().collect()
    )
    per_copy = (
        emb.groupBy((F.col("vec_id") / SHIFT).cast("int").alias("copy"), "label")
        .count()
        .collect()
    )
    for c in range(COPIES):
        sizes = sorted(r["count"] for r in per_copy if r.copy == c)
        assert sizes == base_sizes, c


def test_customer_names_track_shifted_keys(spark):
    cust = scaled_table(spark, SRC, "customer", COPIES)
    bad = cust.filter(
        F.col("c_name")
        != F.concat(F.lit("Customer#"), F.lpad(F.col("c_custkey").cast("string"), 12, "0"))
    ).count()
    assert bad == 0
    assert cust.select("c_name").distinct().count() == cust.count()
