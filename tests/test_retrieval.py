"""Unit semantics of operators/retrieval (BM25, RRF) on hand-built
frames — the oracle keys cover the corpus shapes."""

import math

from yark_spark.operators.retrieval import bm25, rrf_fuse


def test_bm25_hand_computed_score(spark):
    # 2 docs, dl = 3 each, avgdl = 3; term 'x': df=1, tf=2 in doc 1.
    docs = spark.createDataFrame(
        [(1, "x x y"), (2, "a b c")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["bm25"] for r in bm25(docs, ["x"]).collect()}
    idf = math.log(1.0 + (2 - 1 + 0.5) / (1 + 0.5))
    tfn = 2 * (1.2 + 1.0) / (2 + 1.2 * (1 - 0.75 + 0.75 * 3 / 3))
    assert got == {1: round(idf * tfn, 6)}


def test_rrf_fuse_missing_doc_contributes_single_term(spark):
    a = spark.createDataFrame([(1, 2.0), (2, 1.0)], ["doc_id", "s1"])
    b = spark.createDataFrame([(2, 9.0), (3, 8.0)], ["doc_id", "s2"])
    got = {r["doc_id"]: r["rrf"] for r in rrf_fuse([(a, "s1"), (b, "s2")], k=60).collect()}
    assert got[1] == round(1 / 61, 6)              # only ranker A
    assert got[2] == round(1 / 62 + 1 / 61, 6)     # rank 2 in A, rank 1 in B
    assert got[3] == round(1 / 62, 6)              # only ranker B
    assert set(got) == {1, 2, 3}


def test_rrf_fuse_rejects_empty(spark):
    import pytest

    with pytest.raises(ValueError, match="no rankers"):
        rrf_fuse([])


def test_bm25_score_is_additive_over_terms(spark):
    """BM25 is a sum of independent per-term contributions: the 2-term
    score equals the per-term scores summed per doc (within the 6dp
    rounding both paths apply)."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "x x y z"), (2, "y z z"), (3, "a b c")], ["doc_id", "text"]
    )
    both = {r["doc_id"]: r["bm25"] for r in bm25(docs, ["x", "y"]).collect()}
    only_x = {r["doc_id"]: r["bm25"] for r in bm25(docs, ["x"]).collect()}
    only_y = {r["doc_id"]: r["bm25"] for r in bm25(docs, ["y"]).collect()}
    for doc in both:
        expect = only_x.get(doc, 0.0) + only_y.get(doc, 0.0)
        assert abs(both[doc] - expect) < 2e-6, (doc, both[doc], expect)
