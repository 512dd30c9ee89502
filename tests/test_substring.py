"""Unit semantics of operators/substring.duplicated_span_coverage:
interval-union arithmetic on hand-built corpora (the oracle-parity test
covers the full corpus; these pin the edge shapes)."""

from pyspark.sql import functions as F

from yark_spark.operators.substring import duplicated_span_coverage

SHARED = "a b c d e f g h i j"  # one exact 10-token gram


def _cov(spark, rows, k=10):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = duplicated_span_coverage(df, "doc_id", "text", k=k)
    return {r["doc_id"]: (r["n_tokens"], r["covered_tokens"], r["dup_frac"]) for r in out.collect()}

def test_exact_copy_fully_covered(spark):
    got = _cov(spark, [(1, SHARED), (2, SHARED)])
    assert got[1] == (10, 10, 1.0)
    assert got[2] == (10, 10, 1.0)


def test_unique_docs_zero_coverage(spark):
    got = _cov(spark, [(1, SHARED), (2, "q r s t u v w x y z")])
    assert got[1] == (10, 0, 0.0)
    assert got[2] == (10, 0, 0.0)


def test_two_disjoint_occurrences_sum(spark):
    # doc 3 contains the shared gram twice, separated by one token:
    # marked positions 0 and 11 -> union = 10 + 10 = 20 of 21.
    got = _cov(spark, [(1, SHARED), (3, SHARED + " k " + SHARED)])
    assert got[3][0] == 21
    assert got[3][1] == 20


def test_overlapping_intervals_union_not_sum(spark):
    # doc 4 = SHARED + first 2 shared tokens again; doc 5 shifts SHARED by
    # two filler tokens so doc 4's grams at pos 0 AND pos 2 both repeat
    # (pos 2 gram = 'c..j a b' appears in doc 5 too). Union of [0,10) and
    # [2,12) is 12, not 20.
    doc4 = SHARED + " a b"
    doc5 = "z z " + SHARED + " a b z"
    got = _cov(spark, [(4, doc4), (5, doc5)])
    n4, covered4, _ = got[4]
    assert n4 == 12
    assert covered4 == 12


def test_short_docs_report_zero(spark):
    got = _cov(spark, [(1, "a b c"), (2, SHARED), (3, SHARED)])
    assert got[1] == (3, 0, 0.0)


def test_coverage_never_exceeds_length(spark):
    rows = [(i, SHARED + f" extra{i % 3} " + SHARED) for i in range(12)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = duplicated_span_coverage(df, "doc_id", "text", k=10)
    bad = out.filter(F.col("covered_tokens") > F.col("n_tokens")).count()
    assert bad == 0


def test_interval_union_formula_property():
    """The lag-window formula (first→k, else min(k, pos-prev)) must equal
    the true size of the union of [p, p+k) — property-checked in pure
    python over random position sets (both engines run this same
    algebra, so the formula itself is the thing to pin)."""
    from hypothesis import given, strategies as st

    @given(
        st.lists(st.integers(min_value=0, max_value=300), min_size=0, max_size=60),
        st.integers(min_value=1, max_value=20),
    )
    def check(raw, k):
        pos = sorted(set(raw))
        formula = sum(
            k if i == 0 else min(k, p - pos[i - 1]) for i, p in enumerate(pos)
        )
        truth = len({x for p in pos for x in range(p, p + k)})
        assert formula == truth, (pos, k, formula, truth)

    check()


def test_hash_fn_paths_agree(spark):
    """The xxhash64 production path and the md5 oracle-parity path must
    produce identical coverage (collisions aside, which the fixture can't
    hit)."""
    rows = [(1, SHARED + " tail one"), (2, SHARED + " tail two"),
            (3, "totally different words here with no repeats at all ok")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(duplicated_span_coverage(df, hash_fn="md5").collect())
    b = sorted(duplicated_span_coverage(df, hash_fn="xxhash64").collect())
    assert a == b

    import pytest

    with pytest.raises(ValueError, match="hash_fn"):
        duplicated_span_coverage(df, hash_fn="sha1")
