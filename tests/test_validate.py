"""Unit semantics of operators/validate (checks fire on known-bad
frames; the oracle-parity test covers the corpus keys)."""

from yark_spark.operators.validate import (
    membership_violations,
    not_null_violations,
    profile_table,
    quality_report,
    range_violations,
    referential_violations,
    unique_violations,
)


def test_unique_violations_reports_duplicated_keys(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], ["k", "v"])
    got = unique_violations(df, ["k"]).collect()
    assert [(r["k"], r["n_occurrences"]) for r in got] == [(1, 2)]


def test_referential_violations_anti_join(spark):
    child = spark.createDataFrame([(1,), (2,), (3,)], ["fk"])
    parent = spark.createDataFrame([(1,), (2,)], ["pk"])
    got = referential_violations(child, parent, "fk", "pk").collect()
    assert [r["fk"] for r in got] == [3]


def test_quality_report_counts_and_names(spark):
    df = spark.createDataFrame(
        [(1, None, 99, "x"), (1, "b", 5, "bad"), (2, "c", 5, "x")],
        ["k", "name", "qty", "cat"],
    )
    report = quality_report(
        {
            "k_unique": unique_violations(df, ["k"]),
            "name_not_null": not_null_violations(df, "name"),
            "qty_range": range_violations(df, "qty", 1, 10),
            "cat_membership": membership_violations(df, "cat", ["x", "y"]),
        }
    )
    got = {r["check_name"]: r["n_violations"] for r in report.collect()}
    assert got == {
        "k_unique": 1,
        "name_not_null": 1,
        "qty_range": 1,
        "cat_membership": 1,
    }


def test_profile_table_single_pass_values(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b")], ["id", "s"]
    )
    got = {r["column_name"]: r for r in profile_table(df).collect()}
    assert got["id"]["n_rows"] == 3
    assert got["id"]["n_nulls"] == 0
    assert got["id"]["n_distinct"] == 2
    assert got["id"]["min_value"] == "1" and got["id"]["max_value"] == "2"
    assert got["s"]["n_nulls"] == 1
    assert got["s"]["n_distinct"] == 2
    assert got["s"]["min_value"] == "a" and got["s"]["max_value"] == "b"


def test_profile_table_empty_frame(spark):
    """Empty input → one row per column with zero counts and NULL
    min/max (not an error) — the shape a catalog expects for an empty
    snapshot."""
    df = spark.createDataFrame([], "id long, s string")
    got = {r["column_name"]: r for r in profile_table(df).collect()}
    assert set(got) == {"id", "s"}
    for c in got.values():
        assert c["n_rows"] == 0 and c["n_nulls"] == 0 and c["n_distinct"] == 0
        assert c["min_value"] is None and c["max_value"] is None


def test_quality_report_requires_checks(spark):
    import pytest

    with pytest.raises(ValueError, match="no checks"):
        quality_report({})
