"""Comment-tree traversal tests (schema.sql:37,41 self-FK; SURVEY §7 risk:
iterative self-join in place of recursive CTE)."""

from yark_spark.operators.comments import resolve_roots, thread_stats


def _comments(spark, rows):
    return spark.createDataFrame(
        rows, "comment_id string, parent string, likes long"
    ).selectExpr("comment_id", "parent", "likes")


def test_resolve_depth_two(spark):
    df = _comments(spark, [("c1", None, 3), ("c2", "c1", 1), ("c3", "c2", 0)])
    got = {r["comment_id"]: (r["root_id"], r["depth"]) for r in resolve_roots(df).collect()}
    assert got == {"c1": ("c1", 0), "c2": ("c1", 1), "c3": ("c1", 2)}


def test_orphan_surfaces_not_lost(spark):
    df = _comments(spark, [("c1", None, 0), ("cx", "missing", 0)])
    got = {r["comment_id"]: r["root_id"] for r in resolve_roots(df).collect()}
    assert got["cx"] is None  # corrupt parent → surfaced, not dropped


def test_thread_stats(spark):
    df = _comments(
        spark,
        [("c1", None, 3), ("c2", "c1", 1), ("c3", "c1", 2), ("d1", None, 10)],
    )
    got = {r["root_id"]: r for r in thread_stats(df).collect()}
    assert got["c1"]["n_comments"] == 3
    assert got["c1"]["max_depth"] == 1
    assert got["c1"]["total_likes"] == 6
    assert got["d1"]["n_comments"] == 1
