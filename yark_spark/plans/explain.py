"""Physical-plan inspection helpers (SURVEY.md §4).

Used by tests to pin the scale-critical plan properties: predicate pushdown
reaching the Parquet scan, column pruning in ReadSchema, broadcast joins on
dimension tables, whole-stage codegen coverage, and shuffle counts.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def pushed_filters(df: DataFrame) -> str:
    """Concatenated PushedFilters blocks across all scans (raw text — filter
    exprs themselves contain commas, so no splitting)."""
    plan = formatted_plan(df)
    return " ".join(m.group(1) for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan))


def read_schemas(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan)]


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (excludes broadcast exchanges).
    Formatted mode lists nodes as '(N) Exchange' with arguments on the next
    line — count shuffle (hash/range) partitionings only."""
    plan = formatted_plan(df)
    # 'Arguments: hash/rangepartitioning' lines appear only under Exchange
    # nodes (details section), one per shuffle
    return len(re.findall(r"Arguments: (?:hash|range)partitioning", plan))


def count_broadcast_joins(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", formatted_plan(df)))


def has_whole_stage_codegen(df: DataFrame) -> bool:
    """Formatted mode marks codegen membership with '[codegen id : N]'."""
    return "codegen id" in formatted_plan(df)


def assert_scan_pruned(df: DataFrame, must_not_contain: list[str]) -> None:
    """Column pruning: none of the named columns may appear in any scan's
    ReadSchema."""
    schemas = read_schemas(df)
    assert schemas, "no parquet scans found in plan"
    for col in must_not_contain:
        for s in schemas:
            assert f"{col}:" not in s, f"column {col} not pruned from scan: {s}"
