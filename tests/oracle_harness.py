"""Local replica of the driver's DuckDB differential check.

Runs a query key's Spark form and oracle SQL on the same sf dir and
compares row count, column names, and order-insensitive values exactly.
Stricter than the driver can possibly be — if this passes, the driver's
value-hash comparison passes for any reasonable normalization.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm_cell(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "∅"
            if v == int(v) and abs(v) < 1e15:
                return f"{int(v)}"
            return repr(v)
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        if hasattr(v, "item") and not isinstance(v, (bytes, str)):
            try:
                return norm_cell(v.item())
            except Exception:
                pass
        if v is pd.NaT:
            return "∅"
        return repr(v)

    out = df.map(norm_cell)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def compare_query(spark, key: str, sf_dir: str, con=None) -> None:
    """Assert Spark result == oracle result for one query key."""
    from yark_spark.queries import ORACLES, QUERIES

    spark_pdf = QUERIES[key](spark, sf_dir).toPandas()
    own_con = con is None
    if own_con:
        con = duck_connection(sf_dir)
    try:
        duck_pdf = con.execute(ORACLES[key]).fetchdf()
    finally:
        if own_con:
            con.close()

    assert len(spark_pdf) == len(duck_pdf), (
        f"{key}: row count mismatch spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{key}: columns mismatch spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
    )
    a = _normalize(spark_pdf)
    b = _normalize(duck_pdf)
    if not a.equals(b):
        diff_mask = (a != b).any(axis=1)
        sample = pd.concat(
            {"spark": a[diff_mask].head(5), "duck": b[diff_mask].head(5)}, axis=1
        )
        raise AssertionError(f"{key}: value mismatch; first differing rows:\n{sample}")
