"""Simulate the driver's CORRECTNESS gate locally.

Runs the FIRST 50 registered query keys (exactly the driver's window)
against a VANILLA SparkSession (no yark_spark session tuning — catches
session-conf dependencies) and compares each oracle-backed key to DuckDB
over the same parquet tables: schema (column names), row count, int/float
dtype drift (the value-hash killer), and normalized values.

Run from OUTSIDE the repo so pandas-UDF workers don't accidentally inherit
an importable repo cwd (see .claude/skills/verify/SKILL.md):

    cd /tmp && python /root/repo/scripts/driver_sim.py [sf_dir] [key ...]

Exit code 0 = every checked key matches (rows-only keys just run).
"""

from __future__ import annotations

import sys

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--all"]
    check_all = "--all" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    sys.path.insert(0, "/root/repo")
    import duckdb
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # explicitly named keys resolve against the FULL registry;
    # the bare invocation simulates the driver window (first 50)
    pool = list(qs) if (check_all or only) else list(qs)[:50]
    window = [k for k in pool if not only or k in only]
    bad, rows_only = [], []
    timings: dict = {}
    for key in window:
        import time as _time

        _t0 = _time.perf_counter()
        try:
            a = qs[key](spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001 — report, don't abort the sweep
            print(f"{key}: SPARK ERROR {str(ex)[:200]}")
            bad.append(key)
            continue
        timings[key] = round(_time.perf_counter() - _t0, 2)
        if key not in osql:
            rows_only.append(key)
            print(f"{key}: rows-only ({len(a)} rows)")
            continue
        try:
            b = con.execute(osql[key]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            print(f"{key}: ORACLE ERROR {str(ex)[:200]}")
            bad.append(key)
            continue
        cols = sorted(a.columns)
        if cols != sorted(b.columns):
            print(f"{key}: SCHEMA spark={cols} oracle={sorted(b.columns)}")
            bad.append(key)
            continue
        if len(a) != len(b):
            print(f"{key}: ROWS spark={len(a)} oracle={len(b)}")
            bad.append(key)
            continue
        a2 = a[cols].sort_values(cols).reset_index(drop=True)
        b2 = b[cols].sort_values(cols).reset_index(drop=True)
        drift = [
            c
            for c in cols
            if {str(a2[c].dtype)[:3], str(b2[c].dtype)[:3]} == {"int", "flo"}
        ]
        if drift:
            print(f"{key}: INT/FLOAT DTYPE DRIFT {drift} — value hash will differ")
            bad.append(key)
            continue

        def _norm(v):
            return f"{v:.6g}" if isinstance(v, float) else str(v)

        aa = a2.map(_norm).sort_values(cols).reset_index(drop=True)
        bb = b2.map(_norm).sort_values(cols).reset_index(drop=True)
        if not aa.equals(bb):
            print(f"{key}: VALUES DIFFER")
            bad.append(key)
            continue
        print(f"{key}: ok ({len(a)} rows)")

    print(
        f"\nchecked {len(window)}: {len(window) - len(bad) - len(rows_only)} matched, "
        f"{len(rows_only)} rows-only, {len(bad)} failed"
    )
    if timings:
        slowest = sorted(timings.items(), key=lambda t: -t[1])[:5]
        print("slowest (spark side, s):", ", ".join(f"{k}={v}" for k, v in slowest))
    if bad:
        print("FAILED:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
