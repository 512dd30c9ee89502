#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {key: sec, ...}, "sf": ...}.

Each query is executed to completion (count of the result — forces the full
plan without driver-side materialization cost dominating).
"""

from __future__ import annotations

import json
import os
import sys
import time


HEADLINE = [
    "q_groupby_agg",      # TPC-H Q1 shape: scan + hash agg
    "q_join_inner",       # fact-fact sort-merge/AQE join
    "q_join_3way",        # broadcast dim chain
    "q_window_rank",      # shuffle + window
    "q_asof_join",        # union + running window (as-of)
    "q_topk",             # TakeOrderedAndProject
    "q_dedup_exact",      # content-hash dedup
    "q_minhash_signature",  # explode + groupBy (shingle pipeline)
    "q_dedup_fuzzy",      # full MinHash LSH candidate pipeline
    "q_cosine_topk",      # brute-force vector top-k
    "q_text_stats",       # text aggregate scan
    "q_stream_tumbling",  # windowed time agg
    "q_tpch_q3_shape",    # selective dim filter + join chain + topk
    "q_tpch_q5_shape",    # star join with broadcast dims
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from yark_spark.queries import QUERIES
    from yark_spark.session import get_spark

    spark = get_spark("yark_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + file listing so per-query numbers measure the plan
    QUERIES["q_full_scan"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for key in HEADLINE:
        df = QUERIES[key](spark, sf_dir)
        t0 = time.perf_counter()
        df.count()
        timings[key] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    ingest = bench_history_ingest(spark)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "ingest": ingest,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


def bench_history_ingest(spark, n_rows: int = 100_000) -> dict:
    """Watch-history ingest throughput (the reference's core workload —
    `cmds/archive.py:331-348` does this sequentially with a commit per row;
    SQLite-bound at roughly hundreds of rows/s). Measures file → parse →
    compound-key dedup → surrogate ids → parquet write, end to end."""
    import tempfile

    from yark_spark.operators.writes import insert_ignore
    from yark_spark.sources.takeout import dedupe_history, read_watch_history

    d = tempfile.mkdtemp(prefix="bench_ingest_")
    path = os.path.join(d, "watch-history.json")
    with open(path, "w") as f:
        f.write("[")
        for i in range(n_rows):
            if i:
                f.write(",")
            f.write(
                '{"titleUrl": "https://www.youtube.com/watch?v=vid%07dXXXX",'
                ' "time": "2024-%02d-%02dT%02d:%02d:%02d Z"}'.replace(" Z", "Z")
                % (i % 50_000, (i // 10_000) % 12 + 1, i % 28 + 1, i % 24, i % 60, i % 60)
            )
        f.write("]")

    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    raw = read_watch_history(spark, path)
    deduped = dedupe_history(raw).withColumn(
        "history_id", F.xxhash64("video", "watched")
    ).select("history_id", "video", "watched")
    out = os.path.join(d, "history_out")
    deduped.write.mode("overwrite").parquet(out)
    dt = time.perf_counter() - t0
    n_out = spark.read.parquet(out).count()
    return {
        "history_rows_in": n_rows,
        "history_rows_out": n_out,
        "sec": round(dt, 4),
        "rows_per_sec": round(n_rows / dt),
    }


if __name__ == "__main__":
    main()
