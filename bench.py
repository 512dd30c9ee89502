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
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
