#!/usr/bin/env python
"""Round-17 scale lanes: 20x/50x curves for the round-17 surface —
Delta stats skipping, Iceberg bounds pruning, the Iceberg changelog
scan, and VARIANT column decode.

The registered query keys clamp doc_id < 512 (the oracle fixture
range), so the lane times the UNDERLYING feature operators over the
WHOLE documents table of each directory — per-group applyInPandas
pipelines whose table count scales linearly with the corpus. Same
protocol as scripts/scale_bench.py: noop sink (consumes every
column), min-of-3 with cache clear, ratios vs /root/testdata/sf0.1.

Usage: python scripts/scale_lane_r17.py <scale_dir> [--json out.json] [--note ...]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    argv = list(sys.argv[1:])
    note = None
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if "--note" in argv:
        i = argv.index("--note")
        note = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf1 = argv[0] if argv else "/root/repo/.scale/sf2x"
    base = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from yark_spark.io import load_table
    from yark_spark.queries import QUERIES
    from yark_spark.session import get_spark

    from yark_spark.operators.multimodal import (
        delta_stats_skip_features,
        delta_variant_features,
        iceberg_bounds_prune_features,
        iceberg_changelog_features,
    )

    LANE = {
        "delta_stats_skip_full": delta_stats_skip_features,
        "iceberg_bounds_prune_full": iceberg_bounds_prune_features,
        "iceberg_changelog_full": iceberg_changelog_features,
        "delta_variant_full": delta_variant_features,
    }

    spark = get_spark("yark_spark-scale-r17")
    spark.sparkContext.setLogLevel("ERROR")
    for d in (base, sf1):
        QUERIES["q_full_scan"](spark, d).count()  # warm listings + JIT

    from yark_spark.operators.release import release_tracked

    def run(fn, d: str) -> tuple[float, int]:
        runs = []
        for _ in range(3):
            spark.catalog.clearCache()
            release_tracked()
            t0 = time.perf_counter()
            df = fn(load_table(spark, d, "documents"))
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        n = fn(load_table(spark, d, "documents")).count()
        return round(min(runs), 4), n

    out: dict = {"metric": "scale_ratio_r17_lane", "queries": {}}
    tot_base = tot_sf1 = 0.0
    for key, fn in LANE.items():
        w0, n0 = run(fn, base)
        w1, n1 = run(fn, sf1)
        tot_base += w0
        tot_sf1 += w1
        out["queries"][key] = {
            "sf0.1_warm": w0,
            "sf1_warm": w1,
            "ratio": round(w1 / w0, 2) if w0 else None,
            "rows_sf0.1": n0,
            "rows_sf1": n1,
            "rows_ratio": round(n1 / n0, 2) if n0 else None,
        }
    out["value"] = round(tot_sf1 / tot_base, 3)
    out["unit"] = "ratio"
    out["total_sf0.1_warm"] = round(tot_base, 4)
    out["total_sf1_warm"] = round(tot_sf1, 4)
    out["load_avg"] = [round(x, 2) for x in os.getloadavg()]
    if note:
        out["method"] = note
    print(json.dumps(out))
    if json_path:
        with open(json_path, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
