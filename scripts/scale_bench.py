#!/usr/bin/env python
"""Scale-up bench lane (VERDICT r6 item 1): run the headline query set at
sf0.1 AND at the derived 10× directory (scripts/make_scale_data.py) in one
session, and print per-query sf1/sf0.1 time ratios as ONE JSON line.

Near-linear scaling = ratio ≈ 10 × (parallel-efficiency factor); local[32]
under-utilizes at sf0.1 (tiny tasks), so healthy ratios land well UNDER
10. A ratio ≫ 10 flags a super-linear operator (the thing this lane
exists to catch). Results are recorded in BASELINE.md §scale.

Usage: python scripts/scale_bench.py [sf1_dir] [base_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

EXTRA = [
    "q_sessionize",        # per-user windows: user cardinality scales x10
    "q_token_entropy",     # two-level agg over (doc, token)
    "q_dedup_exact",       # content-hash shuffle
    "q_minhash_signature", # map-only signature pass
    # round-7 session-2 heavy curation ops
    "q_substring_dedup",   # gram volume x10; repeat filter partial agg
    "q_dedup_incremental", # band semi-join vs a x10 index
    "q_line_dedup",        # line-cardinality shuffle + reassembly
    "q_bm25",              # postings filter before shuffle
    # round-8 additions
    "q_skyline",           # two-level frontier; partials must stay tiny
    "q_pagerank",          # 3 iterations of edge-join + partial agg
    "q_weighted_sample",   # bounded explode + TakeOrdered top-k
    # round-8b curation/analytics batch
    "q_semdedup",          # within-cluster pair join; cluster COUNT scales
    "q_fuzzy_match_join",  # blocked record linkage; blocks stay bounded
    "q_collocation_pmi",   # vocabulary-bounded bigram + marginal rollups
    "q_scd2_intervals",    # per-user change-point windows
    "q_heavy_hitters",     # token counts + one-row total broadcast
    # round 9: the r8 statistics/rules keys join the deep (20x/50x) lane
    "q_exact_median_global",  # value-count agg + two-phase prefix sum
    "q_copurchase_rules",     # basket self-join; basket size stays bounded
    # round 10: the r9 analytics keys join the deep lane (VERDICT r9 #5)
    "q_funnel_steps",          # 3 chained min-ts aggs; user cardinality scales
    "q_snm_pairs",             # sorted-neighborhood linkage; window-bounded pairs
    "q_histogram_equidepth",   # value-count agg + quantile boundary scan
    "q_stratified_downsample", # per-stratum exact take; strata scale
    "q_triangle_count",        # wedge closure; watch sum(deg^2) hub skew
    # round 10 additions (for the NEXT deep-lane run)
    "q_cohort_retention",      # per-user min agg + bounded (user, week) join
    "q_markov_transitions",    # per-user lead window; matrix is types^2
    "q_rfm_scores",            # 3 sized range shuffles + ntile arithmetic
    "q_event_paths",           # per-user 2-lead window + bounded path agg
    "q_pagerank_personalized", # seeded power iteration, persisted inputs
    "q_degree_distribution",   # per-side degree aggs + count-of-counts
    "q_seasonality",           # 168-cell partial agg + broadcast total
    # round 11: the one new key whose cost scales with the corpus (the
    # codec keys decode fixed 100-300-doc fixture ranges by design)
    "q_dsir_importance",       # (doc,bucket) shuffle + broadcast dists
    "q_shard_bin_packing",     # two-phase prefix sum over the full corpus
    # round 12: the session-2 key whose cost scales with the corpus
    # (the wire/codec keys are fixed-doc-range fixtures by design)
    "q_wordpiece_encode",      # map-only munch + distinct-word memo
    # round 13: the one new key whose cost scales with the corpus (pdf/
    # zstd-dict/avro/main-content keys are fixed-doc-range fixtures)
    "q_unigram_encode",        # map-only Viterbi + distinct-word memo
    # round-13 session 2: the from-scratch parquet reader runs over the
    # WHOLE documents file (the other new keys are fixed-doc-range)
    "q_parquet_raw_scan",      # per-file map-only page decode
    # round-13 session 3: the two new keys whose cost scales with the
    # corpus (iceberg/delta/prune keys are fixed-doc-range fixtures)
    "q_simhash_oracle",        # map-only 60-bit vote folds over tokens
    "q_kmv_distinct",          # 3 hash-distinct TopK merges
    # round 14: the two new keys that run over the WHOLE embeddings
    # table (pdf-fonts/iceberg/delta/brotli/latex keys are
    # fixed-doc-range fixtures by design)
    "q_orc_vector_scan",            # ORC LIST/MAP shards, map-only decode
    "q_orc_vector_write_roundtrip", # LIST write → read, map-only
    # round-14 session 3: the one new key over the WHOLE embeddings
    # table (codec/zip/mp3/iceberg/brotli keys are fixed-doc-range)
    "q_arrow_ipc_vector_scan",      # IPC list<float32> shards, map-only
]


def main() -> None:
    argv = list(sys.argv[1:])
    only = None
    note = None
    json_path = None
    if "--keys" in argv:
        i = argv.index("--keys")
        only = argv[i + 1].split(",")
        argv = argv[:i] + argv[i + 2 :]
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if "--note" in argv:
        i = argv.index("--note")
        note = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf1 = argv[0] if len(argv) > 0 else "/root/repo/.scale/sf1"
    base = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from bench import HEADLINE
    from yark_spark.queries import QUERIES
    from yark_spark.session import get_spark

    keys = HEADLINE + [k for k in EXTRA if k not in HEADLINE]
    if only:
        # validate up front (ADVICE r10 low #2): a typo'd key used to
        # reach QUERIES[key] mid-run after warmup and lose the sweep
        unknown = [k for k in only if k not in QUERIES]
        if unknown:
            sys.exit(f"scale_bench: unknown query keys: {', '.join(unknown)}")
        keys = [k for k in keys if k in only] + [k for k in only if k not in keys]
    spark = get_spark("yark_spark-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    for d in (base, sf1):
        QUERIES["q_full_scan"](spark, d).count()  # warm listings + JIT

    from yark_spark.operators.release import release_tracked

    def run(key: str, d: str) -> tuple[float, float, int]:
        # min of 3: the sandbox carries background load, and a single
        # contended run can inflate a ratio 5x (observed r7) — the lane
        # compares plan cost, so the best observed run is the signal.
        #
        # Timed via the noop sink, NOT count(): count() references zero
        # columns, which lets Catalyst ELIMINATE a final left join whose
        # right side has a provably-unique key — for q_substring_dedup
        # that pruned the entire gram pipeline and "measured" a 0.07 s
        # token-length scan. The noop write consumes every column, so the
        # full declared plan executes.
        #
        # Round 9: the SQL cache is CLEARED before every run and the
        # timer starts BEFORE the query builds. Several operators
        # cache/persist internally (copurchase baskets, triangle edges,
        # median value-counts) — without the clear, runs 2-3 of the same
        # plan are served from the cache manager and the eager build-time
        # jobs fall outside the timer, which fakes near-constant "warm"
        # times at every scale (observed: pagerank ratio 1.03 at 20x).
        runs, n = [], 0
        for _ in range(3):
            spark.catalog.clearCache()
            release_tracked()
            t0 = time.perf_counter()
            df = QUERIES[key](spark, d)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        n = QUERIES[key](spark, d).count()
        return round(runs[0], 4), round(min(runs), 4), n

    out: dict = {"metric": "scale_ratio_sf1_over_sf0.1", "queries": {}}
    tot_base = tot_sf1 = 0.0
    for key in keys:
        c0, w0, n0 = run(key, base)
        c1, w1, n1 = run(key, sf1)
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
