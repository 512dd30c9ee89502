#!/usr/bin/env python
"""ANN recall-vs-probe curve on the scale lane (VERDICT r7 next-round #5).

Full-probe equivalence (q_ann_ivf / q_ann_lsh_full) pins CORRECTNESS; the
operating point a 100 TB user actually runs is a PARTIAL probe. This lane
measures recall@k against the exact brute-force top-k at 10x and 20x the
sf0.1 embeddings corpus, for IVF (n_probe in {1, 2, 4, all}) and
hyperplane LSH (n_planes in {4, 6, 8, 16}).

Scaled corpus: N deterministic perturbed copies of every fixture vector
(noise from xxhash64(vec_id, dim_index), +/-2.5% per component). Copies of
one base vector stay mutually near while distinct base vectors stay far —
the clustered geometry real embedding corpora have (near-dup families),
which is exactly what IVF's KMeans quantizer exploits. Pure-random scaling
would make "nearest neighbor" itself unstructured and the recall question
meaningless.

Prints ONE JSON line; the per-round artifact is SCALE_r{N}_ann.json.
tests/test_similarity_ivf.py asserts the documented-default operating
points (IVF n_probe=2/n_cells=16 recall >= 0.9 on the 5x corpus; LSH
n_planes=6) so a regression fails the suite, not just the lane.

Usage: python scripts/ann_recall_lane.py [base_sf_dir] [copies ...]
"""

from __future__ import annotations

import json
import os
import sys
import time


def scaled_embeddings(spark, sf_dir: str, copies: int, eps: float = 0.05):
    """copies x the fixture embeddings: copy c of base vector v gets
    vec_id = base + 2000*c and v[j] += eps * (hash01(vec_id, j) - 0.5),
    all JVM-side (explode + zip_with + xxhash64), no driver loops."""
    from pyspark.sql import functions as F

    from yark_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n_base = 2000  # sf0.1 fixture size; ids stay disjoint per copy
    return (
        emb.select(
            "vec_id",
            "embedding",
            F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("copy"),
        )
        .select(
            (F.col("vec_id") + F.col("copy") * n_base).alias("vec_id"),
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.sequence(F.lit(0), F.size("embedding") - 1),
                lambda x, j: x
                + F.lit(eps)
                * (
                    (
                        F.pmod(
                            F.xxhash64(
                                F.col("vec_id") + F.col("copy") * n_base, j
                            ),
                            F.lit(100_000),
                        )
                        / 100_000.0
                    )
                    - 0.5
                ),
            ).alias("embedding"),
        )
        .repartition(32)
    )


def recall_at_k(approx, exact) -> float:
    a, e = {}, {}
    for r in approx.collect():
        a.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in exact.collect():
        e.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(a.get(q, set()) & e[q]) for q in e)
    return hits / max(1, sum(len(v) for v in e.values()))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies_list = [int(c) for c in sys.argv[2:]] or [10, 20]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from yark_spark.operators.similarity import ann_topk_lsh, cosine_topk, ivf_topk
    from yark_spark.session import get_spark

    spark = get_spark("yark_spark-ann-recall")
    spark.sparkContext.setLogLevel("ERROR")

    K, NQ, N_CELLS = 5, 20, 16
    out: dict = {"metric": "ann_recall_curve", "k": K, "n_queries": NQ, "curves": {}}
    for copies in copies_list:
        emb = scaled_embeddings(spark, sf_dir, copies).persist()
        n = emb.count()
        t0 = time.time()
        exact = cosine_topk(emb, query_max_id=NQ, k=K)
        exact.persist().count()
        exact_sec = time.time() - t0

        ivf_curve = {}
        for n_probe in (1, 2, 4, N_CELLS):
            t0 = time.time()
            approx = ivf_topk(
                emb, query_max_id=NQ, k=K, n_cells=N_CELLS, n_probe=n_probe
            )
            r = recall_at_k(approx, exact)
            ivf_curve[str(n_probe)] = {
                "recall": round(r, 4),
                "sec": round(time.time() - t0, 2),
            }
        lsh_curve = {}
        for n_planes in (4, 6, 8, 16):
            t0 = time.time()
            approx = ann_topk_lsh(emb, query_max_id=NQ, k=K, n_planes=n_planes)
            r = recall_at_k(approx, exact)
            lsh_curve[str(n_planes)] = {
                "recall": round(r, 4),
                "sec": round(time.time() - t0, 2),
            }
        # multi-probe (round 9): flip 1-2 sign bits at the speed-optimal
        # plane count — recovers the neighbors a single hyperplane split
        # away without coarsening the buckets
        mp_curve = {}
        for n_planes, n_flip in ((8, 1), (8, 2), (16, 2)):
            t0 = time.time()
            approx = ann_topk_lsh(
                emb, query_max_id=NQ, k=K, n_planes=n_planes, n_flip=n_flip
            )
            r = recall_at_k(approx, exact)
            mp_curve[f"{n_planes}p_flip{n_flip}"] = {
                "recall": round(r, 4),
                "sec": round(time.time() - t0, 2),
            }
        out["curves"][f"{copies}x"] = {
            "n_vectors": n,
            "exact_sec": round(exact_sec, 2),
            "ivf_n_cells": N_CELLS,
            "ivf_by_n_probe": ivf_curve,
            "lsh_by_n_planes": lsh_curve,
            "lsh_multiprobe": mp_curve,
        }
        exact.unpersist()
        emb.unpersist()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
