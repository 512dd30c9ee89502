"""Round-2 extension keys (§2.8): SimHash candidate pairs and IVF ANN.

Registered LAST so the driver's 50-key CORRECTNESS window (which fronts
not-yet-verified keys — see queries/__init__.driver_ordered) keeps every
round-1 key while picking these up in its tail slots.
"""

from __future__ import annotations

from yark_spark.io import load_table
from yark_spark.registry import query


@query("q_simhash_pairs")  # rows-only: xxhash64 bit-votes are Spark-specific
def q_simhash_pairs(spark, sf_dir):
    """E2 SimHash near-dup pairs: banded 64-bit signatures → candidate
    equi-join → bit_count(xor) Hamming filter. Pigeonhole guarantee
    (bands > max_hamming → no missed pair) is property-tested in
    tests/test_dedup_cap.py against brute-force Hamming."""
    from yark_spark.operators.dedup import simhash_candidates

    docs = load_table(spark, sf_dir, "documents")
    return simhash_candidates(docs, "doc_id", "text", max_hamming=3)


@query("q_ann_ivf")  # rows-only: KMeans cell assignment is engine-specific
def q_ann_ivf(spark, sf_dir):
    """E3 IVF ANN: KMeans coarse quantizer → inverted cell lists → n_probe
    nearest cells per query → two-phase top-k. Recall vs the exact path is
    asserted in tests/test_similarity_ivf.py."""
    from yark_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, query_max_id=10, k=5, n_cells=8, n_probe=2)
