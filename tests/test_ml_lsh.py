"""pyspark.ml LSH variant tests: the ml paths must agree with the exact
baselines (token-set Jaccard; brute-force cosine/euclidean ordering)."""

import pytest

from pyspark.sql import functions as F

from yark_spark.io import load_table

pytest.importorskip("pyspark.ml")
pytest.importorskip("numpy")

from yark_spark.operators.ml_lsh import ml_ann_neighbors, ml_fuzzy_dedup_pairs  # noqa: E402


def test_ml_fuzzy_dedup_agrees_with_exact_jaccard(spark, sf_dir):
    """Every high-similarity pair found by MinHashLSH must be truly similar
    per exact token-set Jaccard (no false accepts beyond the distance
    threshold), and recall on strong dupes must be non-trivial."""
    from yark_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    ml_pairs = ml_fuzzy_dedup_pairs(docs, max_distance=0.4)
    exact = ngram_jaccard_pairs(docs, "doc_id", "text", max_id=60)
    joined = ml_pairs.join(exact, ["id_a", "id_b"])
    rows = joined.collect()
    assert rows, "LSH found no candidate pairs at all"
    for r in rows:
        # approxSimilarityJoin distance is on hashed term sets; allow slack
        # vs whitespace tokenization but require genuine similarity
        assert r["jaccard"] >= 0.4, (r["id_a"], r["id_b"], r["jaccard"])


def test_ml_ann_matches_exact_euclidean_topk(spark, sf_dir):
    """approxNearestNeighbors top-k must be a subset of the exact euclidean
    top-2k for a known query vector."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ann = ml_ann_neighbors(emb, [float(x) for x in qvec], k=5)
    ann_ids = [r["vec_id"] for r in ann.collect()]
    assert len(ann_ids) == 5 and ann_ids[0] == 0  # self is nearest

    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.lit([float(x) for x in qvec]).cast("array<double>"),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    exact = emb.select("vec_id", dist.alias("d")).orderBy("d", "vec_id").limit(10)
    exact_ids = {r["vec_id"] for r in exact.collect()}
    overlap = len(set(ann_ids) & exact_ids)
    assert overlap >= 3, (ann_ids, exact_ids)
