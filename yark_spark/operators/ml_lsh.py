"""pyspark.ml LSH variants (SURVEY.md §2.8 E2/E3 scale paths).

Alternative implementations of fuzzy dedup and ANN using the built-in ML
primitives — HashingTF shingles → MinHashLSH.approxSimilarityJoin for
near-dup pairs, and BucketedRandomProjectionLSH for approximate nearest
neighbors. These complement the pure-DataFrame pipelines in
operators/dedup.py and operators/similarity.py: the hand-rolled forms are
oracle-checkable and shuffle-transparent; the ml forms are the
battle-tested library path with the same O(candidates) behavior.

Gated behind import-try: pyspark.ml needs numpy at import and is optional
for the core engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:
    from pyspark.ml.feature import (
        BucketedRandomProjectionLSH,
        HashingTF,
        MinHashLSH,
        Tokenizer,
    )
    from pyspark.ml.functions import array_to_vector

    ML_AVAILABLE = True
except ImportError:  # pragma: no cover
    ML_AVAILABLE = False


def _require_ml():
    if not ML_AVAILABLE:
        raise ImportError("pyspark.ml unavailable in this environment")


def ml_fuzzy_dedup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_features: int = 1 << 18,
    num_hash_tables: int = 4,
    max_distance: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """E2 via ml: tokenize → HashingTF term sets → MinHashLSH self-join.

    Returns (id_a, id_b, jaccard_distance ≤ max_distance), id_a < id_b.
    HashingTF with binary=True makes the vectors set-indicators, so the LSH
    distance is Jaccard distance (1 − similarity).
    """
    _require_ml()
    tok = Tokenizer(inputCol=text_col, outputCol="__toks")
    tf = HashingTF(
        inputCol="__toks", outputCol="__features", numFeatures=num_features, binary=True
    )
    featurized = tf.transform(tok.transform(docs.select(id_col, text_col)))
    # MinHashLSH requires at least one non-zero entry; empty docs are dropped
    featurized = featurized.filter(F.size("__toks") > 0)
    mh = MinHashLSH(
        inputCol="__features", outputCol="__hashes", numHashTables=num_hash_tables, seed=seed
    )
    model = mh.fit(featurized)
    pairs = model.approxSimilarityJoin(
        featurized, featurized, max_distance, distCol="jaccard_distance"
    )
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round("jaccard_distance", 6).alias("jaccard_distance"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def ml_ann_neighbors(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """E3 via ml: BucketedRandomProjectionLSH approxNearestNeighbors for one
    query vector (euclidean-distance ANN). Returns (id, distance)."""
    _require_ml()
    from pyspark.ml.linalg import Vectors

    with_vec = embeddings.select(
        F.col(id_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias("__vec")
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="__vec",
        outputCol="__hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = brp.fit(with_vec)
    out = model.approxNearestNeighbors(with_vec, Vectors.dense(query_vec), k, distCol="distance")
    return out.select(id_col, F.round("distance", 6).alias("distance"))
