"""Similarity-search query keys over the embeddings table (§2.8 E3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from yark_spark.io import load_table
from yark_spark.operators.similarity import ann_topk_lsh, cosine_topk, embedding_near_dups
from yark_spark.registry import query

_COSINE_SQL = (
    "round(list_cosine_similarity(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])), 6)"
)


#: brute-force top-5 cosine neighbors for queries vec_id < 10 — the oracle
#: for the exact path (q_cosine_topk) AND for full-probe IVF (q_ann_ivf in
#: queries/extras: probing every cell must reproduce the exact result).
COSINE_TOPK_ORACLE = (
    "WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10), "
    "scored AS (SELECT q.query_id, e.vec_id AS neighbor_id, "
    + _COSINE_SQL.format(a="q.qv", b="e.embedding")
    + " AS cosine_sim FROM q JOIN embeddings e ON e.vec_id <> q.query_id), "
    "ranked AS (SELECT *, row_number() OVER ("
    "PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rn FROM scored) "
    "SELECT query_id, neighbor_id, cosine_sim FROM ranked WHERE rn <= 5"
)


@query("q_cosine_topk", oracle=COSINE_TOPK_ORACLE)
def q_cosine_topk(spark, sf_dir):
    """E3 brute-force cosine top-k (correctness baseline): query set
    broadcast, candidates stream map-side, final per-query top-k via window.
    Similarity rounded to 6dp before ranking + neighbor-id tie-break keeps
    the result set deterministic across engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, query_max_id=10, k=5)


@query(
    "q_dedup_embedding",
    oracle=(
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
        + _COSINE_SQL.format(a="a.embedding", b="b.embedding")
        + " AS cosine_sim FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        "WHERE a.vec_id < 150 AND b.vec_id < 150 "
        "AND " + _COSINE_SQL.format(a="a.embedding", b="b.embedding") + " >= 0.3"
    ),
)
def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs above a threshold (bounded id
    range = the exact baseline; the LSH bucket variant scales it)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dups(emb, threshold=0.3, max_id=150)


@query("q_ann_lsh")  # rows-only: hyperplane bucketing is engine-specific
def q_ann_lsh(spark, sf_dir):
    """E3 scale path: sign-random-projection LSH buckets → per-bucket scoring
    only. ~2**-n_planes of the candidate set scanned per query."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_topk_lsh(emb, query_max_id=10, k=5, n_planes=6)
