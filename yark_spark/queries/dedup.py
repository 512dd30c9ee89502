"""Dedup query keys over the documents table (SURVEY.md §2.8 E1/E2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from yark_spark.io import load_table
from yark_spark.operators.dedup import (
    fuzzy_dedup_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from yark_spark.registry import query


@query(
    "q_dedup_exact",
    oracle=(
        "SELECT min(doc_id) AS doc_id, text, count(*) AS n_copies "
        "FROM documents GROUP BY text"
    ),
)
def q_dedup_exact(spark, sf_dir):
    """E1 exact dedup: one deterministic representative (min id) per distinct
    text. At scale this groups on sha2(text) so the shuffle key is 64 bytes,
    not the document (see operators.dedup.exact_dedup); grouping on text
    directly here keeps the oracle equivalent."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies")
    ).select("doc_id", "text", "n_copies")


@query(
    "q_minhash_signature",
    oracle=(
        "WITH tok AS (SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS tok "
        "FROM documents) "
        "SELECT doc_id, min(md5('0' || tok)) AS h0, min(md5('1' || tok)) AS h1, "
        "min(md5('2' || tok)) AS h2, min(md5('3' || tok)) AS h3 "
        "FROM tok GROUP BY doc_id"
    ),
)
def q_minhash_signature(spark, sf_dir):
    """E2 MinHash signature, oracle-checkable variant: hash family =
    md5(seed || token) compared lexicographically (identical in both
    engines). The production path (q_dedup_fuzzy) uses xxhash64 — cheaper,
    JVM-native — which no oracle can mirror, so this key pins the algebra:
    signature_i = min over distinct tokens of hash_i(token)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split(F.lower(F.col("text")), " "))

    def _md5_i(i):
        return lambda t: F.md5(F.concat(F.lit(str(i)), t))

    # map-only: array_min over per-token md5s == SQL min over exploded rows
    cols = [F.array_min(F.transform(toks, _md5_i(i))).alias(f"h{i}") for i in range(4)]
    return docs.select("doc_id", *cols)


@query("q_dedup_fuzzy")  # rows-only: xxhash64-based LSH is Spark-specific
def q_dedup_fuzzy(spark, sf_dir):
    """E2 near-dup detection at scale: 16-hash MinHash signature → 4-band
    LSH candidate join → Jaccard estimate ≥ 0.5. Only candidate pairs ever
    materialize; the cross product never exists."""
    docs = load_table(spark, sf_dir, "documents")
    return fuzzy_dedup_pairs(docs, "doc_id", "text", num_hashes=16, bands=4, threshold=0.5)


@query("q_simhash")  # rows-only: xxhash64 bit-votes are Spark-specific
def q_simhash(spark, sf_dir):
    """E2 SimHash 64-bit signatures (bit-vote majority over token hashes)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash(docs, "doc_id", "text")


@query(
    "q_jaccard_pairs",
    oracle=(
        "WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 20), "
        "tok AS (SELECT doc_id, "
        "unnest(list_distinct(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'))) AS tok "
        "FROM base), "
        "sizes AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter "
        "FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2) "
        "SELECT id_a, id_b, round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard "
        "FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b"
    ),
)
def q_jaccard_pairs(spark, sf_dir):
    """Exact token-set Jaccard within a bounded id range — the ground truth
    the MinHash/LSH estimators approximate. Intersections come from a token
    equi-join (shuffle on token), never a doc×doc cross join."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", max_id=20)
