"""Training-data pipeline operators beyond dedup/similarity (north-star):
document chunking and deterministic stratified sampling — both map-only /
single-shuffle and oracle-checkable."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from yark_spark.io import load_table
from yark_spark.registry import query

CHUNK = 64   # tokens per chunk
STRIDE = 48  # 16-token overlap


@query(
    "q_chunk_documents",
    oracle=(
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents "
        "WHERE doc_id < 100), "
        "idx AS (SELECT doc_id, toks, "
        f"unnest(range(0, greatest(len(toks) - {CHUNK - STRIDE}, 1), {STRIDE})) AS start "
        "FROM t) "
        "SELECT doc_id, CAST(start AS BIGINT) AS chunk_start, "
        f"array_to_string(toks[start + 1 : start + {CHUNK}], ' ') AS chunk "
        "FROM idx"
    ),
)
def q_chunk_documents(spark, sf_dir):
    """Fixed-size token chunking with overlap (context-window packing prep).
    Map-only: tokenize once, generate chunk starts with sequence(), slice
    per start — no shuffle, no UDF. chunk i covers tokens
    [i*stride, i*stride + size)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.split(F.col("text"), " ")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(toks) - F.lit(CHUNK - STRIDE), F.lit(1)) - 1,
        F.lit(STRIDE),
    )
    return (
        docs.select("doc_id", toks.alias("toks"), F.explode(starts).alias("chunk_start"))
        .select(
            "doc_id",
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.array_join(
                F.slice(F.col("toks"), F.col("chunk_start") + 1, CHUNK), " "
            ).alias("chunk"),
        )
    )


@query(
    "q_stratified_sample",
    oracle=(
        "SELECT doc_id, lang FROM ("
        "  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn"
        "  FROM documents) t WHERE rn % 5 = 1"
    ),
)
def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling: every 5th document per language
    stratum in id order — reproducible across engines and runs (unlike
    rand()-based sampling), which is what a training-data split needs."""
    w = Window.partitionBy("lang").orderBy("doc_id")
    return (
        load_table(spark, sf_dir, "documents")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") % 5 == 1)
        .select("doc_id", "lang")
    )
