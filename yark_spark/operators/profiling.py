"""Per-document repetition profiling (Gopher/MassiveText repetition
filters, Rae et al. 2021 §A1.1 — public paper).

``token_repetition_ratio`` (functions/text.py) catches global token
reuse; the top-n-gram fraction here catches LOOPS — a document whose
most frequent bigram covers most bigram slots is degenerate generation
even when its token vocabulary looks diverse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from yark_spark.operators.dedup import tokens


def top_bigram(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Most frequent token bigram per document and the fraction of bigram
    slots it occupies. Deterministic tie-break: (count desc, bigram asc).

    100 TB design: bigrams are built map-side with a ``transform`` over
    the token array (no self-join), counted with one (doc, bigram)
    partial-agg shuffle, and the argmax is a window PARTITIONED BY the
    document key — no global sort, parallelism = |docs|. Documents with
    fewer than 2 tokens are dropped (no bigram exists).
    """
    base = docs.select(F.col(id_col), tokens(docs, text_col).alias("t")).filter(
        F.size("t") >= 2
    )
    bg = base.select(
        F.col(id_col),
        (F.size("t") - 1).alias("n_bigrams"),
        F.explode(
            F.expr("transform(slice(t, 1, size(t) - 1), (x, i) -> concat(x, ' ', t[i + 1]))")
        ).alias("bigram"),
    )
    counts = bg.groupBy(id_col, "n_bigrams", "bigram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("cnt").desc(), F.col("bigram"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            id_col,
            F.col("bigram").alias("top_bigram"),
            F.round(F.col("cnt") / F.col("n_bigrams"), 6).alias("top_bigram_frac"),
        )
    )
