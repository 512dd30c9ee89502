"""Exact-substring duplication analysis (the k-gram-span form of
"Deduplicating Training Data Makes Language Models Better", Lee et al.
2022 — public paper).

Suffix arrays don't distribute; the standard scale-out equivalent marks
every position whose k-token gram occurs ≥2 times ANYWHERE in the corpus
(same doc or cross-doc) and unions the marked [pos, pos+k) intervals per
document. Coverage ≈ the fraction a suffix-array dedup would cut; the
interval union is exactly computable with one per-doc window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from yark_spark.operators.dedup import tokens


def duplicated_span_coverage(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-document duplicated-substring coverage: ``covered_tokens`` =
    size of the union of [pos, pos+k) over every position whose k-gram
    repeats corpus-wide; ``dup_frac`` = covered/n_tokens. One row per
    input document (0 coverage when nothing repeats or n_tokens < k).

    100 TB design: grams are built MAP-SIDE (transform over the token
    array) and md5-compressed so the gram shuffle key is 32 bytes
    regardless of k; the repeat mark (count ≥ 2) is a count window OVER
    THE GRAM — one shuffle of the gram table, replacing the round-7
    partial-agg + join-back form, which shuffled the full gram table for
    the join AND re-ran the tokenize+hash map work for the second
    consumer (A/B at sf0.1, identical output both hash families:
    warm 1.74 s → 0.96 s, cold 2.5 s → 1.1 s); the interval union is a
    lag window PARTITIONED by document. Nothing is quadratic: cost is
    O(corpus tokens) map work + two keyed shuffles. k trades recall
    (smaller catches more) vs gram volume.

    ``hash_fn``: ``"md5"`` (default) is the oracle-parity family;
    ``"xxhash64"`` is the production path — an 8-byte BIGINT shuffle key
    instead of a 32-char string, JVM-native, same coverage result up to
    hash collisions (~2^-64 per gram pair; a false collision can only
    OVER-mark coverage by one gram).
    """
    if hash_fn not in ("md5", "xxhash64"):
        raise ValueError(f"hash_fn must be md5 or xxhash64, got {hash_fn!r}")
    base = docs.select(F.col(id_col), tokens(docs, text_col).alias("t")).select(
        id_col, "t", F.size("t").alias("n")
    )
    grams = (
        base.filter(F.col("n") >= k)
        .select(
            F.col(id_col),
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(t) - {k}), "
                    f"p -> {hash_fn}(concat_ws(' ', slice(t, p + 1, {k}))))"
                )
            ).alias("pos", "gram"),
        )
    )
    marked = (
        grams.withColumn("__cnt", F.count(F.lit(1)).over(Window.partitionBy("gram")))
        .filter(F.col("__cnt") >= 2)
        .select(id_col, "pos")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    covered = (
        marked.withColumn("prev", F.lag("pos").over(w))
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(F.col("prev").isNull(), F.lit(k)).otherwise(
                    F.least(F.lit(k), F.col("pos") - F.col("prev"))
                )
            )
            .cast("long")
            .alias("covered_tokens")
        )
    )
    return (
        base.join(covered, id_col, "left")
        .select(
            id_col,
            F.col("n").cast("long").alias("n_tokens"),
            F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("long").alias("covered_tokens"),
            F.round(F.coalesce(F.col("covered_tokens"), F.lit(0)) / F.col("n"), 6).alias(
                "dup_frac"
            ),
        )
    )
