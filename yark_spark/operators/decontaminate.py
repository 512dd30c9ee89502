"""Benchmark decontamination — drop/flag corpus docs sharing a word n-gram
with an eval benchmark (SURVEY.md §2.8 pipeline op; VERDICT r2 "What's
wrong" #3 and next-round item 4).

Two shapes with identical semantics, auto-selected by benchmark size:

- ``broadcast``: the benchmark gram set aggregates to ONE array row and
  broadcasts; overlap is a map-only ``array_intersect`` per corpus doc.
  Zero corpus shuffles — the right shape when the benchmark is tiny next to
  the corpus (a handful of eval sets).
- ``join``: corpus grams EXPLODE and equi-join the benchmark gram TABLE on
  the gram (shuffle on gram, then a per-doc count). The right shape when
  the full decontamination suite is large (all eval sets × 13-grams can
  reach 10⁸ grams — far past any broadcast or single-row array), since no
  single task ever holds the benchmark set.

``mode="auto"`` counts the distinct benchmark grams (one cheap aggregate
over the benchmark only — never the corpus) and picks the shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yark_spark.functions.text import ngrams

#: benchmark gram count above which auto mode switches to the gram join
BROADCAST_MAX_GRAMS = 1_000_000


def benchmark_grams(benchmark: DataFrame, text_col: str, n: int) -> DataFrame:
    """Distinct benchmark n-grams as a one-column table (``ng``)."""
    return (
        benchmark.select(F.explode(ngrams(F.col(text_col), n)).alias("ng")).distinct()
    )


def _pick_mode(mode: str, bench_grams: DataFrame, broadcast_max_grams: int) -> str:
    if mode != "auto":
        return mode
    n_grams = bench_grams.count()
    return "broadcast" if n_grams <= broadcast_max_grams else "join"


def contamination_counts(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    mode: str = "auto",
    broadcast_max_grams: int = BROADCAST_MAX_GRAMS,
) -> DataFrame:
    """(id, n_contaminated) for corpus docs sharing ≥1 distinct n-gram with
    the benchmark; docs with zero overlap are absent. Both shapes return
    identical rows (the gram-join path is driver-verified against the same
    oracle as the broadcast path — q_decontaminate / q_decontaminate_join).
    """
    bench = benchmark_grams(benchmark, text_col, n)
    shape = _pick_mode(mode, bench, broadcast_max_grams)
    if shape == "broadcast":
        bset = bench.agg(F.collect_set("ng").alias("bset"))
        with_grams = corpus.select(
            F.col(id_col), ngrams(F.col(text_col), n).alias("__gs")
        ).filter(F.size("__gs") > 0)
        return (
            with_grams.crossJoin(F.broadcast(bset))
            .select(
                id_col,
                F.size(F.array_intersect("__gs", "bset")).alias("n_contaminated"),
            )
            .filter(F.col("n_contaminated") >= 1)
        )
    # join shape: explode (ngrams() already dedupes per doc) → equi-join on
    # the gram → per-doc count. Shuffles on gram, never holds the benchmark
    # set in one task.
    exploded = corpus.select(
        F.col(id_col), F.explode(ngrams(F.col(text_col), n)).alias("ng")
    )
    return (
        exploded.join(bench, "ng")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    mode: str = "auto",
    broadcast_max_grams: int = BROADCAST_MAX_GRAMS,
) -> DataFrame:
    """Corpus rows with ZERO benchmark n-gram overlap (the filter shape the
    curation pipeline applies). Join shape = left-anti against contaminated
    ids; broadcast shape = map-only array_intersect filter."""
    bench = benchmark_grams(benchmark, text_col, n)
    shape = _pick_mode(mode, bench, broadcast_max_grams)
    if shape == "broadcast":
        bset = bench.agg(F.collect_set("ng").alias("bset"))
        grams = ngrams(F.col(text_col), n)
        return (
            corpus.crossJoin(F.broadcast(bset))
            .filter(F.size(F.array_intersect(grams, F.col("bset"))) == 0)
            .drop("bset")
        )
    contaminated = (
        corpus.select(F.col(id_col), F.explode(ngrams(F.col(text_col), n)).alias("ng"))
        .join(bench, "ng")
        .select(id_col)
        .distinct()
    )
    return corpus.join(contaminated, id_col, "left_anti")
