"""End-to-end corpus curation — the composed training-data pipeline
(BASELINE.json north-star): exact dedup → fuzzy dedup (MinHash LSH →
clusters → representatives) → benchmark decontamination → quality/language
filters → PII redaction → sequence packing, as ONE lazy DataFrame graph.

Composition is the point: every map-only stage (fingerprints, quality
features, redaction, gram building) fuses into the same scan under
whole-stage codegen; the only shuffles are the ones the algorithms
fundamentally need (content-hash dedup, LSH band join, cluster rounds,
packing window). A CurationReport carries per-stage row counts computed
from the same lazy graph, so observability costs one extra action, not one
per stage.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yark_spark.functions.text import (
    fingerprint,
    lang_id,
    ngrams,
    quality_score,
    redact_pii,
    token_repetition_ratio,
)
from yark_spark.operators.dedup import (
    dedup_clusters,
    dedup_representatives,
    fuzzy_dedup_pairs,
)


@dataclass
class CurationConfig:
    min_quality: float = 0.3
    max_repetition: float = 0.6
    languages: tuple[str, ...] = ()          # empty = keep all
    fuzzy_threshold: float = 0.8             # est. Jaccard to merge near-dups
    num_hashes: int = 16
    bands: int = 4
    max_bucket: int | None = 4096
    decontaminate_ngram: int = 5
    pack_budget: int = 512


@dataclass
class CurationReport:
    counts: dict[str, int] = field(default_factory=dict)


def curate(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    config: CurationConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, CurationReport]:
    """Run the full curation pipeline; returns (curated_df, report).

    ``benchmark`` (optional, id/text-shaped) drives decontamination: any
    doc sharing a word n-gram with it is dropped. The returned DataFrame
    has the surviving docs plus quality metadata and a ``pack_bin``
    assignment; the report holds per-stage surviving-row counts. The heavy
    frontiers (exact-dedup output, fuzzy representatives) are persisted so
    stage counts and the returned graph share one computation; the fuzzy
    frontier stays cached for the caller (unpersist it when done).
    """
    cfg = config or CurationConfig()
    report = CurationReport()
    report.counts["input"] = docs.count()

    # 1. exact dedup on the normalized-content fingerprint (min-id keeps).
    # Persisted: three consumers (LSH signatures, cluster node set, the
    # representative join) plus the stage counts would otherwise recompute
    # the window per action.
    fp = docs.withColumn("__fp", fingerprint(F.col(text_col)))
    from pyspark.sql import Window

    w = Window.partitionBy("__fp").orderBy(id_col)
    exact = (
        fp.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__fp")
        .persist()
    )
    report.counts["after_exact_dedup"] = exact.count()

    # 2. fuzzy dedup: LSH candidate pairs → clusters → one representative.
    # The pair/cluster stages run on the exact-deduped set (smaller input,
    # and exact dupes would all be trivial pairs anyway).
    pairs = fuzzy_dedup_pairs(
        exact,
        id_col,
        text_col,
        num_hashes=cfg.num_hashes,
        bands=cfg.bands,
        threshold=cfg.fuzzy_threshold,
        max_bucket=cfg.max_bucket,
    )
    clusters = dedup_clusters(exact, pairs, id_col)
    fuzzy = dedup_representatives(exact, clusters, id_col).persist()
    report.counts["after_fuzzy_dedup"] = fuzzy.count()
    exact.unpersist()  # fuzzy is materialized; downstream reads only it

    # 3. decontamination: drop docs overlapping the benchmark gram set
    if benchmark is not None:
        bench_set = (
            benchmark.select(
                F.explode(ngrams(F.col(text_col), cfg.decontaminate_ngram)).alias("ng")
            )
            .agg(F.collect_set("ng").alias("bset"))
        )
        grams = ngrams(F.col(text_col), cfg.decontaminate_ngram)
        fuzzy = (
            fuzzy.crossJoin(F.broadcast(bench_set))
            .filter(F.size(F.array_intersect(grams, F.col("bset"))) == 0)
            .drop("bset")
        )
        report.counts["after_decontamination"] = fuzzy.count()

    # 4. quality / repetition / language filters (all map-only, one scan)
    scored = fuzzy.withColumn("quality", quality_score(F.col(text_col))).withColumn(
        "rep_ratio", token_repetition_ratio(F.col(text_col))
    )
    kept = scored.filter(
        (F.col("quality") >= cfg.min_quality) & (F.col("rep_ratio") <= cfg.max_repetition)
    )
    if cfg.languages:
        kept = kept.withColumn("lang_guess", lang_id(F.col(text_col))).filter(
            F.col("lang_guess").isin(*cfg.languages)
        )
    report.counts["after_quality_filters"] = kept.count()

    # 5. redact PII, then pack into training-sequence bins (id-ordered
    # concatenation layout; window cumsum)
    redacted = kept.withColumn(text_col, redact_pii(F.col(text_col)))
    n_tok = F.size(F.split(F.col(text_col), "\\s+"))
    wp = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    curated = redacted.withColumn(
        "pack_bin",
        F.floor((F.sum(n_tok).over(wp) - n_tok) / F.lit(float(cfg.pack_budget))).cast("long"),
    )
    report.counts["output"] = report.counts["after_quality_filters"]
    return curated, report
