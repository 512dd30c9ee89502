"""Decontamination shapes (operators/decontaminate): broadcast vs gram-join
agreement, auto-selection by benchmark size (VERDICT r2 item 4)."""

import pandas as pd
from pyspark.sql import functions as F

from yark_spark.io import load_table
from yark_spark.operators.decontaminate import (
    benchmark_grams,
    contamination_counts,
    decontaminate,
)

SF_DIR = "/root/testdata/sf0.001"


def _corpus_bench(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return docs.filter(F.col("doc_id") >= 10), docs.filter(F.col("doc_id") < 10)


def test_shapes_agree_on_counts(spark):
    corpus, bench = _corpus_bench(spark)
    a = (
        contamination_counts(corpus, bench, mode="broadcast")
        .orderBy("doc_id")
        .toPandas()
    )
    b = contamination_counts(corpus, bench, mode="join").orderBy("doc_id").toPandas()
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_shapes_agree_on_filter(spark):
    corpus, bench = _corpus_bench(spark)
    a = sorted(r["doc_id"] for r in decontaminate(corpus, bench, mode="broadcast").collect())
    b = sorted(r["doc_id"] for r in decontaminate(corpus, bench, mode="join").collect())
    assert a == b
    # filter + counts partition the corpus: clean ∪ contaminated = corpus
    contaminated = {
        r["doc_id"] for r in contamination_counts(corpus, bench, mode="join").collect()
    }
    assert set(a) | contaminated == {r["doc_id"] for r in corpus.select("doc_id").collect()}
    assert not (set(a) & contaminated)


def test_auto_switches_to_join_when_benchmark_large(spark):
    """With a broadcast cap smaller than the benchmark gram count, auto
    must pick the gram-join shape — asserted on the physical plan (the
    broadcast shape carries a collect_set aggregate; the join shape has no
    array column at all)."""
    from yark_spark.plans.explain import formatted_plan

    corpus, bench = _corpus_bench(spark)
    n_grams = benchmark_grams(bench, "text", 5).count()
    assert n_grams > 3  # sanity: the cap below actually forces the switch
    joined = contamination_counts(
        corpus, bench, mode="auto", broadcast_max_grams=3
    )
    plan = formatted_plan(joined)
    assert "collect_set" not in plan, plan
    small = contamination_counts(
        corpus, bench, mode="auto", broadcast_max_grams=n_grams
    )
    assert "collect_set" in formatted_plan(small)


def test_curate_report_releases_cache(spark):
    """CurationReport.cached carries the persisted frontier; unpersist()
    releases it (the round-2 leak: the handle was overwritten by the
    decontamination reassignment)."""
    from yark_spark.operators.curate import CurationConfig, curate

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text", "lang")
    out, report = curate(
        docs.filter(F.col("doc_id") >= 10),
        benchmark=docs.filter(F.col("doc_id") < 10).select("doc_id", "text"),
        config=CurationConfig(),
    )
    out.count()
    assert report.cached and all(df.is_cached for df in report.cached)
    report.unpersist()
    assert not report.cached
