"""Sequence-packing keys (queries/extras): bin-capacity invariants."""

from pyspark.sql import functions as F

from yark_spark.queries.extras import PACK_BUDGET, q_pack_greedy, q_pack_sequences

SF_DIR = "/root/testdata/sf0.001"


def test_greedy_bins_respect_budget(spark):
    out = q_pack_greedy(spark, SF_DIR).toPandas()
    sums = out.groupby(["lang", "bin"]).n_tokens.sum()
    counts = out.groupby(["lang", "bin"]).size()
    # a bin exceeds the budget only when it holds a single oversized doc
    for key, total in sums.items():
        assert total <= PACK_BUDGET or counts[key] == 1
    # bins are consecutive from 0 within each stratum
    for lang, grp in out.groupby("lang"):
        bins = sorted(grp["bin"].unique())
        assert bins == list(range(len(bins)))


def test_greedy_deterministic(spark):
    a = q_pack_greedy(spark, SF_DIR).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = q_pack_greedy(spark, SF_DIR).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_concat_packing_bins_monotone(spark):
    out = (
        q_pack_sequences(spark, SF_DIR)
        .orderBy("doc_id")
        .select("bin")
        .toPandas()["bin"]
    )
    assert (out.diff().dropna() >= 0).all()
    assert out.iloc[0] == 0
