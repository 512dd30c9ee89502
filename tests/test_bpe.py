"""Distributed BPE merge trainer (operators/bpe): exact equivalence with
the classic pure-Python reference on the same corpus — the rows-only
contract for q_bpe_merges — plus merge-application edge semantics."""

from pyspark.sql import functions as F

from yark_spark.io import load_table
from yark_spark.operators.bpe import (
    _apply_merge,
    reference_bpe_merges,
    train_bpe_merges,
    word_freqs,
)


def test_trainer_matches_reference_implementation_exactly(spark, sf_dir):
    """8 merges learned from the real documents corpus must equal the
    reference algorithm's merges — rank, pair, and count — including
    the (count desc, pair asc) tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in train_bpe_merges(docs, k_merges=8).collect()
    ]
    wf = [(r["word"], r["freq"]) for r in word_freqs(docs).collect()]
    assert got == reference_bpe_merges(wf, 8)


def test_merge_application_left_to_right_non_overlapping(spark):
    """The pure-Column fold applies merges like the reference: left to
    right, non-overlapping, merged tokens never re-merge in the pass."""
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "a", "a", "a"],), (["a", "b", "a", "a"],), ([],)],
        "seq array<string>",
    )
    out = [r["m"] for r in df.select(_apply_merge(F.col("seq"), "a", "a").alias("m")).collect()]
    assert out == [["aa", "a"], ["aa", "aa"], ["a", "b", "aa"], []]


def test_trainer_deterministic_across_runs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(100)
    a = train_bpe_merges(docs, k_merges=4).collect()
    b = train_bpe_merges(docs, k_merges=4).collect()
    assert a == b
