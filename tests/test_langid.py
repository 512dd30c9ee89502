"""Language-ID contracts (round 12): the oracle key q_langid pins the
integer-exact verdict against DuckDB; these tests pin the LEARNING
behavior on corpora where languages genuinely differ in character
statistics (the driver fixture's text is label-independent by
construction, so fixture accuracy is necessarily near chance — the
classifier itself is what must be correct)."""

import random

import pytest
from pyspark.sql import functions as F

from yark_spark.operators.lm import langid_ngram_vote

# distinct character inventories per synthetic language
_ALPHABETS = {
    "aa": "abcdef",
    "gg": "ghijkl",
    "mm": "mnopqr",
    "zz": "stuvwx",
}


def _synth_docs(n_per_lang=30, seed=0):
    rng = random.Random(seed)
    rows = []
    i = 0
    for lang, alpha in _ALPHABETS.items():
        for _ in range(n_per_lang):
            words = [
                "".join(rng.choice(alpha) for _ in range(rng.randrange(3, 9)))
                for _ in range(rng.randrange(20, 40))
            ]
            rows.append((i, " ".join(words), lang))
            i += 1
    rng.shuffle(rows)
    return [(i, t, l) for i, (_, t, l) in enumerate(rows)]


def test_langid_near_perfect_on_separable_corpus(spark):
    """Train on even doc_ids, classify everything: when languages use
    disjoint alphabets, held-out accuracy must be >= 0.95."""
    rows = _synth_docs()
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = langid_ngram_vote(
        df, train_condition=F.col("doc_id") % 2 == 0, n_buckets=512
    )
    got = {r["doc_id"]: r["pred_lang"] for r in out.collect()}
    truth = {i: l for i, _, l in rows}
    held = [i for i in truth if i % 2 == 1]
    acc = sum(got[i] == truth[i] for i in held) / len(held)
    assert acc >= 0.95, acc
    assert len(got) == len(rows)


def test_langid_votes_accounting(spark):
    """votes <= n_trigrams, and n_trigrams equals len(text)-2 for a
    single-token doc (trigram count of the lowered/trimmed text)."""
    df = spark.createDataFrame(
        [(0, "abcdefgh", "x"), (1, "ABCDEFGH  ", "x")],
        "doc_id long, text string, lang string",
    )
    rows = {r["doc_id"]: r for r in langid_ngram_vote(df, n_buckets=64).collect()}
    for r in rows.values():
        assert r["votes"] <= r["n_trigrams"] == 6
    # case/trim normalization: identical trigram stream => same verdict
    assert rows[0]["pred_lang"] == rows[1]["pred_lang"]
    assert rows[0]["votes"] == rows[1]["votes"]


def test_langid_short_docs_emit_no_row(spark):
    df = spark.createDataFrame(
        [(0, "ab", "x"), (1, "abcd", "x")], "doc_id long, text string, lang string"
    )
    out = langid_ngram_vote(df, n_buckets=64).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_langid_fixture_confusion_matrix_deterministic(spark, sf_dir):
    """The driver fixture's confusion matrix: text is label-independent,
    so accuracy is near chance — the contract is DETERMINISM (two runs
    agree exactly) and full coverage, with the majority class dominating
    predictions as the vote math implies."""
    from yark_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = langid_ngram_vote(docs, train_condition=F.col("doc_id") < 60)
    a = {(r["doc_id"], r["pred_lang"]) for r in out.collect()}
    b = {(r["doc_id"], r["pred_lang"]) for r in out.collect()}
    assert a == b
    n_docs = docs.filter(F.length(F.trim("text")) >= 3).count()
    assert len(a) == n_docs
