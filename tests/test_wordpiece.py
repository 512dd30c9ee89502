"""WordPiece tokenizer tests (round 12): greedy maximum-munch
semantics, the all-or-nothing [UNK] rule (pieces already matched must
be DISCARDED when a later position fails), ## presentation,
single-char fallback, and the Spark operator's aggregate contract
against a hand computation."""

import hashlib

import pytest

from yark_spark.operators.wordpiece import (
    WORDPIECE_VOCAB,
    wordpiece_tokenize_word,
)

V = frozenset(WORDPIECE_VOCAB)


def test_greedy_takes_longest_piece():
    # "custom" (6) beats "c"+... at position 0
    assert wordpiece_tokenize_word("customer", V) == ["custom", "##er"]
    # full-word pieces win outright
    assert wordpiece_tokenize_word("scan", V) == ["scan"]
    assert wordpiece_tokenize_word("sort", V) == ["sort"]


def test_continuation_presentation():
    assert wordpiece_tokenize_word("table", V) == ["tab", "##le"]
    assert wordpiece_tokenize_word("order", V) == ["or", "##d", "##er"]


def test_single_char_fallback():
    # a word made of letters with no multi-char pieces decomposes to chars
    assert wordpiece_tokenize_word("xyz", V) == ["x", "##y", "##z"]


def test_unk_all_or_nothing():
    # 'query': q has no piece at position 0 → [UNK]
    assert wordpiece_tokenize_word("query", V) == ["[UNK]"]
    # failure MID-word must discard already-matched pieces: 'tabq' gets
    # 'tab' then fails on q → whole word [UNK], not ['tab', '[UNK]']
    assert wordpiece_tokenize_word("tabq", V) == ["[UNK]"]


def test_greedy_is_not_optimal_search():
    # maximum munch is defined greedily: given pieces {ab, a, bc} (all
    # as both forms), 'abc' greedily takes 'ab' then fails on lone 'c'
    # only if 'c' absent — construct a vocab to pin the GREEDY choice
    vocab = frozenset({"ab", "a", "bc", "c"})
    assert wordpiece_tokenize_word("abc", vocab) == ["ab", "##c"]
    vocab_no_c = frozenset({"ab", "a", "bc"})
    # greedy 'ab' strands 'c' → [UNK] even though a+bc segments fully
    assert wordpiece_tokenize_word("abc", vocab_no_c) == ["[UNK]"]


def test_spark_operator_aggregates(spark, sf_dir):
    from pyspark.sql import functions as F

    from yark_spark.io import load_table
    from yark_spark.operators.wordpiece import wordpiece_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    rows = {r.doc_id: r for r in wordpiece_features(docs).collect()}
    src = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert set(rows) == set(src)
    for did, text in src.items():
        words = [w for w in text.lower().split() if w]
        tokens = []
        for w in words:
            tokens.extend(wordpiece_tokenize_word(w, V))
        r = rows[did]
        assert r.n_words == len(words)
        assert r.n_tokens == len(tokens)
        assert r.n_unk == sum(1 for t in tokens if t == "[UNK]")
        assert r.digest == hashlib.md5(" ".join(tokens).encode()).hexdigest()
