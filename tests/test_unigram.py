"""Unigram-LM tokenizer tests (round 13): EM trainer properties and
determinism, the distributed-trainer pin against the sequential
reference, Viterbi vectors, the (cost, token-string) tie-break, the
DP-vs-exhaustive-enumeration property, and the greedy-is-not-optimal
pin that separates unigram from WordPiece."""

import itertools
import math
import random

import pytest

from yark_spark.operators.unigram import (
    CORPUS_WORD_FREQS,
    UNIGRAM_PIECES,
    e_step_word,
    pieces_to_costs,
    seed_pieces,
    train_unigram,
    unigram_encode_word,
)


def _brute_force(word, costs):
    """Exhaustive segmentation argmin under (cost, toks) — the oracle's
    recursive-CTE semantics in Python."""
    best = None
    n = len(word)

    def rec(p, cost, toks):
        nonlocal best
        if p == n:
            cand = (cost, " ".join(toks))
            if best is None or cand < best:
                best = cand
            return
        for ln in range(1, n - p + 1):
            piece = word[p : p + ln]
            c = costs.get(piece)
            if c is not None:
                rec(p + ln, cost + c, toks + [piece])

    rec(0, 0, [])
    return ["[UNK]"] if best is None else best[1].split(" ")


def test_seed_probabilities_normalize():
    pieces = seed_pieces(CORPUS_WORD_FREQS)
    assert abs(sum(pieces.values()) - 1.0) < 1e-9
    assert all(len(p) <= 4 for p in pieces)
    # frequency weighting: 'join' substring mass beats 'dup'
    assert pieces["join"] > pieces["dup"]


def test_e_step_expected_counts_sum_to_expected_length():
    pieces = seed_pieces([("abc", 1)])
    counts = e_step_word("abc", 10, pieces)
    # expected tokens per segmentation, weighted: between 1 and len(word)
    total = sum(counts.values())
    assert 10.0 <= total <= 30.0
    # a word with an unknown character contributes nothing
    assert e_step_word("zzz", 5, pieces) == {}


def test_training_is_deterministic_and_matches_constant():
    assert pieces_to_costs(train_unigram(CORPUS_WORD_FREQS)) == UNIGRAM_PIECES
    # singles survive pruning: every corpus letter is encodable
    singles = {p for p, _ in UNIGRAM_PIECES if len(p) == 1}
    corpus_chars = set("".join(w for w, _ in CORPUS_WORD_FREQS))
    assert corpus_chars <= singles


def test_viterbi_vectors_on_trained_table():
    costs = dict(UNIGRAM_PIECES)
    assert unigram_encode_word("customer", costs) == ["cust", "omer"]
    assert unigram_encode_word("x9z", costs) == ["[UNK]"]  # no digit pieces
    # every token re-joins to the word
    for w, _ in CORPUS_WORD_FREQS:
        toks = unigram_encode_word(w, costs)
        assert "".join(toks) == w


def test_tie_break_is_lexicographic_on_token_stream():
    # "abc": ab+c = 15 = a+b+c; 'a b c' < 'ab c' (space sorts low)
    costs = {"ab": 10, "a": 4, "b": 6, "c": 5}
    assert unigram_encode_word("abc", costs) == ["a", "b", "c"]
    # flip the balance so the two-token path is strictly cheaper
    costs2 = {"ab": 9, "a": 4, "b": 6, "c": 5}
    assert unigram_encode_word("abc", costs2) == ["ab", "c"]


def test_viterbi_agrees_with_exhaustive_enumeration():
    costs = dict(UNIGRAM_PIECES)
    for w, _ in CORPUS_WORD_FREQS:
        assert unigram_encode_word(w, costs) == _brute_force(w, costs)


def test_viterbi_vs_brute_force_fuzz():
    rng = random.Random(1913)
    alphabet = "abcd"
    for _ in range(200):
        word = "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 9)))
        costs = {}
        for ln in (1, 2, 3):
            for tpl in itertools.product(alphabet, repeat=ln):
                if rng.random() < (0.9 if ln == 1 else 0.3):
                    costs["".join(tpl)] = rng.randrange(1, 50)
        assert unigram_encode_word(word, costs) == _brute_force(word, costs)


def test_unigram_beats_greedy_longest_match():
    # greedy WordPiece munch would take 'table' whole; min-cost prefers
    # tab+le — the probabilistic/greedy family split, pinned
    costs = {"table": 30, "tab": 9, "le": 5, "t": 8, "a": 8, "b": 8, "l": 8, "e": 8}
    assert unigram_encode_word("table", costs) == ["tab", "le"]


def test_train_prunes_to_budget():
    pieces = train_unigram(CORPUS_WORD_FREQS, vocab_multi=16)
    multis = [p for p in pieces if len(p) > 1]
    assert len(multis) <= 16
    assert abs(sum(pieces.values()) - 1.0) < 1e-9


def test_distributed_trainer_matches_sequential(spark):
    from yark_spark.operators.unigram import unigram_train_distributed

    wf = [(w, f) for w, f in CORPUS_WORD_FREQS[:12]]
    seq = train_unigram(wf, vocab_multi=12, rounds=2)
    df = spark.createDataFrame(wf, ["word", "freq"])
    dist = unigram_train_distributed(df, vocab_multi=12, rounds=2)
    assert set(seq) == set(dist)
    for p, v in seq.items():
        assert dist[p] == pytest.approx(v, rel=1e-9), p


def test_costs_are_integer_pico():
    probs = {"a": 0.5, "b": 0.25, "c": 0.25}
    table = dict(pieces_to_costs(probs))
    assert table["a"] == round(math.log(2) * 1_000_000_000_000)
    assert all(isinstance(c, int) for c in table.values())
