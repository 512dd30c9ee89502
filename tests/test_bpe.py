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


def test_trainer_local_route_equals_distributed_loop(spark, sf_dir):
    """Round 18: the vocab-size router must be output-invisible — the
    driver-side trainer (small vocab, default route) and the
    distributed iteration (forced with local_max_vocab=0, and taken
    when the cap is below the vocabulary) return identical rows."""
    docs = load_table(spark, sf_dir, "documents")
    routed = train_bpe_merges(docs, k_merges=6).collect()
    distributed = train_bpe_merges(docs, k_merges=6, local_max_vocab=0).collect()
    assert [tuple(r) for r in routed] == [tuple(r) for r in distributed]
    # a cap smaller than the vocabulary must fall through to the
    # distributed loop and still produce the same table
    over_cap = train_bpe_merges(docs, k_merges=6, local_max_vocab=3).collect()
    assert [tuple(r) for r in over_cap] == [tuple(r) for r in routed]


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


def test_bpe_encode_expr_equals_udf_and_reference(spark):
    """Round 9: the two encode paths (pure-Column fold chain vs the
    Arrow-batched per-word loop) must produce IDENTICAL token sequences,
    and both must equal a pure-Python application of the merge table —
    on words exercising overlapping-merge order (aaa → [aa, a]), chained
    merges, and merge-rank precedence."""
    from pyspark.sql import functions as F

    from yark_spark.operators.bpe import bpe_encode_expr, bpe_encode_udf

    merges = [("a", "a"), ("l", "o"), ("lo", "w"), ("aa", "b")]
    texts = [
        "low lower lowest",
        "aaa aaaa aab aaab",
        "low aaa low",
        "",
        "  spaced   out  ",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    def py_encode(text):
        out = []
        for w in text.strip().lower().split():
            seq = list(w)
            for left, right in merges:
                i = 0
                while i < len(seq) - 1:
                    if seq[i] == left and seq[i + 1] == right:
                        seq[i : i + 2] = [left + right]
                    i += 1
            out.extend(seq)
        return out

    expected = {i: py_encode(t) for i, t in enumerate(texts)}

    udf_out = {
        r["doc_id"]: list(r["tokens"]) for r in bpe_encode_udf(docs, merges).collect()
    }
    assert udf_out == expected

    words = docs.select(
        "doc_id",
        F.posexplode(
            F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\x0B\f\r]+")
        ).alias("pos", "word"),
    ).filter(F.col("word") != "")
    expr_out_rows = words.select(
        "doc_id", "pos", bpe_encode_expr(F.split("word", ""), merges).alias("toks")
    ).collect()
    expr_out: dict = {i: [] for i in range(len(texts))}
    for r in sorted(expr_out_rows, key=lambda r: (r["doc_id"], r["pos"])):
        expr_out[r["doc_id"]].extend(r["toks"])
    assert expr_out == expected


def test_fast_local_trainer_matches_reference_exactly():
    """train_bpe_merges_local (round 10): the heap/incremental trainer
    must reproduce the O(ranks x vocab) reference bit-for-bit, including
    the (count desc, pair asc) tie-break, across fuzzed vocabularies."""
    import random

    from yark_spark.operators.bpe import reference_bpe_merges, train_bpe_merges_local

    rng = random.Random(20260814)
    for trial in range(25):
        vocab = [
            (
                "".join(rng.choice("abcde") for _ in range(rng.randint(1, 9))),
                rng.randint(1, 9),
            )
            for _ in range(rng.randint(2, 60))
        ]
        k = rng.randint(1, 25)
        assert reference_bpe_merges(list(vocab), k) == train_bpe_merges_local(
            list(vocab), k
        ), trial


def test_encode_rank_floor_preserves_sequential_semantics(spark):
    """The rank-dict encoder's FLOOR (round 10): a later merge whose
    output recreates an earlier merge's pair must NOT re-trigger that
    earlier merge — the sequential expr path is the contract. Table:
    rank1 ('x','abc'), rank2 ('a','bc'), rank3 ('ab','c'). On 'xabc',
    rank3 merges 'ab'+'c' into 'abc' AFTER rank1's pass is over, so the
    result must stay ['x', 'abc'] split — not 'xabc' re-merged."""
    from pyspark.sql import functions as F

    from yark_spark.operators.bpe import bpe_encode_expr, bpe_encode_udf

    merges = [("x", "abc"), ("a", "bc"), ("ab", "c")]
    # seed tokens 'bc' and 'ab' must exist for ranks 2-3 to be reachable
    # from characters; build them via two prefix merges
    table = [("b", "c"), ("a", "b")] + merges
    docs = spark.createDataFrame(
        [(1, "xabc"), (2, "aabc"), (3, "abcabc xabc")], "doc_id long, text string"
    )
    got_udf = {
        r["doc_id"]: r["tokens"] for r in bpe_encode_udf(docs, table).collect()
    }
    exprd = docs.select(
        "doc_id",
        bpe_encode_expr(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"), []
        ).alias("words"),
    )
    # expr twin: apply the same merges per word via the Column fold
    from yark_spark.operators.bpe import _apply_merge

    def fold(seq):
        out = seq
        for l, r in table:
            out = _apply_merge(out, l, r)
        return out

    got_expr = {
        r["doc_id"]: r["toks"]
        for r in docs.select(
            "doc_id",
            F.flatten(
                F.transform(
                    F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                    lambda w: fold(F.split(w, "")),
                )
            ).alias("toks"),
        ).collect()
    }
    assert got_udf == got_expr
    assert got_udf[1] == ["x", "abc"]  # the floor case, explicitly
