"""Semantics of the round-7 curation transforms: C4-style line dedup
(operators/dedup.line_dedup) and CCNet-style bigram LM scoring
(operators/lm.bigram_lm_score)."""

import pandas as pd
from pyspark.sql import functions as F

from yark_spark.operators.dedup import line_dedup
from yark_spark.operators.lm import bigram_lm_score


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def test_line_dedup_removes_shared_keeps_order(spark):
    boiler = " ".join(f"b{i}" for i in range(10))       # one shared 10-token line
    uniq = [" ".join(f"u{d}_{i}" for i in range(10)) for d in range(4)]
    # boilerplate line sits at a DIFFERENT position per doc; unique lines
    # must survive in their original order
    texts = [
        boiler + " " + uniq[0] + " " + uniq[1],
        uniq[2] + " " + boiler + " " + uniq[3],
        uniq[0].replace("u0", "x0") + " " + boiler,
    ]
    out = {r.doc_id: r for r in line_dedup(_docs(spark, texts), min_docs=3).collect()}
    assert out[0].n_removed == 1 and out[0].clean_text == uniq[0] + ". " + uniq[1]
    assert out[1].n_removed == 1 and out[1].clean_text == uniq[2] + ". " + uniq[3]
    assert out[2].n_removed == 1
    # below threshold: nothing removed
    out2 = {r.doc_id: r for r in line_dedup(_docs(spark, texts), min_docs=4).collect()}
    assert all(r.n_removed == 0 for r in out2.values())


def test_line_dedup_counts_docs_not_occurrences(spark):
    line = " ".join(f"w{i}" for i in range(10))
    # one doc repeats the line 3 times; only 2 DISTINCT docs contain it
    texts = [line + " " + line + " " + line, line, "different " + " ".join(f"z{i}" for i in range(9))]
    out = {r.doc_id: r for r in line_dedup(_docs(spark, texts), min_docs=3).collect()}
    assert all(r.n_removed == 0 for r in out.values())


def test_lm_score_ranks_in_domain_above_gibberish(spark):
    ref = ["the cat sat on the mat", "the dog sat on the rug",
           "the cat ran to the dog", "a cat and a dog sat"] * 3
    texts = ref + ["the cat sat on the rug", "zq xv qj wk pf zz"]
    df = _docs(spark, texts)
    scores = {
        r.doc_id: r.lm_score
        for r in bigram_lm_score(df, ref_condition=F.col("doc_id") < len(ref)).collect()
    }
    in_domain = scores[len(ref)]
    gibberish = scores[len(ref) + 1]
    assert in_domain > gibberish
    # smoothing: gibberish still gets a finite score
    assert gibberish == gibberish and gibberish < 0


def test_lm_score_skips_sub_bigram_docs(spark):
    df = _docs(spark, ["only", "two tokens", ""])
    got = {r.doc_id for r in bigram_lm_score(df).collect()}
    assert got == {1}


def test_line_dedup_reconstruction_identity(spark):
    """With the threshold unreachable, line_dedup must be a pure
    re-chunking: clean_text == the '. '-join of the doc's 10-token
    windows, for every doc — pins the ordered-reassembly machinery."""
    import re

    texts = [
        " ".join(f"t{d}_{i}" for i in range(n))
        for d, n in enumerate([1, 9, 10, 11, 25, 40])
    ]
    out = {r.doc_id: r.clean_text
           for r in line_dedup(_docs(spark, texts), min_docs=10**9).collect()}
    for d, text in enumerate(texts):
        toks = re.split(r"\s+", text.strip().lower())
        want = ". ".join(" ".join(toks[i:i + 10]) for i in range(0, len(toks), 10))
        assert out[d] == want, (d, out[d], want)


def test_minhash_estimate_tracks_exact_jaccard(spark, sf_dir):
    """q_minhash_estimate vs q_jaccard_pairs on the same id slice: with
    only 4 hashes the estimator is coarse (quantized to {0,.25,.5,.75,1}),
    so assert the relationship, not equality: mean |est - exact| bounded,
    and clearly-similar pairs score above clearly-dissimilar ones."""
    from yark_spark.queries import QUERIES

    est = {
        (r.id_a, r.id_b): r.jaccard_est
        for r in QUERIES["q_minhash_estimate"](spark, sf_dir).collect()
    }
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in QUERIES["q_jaccard_pairs"](spark, sf_dir).collect()
    }
    common = set(est) & set(exact)
    assert len(common) >= 50
    mae = sum(abs(est[p] - exact[p]) for p in common) / len(common)
    assert mae < 0.35, mae  # 4-hash variance bound, not tightness
    hi = [est[p] for p in common if exact[p] > 0.6]
    lo = [est[p] for p in common if exact[p] < 0.2]
    if hi and lo:
        assert sum(hi) / len(hi) > sum(lo) / len(lo)


def test_dsir_importance_majority_verdict(spark):
    # target slice speaks 'aa bb'; off-domain docs speak 'zz yy'.
    # target docs must lean keep, the off-domain doc drop; counts exact.
    from yark_spark.operators.lm import dsir_importance
    from pyspark.sql import functions as F

    rows = [
        (0, "aa bb aa bb aa"),   # target: buckets of (aa bb)/(bb aa)
        (1, "aa bb aa bb"),      # target
        (2, "zz yy zz yy zz"),   # raw-only vocabulary
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dsir_importance(df, target_condition=F.col("doc_id") < 2)
    got = {r.doc_id: r for r in out.collect()}
    assert got[0].n_bigrams == 4 and got[1].n_bigrams == 3
    assert got[0].verdict == "keep" and got[1].verdict == "keep"
    # doc 2's buckets have ct=0 (never seen in target): with B=256 the
    # smoothed p=(0+1)/(tt+256) vs q=(c+1)/(tr+256) leans drop
    assert got[2].verdict == "drop"
    assert got[2].n_target_leaning == 0


def test_dsir_importance_doc_level_flag_condition(spark):
    # review fix: the documented unioned-frame pattern — a condition on
    # a doc-level marker column, not an id predicate — must work and
    # agree with the equivalent id-based call
    from pyspark.sql import functions as F

    from yark_spark.operators.lm import dsir_importance

    rows = [(i, f"tok{i % 7} tok{(i + 1) % 5} tok{i % 3}") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "is_target", F.col("doc_id") < 15
    )
    by_flag = dsir_importance(df, target_condition=F.col("is_target"))
    by_id = dsir_importance(df, target_condition=F.col("doc_id") < 15)
    assert sorted(map(tuple, by_flag.collect())) == sorted(
        map(tuple, by_id.collect())
    )
