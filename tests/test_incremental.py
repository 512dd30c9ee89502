"""Unit semantics of operators/incremental.incremental_minhash_flags."""

from pyspark.sql import functions as F

from yark_spark.operators.incremental import incremental_minhash_flags


def _flags(spark, rows, index_ids):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = incremental_minhash_flags(
        df, F.col("doc_id").isin(index_ids), num_hashes=8, bands=4
    )
    return {r["doc_id"]: r["is_dup"] for r in out.collect()}


def test_exact_copy_of_index_doc_flagged(spark):
    got = _flags(
        spark,
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "completely different words about spark shuffles and joins")],
        index_ids=[1],
    )
    assert got == {2: True, 3: False}


def test_index_docs_absent_from_output(spark):
    got = _flags(
        spark,
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        index_ids=[1],
    )
    assert set(got) == {2}


def test_near_duplicate_shares_a_band(spark):
    # 8 hashes / 4 bands = 2 hashes per band; a doc differing by one token
    # out of many usually keeps >= 1 band intact. Use identical token SET
    # (order shuffled) which is guaranteed identical signatures.
    base = "one two three four five six seven eight nine ten"
    shuffled = "ten nine eight seven six five four three two one"
    got = _flags(spark, [(1, base), (2, shuffled)], index_ids=[1])
    assert got[2] is True


def test_empty_index_flags_nothing(spark):
    got = _flags(
        spark,
        [(2, "some new document"), (3, "another new document")],
        index_ids=[99],
    )
    assert got == {2: False, 3: False}


def test_persisted_index_screen_matches_one_shot(spark, tmp_path):
    """round 7: build_band_index → parquet → read back → screen must equal
    the one-shot incremental_minhash_flags on the same split."""
    from pyspark.sql import functions as F

    from yark_spark.operators.incremental import (
        build_band_index,
        screen_against_index,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),   # copy of 1
        (3, "one two three four five six seven"),
        (4, "totally new words nobody wrote before"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    old = df.filter(F.col("doc_id") == 1)
    new = df.filter(F.col("doc_id") != 1)

    idx_path = str(tmp_path / "band_index")
    build_band_index(old).write.mode("overwrite").parquet(idx_path)
    idx = spark.read.parquet(idx_path)

    via_index = {
        r["doc_id"]: r["is_dup"]
        for r in screen_against_index(new, idx).collect()
    }
    one_shot = {
        r["doc_id"]: r["is_dup"]
        for r in incremental_minhash_flags(df, F.col("doc_id") == 1).collect()
    }
    assert via_index == one_shot
    assert via_index[2] is True and via_index[4] is False
