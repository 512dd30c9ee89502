"""Multimodal binary-column plumbing tests (SURVEY.md §2.8 E4): real
Spark-side schema/batching, deterministically stubbed decode."""

import pytest
from pyspark.sql import functions as F

from yark_spark.operators.multimodal import (
    decode_image,
    extract_features,
    fake_image_features,
    with_binary_payload,
)


def test_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff")


def test_fake_features_deterministic():
    a = fake_image_features(b"payload")
    b = fake_image_features(b"payload")
    c = fake_image_features(b"other")
    assert a == b
    assert a != c
    assert 64 <= a[0] < 256 and 64 <= a[1] < 256 and a[2] in ("RGB", "L")


def test_binary_payload_roundtrip(spark):
    df = spark.createDataFrame([(1, "héllo wörld")], "doc_id long, text string")
    out = with_binary_payload(df).collect()[0]
    assert bytes(out["payload"]).decode("utf-8") == "héllo wörld"


def test_extract_features_schema_and_batching(spark, sf_dir):
    from yark_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    feats = extract_features(with_binary_payload(docs))
    rows = feats.collect()
    assert len(rows) == 50
    assert set(feats.columns) == {"doc_id", "n_bytes", "sha1_8", "fake_width", "fake_height", "fake_mode"}
    # n_bytes must equal the utf-8 byte length of the text, proving the
    # payload flowed through Arrow batches intact
    joined = feats.join(docs, "doc_id").filter(
        F.col("n_bytes") != F.length(F.encode(F.col("text"), "utf-8"))
    )
    assert joined.count() == 0


def test_extract_features_distributed_partitions(spark, sf_dir):
    """mapInPandas must work per-partition (no driver collect): force many
    partitions and confirm identical results."""
    from yark_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    one = extract_features(with_binary_payload(docs).coalesce(1))
    many = extract_features(with_binary_payload(docs).repartition(8))
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))
