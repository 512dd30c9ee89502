"""Source-edge robustness (sources/takeout): error-tolerant ingest with a
replayable quarantine."""


def test_json_quarantine_splits_clean_and_corrupt(spark, tmp_path):
    """round 7: PERMISSIVE ingest captures malformed lines into a replayable
    quarantine instead of failing the job or silently dropping rows."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from yark_spark.sources.takeout import read_json_with_quarantine

    p = tmp_path / "in.json"
    p.write_text(
        '{"video": "v1", "pos": 1}\n'
        "{this is not json at all\n"
        '{"video": "v2", "pos": 2}\n'
        '{"video": "v3", "pos": "not_a_number"}\n'
    )
    schema = StructType(
        [StructField("video", StringType()), StructField("pos", LongType())]
    )
    clean, quarantine, raw = read_json_with_quarantine(spark, str(p), schema)
    # 100 TB posture: persisted DISK_ONLY (no executor-memory pinning),
    # handle returned for caller-managed release
    assert raw.storageLevel.useDisk and not raw.storageLevel.useMemory
    assert {(r["video"], r["pos"]) for r in clean.collect()} == {("v1", 1), ("v2", 2)}
    bad = [r["raw_line"] for r in quarantine.collect()]
    assert len(bad) == 2
    assert any("not json at all" in b for b in bad)
    assert any("not_a_number" in b for b in bad)  # raw line preserved for replay
    raw.unpersist()
