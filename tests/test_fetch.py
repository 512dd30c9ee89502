"""Fetch-layer tests (S1/S2/S3/P3/P4): fakes stand in for the network; the
dataflow (partition parallelism, retry chain, quarantine split, enrichment
join) is real."""

import json

from pyspark.sql import functions as F

from yark_spark.sources.fetch import enrich_with_ratings, fetch_infodicts, parse_fetched

# NB: fakes are built by a factory so they pickle BY VALUE (cloudpickle
# closure) — a module-level function here would pickle by reference to
# 'test_fetch', which executors can't import.


def _make_fakes():
    def fake_primary(vid: str) -> str:
        if vid.startswith("dead") or vid.startswith("wayb"):
            raise RuntimeError("primary down")
        return json.dumps({"id": vid, "fulltitle": f"title-{vid}"})

    def fake_fallback(vid: str) -> str:
        if vid.startswith("dead"):
            raise RuntimeError("fallback down too")
        return json.dumps({"id": vid, "fulltitle": f"wayback-{vid}", "availability": "public"})

    return fake_primary, fake_fallback


def test_fetch_retry_chain_and_quarantine(spark):
    fake_primary, fake_fallback = _make_fakes()
    ids = spark.createDataFrame(
        [("goodvideo01",), ("waybvideo01",), ("deadvideo01",)], "id string"
    )
    fetched = fetch_infodicts(
        ids, fake_primary, fake_fallback, backoff_seconds=0.0, parallelism=3
    )
    rows = {r["id"]: r for r in fetched.collect()}
    assert rows["goodvideo01"]["source"] == "primary"
    assert rows["goodvideo01"]["attempts"] == 1
    assert rows["waybvideo01"]["source"] == "fallback"
    assert rows["waybvideo01"]["attempts"] == 2  # primary fail + first fallback
    assert rows["deadvideo01"]["payload"] is None
    assert rows["deadvideo01"]["attempts"] == 1 + 3  # primary + MAX_ATTEMPTS (P3)


def test_parse_fetched_tags_recovered(spark):
    fake_primary, fake_fallback = _make_fakes()
    ids = spark.createDataFrame([("goodvideo01",), ("waybvideo01",), ("deadvideo01",)], "id string")
    fetched = fetch_infodicts(ids, fake_primary, fake_fallback, backoff_seconds=0.0)
    parsed, lost = parse_fetched(fetched)
    by_id = {r["id"]: r for r in parsed.collect()}
    assert by_id["goodvideo01"]["availability"] is None
    assert by_id["waybvideo01"]["availability"] == "recovered"  # S2 tag
    assert [r["id"] for r in lost.collect()] == ["deadvideo01"]  # P4


def test_end_to_end_fetch_archive(spark):
    """Fetched + parsed rows flow into the archive graph; lost ids become
    stubs — the full §3.2 path with a fake network."""
    from yark_spark.operators.archive import archive_batch, empty_store
    from yark_spark.sources.infodict import lost_stub
    from yark_spark.operators.writes import insert_ignore

    fake_primary, fake_fallback = _make_fakes()
    ids = spark.createDataFrame([("goodvideo01",), ("deadvideo01",)], "id string")
    fetched = fetch_infodicts(ids, fake_primary, fake_fallback, backoff_seconds=0.0)
    parsed, lost = parse_fetched(fetched)
    store = archive_batch(empty_store(spark), parsed)
    store["videos"] = insert_ignore(store["videos"], lost_stub(lost), ["video_id"])
    v = {r["video_id"]: r for r in store["videos"].collect()}
    assert v["goodvideo01"]["title"] == "title-goodvideo01"
    assert v["deadvideo01"]["availability"] == "lost"


def test_ratings_enrichment_left_join(spark):
    videos = spark.createDataFrame(
        [("v1", 10), ("v2", 20)], "id string, like_count long"
    ).withColumn("ryd_likes", F.lit(None).cast("long"))
    ratings = spark.createDataFrame([("v1", 99)], "id string, ryd_likes long")
    out = enrich_with_ratings(videos, ratings)
    got = {r["id"]: r["ryd_likes"] for r in out.collect()}
    assert got == {"v1": 99, "v2": None}  # missing → NULL (empty-dict fallback)
