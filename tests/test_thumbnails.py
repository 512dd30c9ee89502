"""K2 thumbnail dump roundtrip (`cmds/archive.py:201-221`): BLOB column →
per-partition binary file writes with extension extraction and
skip-existing."""

import os

from yark_spark import cli
from yark_spark.operators.store import ParquetStore
from yark_spark.operators.writes import insert_ignore
from yark_spark.schemas import VIDEOS


def _videos_with_thumbs(spark):
    rows = [
        ("vidthumb001", b"\xff\xd8fakejpegbytes", "https://i.ytimg.com/vi/a/hq.jpg?sqp=xyz"),
        ("vidthumb002", b"RIFFfakewebp", "https://i.ytimg.com/vi/b/max.webp"),
        ("vidnothumb03", None, None),
    ]
    df = spark.createDataFrame(
        [(vid, tb, url) for vid, tb, url in rows],
        "video_id string, thumbnail binary, thumbnail_url string",
    )
    # widen to the full videos schema
    from pyspark.sql import functions as F

    cols = []
    for f in VIDEOS.fields:
        if f.name in ("video_id", "thumbnail", "thumbnail_url"):
            cols.append(F.col(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def test_dump_thumbnails_cli(spark, tmp_path, capsys):
    store_dir = str(tmp_path / "store")
    store = ParquetStore(spark, store_dir)
    store.write("videos", insert_ignore(store.read("videos"), _videos_with_thumbs(spark), ["video_id"]))

    out = str(tmp_path / "thumbs")
    rc = cli.main(["dump-thumbnails", "--store", store_dir, "--out", out], spark=spark)
    assert rc == 0
    files = sorted(os.listdir(out))
    # query-string stripped from extension (X2, :211); NULL thumbnail skipped
    assert files == ["vidthumb001.jpg", "vidthumb002.webp"]
    with open(os.path.join(out, "vidthumb001.jpg"), "rb") as f:
        assert f.read() == b"\xff\xd8fakejpegbytes"

    # skip-existing (`:213`): mutate a file, re-dump, content must survive
    with open(os.path.join(out, "vidthumb001.jpg"), "wb") as f:
        f.write(b"edited")
    rc = cli.main(["dump-thumbnails", "--store", store_dir, "--out", out], spark=spark)
    assert rc == 0
    with open(os.path.join(out, "vidthumb001.jpg"), "rb") as f:
        assert f.read() == b"edited"


def test_binary_source_roundtrips_dump(spark, tmp_path):
    """E4 inverse path: dump → binaryFile re-ingest → restore onto videos.
    Bytes survive the full cycle; rows without a dumped file keep their
    stored thumbnail."""
    from yark_spark.sources.binary import read_binary_dir, restore_thumbnails

    store_dir = str(tmp_path / "store")
    store = ParquetStore(spark, store_dir)
    store.write("videos", insert_ignore(store.read("videos"), _videos_with_thumbs(spark), ["video_id"]))
    out = str(tmp_path / "thumbs")
    assert cli.main(["dump-thumbnails", "--store", store_dir, "--out", out], spark=spark) == 0

    files = read_binary_dir(spark, out)
    got = {r.file_id: (r.ext, bytes(r.content), r.length) for r in files.collect()}
    assert got == {
        "vidthumb001": ("jpg", b"\xff\xd8fakejpegbytes", 15),
        "vidthumb002": ("webp", b"RIFFfakewebp", 12),
    }

    # wipe stored thumbnails, then restore from the dumped files
    from pyspark.sql import functions as F

    stripped = store.read("videos").withColumn(
        "thumbnail", F.lit(None).cast("binary")
    )
    restored = restore_thumbnails(stripped, files)
    by_id = {r.video_id: r.thumbnail for r in restored.select("video_id", "thumbnail").collect()}
    assert bytes(by_id["vidthumb001"]) == b"\xff\xd8fakejpegbytes"
    assert bytes(by_id["vidthumb002"]) == b"RIFFfakewebp"
    assert by_id["vidnothumb03"] is None


def test_resize_and_frame_sample(spark, sf_dir):
    from yark_spark.operators.multimodal import resize_images, sample_frames, with_binary_payload
    from yark_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").limit(10)
    payloads = with_binary_payload(docs)
    resized = resize_images(payloads, target=(224, 224))
    rows = resized.collect()
    assert len(rows) == 10
    assert all(r["width"] == 224 and r["height"] == 224 for r in rows)
    assert all(len(bytes(r["payload"])) <= 224 * 224 // 64 for r in rows)

    frames = sample_frames(payloads, n_frames=4)
    fr = frames.collect()
    assert len(fr) == 40  # flat-map: 4 frames per asset
    by_doc = {}
    for r in fr:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 1, 2, 3] for v in by_doc.values())
