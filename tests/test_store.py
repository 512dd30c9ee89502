"""ParquetStore version retention (ADVICE r1, store.py): a lazy DataFrame
read before a write must stay consumable after the write (the old version
is retained), and vacuum reclaims non-current versions."""

import os

from yark_spark.operators.store import ParquetStore


def _versions(root, name):
    tdir = os.path.join(root, name)
    return sorted(d for d in os.listdir(tdir) if d.startswith("v"))


def test_reader_survives_one_write(spark, tmp_path):
    root = str(tmp_path / "store")
    store = ParquetStore(spark, root)
    store.write("t", spark.range(5).toDF("id"))
    old = store.read("t")  # lazy — not yet consumed
    store.write("t", spark.range(9).toDF("id"))
    # the v0 reader still resolves: v0 was retained by the v1 write
    assert old.count() == 5
    assert store.read("t").count() == 9
    assert _versions(root, "t") == ["v0", "v1"]


def test_gc_keeps_only_retain_versions(spark, tmp_path):
    store = ParquetStore(spark, str(tmp_path / "store"), retain=2)
    for n in range(4):
        store.write("t", spark.range(n + 1).toDF("id"))
    assert _versions(str(tmp_path / "store"), "t") == ["v2", "v3"]
    assert store.read("t").count() == 4


def test_vacuum_drops_non_current(spark, tmp_path):
    root = str(tmp_path / "store")
    store = ParquetStore(spark, root)
    store.write("t", spark.range(3).toDF("id"))
    store.write("t", spark.range(6).toDF("id"))
    store.vacuum()
    assert _versions(root, "t") == ["v1"]
    assert store.read("t").count() == 6
