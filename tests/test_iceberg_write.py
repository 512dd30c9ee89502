"""Iceberg commit API (round 14, session 3): create/commit over an
object-store-shaped member dict, resolved back through the module's
own spec-hardened reader. Pins the v2 commit arithmetic — sequence
assignment, entry-level NULL sequence numbers (inheritance), verbatim
manifest reuse, lineage, time travel, metadata-log — plus the typed
guards."""

from __future__ import annotations

import json

import pytest

from yark_spark.operators.avro_ocf import avro_records
from yark_spark.operators.containers import tar_build
from yark_spark.operators.iceberg import (
    iceberg_commit,
    iceberg_snapshot_rows,
    iceberg_table_create,
)
from yark_spark.operators.parquet_write import parquet_write

FIELDS = [
    {"id": 1, "name": "doc_id", "required": True, "type": "long"},
    {"id": 2, "name": "text", "required": True, "type": "string"},
]


def _pq(lo, hi):
    return parquet_write(
        {
            "doc_id": list(range(lo, hi)),
            "text": ["t%03d" % i for i in range(lo, hi)],
        },
        types={"doc_id": "INT64", "text": "BYTE_ARRAY"},
        codec="SNAPPY",
    )


def _three_commit_table():
    m = iceberg_table_create(FIELDS)
    m, s1 = iceberg_commit(
        m,
        data_files=[
            ("data/p0.parquet", _pq(0, 16), 16),
            ("data/p1.parquet", _pq(16, 32), 16),
        ],
    )
    m, s2 = iceberg_commit(
        m,
        data_files=[
            ("data/p2.parquet", _pq(32, 48), 16),
            ("data/p3.parquet", _pq(48, 64), 16),
        ],
    )
    pos = parquet_write(
        {"file_path": ["data/p1.parquet"] * 8, "pos": list(range(8))},
        types={"file_path": "BYTE_ARRAY", "pos": "INT64"},
        codec="SNAPPY",
    )
    eq = parquet_write({"doc_id": [40]}, types={"doc_id": "INT64"}, codec="SNAPPY")
    m, s3 = iceberg_commit(
        m,
        delete_files=[
            {"path": "data/del-pos.parquet", "blob": pos, "content": 1,
             "record_count": 8},
            {"path": "data/del-eq.parquet", "blob": eq, "content": 2,
             "record_count": 1, "equality_ids": [1]},
        ],
    )
    return m, (s1, s2, s3)


def test_roundtrip_latest_and_time_travel():
    m, (s1, s2, s3) = _three_commit_table()
    tar = tar_build(sorted(m.items()))
    got = sorted(r["doc_id"] for _, r in iceberg_snapshot_rows(tar, ["doc_id"]))
    assert got == [i for i in range(64) if not (16 <= i <= 23) and i != 40]
    assert sorted(
        r["doc_id"] for _, r in iceberg_snapshot_rows(tar, ["doc_id"], s1)
    ) == list(range(32))
    assert sorted(
        r["doc_id"] for _, r in iceberg_snapshot_rows(tar, ["doc_id"], s2)
    ) == list(range(64))


def test_lineage_and_metadata_log():
    m, (s1, s2, s3) = _three_commit_table()
    names = [n for n in m if n.endswith(".metadata.json")]
    assert names == ["metadata/v4.metadata.json"]  # single current pointer
    meta = json.loads(m[names[0]])
    assert [(s["snapshot-id"], s.get("parent-snapshot-id")) for s in
            meta["snapshots"]] == [(1, None), (2, 1), (3, 2)]
    assert [s["summary"]["operation"] for s in meta["snapshots"]] == [
        "append", "append", "overwrite",
    ]
    assert meta["last-sequence-number"] == 3
    assert [e["metadata-file"] for e in meta["metadata-log"]] == [
        "metadata/v1.metadata.json",
        "metadata/v2.metadata.json",
        "metadata/v3.metadata.json",
    ]


def test_manifest_reuse_and_null_entry_sequences():
    m, (s1, s2, s3) = _three_commit_table()
    # snapshot 3's manifest list must reference snapshot 1/2 manifests
    # VERBATIM with their ORIGINAL sequence numbers
    lists = {n: avro_records(m[n]) for n in m if n.startswith("metadata/snap-")}
    recs3 = lists["metadata/snap-3.avro"]
    by_path = {r["manifest_path"]: r for r in recs3}
    assert by_path["metadata/m1-data.avro"]["sequence_number"] == 1
    assert by_path["metadata/m2-data.avro"]["sequence_number"] == 2
    assert by_path["metadata/m3-deletes.avro"]["sequence_number"] == 3
    # the snapshot-1 list's record equals snapshot-3's for m1 (reuse)
    rec1 = lists["metadata/snap-1.avro"][0]
    assert rec1 == by_path["metadata/m1-data.avro"]
    # manifest ENTRIES carry null sequence numbers — inheritance is
    # what the reader resolves, per entry
    for entry in avro_records(m["metadata/m1-data.avro"]):
        assert entry["sequence_number"] is None
        assert entry["status"] == 1


def test_eq_delete_same_sequence_survives():
    """A data file added in the SAME commit as an equality delete is
    NOT affected (strict seq > rule) — commit both and the row lives."""
    m = iceberg_table_create(FIELDS)
    eq = parquet_write({"doc_id": [5]}, types={"doc_id": "INT64"}, codec="SNAPPY")
    m, _ = iceberg_commit(
        m,
        data_files=[("data/p0.parquet", _pq(0, 16), 16)],
        delete_files=[
            {"path": "data/del-eq.parquet", "blob": eq, "content": 2,
             "record_count": 1, "equality_ids": [1]},
        ],
    )
    got = sorted(
        r["doc_id"]
        for _, r in iceberg_snapshot_rows(tar_build(sorted(m.items())), ["doc_id"])
    )
    assert got == list(range(16))  # doc 5 SURVIVES
    # a later data file is still unaffected; a later DELETE would apply
    m, _ = iceberg_commit(m, data_files=[("data/p1.parquet", _pq(16, 32), 16)])
    eq2 = parquet_write({"doc_id": [7]}, types={"doc_id": "INT64"}, codec="SNAPPY")
    m, _ = iceberg_commit(
        m,
        delete_files=[
            {"path": "data/del2.parquet", "blob": eq2, "content": 2,
             "record_count": 1, "equality_ids": [1]},
        ],
    )
    got = sorted(
        r["doc_id"]
        for _, r in iceberg_snapshot_rows(tar_build(sorted(m.items())), ["doc_id"])
    )
    assert got == [i for i in range(32) if i != 7]


def test_typed_guards():
    m = iceberg_table_create(FIELDS)
    with pytest.raises(ValueError, match="empty commit"):
        iceberg_commit(m)
    # v1 tables COMMIT since round 17 — v2-only features stay typed
    v1 = {
        "metadata/v1.metadata.json": json.dumps(
            {"format-version": 1, "schemas": [], "snapshots": []}
        ).encode()
    }
    with pytest.raises(NotImplementedError, match="remove_files"):
        iceberg_commit(
            v1, data_files=[("d", b"x", 1)], remove_files=["zz"]
        )
    with pytest.raises(ValueError, match="content"):
        iceberg_commit(
            m,
            delete_files=[{"path": "d", "blob": b"x", "content": 9,
                           "record_count": 1}],
        )


def test_partitioned_commit_prunes():
    """A table created with a truncate[16] spec commits partitioned
    manifests + field summaries; the partition scan skips the other
    commit's manifest unopened and the sibling file unread."""
    from yark_spark.operators.iceberg import iceberg_partition_scan

    spec = [{"name": "doc_trunc", "transform": "truncate[16]",
             "source-id": 1, "field-id": 1000}]
    m = iceberg_table_create(FIELDS, partition_spec=spec)
    m, _ = iceberg_commit(
        m,
        data_files=[
            ("data/p0.parquet", _pq(0, 16), 16, {"doc_trunc": 0}),
            ("data/p1.parquet", _pq(16, 32), 16, {"doc_trunc": 16}),
        ],
    )
    m, _ = iceberg_commit(
        m,
        data_files=[
            ("data/p2.parquet", _pq(32, 48), 16, {"doc_trunc": 32}),
            ("data/p3.parquet", _pq(48, 64), 16, {"doc_trunc": 48}),
        ],
    )
    tar = tar_build(sorted(m.items()))
    rows, cnt = iceberg_partition_scan(tar, ["doc_id"], source_value=38)
    assert sorted(r["doc_id"] for r in rows) == list(range(32, 48))
    assert cnt == {"manifests_total": 2, "manifests_skipped": 1,
                   "files_skipped": 1, "files_scanned": 1}
    # the general resolver still reads partition-carrying entries
    got = sorted(r["doc_id"] for _, r in iceberg_snapshot_rows(tar, ["doc_id"]))
    assert got == list(range(64))
    # bucket transform through the same write path
    from yark_spark.operators.iceberg import iceberg_bucket

    spec_b = [{"name": "doc_bucket", "transform": "bucket[4]",
               "source-id": 1, "field-id": 1000}]
    m = iceberg_table_create(FIELDS, partition_spec=spec_b)
    files = []
    for k in range(4):
        files.append(
            (f"data/b{k}.parquet", _pq(16 * k, 16 * k + 16), 16,
             {"doc_bucket": k})
        )
    m, _ = iceberg_commit(m, data_files=files[:2])
    m, _ = iceberg_commit(m, data_files=files[2:])
    probe = 7
    want_bucket = iceberg_bucket(probe, 4)
    tar = tar_build(sorted(m.items()))
    rows, cnt = iceberg_partition_scan(tar, ["doc_id"], source_value=probe)
    assert all(
        r["doc_id"] // 16 == want_bucket for r in rows
    ) and len(rows) == 16
    assert cnt["files_scanned"] == 1


def test_partitioned_commit_requires_partition_values():
    spec = [{"name": "p", "transform": "identity", "source-id": 1,
             "field-id": 1000}]
    m = iceberg_table_create(FIELDS, partition_spec=spec)
    with pytest.raises(ValueError, match="partition"):
        iceberg_commit(m, data_files=[("d.parquet", _pq(0, 4), 4)])


def test_field_id_rename_resolution():
    """Files carry original names + field ids; a metadata-only rename
    must still resolve (the spec's name-independent rule). Equality
    deletes route through the same id resolver."""
    import json as _json

    fields_old = [
        {"id": 1, "name": "doc_key", "required": True, "type": "long"},
        {"id": 2, "name": "body", "required": True, "type": "string"},
    ]
    m = iceberg_table_create(fields_old)
    blob = parquet_write(
        {"doc_key": list(range(16)), "body": ["t%02d" % i for i in range(16)]},
        types={"doc_key": "INT64", "body": "BYTE_ARRAY"},
        codec="SNAPPY",
        field_ids={"doc_key": 1, "body": 2},
    )
    m, _ = iceberg_commit(m, data_files=[("data/p0.parquet", blob, 16)])
    eq = parquet_write(
        {"doc_key": [5]}, types={"doc_key": "INT64"}, codec="SNAPPY",
        field_ids={"doc_key": 1},
    )
    m, _ = iceberg_commit(
        m,
        delete_files=[
            {"path": "data/del.parquet", "blob": eq, "content": 2,
             "record_count": 1, "equality_ids": [1]},
        ],
    )
    name = next(n for n in m if n.endswith(".metadata.json"))
    meta = _json.loads(m[name])
    meta["schemas"][0]["fields"][0]["name"] = "doc_id"
    meta["schemas"][0]["fields"][1]["name"] = "text"
    m[name] = _json.dumps(meta).encode()
    rows = iceberg_snapshot_rows(tar_build(sorted(m.items())), ["doc_id", "text"])
    got = sorted(r["doc_id"] for _, r in rows)
    assert got == [i for i in range(16) if i != 5]  # eq delete resolved by id
    assert all(r["text"] == "t%02d" % r["doc_id"] for _, r in rows)


def test_partitioned_commit_null_partition_value():
    """Round 15 (ADVICE): a data file with a NULL partition value
    (identity over a null source column) commits cleanly — summaries
    set contains_null and bound over the non-null values only; the
    partition scan still prunes on the surviving bounds and the
    general resolver reads every row back."""
    from yark_spark.operators.iceberg import iceberg_partition_scan

    spec = [{"name": "p", "transform": "identity", "source-id": 1,
             "field-id": 1000}]
    m = iceberg_table_create(FIELDS, partition_spec=spec)
    m, _ = iceberg_commit(
        m,
        data_files=[
            ("data/p0.parquet", _pq(0, 16), 16, {"p": 0}),
            ("data/pn.parquet", _pq(16, 32), 16, {"p": None}),
        ],
    )
    tar = tar_build(sorted(m.items()))
    # manifest-list summary: null recorded, bounds over non-null only
    members = dict(m)
    snap = [p for p in members if p.startswith("metadata/snap-")]
    assert len(snap) == 1
    (mf_rec,) = avro_records(members[snap[0]])
    (s0,) = mf_rec["partitions"]
    assert s0["contains_null"] is True
    assert bytes(s0["lower_bound"]) == (0).to_bytes(8, "little", signed=True)
    assert bytes(s0["upper_bound"]) == (0).to_bytes(8, "little", signed=True)
    # probing p=0 scans the null-partition file too? No: its entry
    # mismatches, so only p0 is read; the null file is skipped.
    rows, cnt = iceberg_partition_scan(tar, ["doc_id"], source_value=0)
    assert sorted(r["doc_id"] for r in rows) == list(range(16))
    assert cnt["files_scanned"] == 1 and cnt["files_skipped"] == 1
    got = sorted(r["doc_id"] for _, r in iceberg_snapshot_rows(tar, ["doc_id"]))
    assert got == list(range(32))


def test_partitioned_commit_all_null_partition_values():
    spec = [{"name": "p", "transform": "identity", "source-id": 1,
             "field-id": 1000}]
    m = iceberg_table_create(FIELDS, partition_spec=spec)
    m, _ = iceberg_commit(
        m, data_files=[("data/pn.parquet", _pq(0, 8), 8, {"p": None})]
    )
    members = dict(m)
    snap = [p for p in members if p.startswith("metadata/snap-")]
    (mf_rec,) = avro_records(members[snap[0]])
    (s0,) = mf_rec["partitions"]
    assert s0["contains_null"] is True
    assert s0["lower_bound"] is None and s0["upper_bound"] is None
    tar = tar_build(sorted(m.items()))
    got = sorted(r["doc_id"] for _, r in iceberg_snapshot_rows(tar, ["doc_id"]))
    assert got == list(range(8))


def test_partition_scan_applies_row_level_deletes():
    """Round 15: the partition scan previously SKIPPED delete
    manifests — a partitioned v2 table with position or equality
    deletes would return phantom rows. Both kinds now apply inside
    the surviving partition with the spec's sequence rules."""
    from yark_spark.operators.iceberg import iceberg_partition_scan

    spec = [{"name": "p", "transform": "identity", "source-id": 1,
             "field-id": 1000}]
    m = iceberg_table_create(FIELDS, partition_spec=spec)
    m, _ = iceberg_commit(
        m,
        data_files=[
            ("data/p0.parquet", _pq(0, 16), 16, {"p": 0}),
            ("data/p1.parquet", _pq(16, 32), 16, {"p": 16}),
        ],
    )
    pos = parquet_write(
        {"file_path": ["data/p0.parquet"] * 3, "pos": [1, 5, 9]},
        types={"file_path": "BYTE_ARRAY", "pos": "INT64"}, codec="SNAPPY",
    )
    eq = parquet_write({"doc_id": [12]}, types={"doc_id": "INT64"},
                       codec="SNAPPY")
    m, _ = iceberg_commit(
        m,
        delete_files=[
            {"path": "data/del-pos.parquet", "blob": pos, "content": 1,
             "record_count": 3},
            {"path": "data/del-eq.parquet", "blob": eq, "content": 2,
             "record_count": 1, "equality_ids": [1]},
        ],
    )
    tar = tar_build(sorted(m.items()))
    rows, cnt = iceberg_partition_scan(tar, ["doc_id"], source_value=0)
    got = sorted(r["doc_id"] for r in rows)
    # positions 1/5/9 and the equality key 12 are gone
    assert got == [i for i in range(16) if i not in (1, 5, 9, 12)]
    assert cnt["files_scanned"] == 1 and cnt["files_skipped"] == 1
    # the other partition is untouched by p0's position deletes
    rows2, _ = iceberg_partition_scan(tar, ["doc_id"], source_value=16)
    assert sorted(r["doc_id"] for r in rows2) == list(range(16, 32))


def test_v1_write_roundtrip_and_guards():
    """v1 table write (round 17): sequence-number-free manifests the
    v1 reader resolves; delete files and v2-only features typed."""
    import pytest

    from yark_spark.operators.containers import tar_build
    from yark_spark.operators.iceberg import (
        iceberg_commit,
        iceberg_incremental_files,
        iceberg_snapshot_rows,
        iceberg_table_create,
    )
    from yark_spark.operators.parquet_write import parquet_write

    def pq(ks):
        return parquet_write(
            {"k": list(ks)}, types={"k": "INT64"}, codec="SNAPPY"
        )

    fields = [{"id": 1, "name": "k", "required": True, "type": "long"}]
    m = iceberg_table_create(fields, format_version=1)
    m, s1 = iceberg_commit(m, data_files=[("data/p0.parquet", pq([1, 2]), 2)])
    m, s2 = iceberg_commit(m, data_files=[("data/p1.parquet", pq([3]), 1)])
    tar = tar_build(sorted(m.items()))
    assert sorted(r["k"] for _, r in iceberg_snapshot_rows(tar, ["k"])) == [1, 2, 3]
    assert sorted(
        r["k"] for _, r in iceberg_snapshot_rows(tar, ["k"], snapshot_id=s1)
    ) == [1, 2]
    assert [rec["path"] for _s, rec in iceberg_incremental_files(tar, s1, s2)] == [
        "data/p1.parquet"
    ]
    with pytest.raises(ValueError, match="v1 tables cannot carry delete"):
        iceberg_commit(m, delete_files=[{
            "path": "d", "blob": pq([1]), "content": 2,
            "record_count": 1, "equality_ids": [1]}])
    with pytest.raises(NotImplementedError, match="stats_by_path"):
        iceberg_commit(
            m, data_files=[("data/p2.parquet", pq([4]), 1)],
            stats_by_path={"data/p2.parquet": {"value_counts": {1: 1}}},
        )
