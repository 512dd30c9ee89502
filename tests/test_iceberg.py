"""Iceberg v2 snapshot resolution (operators/iceberg, round 13 s3).

Pins the spec rules the fixture key relies on — sequence-number
inheritance, the position-delete >= rule vs the equality-delete strict
> rule, DELETED-status entries, time travel — plus the typed corrupt-
tree boundaries (missing member, manifest length mismatch, v1 tables).
All in-process: every byte through in-repo avro/parquet/tar writers.
"""

from __future__ import annotations

import json

import pytest

from yark_spark.operators.avro_ocf import avro_build
from yark_spark.operators.containers import tar_build
from yark_spark.operators.iceberg import (
    MANIFEST_LIST_SCHEMA,
    MANIFEST_SCHEMA,
    iceberg_plan_snapshot,
    iceberg_snapshot_rows,
)
from yark_spark.operators.parquet_write import parquet_write

SCHEMA_FIELDS = [
    {"id": 1, "name": "doc_id", "required": True, "type": "long"},
    {"id": 2, "name": "text", "required": True, "type": "string"},
]


def _pq(ids, texts):
    return parquet_write(
        {"doc_id": ids, "text": texts},
        types={"doc_id": "INT64", "text": "BYTE_ARRAY"},
        codec="SNAPPY",
    )


def _entry(path, blob, content=0, nrec=None, eq_ids=None, seq=None, status=1):
    return {
        "status": status,
        "snapshot_id": None,
        "sequence_number": seq,
        "file_sequence_number": seq,
        "data_file": {
            "content": content,
            "file_path": path,
            "file_format": "PARQUET",
            "record_count": nrec,
            "file_size_in_bytes": len(blob),
            "equality_ids": eq_ids,
        },
    }


def _mf(path, blob, content, seq):
    return {
        "manifest_path": path,
        "manifest_length": len(blob),
        "partition_spec_id": 0,
        "content": content,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": seq,
        "added_files_count": 1,
        "existing_files_count": 0,
        "deleted_files_count": 0,
    }


def _table(
    *,
    eq_seq=2,
    pos_seq=2,
    p1_entry_seq=None,
    p1_status=1,
    tamper_manifest_length=False,
    drop_member=None,
    format_version=2,
):
    """Two data files: p0 (docs 0-3, seq 1) and p1 (docs 4-7, seq 2);
    a positional delete (p0 pos 0) and an equality delete {1, 4} at
    configurable sequences."""
    p0 = _pq([0, 1, 2, 3], ["a", "b", "c", "d"])
    p1 = _pq([4, 5, 6, 7], ["e", "f", "g", "h"])
    pos = parquet_write(
        {"file_path": ["data/p0.parquet"], "pos": [0]},
        types={"file_path": "BYTE_ARRAY", "pos": "INT64"},
    )
    eq = parquet_write({"doc_id": [1, 4]}, types={"doc_id": "INT64"})
    m1 = avro_build(MANIFEST_SCHEMA, [_entry("data/p0.parquet", p0, 0, 4)])
    m2 = avro_build(
        MANIFEST_SCHEMA,
        [_entry("data/p1.parquet", p1, 0, 4, seq=p1_entry_seq, status=p1_status)],
    )
    m3 = avro_build(
        MANIFEST_SCHEMA,
        [
            _entry("data/pos.parquet", pos, 1, 1, seq=pos_seq),
            _entry("data/eq.parquet", eq, 2, 2, eq_ids=[1], seq=eq_seq),
        ],
    )
    snap1 = avro_build(MANIFEST_LIST_SCHEMA, [_mf("metadata/m1.avro", m1, 0, 1)])
    snap2 = avro_build(
        MANIFEST_LIST_SCHEMA,
        [
            _mf("metadata/m1.avro", m1, 0, 1),
            _mf(
                "metadata/m2.avro",
                m2,
                0,
                2,
            )
            if not tamper_manifest_length
            else {**_mf("metadata/m2.avro", m2, 0, 2), "manifest_length": 1},
            _mf("metadata/m3.avro", m3, 1, 2),
        ],
    )
    meta = {
        "format-version": format_version,
        "table-uuid": "00000000-0000-0000-0000-000000000000",
        "location": "tbl",
        "last-sequence-number": 2,
        "current-snapshot-id": 2,
        "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": SCHEMA_FIELDS}],
        "snapshots": [
            {
                "snapshot-id": 1,
                "sequence-number": 1,
                "timestamp-ms": 0,
                "manifest-list": "metadata/snap-1.avro",
                "summary": {"operation": "append"},
            },
            {
                "snapshot-id": 2,
                "sequence-number": 2,
                "parent-snapshot-id": 1,
                "timestamp-ms": 1,
                "manifest-list": "metadata/snap-2.avro",
                "summary": {"operation": "overwrite"},
            },
        ],
    }
    members = [
        ("metadata/v2.metadata.json", json.dumps(meta).encode()),
        ("metadata/snap-1.avro", snap1),
        ("metadata/snap-2.avro", snap2),
        ("metadata/m1.avro", m1),
        ("metadata/m2.avro", m2),
        ("metadata/m3.avro", m3),
        ("data/pos.parquet", pos),
        ("data/eq.parquet", eq),
        ("data/p0.parquet", p0),
        ("data/p1.parquet", p1),
    ]
    if drop_member:
        members = [m for m in members if m[0] != drop_member]
    return tar_build(members)


def _ids(rows):
    return sorted(r["doc_id"] for _, r in rows)


def test_current_snapshot_applies_both_delete_shapes():
    rows = iceberg_snapshot_rows(_table(), ["doc_id", "text"])
    # pos-delete kills doc 0 (p0 pos 0, seq 2 >= 1); eq-delete kills
    # doc 1 (p0, seq 2 > 1) but NOT doc 4 (p1 seq 2, not strictly less).
    assert _ids(rows) == [2, 3, 4, 5, 6, 7]
    seqs = {r["doc_id"]: seq for seq, r in rows}
    assert seqs[2] == 1 and seqs[4] == 2


def test_equality_delete_strict_inequality_boundary():
    # Raising the eq-delete's sequence to 3 makes it strictly greater
    # than p1's 2, so doc 4 now dies too.
    rows = iceberg_snapshot_rows(_table(eq_seq=3), ["doc_id"])
    assert _ids(rows) == [2, 3, 5, 6, 7]


def test_position_delete_applies_at_equal_sequence():
    # pos-delete at seq 1 == p0's seq 1: >= means it still applies.
    rows = iceberg_snapshot_rows(_table(pos_seq=1), ["doc_id"])
    assert 0 not in _ids(rows)


def test_sequence_inheritance_null_entry_takes_list_number():
    # p1's entry carries null sequence_number; it must inherit 2 from
    # the manifest-list row (eq-delete at seq 2 then spares it).
    rows = iceberg_snapshot_rows(_table(p1_entry_seq=None), ["doc_id"])
    assert 4 in _ids(rows)
    # An EXPLICIT entry seq of 1 makes the same eq-delete apply.
    rows = iceberg_snapshot_rows(_table(p1_entry_seq=1), ["doc_id"])
    assert 4 not in _ids(rows)


def test_deleted_status_entries_drop_out():
    rows = iceberg_snapshot_rows(_table(p1_status=2), ["doc_id"])
    assert _ids(rows) == [2, 3]


def test_time_travel_reads_pre_delete_state():
    rows = iceberg_snapshot_rows(_table(), ["doc_id"], snapshot_id=1)
    assert _ids(rows) == [0, 1, 2, 3]
    assert all(seq == 1 for seq, _ in rows)


def test_plan_is_metadata_only():
    fields, data, deletes = iceberg_plan_snapshot(_table())
    assert fields == {1: "doc_id", 2: "text"}
    assert {d["path"] for d in data} == {"data/p0.parquet", "data/p1.parquet"}
    assert {d["content"] for d in deletes} == {1, 2}


def test_unknown_snapshot_is_typed():
    with pytest.raises(ValueError, match="snapshot 9"):
        iceberg_snapshot_rows(_table(), ["doc_id"], snapshot_id=9)


def test_missing_member_is_typed():
    with pytest.raises(ValueError, match="missing member"):
        iceberg_snapshot_rows(_table(drop_member="data/p1.parquet"), ["doc_id"])


def test_manifest_length_mismatch_is_typed():
    with pytest.raises(ValueError, match="length"):
        iceberg_snapshot_rows(_table(tamper_manifest_length=True), ["doc_id"])


def test_format_version_3_is_boundary():
    # v1 reads since round 14 (see test_iceberg_transforms.py); v3
    # (deletion vectors et al.) stays typed
    with pytest.raises(NotImplementedError, match="format-version"):
        iceberg_snapshot_rows(_table(format_version=3), ["doc_id"])


def test_v1_with_delete_manifests_is_corrupt():
    # a table CLAIMING v1 but carrying delete manifests is malformed:
    # sequence numbers / row-level deletes arrived with v2
    with pytest.raises(ValueError, match="v1 tables cannot carry delete"):
        iceberg_snapshot_rows(_table(format_version=1), ["doc_id"])


def test_multi_column_equality_delete_is_conjunctive():
    """Round 16 (VERDICT r15 #4 — the Flink CDC write shape): a
    2-column equality delete matches on the CONJUNCTION of both id
    columns. Row (2, 'zz') names doc 2's key but the WRONG text, so
    doc 2 must SURVIVE — a per-column (disjunctive) reading would
    wrongly kill it."""
    p0 = _pq([0, 1, 2], ["a", "b", "c"])
    eq = parquet_write(
        {"doc_id": [1, 2], "text": ["b", "zz"]},
        types={"doc_id": "INT64", "text": "BYTE_ARRAY"},
    )
    m1 = avro_build(
        MANIFEST_SCHEMA, [_entry("data/p0.parquet", p0, 0, 3, seq=1)]
    )
    m3 = avro_build(
        MANIFEST_SCHEMA,
        [_entry("data/eq.parquet", eq, 2, 2, eq_ids=[1, 2], seq=2)],
    )
    snap = avro_build(
        MANIFEST_LIST_SCHEMA,
        [_mf("metadata/m1.avro", m1, 0, 1), _mf("metadata/m3.avro", m3, 1, 2)],
    )
    meta = {
        "format-version": 2,
        "current-snapshot-id": 1,
        "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": SCHEMA_FIELDS}],
        "snapshots": [
            {
                "snapshot-id": 1,
                "sequence-number": 2,
                "timestamp-ms": 0,
                "manifest-list": "metadata/snap.avro",
                "summary": {"operation": "append"},
            }
        ],
    }
    payload = tar_build(
        [
            ("metadata/v2.metadata.json", json.dumps(meta).encode()),
            ("metadata/snap.avro", snap),
            ("metadata/m1.avro", m1),
            ("metadata/m3.avro", m3),
            ("data/eq.parquet", eq),
            ("data/p0.parquet", p0),
        ]
    )
    rows = iceberg_snapshot_rows(payload, ["doc_id", "text"])
    assert [(r["doc_id"], r["text"]) for _, r in rows] == [(0, "a"), (2, "c")]
    # an empty equality_ids list is malformed, not a fallback
    bad_m3 = avro_build(
        MANIFEST_SCHEMA,
        [_entry("data/eq.parquet", eq, 2, 2, eq_ids=[], seq=2)],
    )
    bad_snap = avro_build(
        MANIFEST_LIST_SCHEMA,
        [
            _mf("metadata/m1.avro", m1, 0, 1),
            _mf("metadata/m3.avro", bad_m3, 1, 2),
        ],
    )
    bad = tar_build(
        [
            ("metadata/v2.metadata.json", json.dumps(meta).encode()),
            ("metadata/snap.avro", bad_snap),
            ("metadata/m1.avro", m1),
            ("metadata/m3.avro", bad_m3),
            ("data/eq.parquet", eq),
            ("data/p0.parquet", p0),
        ]
    )
    with pytest.raises(ValueError, match="equality_ids"):
        iceberg_snapshot_rows(bad, ["doc_id"])


# ---------------------------------------------------------------------------
# Partition pruning (round 13 s3)
# ---------------------------------------------------------------------------

from yark_spark.operators.iceberg import (  # noqa: E402
    PARTITIONED_MANIFEST_LIST_SCHEMA,
    PARTITIONED_MANIFEST_SCHEMA,
    iceberg_partition_scan,
    partition_bound,
)


def _ptable(*, summary_bounds=((0, 1), (2, 3))):
    files = []
    for k in range(8):
        blob = _pq([k * 8 + j for j in range(8)], [f"t{k}-{j}" for j in range(8)])
        files.append((f"data/f{k}.parquet", k // 2, blob))

    def _entry(path, part, blob):
        return {
            "status": 1,
            "snapshot_id": None,
            "sequence_number": 1,
            "file_sequence_number": 1,
            "data_file": {
                "content": 0,
                "file_path": path,
                "file_format": "PARQUET",
                "partition": {"part": part},
                "record_count": 8,
                "file_size_in_bytes": len(blob),
            },
        }

    mA = avro_build(PARTITIONED_MANIFEST_SCHEMA, [_entry(*f) for f in files[:4]])
    mB = avro_build(PARTITIONED_MANIFEST_SCHEMA, [_entry(*f) for f in files[4:]])

    def _mfp(path, blob, bounds):
        return {
            "manifest_path": path,
            "manifest_length": len(blob),
            "partition_spec_id": 0,
            "content": 0,
            "sequence_number": 1,
            "min_sequence_number": 1,
            "added_snapshot_id": 1,
            "added_files_count": 4,
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "partitions": None
            if bounds is None
            else [
                {
                    "contains_null": False,
                    "lower_bound": partition_bound(bounds[0]),
                    "upper_bound": partition_bound(bounds[1]),
                }
            ],
        }

    snap = avro_build(
        PARTITIONED_MANIFEST_LIST_SCHEMA,
        [
            _mfp("metadata/mA.avro", mA, summary_bounds[0]),
            _mfp("metadata/mB.avro", mB, summary_bounds[1]),
        ],
    )
    meta = {
        "format-version": 2,
        "current-snapshot-id": 1,
        "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": SCHEMA_FIELDS}],
        "snapshots": [
            {
                "snapshot-id": 1,
                "sequence-number": 1,
                "timestamp-ms": 0,
                "manifest-list": "metadata/snap.avro",
                "summary": {"operation": "append"},
            }
        ],
    }
    return tar_build(
        [
            ("metadata/v2.metadata.json", json.dumps(meta).encode()),
            ("metadata/snap.avro", snap),
            ("metadata/mA.avro", mA),
            ("metadata/mB.avro", mB),
        ]
        + [(p, b) for p, _pt, b in files]
    )


def test_partition_scan_two_level_prune():
    rows, cnt = iceberg_partition_scan(_ptable(), ["doc_id"], 2)
    assert sorted(r["doc_id"] for r in rows) == list(range(32, 48))
    assert cnt == {
        "manifests_total": 2,
        "manifests_skipped": 1,
        "files_skipped": 2,
        "files_scanned": 2,
    }


def test_partition_scan_missing_summaries_opens_manifest():
    # null summaries → manifest must open (superset guarantee), file
    # level still prunes
    rows, cnt = iceberg_partition_scan(
        _ptable(summary_bounds=(None, None)), ["doc_id"], 2
    )
    assert sorted(r["doc_id"] for r in rows) == list(range(32, 48))
    assert cnt["manifests_skipped"] == 0 and cnt["files_skipped"] == 6


def test_partition_scan_empty_partition():
    rows, cnt = iceberg_partition_scan(_ptable(), ["doc_id"], 9)
    assert rows == [] and cnt["manifests_skipped"] == 2


def test_replace_operation_resolves():
    # compaction commits carry operation "replace" — same resolution
    blob = _table(format_version=2)
    import json as _json

    from yark_spark.operators.containers import tar_build, tar_members

    members = dict(tar_members(blob))
    meta = _json.loads(members["metadata/v2.metadata.json"])
    meta["snapshots"][1]["summary"]["operation"] = "replace"
    members["metadata/v2.metadata.json"] = _json.dumps(meta).encode()
    rows = iceberg_snapshot_rows(tar_build(list(members.items())), ["doc_id"])
    assert _ids(rows) == [2, 3, 4, 5, 6, 7]
    meta["snapshots"][1]["summary"]["operation"] = "expire-snapshots"
    members["metadata/v2.metadata.json"] = _json.dumps(meta).encode()
    with pytest.raises(NotImplementedError, match="operation"):
        iceberg_snapshot_rows(tar_build(list(members.items())), ["doc_id"])


def test_manifest_schema_evolution_v1_era_subset():
    """Round 16 (VERDICT r15 #8): a FORMAT-VERSION 2 table whose
    manifest files were written under a v1-era SUBSET schema (no
    sequence numbers, no content, no equality_ids) resolves through
    Avro schema resolution against the reader model — missing entry
    sequence numbers inherit, missing list sequence numbers default 0,
    content defaults to data. A writer-only EXTRA field (a future
    writer) is decoded and discarded per the spec."""
    from yark_spark.operators.iceberg import V1_MANIFEST_LIST_SCHEMA

    p0 = _pq([0, 1], ["a", "b"])
    # v1-era subset writer schema for entries
    old_entry_schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": "long"},
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "data_file",
                    "fields": [
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                        # a field the CURRENT reader model does not
                        # know: decoded and discarded
                        {"name": "writer_only_stat", "type": "long"},
                    ],
                },
            },
        ],
    }
    m1 = avro_build(
        old_entry_schema,
        [
            {
                "status": 1,
                "snapshot_id": 1,
                "data_file": {
                    "file_path": "data/p0.parquet",
                    "file_format": "PARQUET",
                    "record_count": 2,
                    "file_size_in_bytes": len(p0),
                    "writer_only_stat": 999,
                },
            }
        ],
    )
    snap = avro_build(
        V1_MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": "metadata/m1.avro",
                "manifest_length": len(m1),
                "partition_spec_id": 0,
                "added_snapshot_id": 1,
                "added_files_count": 1,
                "existing_files_count": 0,
                "deleted_files_count": 0,
            }
        ],
    )
    meta = {
        "format-version": 2,
        "current-snapshot-id": 1,
        "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": SCHEMA_FIELDS}],
        "snapshots": [
            {
                "snapshot-id": 1,
                "sequence-number": 1,
                "timestamp-ms": 0,
                "manifest-list": "metadata/snap.avro",
                "summary": {"operation": "append"},
            }
        ],
    }
    payload = tar_build(
        [
            ("metadata/v2.metadata.json", json.dumps(meta).encode()),
            ("metadata/snap.avro", snap),
            ("metadata/m1.avro", m1),
            ("data/p0.parquet", p0),
        ]
    )
    rows = iceberg_snapshot_rows(payload, ["doc_id", "text"])
    assert [(r["doc_id"], r["text"]) for _, r in rows] == [(0, "a"), (1, "b")]
    # all entries planned at the inherited/default sequence 0
    _fields, data_files, delete_files = iceberg_plan_snapshot(payload)
    assert [d["seq"] for d in data_files] == [0]
    assert [d["content"] for d in data_files] == [0]
    assert delete_files == []


def test_incremental_append_scan():
    """Round 16 (Delta CDF's Iceberg twin): files added by snapshots
    in (from, to], oldest first, via the parent chain; reused
    manifests contribute nothing; overwrite snapshots in range and
    non-ancestor bounds are typed."""
    from yark_spark.operators.iceberg import (
        iceberg_commit,
        iceberg_incremental_files,
        iceberg_table_create,
    )

    fields = [{"id": 1, "name": "doc_id", "required": True, "type": "long"}]

    def pq(ids):
        return parquet_write({"doc_id": list(ids)}, types={"doc_id": "INT64"})

    m = iceberg_table_create(fields)
    m, s1 = iceberg_commit(m, data_files=[("data/p0.parquet", pq([0, 1]), 2)])
    m, s2 = iceberg_commit(m, data_files=[("data/p1.parquet", pq([2]), 1)])
    m, s3 = iceberg_commit(m, data_files=[("data/p2.parquet", pq([3]), 1)])
    tar = tar_build(sorted(m.items()))
    inc = iceberg_incremental_files(tar, s1)
    assert [(sid, f["path"]) for sid, f in inc] == [
        (s2, "data/p1.parquet"), (s3, "data/p2.parquet"),
    ]
    assert [f["path"] for _s, f in iceberg_incremental_files(tar, s1, s2)] == [
        "data/p1.parquet"
    ]
    assert iceberg_incremental_files(tar, s3) == []
    with pytest.raises(ValueError, match="not an ancestor"):
        iceberg_incremental_files(tar, s3, s1)
    with pytest.raises(ValueError, match="not in metadata"):
        iceberg_incremental_files(tar, 99)
    # an overwrite/delete snapshot in range cannot be appended-scanned
    m2, s4 = iceberg_commit(
        m,
        delete_files=[{
            "path": "data/eq.parquet",
            "blob": pq([2]),
            "content": 2,
            "record_count": 1,
            "equality_ids": [1],
        }],
        operation="overwrite",
    )
    tar2 = tar_build(sorted(m2.items()))
    with pytest.raises(NotImplementedError, match="overwrite"):
        iceberg_incremental_files(tar2, s1)
