"""Round 14: Iceberg partition-spec transforms (spec Appendix B),
format-version 1 tables, and the murmur3_x86_32 bucket hash — pinned
three ways: spec Appendix-B vectors, canonical murmur3 reference
vectors, and the Spark Column-arithmetic twin."""

from __future__ import annotations

import json

import pytest

from yark_spark.operators.avro_ocf import avro_build
from yark_spark.operators.containers import tar_build
from yark_spark.operators.iceberg import (
    PARTITIONED_MANIFEST_LIST_SCHEMA,
    V1_MANIFEST_LIST_SCHEMA,
    V1_MANIFEST_SCHEMA,
    iceberg_bucket,
    iceberg_partition_scan,
    iceberg_snapshot_rows,
    iceberg_transform,
    murmur3_x86_32,
    partition_bound,
    transform_result_width,
)
from yark_spark.operators.parquet_write import parquet_write

_DAY = 86_400_000_000
_HOUR = 3_600_000_000


# ---------------------------------------------------------------------------
# Hash + transform vectors
# ---------------------------------------------------------------------------


def test_murmur3_x86_32_reference_vectors():
    # canonical vectors for Austin Appleby's public-domain reference
    vecs = {
        b"": 0x00000000,
        b"a": 0x3C2569B2,
        b"abc": 0xB3DD93FA,
        b"hello": 0x248BFA47,
        b"Hello, world!": 0xC0363E43,
        b"The quick brown fox jumps over the lazy dog": 0x2E4FF723,
    }
    for data, want in vecs.items():
        assert murmur3_x86_32(data) & 0xFFFFFFFF == want, data


def test_iceberg_spec_appendix_b_hash_vectors():
    # the spec's own bucket-hash examples: int/long 34, "iceberg", bytes
    assert murmur3_x86_32((34).to_bytes(8, "little", signed=True)) == 2017239379
    assert murmur3_x86_32(b"iceberg") == 1210000089
    assert murmur3_x86_32(bytes([0, 1, 2, 3])) == -188683207


def test_bucket_int_long_agree():
    # spec: int and long hash identically (shared 8-byte LE form)
    for v in (0, 1, 34, -7, 2**40 + 3):
        assert iceberg_bucket(v, 16, "int" if -(2**31) <= v < 2**31 else "long") \
            == iceberg_bucket(v, 16, "long")


def test_bucket_string_and_binary():
    assert iceberg_bucket("iceberg", 16, "string") == (1210000089 & 0x7FFFFFFF) % 16
    assert iceberg_bucket(b"\x00\x01\x02\x03", 7, "binary") == (
        (-188683207 & 0x7FFFFFFF) % 7
    )


def test_truncate_semantics():
    assert iceberg_transform("truncate[10]", 7, "long") == 0
    assert iceberg_transform("truncate[10]", -1, "long") == -10  # floors
    assert iceberg_transform("truncate[16]", 47, "long") == 32
    assert iceberg_transform("truncate[3]", "iceberg", "string") == "ice"
    with pytest.raises(ValueError, match="width"):
        iceberg_transform("truncate[0]", 5, "long")


def test_temporal_transforms():
    ts = 17486 * _DAY + 22 * _HOUR  # 2017-11-16T22:xx
    assert iceberg_transform("day", ts, "timestamp") == 17486
    assert iceberg_transform("hour", ts, "timestamp") == 17486 * 24 + 22
    assert iceberg_transform("year", ts, "timestamp") == 47
    assert iceberg_transform("month", ts, "timestamp") == 47 * 12 + 10
    assert iceberg_transform("day", 17486, "date") == 17486
    assert iceberg_transform("year", 17486, "date") == 47
    # pre-epoch floors toward -inf (Java floorDiv semantics)
    assert iceberg_transform("day", -1, "timestamp") == -1
    assert iceberg_transform("hour", -1, "timestamp") == -1
    with pytest.raises(ValueError, match="hour"):
        iceberg_transform("hour", 17486, "date")


def test_transform_edges():
    assert iceberg_transform("identity", "x", "string") == "x"
    assert iceberg_transform("void", 123, "long") is None
    assert iceberg_transform("identity", None, "long") is None
    with pytest.raises(NotImplementedError, match="transform"):
        iceberg_transform("zorder[2]", 1, "long")


def test_result_widths():
    assert transform_result_width("day") == 4
    assert transform_result_width("hour") == 4
    assert transform_result_width("year") == 4
    assert transform_result_width("month") == 4
    assert transform_result_width("bucket[8]") == 4
    assert transform_result_width("truncate[16]", "long") == 8
    assert transform_result_width("identity", "int") == 4
    assert transform_result_width("identity", "long") == 8


# ---------------------------------------------------------------------------
# bucket[N]-partitioned table: end-to-end prune vs brute force
# ---------------------------------------------------------------------------


def _bucket_table(n_buckets: int = 4):
    """16 docs partitioned by bucket[n](doc_id): one data file per
    non-empty bucket, one manifest per bucket-pair with real bound
    bytes (4-byte ints)."""
    ids = list(range(100, 116))
    by_bucket: dict[int, list[int]] = {}
    for d in ids:
        by_bucket.setdefault(iceberg_bucket(d, n_buckets), []).append(d)

    m_schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"]},
            {"name": "sequence_number", "type": ["null", "long"]},
            {"name": "file_sequence_number", "type": ["null", "long"]},
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "data_file",
                    "fields": [
                        {"name": "content", "type": "int"},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {
                            "name": "partition",
                            "type": {
                                "type": "record",
                                "name": "r102",
                                "fields": [{"name": "id_bucket", "type": "long"}],
                            },
                        },
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                    ],
                },
            },
        ],
    }

    files, entries = [], []
    for b in sorted(by_bucket):
        docs = by_bucket[b]
        blob = parquet_write(
            {"doc_id": docs, "text": [f"t{d}" for d in docs]},
            types={"doc_id": "INT64", "text": "BYTE_ARRAY"},
        )
        path = f"data/id_bucket={b}/f.parquet"
        files.append((path, blob))
        entries.append(
            {
                "status": 1,
                "snapshot_id": None,
                "sequence_number": 1,
                "file_sequence_number": 1,
                "data_file": {
                    "content": 0,
                    "file_path": path,
                    "file_format": "PARQUET",
                    "partition": {"id_bucket": b},
                    "record_count": len(docs),
                    "file_size_in_bytes": len(blob),
                },
            }
        )
    half = len(entries) // 2 or 1
    mA = avro_build(m_schema, entries[:half], codec="deflate")
    mB = avro_build(m_schema, entries[half:], codec="deflate")

    def _bounds(es):
        bs = [e["data_file"]["partition"]["id_bucket"] for e in es]
        return min(bs), max(bs)

    def _mf(path, blob, es):
        lo, hi = _bounds(es)
        return {
            "manifest_path": path,
            "manifest_length": len(blob),
            "partition_spec_id": 0,
            "content": 0,
            "sequence_number": 1,
            "min_sequence_number": 1,
            "added_snapshot_id": 1,
            "added_files_count": len(es),
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "partitions": [
                {
                    "contains_null": False,
                    "lower_bound": partition_bound(lo, 4),
                    "upper_bound": partition_bound(hi, 4),
                }
            ],
        }

    snap = avro_build(
        PARTITIONED_MANIFEST_LIST_SCHEMA,
        [_mf("metadata/mA.avro", mA, entries[:half]),
         _mf("metadata/mB.avro", mB, entries[half:])],
        codec="deflate",
    )
    meta = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0003-000000000000",
        "location": "btbl",
        "last-sequence-number": 1,
        "current-snapshot-id": 1,
        "current-schema-id": 0,
        "default-spec-id": 0,
        "schemas": [
            {
                "schema-id": 0,
                "type": "struct",
                "fields": [
                    {"id": 1, "name": "doc_id", "required": True, "type": "long"},
                    {"id": 2, "name": "text", "required": True, "type": "string"},
                ],
            }
        ],
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {
                        "name": "id_bucket",
                        "transform": f"bucket[{n_buckets}]",
                        "source-id": 1,
                        "field-id": 1000,
                    }
                ],
            }
        ],
        "snapshots": [
            {
                "snapshot-id": 1,
                "sequence-number": 1,
                "timestamp-ms": 0,
                "manifest-list": "metadata/snap-1.avro",
                "summary": {"operation": "append"},
            }
        ],
    }
    members = [
        ("metadata/v2.metadata.json", json.dumps(meta).encode()),
        ("metadata/snap-1.avro", snap),
        ("metadata/mA.avro", mA),
        ("metadata/mB.avro", mB),
    ] + files
    return tar_build(members), ids


def test_bucket_partition_scan_matches_brute_force():
    tar, ids = _bucket_table(4)
    for probe in ids:
        want = sorted(
            d for d in ids if iceberg_bucket(d, 4) == iceberg_bucket(probe, 4)
        )
        rows, cnt = iceberg_partition_scan(tar, ["doc_id"], source_value=probe)
        assert sorted(r["doc_id"] for r in rows) == want
        assert cnt["files_scanned"] >= 1


def test_bound_width_mismatch_is_typed():
    # bucket results are 4-byte ints on the wire; 8-byte bounds are
    # a malformed summary, not a silent scan
    tar, ids = _bucket_table(4)
    import io
    import tarfile

    buf = io.BytesIO(tar)
    with tarfile.open(fileobj=buf) as tf:
        members = {m.name: tf.extractfile(m).read() for m in tf if m.isfile()}
    meta = json.loads(members["metadata/v2.metadata.json"])
    meta["partition-specs"][0]["fields"][0]["transform"] = "truncate[4]"
    members["metadata/v2.metadata.json"] = json.dumps(meta).encode()
    tampered = tar_build(list(members.items()))
    with pytest.raises(ValueError, match="bound width"):
        iceberg_partition_scan(tampered, ["doc_id"], source_value=ids[0])


# ---------------------------------------------------------------------------
# format-version 1 tables
# ---------------------------------------------------------------------------


def _v1_table():
    p0 = parquet_write(
        {"doc_id": [0, 1, 2, 3], "text": ["a", "b", "c", "d"]},
        types={"doc_id": "INT64", "text": "BYTE_ARRAY"},
    )
    p1 = parquet_write(
        {"doc_id": [4, 5], "text": ["e", "f"]},
        types={"doc_id": "INT64", "text": "BYTE_ARRAY"},
    )

    def _e(path, blob, n, status=1):
        return {
            "status": status,
            "snapshot_id": 1,
            "data_file": {
                "file_path": path,
                "file_format": "PARQUET",
                "record_count": n,
                "file_size_in_bytes": len(blob),
            },
        }

    m1 = avro_build(
        V1_MANIFEST_SCHEMA,
        [_e("data/p0.parquet", p0, 4),
         _e("data/p1.parquet", p1, 2),
         _e("data/gone.parquet", p1, 2, status=2)],  # DELETED drops out
        codec="deflate",
    )
    snap = avro_build(
        V1_MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": "metadata/m1.avro",
                "manifest_length": len(m1),
                "partition_spec_id": 0,
                "added_snapshot_id": 1,
                "added_files_count": 3,
                "existing_files_count": 0,
                "deleted_files_count": 0,
            }
        ],
        codec="deflate",
    )
    meta = {
        "format-version": 1,
        "table-uuid": "00000000-0000-0000-0004-000000000000",
        "location": "v1tbl",
        "current-snapshot-id": 1,
        "current-schema-id": 0,
        "schemas": [
            {
                "schema-id": 0,
                "type": "struct",
                "fields": [
                    {"id": 1, "name": "doc_id", "required": True, "type": "long"},
                    {"id": 2, "name": "text", "required": True, "type": "string"},
                ],
            }
        ],
        "snapshots": [
            {
                "snapshot-id": 1,
                "timestamp-ms": 0,
                "manifest-list": "metadata/snap-1.avro",
                "summary": {"operation": "append"},
            }
        ],
    }
    return tar_build(
        [
            ("metadata/v1.metadata.json", json.dumps(meta).encode()),
            ("metadata/snap-1.avro", snap),
            ("metadata/m1.avro", m1),
            ("data/p0.parquet", p0),
            ("data/p1.parquet", p1),
        ]
    )


def test_v1_table_reads_without_sequence_numbers():
    rows = iceberg_snapshot_rows(_v1_table(), ["doc_id", "text"])
    assert sorted(r["doc_id"] for _, r in rows) == [0, 1, 2, 3, 4, 5]
    # v1 entries all plan at sequence 0
    assert {seq for seq, _ in rows} == {0}


# ---------------------------------------------------------------------------
# Spark Column-arithmetic murmur twin ≡ from-scratch hash
# ---------------------------------------------------------------------------


def test_column_murmur_twin_matches(spark):
    from yark_spark.queries.round14 import with_murmur3_long

    vals = [0, 1, 34, 255, 65535, 65536, 2**31 - 1, 2**31, 2**32 - 1,
            2**32, 2**40 + 12345, 2**62 + 7, 448, 90061]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r["v"]: r["h"]
        for r in with_murmur3_long(df, "v", "h").select("v", "h").collect()
    }
    for v in vals:
        want = murmur3_x86_32(v.to_bytes(8, "little", signed=True)) & 0xFFFFFFFF
        assert got[v] == want, v


# ---------------------------------------------------------------------------
# Multi-field partition specs (round 14 second pass)
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000


def _multi_field_table():
    """day(ts) distinguishes MANIFESTS only (groups 0,1 → day 100;
    2,3 → day 200); truncate[16](doc_id) distinguishes FILES inside a
    manifest — so each prune level exercises a different field."""
    groups = {g: list(range(g * 16, g * 16 + 16)) for g in range(4)}
    day_of = {0: 100, 1: 100, 2: 200, 3: 200}
    trunc_of = {g: g * 16 for g in range(4)}

    m_schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"]},
            {"name": "sequence_number", "type": ["null", "long"]},
            {"name": "file_sequence_number", "type": ["null", "long"]},
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "data_file",
                    "fields": [
                        {"name": "content", "type": "int"},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {
                            "name": "partition",
                            "type": {
                                "type": "record",
                                "name": "r102",
                                "fields": [
                                    {"name": "ts_day", "type": "long"},
                                    {"name": "doc_trunc", "type": "long"},
                                ],
                            },
                        },
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                    ],
                },
            },
        ],
    }

    files, entries = [], {}
    for g, ids in groups.items():
        blob = parquet_write(
            {"doc_id": ids, "text": [f"t{d}" for d in ids]},
            types={"doc_id": "INT64", "text": "BYTE_ARRAY"},
        )
        path = f"data/g{g}.parquet"
        files.append((path, blob))
        entries[g] = {
            "status": 1,
            "snapshot_id": None,
            "sequence_number": 1,
            "file_sequence_number": 1,
            "data_file": {
                "content": 0,
                "file_path": path,
                "file_format": "PARQUET",
                "partition": {"ts_day": day_of[g], "doc_trunc": trunc_of[g]},
                "record_count": 16,
                "file_size_in_bytes": len(blob),
            },
        }
    mA = avro_build(m_schema, [entries[0], entries[1]], codec="deflate")
    mB = avro_build(m_schema, [entries[2], entries[3]], codec="deflate")

    def _mf(path, blob, gs):
        return {
            "manifest_path": path,
            "manifest_length": len(blob),
            "partition_spec_id": 0,
            "content": 0,
            "sequence_number": 1,
            "min_sequence_number": 1,
            "added_snapshot_id": 1,
            "added_files_count": len(gs),
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "partitions": [
                {
                    "contains_null": False,
                    "lower_bound": partition_bound(min(day_of[g] for g in gs), 4),
                    "upper_bound": partition_bound(max(day_of[g] for g in gs), 4),
                },
                {
                    "contains_null": False,
                    "lower_bound": partition_bound(min(trunc_of[g] for g in gs), 8),
                    "upper_bound": partition_bound(max(trunc_of[g] for g in gs), 8),
                },
            ],
        }

    snap = avro_build(
        PARTITIONED_MANIFEST_LIST_SCHEMA,
        [_mf("metadata/mA.avro", mA, [0, 1]), _mf("metadata/mB.avro", mB, [2, 3])],
        codec="deflate",
    )
    meta = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0005-000000000000",
        "location": "mtbl",
        "last-sequence-number": 1,
        "current-snapshot-id": 1,
        "current-schema-id": 0,
        "default-spec-id": 0,
        "schemas": [
            {
                "schema-id": 0,
                "type": "struct",
                "fields": [
                    {"id": 1, "name": "doc_id", "required": True, "type": "long"},
                    {"id": 2, "name": "text", "required": True, "type": "string"},
                    {"id": 3, "name": "ts", "required": True, "type": "timestamp"},
                ],
            }
        ],
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {"name": "ts_day", "transform": "day", "source-id": 3,
                     "field-id": 1000},
                    {"name": "doc_trunc", "transform": "truncate[16]",
                     "source-id": 1, "field-id": 1001},
                ],
            }
        ],
        "snapshots": [
            {
                "snapshot-id": 1,
                "sequence-number": 1,
                "timestamp-ms": 0,
                "manifest-list": "metadata/snap-1.avro",
                "summary": {"operation": "append"},
            }
        ],
    }
    members = [
        ("metadata/v2.metadata.json", json.dumps(meta).encode()),
        ("metadata/snap-1.avro", snap),
        ("metadata/mA.avro", mA),
        ("metadata/mB.avro", mB),
    ] + files
    return tar_build(members)


def test_multi_field_partition_prune():
    tar = _multi_field_table()
    # probe: mid-day instant inside day 200, doc source 40 → trunc 32
    rows, cnt = iceberg_partition_scan(
        tar,
        ["doc_id"],
        source_values={"ts_day": 200 * _DAY_US + 7 * 3_600_000_000,
                       "doc_trunc": 40},
    )
    assert sorted(r["doc_id"] for r in rows) == list(range(32, 48))
    # manifest A skipped by the DAY summary, file g3 by the TRUNC struct
    assert cnt == {
        "manifests_total": 2,
        "manifests_skipped": 1,
        "files_skipped": 1,
        "files_scanned": 1,
    }
    # missing probe for one field is typed
    with pytest.raises(ValueError, match="no probe"):
        iceberg_partition_scan(tar, ["doc_id"], source_values={"ts_day": 0})
    # single-value probe against a multi-field spec is typed
    with pytest.raises(ValueError, match="source_values"):
        iceberg_partition_scan(tar, ["doc_id"], source_value=40)


def test_void_spec_field_matches_everything():
    """Round 15: spec evolution replaces dropped partition fields with
    ``void`` transforms — such a field constrains nothing and the
    conjunction prunes on the remaining fields only."""
    from yark_spark.operators.containers import tar_build
    from yark_spark.operators.iceberg import (
        iceberg_commit,
        iceberg_partition_scan,
        iceberg_table_create,
    )
    from yark_spark.operators.parquet_write import parquet_write

    fields = [
        {"id": 1, "name": "doc_id", "required": True, "type": "long"},
        {"id": 2, "name": "old_col", "required": False, "type": "long"},
    ]
    spec = [
        {"name": "p", "transform": "identity", "source-id": 1, "field-id": 1000},
        {"name": "dropped", "transform": "void", "source-id": 2,
         "field-id": 1001},
    ]
    m = iceberg_table_create(fields, partition_spec=spec)

    def pq(lo, hi):
        return parquet_write(
            {"doc_id": list(range(lo, hi))},
            types={"doc_id": "INT64"}, codec="SNAPPY",
        )

    m, _ = iceberg_commit(
        m,
        data_files=[
            ("data/a.parquet", pq(0, 8), 8, {"p": 0, "dropped": None}),
            ("data/b.parquet", pq(8, 16), 8, {"p": 8, "dropped": None}),
        ],
    )
    tar = tar_build(sorted(m.items()))
    rows, cnt = iceberg_partition_scan(
        tar, ["doc_id"], source_values={"p": 8}
    )
    assert sorted(r["doc_id"] for r in rows) == list(range(8, 16))
    assert cnt["files_scanned"] == 1 and cnt["files_skipped"] == 1
    # an all-void spec cannot select anything — typed
    import pytest as _pytest

    spec_all_void = [
        {"name": "dropped", "transform": "void", "source-id": 2,
         "field-id": 1001},
    ]
    m2 = iceberg_table_create(fields, partition_spec=spec_all_void)
    m2, _ = iceberg_commit(
        m2, data_files=[("data/a.parquet", pq(0, 4), 4, {"dropped": None})]
    )
    with _pytest.raises(ValueError, match="void"):
        iceberg_partition_scan(
            tar_build(sorted(m2.items())), ["doc_id"], source_values={}
        )
