"""File-level column-stats data skipping (round 17, VERDICT r16 #1):
Delta ``add.stats`` JSON pruning and Iceberg ``lower_bounds`` /
``upper_bounds`` pruning — files provably outside a conjunctive
predicate are never opened (the counters are the plan contract), files
WITHOUT stats always scan (pruning must never invent evidence), stats
survive every checkpoint form, and delete files are never pruned by
data bounds.

Reference parity note: the reference archiver (SupBlizard/yark) stores
payloads opaquely in SQLite; data skipping is driver-mandated
training-pipeline surface (SURVEY.md §2.8).
"""

from __future__ import annotations

import json

import pytest

from yark_spark.operators.containers import tar_build
from yark_spark.operators.deltalog import (
    delta_add_deletion_vectors,
    delta_checkpoint_table,
    delta_checkpoint_table_v2,
    delta_stats,
    delta_stats_scan,
)
from yark_spark.operators.iceberg import (
    iceberg_bounds_scan,
    iceberg_commit,
    iceberg_single_value,
    iceberg_single_value_decode,
    iceberg_table_create,
)
from yark_spark.operators.parquet_write import parquet_write


def _pq(ks, ss):
    return parquet_write(
        {"k": ks, "s": ss},
        types={"k": "INT64", "s": "BYTE_ARRAY"},
        codec="SNAPPY",
    )


_SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "s", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _delta_table(files, stats_for=None, extra_commits=()):
    """files = [(path, ks, ss)]; stats_for = set of paths that get
    stats (default: all)."""
    members = []
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "t",
                "format": {"provider": "parquet"},
                "schemaString": _SCHEMA_STRING,
                "partitionColumns": [],
                "configuration": {},
            }
        },
    ]
    for path, ks, ss in files:
        blob = _pq(ks, ss)
        members.append((path, blob))
        add = {
            "path": path,
            "size": len(blob),
            "dataChange": True,
            "partitionValues": {},
        }
        if stats_for is None or path in stats_for:
            add["stats"] = delta_stats({"k": ks, "s": ss})
        actions.append({"add": add})
    members.append(
        (
            "_delta_log/" + "0" * 20 + ".json",
            ("\n".join(json.dumps(a) for a in actions) + "\n").encode(),
        )
    )
    for i, commit_actions in enumerate(extra_commits, start=1):
        members.append(
            (
                f"_delta_log/{i:020d}.json",
                ("\n".join(json.dumps(a) for a in commit_actions) + "\n").encode(),
            )
        )
    return tar_build(sorted(members))


FILES = [
    ("p0.parquet", [0, 1, 2, 3], ["a", "b", "c", "d"]),
    ("p1.parquet", [10, 11, 12, 13], ["e", "f", "g", "h"]),
    ("p2.parquet", [20, 21, 22, 23], ["i", "j", "k", "l"]),
]


class TestDeltaStatsScan:
    def test_range_predicate_skips_provably_excluded_files(self):
        tar = _delta_table(FILES)
        rows, c = delta_stats_scan(
            tar, ["k", "s"], [("k", ">=", 10), ("k", "<", 20)]
        )
        assert [r["k"] for r in rows] == [10, 11, 12, 13]
        assert c == {"files_skipped": 2, "files_scanned": 1}

    def test_equality_predicate_on_strings(self):
        tar = _delta_table(FILES)
        rows, c = delta_stats_scan(tar, ["k"], [("s", "==", "j")])
        assert rows == [{"k": 21}]
        assert c == {"files_skipped": 2, "files_scanned": 1}

    def test_statless_file_always_scans(self):
        tar = _delta_table(FILES, stats_for={"p0.parquet", "p2.parquet"})
        rows, c = delta_stats_scan(tar, ["k"], [("k", ">=", 20)])
        # p1 has no stats: must scan (and its rows filter out exactly)
        assert [r["k"] for r in rows] == [20, 21, 22, 23]
        assert c == {"files_skipped": 1, "files_scanned": 2}

    def test_empty_predicate_scans_everything(self):
        tar = _delta_table(FILES)
        rows, c = delta_stats_scan(tar, ["k"], [])
        assert len(rows) == 12
        assert c == {"files_skipped": 0, "files_scanned": 3}

    def test_all_null_column_skips_comparisons_admits_is_null(self):
        files = [("p0.parquet", [None, None], ["a", "b"])]
        tar = _delta_table(files)
        _rows, c = delta_stats_scan(tar, ["s"], [("k", "==", 1)])
        assert c == {"files_skipped": 1, "files_scanned": 0}
        rows, c = delta_stats_scan(tar, ["s"], [("k", "is_null", None)])
        assert len(rows) == 2
        assert c == {"files_skipped": 0, "files_scanned": 1}
        _rows, c = delta_stats_scan(tar, ["s"], [("k", "not_null", None)])
        assert c == {"files_skipped": 1, "files_scanned": 0}

    def test_no_null_file_skips_is_null(self):
        tar = _delta_table(FILES[:1])
        _rows, c = delta_stats_scan(tar, ["k"], [("k", "is_null", None)])
        assert c == {"files_skipped": 1, "files_scanned": 0}

    def test_stats_survive_classic_and_v2_checkpoints(self):
        tar = _delta_table(FILES)
        for rewritten in (
            delta_checkpoint_table(tar),
            delta_checkpoint_table_v2(tar, manifest_format="json"),
            delta_checkpoint_table_v2(tar, manifest_format="parquet"),
        ):
            rows, c = delta_stats_scan(rewritten, ["k"], [("k", ">=", 20)])
            assert [r["k"] for r in rows] == [20, 21, 22, 23]
            assert c == {"files_skipped": 2, "files_scanned": 1}

    def test_stats_survive_dv_attach_and_dv_applies(self):
        tar = _delta_table(FILES)
        with_dv = delta_add_deletion_vectors(tar, {"p1.parquet": [1]})
        rows, c = delta_stats_scan(
            with_dv, ["k"], [("k", ">=", 10), ("k", "<", 20)]
        )
        assert [r["k"] for r in rows] == [10, 12, 13]  # row 1 (k=11) dead
        assert c == {"files_skipped": 2, "files_scanned": 1}

    def test_numrecords_mismatch_is_typed(self):
        blob = _pq([1, 2], ["a", "b"])
        bad_stats = json.dumps(
            {"numRecords": 5, "minValues": {"k": 1}, "maxValues": {"k": 2},
             "nullCount": {"k": 0}}
        )
        actions = [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": {"id": "t", "format": {"provider": "parquet"},
                          "schemaString": _SCHEMA_STRING,
                          "partitionColumns": [], "configuration": {}}},
            {"add": {"path": "p.parquet", "size": len(blob),
                     "dataChange": True, "partitionValues": {},
                     "stats": bad_stats}},
        ]
        tar = tar_build(sorted([
            ("p.parquet", blob),
            ("_delta_log/" + "0" * 20 + ".json",
             ("\n".join(json.dumps(a) for a in actions) + "\n").encode()),
        ]))
        with pytest.raises(ValueError, match="numRecords"):
            delta_stats_scan(tar, ["k"], [("k", ">=", 1)])

    def test_unknown_op_is_typed(self):
        tar = _delta_table(FILES[:1])
        with pytest.raises(ValueError, match="op"):
            delta_stats_scan(tar, ["k"], [("k", "!=", 1)])

    def test_pyarrow_written_file_prunes(self):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import io

        buf = io.BytesIO()
        pq.write_table(
            pa.table({"k": pa.array([30, 31], pa.int64()),
                      "s": pa.array(["m", "n"])}),
            buf,
        )
        blob = buf.getvalue()
        stats = delta_stats({"k": [30, 31], "s": ["m", "n"]})
        actions = [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": {"id": "t", "format": {"provider": "parquet"},
                          "schemaString": _SCHEMA_STRING,
                          "partitionColumns": [], "configuration": {}}},
            {"add": {"path": "pa.parquet", "size": len(blob),
                     "dataChange": True, "partitionValues": {},
                     "stats": stats}},
        ]
        own = _pq([0, 1], ["a", "b"])
        actions.append({"add": {"path": "own.parquet", "size": len(own),
                                "dataChange": True, "partitionValues": {},
                                "stats": delta_stats({"k": [0, 1],
                                                      "s": ["a", "b"]})}})
        tar = tar_build(sorted([
            ("pa.parquet", blob), ("own.parquet", own),
            ("_delta_log/" + "0" * 20 + ".json",
             ("\n".join(json.dumps(a) for a in actions) + "\n").encode()),
        ]))
        rows, c = delta_stats_scan(tar, ["k", "s"], [("k", ">=", 30)])
        assert [r["k"] for r in rows] == [30, 31]
        assert c == {"files_skipped": 1, "files_scanned": 1}


_FIELDS = [
    {"id": 1, "name": "k", "required": True, "type": "long"},
    {"id": 2, "name": "s", "required": True, "type": "string"},
]


def _stats(ks, ss):
    return {
        "value_counts": {1: len(ks), 2: len(ss)},
        "null_value_counts": {1: 0, 2: 0},
        "lower_bounds": {1: min(ks), 2: min(ss)},
        "upper_bounds": {1: max(ks), 2: max(ss)},
    }


def _iceberg_table(with_stats=True):
    m = iceberg_table_create(_FIELDS)
    groups = [
        ("data/p0.parquet", [0, 1, 2, 3], ["a", "b", "c", "d"]),
        ("data/p1.parquet", [10, 11, 12, 13], ["e", "f", "g", "h"]),
        ("data/p2.parquet", [20, 21, 22, 23], ["i", "j", "k", "l"]),
    ]
    stats_by_path = (
        {p: _stats(ks, ss) for p, ks, ss in groups} if with_stats else None
    )
    m, sid = iceberg_commit(
        m,
        data_files=[(p, _pq(ks, ss), len(ks)) for p, ks, ss in groups],
        stats_by_path=stats_by_path,
    )
    return m, sid


class TestIcebergBoundsScan:
    def test_range_predicate_skips_files(self):
        m, _sid = _iceberg_table()
        tar = tar_build(sorted(m.items()))
        rows, c = iceberg_bounds_scan(
            tar, ["k", "s"], [("k", ">=", 10), ("k", "<", 20)]
        )
        assert [r["k"] for r in rows] == [10, 11, 12, 13]
        assert c == {"files_skipped": 2, "files_scanned": 1}

    def test_string_bounds_prune(self):
        m, _sid = _iceberg_table()
        tar = tar_build(sorted(m.items()))
        rows, c = iceberg_bounds_scan(tar, ["k"], [("s", "==", "j")])
        assert rows == [{"k": 21}]
        assert c == {"files_skipped": 2, "files_scanned": 1}

    def test_statless_manifest_always_scans(self):
        m, _sid = _iceberg_table(with_stats=False)
        tar = tar_build(sorted(m.items()))
        rows, c = iceberg_bounds_scan(tar, ["k"], [("k", ">=", 20)])
        assert [r["k"] for r in rows] == [20, 21, 22, 23]
        assert c == {"files_skipped": 0, "files_scanned": 3}

    def test_delete_files_never_pruned(self):
        m, _sid = _iceberg_table()
        # equality delete (field id 1) for k=12 — the delete file's own
        # bounds must NOT be consulted against the data predicate
        del_blob = parquet_write(
            {"k": [12]}, types={"k": "INT64"}, codec="SNAPPY"
        )
        m, _s2 = iceberg_commit(
            m,
            delete_files=[{
                "path": "data/d0.parquet", "blob": del_blob, "content": 2,
                "record_count": 1, "equality_ids": [1],
            }],
        )
        tar = tar_build(sorted(m.items()))
        rows, c = iceberg_bounds_scan(
            tar, ["k"], [("k", ">=", 10), ("k", "<", 20)]
        )
        assert [r["k"] for r in rows] == [10, 11, 13]
        assert c == {"files_skipped": 2, "files_scanned": 1}

    def test_unknown_predicate_column_is_typed(self):
        m, _sid = _iceberg_table()
        tar = tar_build(sorted(m.items()))
        with pytest.raises(ValueError, match="predicate column"):
            iceberg_bounds_scan(tar, ["k"], [("zz", "==", 1)])

    def test_wrong_width_bound_is_typed(self):
        with pytest.raises(ValueError, match="8 bytes"):
            iceberg_single_value_decode(b"\x01\x02", "long")

    def test_single_value_roundtrip(self):
        for typ, v in [
            ("long", -7), ("int", 41), ("string", "héllo"),
            ("double", 2.5), ("boolean", True), ("date", 19000),
            ("timestamp", 1_500_000_000_000_000),
        ]:
            assert (
                iceberg_single_value_decode(iceberg_single_value(v, typ), typ)
                == v
            )

    def test_pyarrow_written_file_prunes(self):
        import io

        import pyarrow as pa
        import pyarrow.parquet as pq

        buf = io.BytesIO()
        pq.write_table(
            pa.table({"k": pa.array([30, 31], pa.int64()),
                      "s": pa.array(["m", "n"])}),
            buf,
        )
        blob = buf.getvalue()
        m = iceberg_table_create(_FIELDS)
        own = _pq([0, 1], ["a", "b"])
        m, _sid = iceberg_commit(
            m,
            data_files=[
                ("data/pa.parquet", blob, 2),
                ("data/own.parquet", own, 2),
            ],
            stats_by_path={
                "data/pa.parquet": _stats([30, 31], ["m", "n"]),
                "data/own.parquet": _stats([0, 1], ["a", "b"]),
            },
        )
        tar = tar_build(sorted(m.items()))
        rows, c = iceberg_bounds_scan(tar, ["k", "s"], [("k", ">=", 30)])
        assert [r["k"] for r in rows] == [30, 31]
        assert c == {"files_skipped": 1, "files_scanned": 1}

    def test_partitioned_commit_carries_stats(self):
        """Partition+stats composition (round 17): bounds ride beside
        the partition record and the partition scan prunes on BOTH."""
        from yark_spark.operators.iceberg import iceberg_partition_scan

        m = iceberg_table_create(
            _FIELDS,
            partition_spec=[{
                "name": "k", "transform": "identity",
                "source-id": 1, "field-id": 1000,
            }],
        )
        m, _sid = iceberg_commit(
            m,
            data_files=[
                ("data/p0.parquet", _pq([1, 2], ["a", "b"]), 2, {"k": 1}),
                ("data/p1.parquet", _pq([1, 3], ["c", "d"]), 2, {"k": 1}),
            ],
            stats_by_path={
                "data/p0.parquet": _stats([1, 2], ["a", "b"]),
                "data/p1.parquet": _stats([1, 3], ["c", "d"]),
            },
        )
        tar = tar_build(sorted(m.items()))
        rows, c = iceberg_partition_scan(
            tar, ["s"], source_values={"k": 1}, predicate=[("s", ">=", "c")]
        )
        assert sorted(r["s"] for r in rows) == ["c", "d"]
        assert c["files_skipped_stats"] == 1 and c["files_scanned"] == 1


class TestTimestampTimeTravel:
    """TIMESTAMP AS OF / as-of-timestamp (round 17, VERDICT r16 #5)."""

    def _delta(self):
        a, b = _pq([1, 2], ["a", "b"]), _pq([3, 4], ["c", "d"])
        actions0 = [
            {"commitInfo": {"timestamp": 1000}},
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": {"id": "t", "format": {"provider": "parquet"},
                          "schemaString": _SCHEMA_STRING,
                          "partitionColumns": [], "configuration": {}}},
            {"add": {"path": "a.parquet", "size": len(a),
                     "dataChange": True, "partitionValues": {}}},
        ]
        actions1 = [
            {"commitInfo": {"timestamp": 2000}},
            {"add": {"path": "b.parquet", "size": len(b),
                     "dataChange": True, "partitionValues": {}}},
        ]
        actions2 = [
            {"commitInfo": {"timestamp": 3000}},
            {"remove": {"path": "a.parquet", "dataChange": True}},
        ]
        members = [("a.parquet", a), ("b.parquet", b)]
        for v, acts in enumerate([actions0, actions1, actions2]):
            members.append((
                f"_delta_log/{v:020d}.json",
                ("\n".join(json.dumps(x) for x in acts) + "\n").encode(),
            ))
        return tar_build(sorted(members))

    def test_delta_resolution(self):
        from yark_spark.operators.deltalog import (
            delta_snapshot_rows,
            delta_version_at_timestamp,
        )

        tar = self._delta()
        assert delta_version_at_timestamp(tar, 1500) == 0
        assert delta_version_at_timestamp(tar, 2000) == 1
        assert delta_version_at_timestamp(tar, 99999) == 2
        rows = delta_snapshot_rows(tar, ["k"], timestamp=2500)
        assert sorted(r["k"] for _, r in rows) == [1, 2, 3, 4]
        rows = delta_snapshot_rows(tar, ["k"], timestamp=3000)
        assert sorted(r["k"] for _, r in rows) == [3, 4]
        with pytest.raises(ValueError, match="predates"):
            delta_version_at_timestamp(tar, 999)
        with pytest.raises(ValueError, match="not both"):
            delta_snapshot_rows(tar, ["k"], version=1, timestamp=2000)

    def test_delta_missing_commitinfo_is_typed(self):
        from yark_spark.operators.deltalog import delta_version_at_timestamp

        tar = _delta_table(FILES[:1])  # fixture commits carry no commitInfo
        with pytest.raises(NotImplementedError, match="commitInfo"):
            delta_version_at_timestamp(tar, 1000)

    def test_iceberg_resolution(self):
        from yark_spark.operators.iceberg import (
            iceberg_snapshot_at_timestamp,
            iceberg_snapshot_rows,
        )

        m = iceberg_table_create(_FIELDS)
        m, s1 = iceberg_commit(m, data_files=[("data/p0.parquet", _pq([1], ["a"]), 1)])
        m, s2 = iceberg_commit(m, data_files=[("data/p1.parquet", _pq([2], ["b"]), 1)])
        tar = tar_build(sorted(m.items()))
        # commit stamps timestamp-ms = sequence (deterministic clock)
        assert iceberg_snapshot_at_timestamp(tar, 1) == s1
        assert iceberg_snapshot_at_timestamp(tar, 99) == s2
        rows = iceberg_snapshot_rows(tar, ["k"], timestamp_ms=1)
        assert sorted(r["k"] for _, r in rows) == [1]
        with pytest.raises(ValueError, match="predates"):
            iceberg_snapshot_at_timestamp(tar, 0)
        with pytest.raises(ValueError, match="not both"):
            iceberg_snapshot_rows(tar, ["k"], snapshot_id=s1, timestamp_ms=1)


def test_type_widening_upcasts_narrow_files():
    """typeWidening (round 17): narrow-typed files upcast to the
    current schema — date-days become midnight micros, wide files
    never re-convert, and without the feature no conversion runs."""
    from yark_spark.operators.deltalog import delta_snapshot_rows

    p0 = parquet_write(
        {"doc_id": [1], "ts": [10000]},
        types={"doc_id": "INT32", "ts": "INT32"}, codec="SNAPPY",
    )
    p1 = parquet_write(
        {"doc_id": [2], "ts": [10001 * 86_400_000_000]},
        types={"doc_id": "INT64", "ts": "INT64"}, codec="SNAPPY",
    )
    wide = json.dumps({"type": "struct", "fields": [
        {"name": "doc_id", "type": "long", "nullable": True, "metadata": {}},
        {"name": "ts", "type": "timestampNtz", "nullable": True,
         "metadata": {}}]})
    commits = [
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": {"id": "t", "format": {"provider": "parquet"},
                          "schemaString": wide, "partitionColumns": [],
                          "configuration": {}}},
            {"add": {"path": "p0.parquet", "size": len(p0),
                     "dataChange": True, "partitionValues": {}}},
        ],
        [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["timestampNtz", "typeWidening"],
                          "writerFeatures": ["timestampNtz", "typeWidening"]}},
            {"add": {"path": "p1.parquet", "size": len(p1),
                     "dataChange": True, "partitionValues": {}}},
        ],
    ]
    members = [("p0.parquet", p0), ("p1.parquet", p1)]
    for v, acts in enumerate(commits):
        members.append((
            f"_delta_log/{v:020d}.json",
            ("\n".join(json.dumps(a) for a in acts) + "\n").encode(),
        ))
    tar = tar_build(sorted(members))
    got = {r["doc_id"]: r["ts"] for _, r in delta_snapshot_rows(tar, ["doc_id", "ts"])}
    assert got == {1: 10000 * 86_400_000_000, 2: 10001 * 86_400_000_000}


def test_mapped_table_partition_and_stats_scans():
    """mode=name mapped tables (round 17): partitionValues and stats
    key by PHYSICAL names — logical probes/predicates translate, rows
    emit logical (was a typed reject)."""
    from yark_spark.operators.deltalog import delta_partition_scan

    schema = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.physicalName": "col-1",
                      "delta.columnMapping.id": 1}},
        {"name": "bucket", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.physicalName": "col-2",
                      "delta.columnMapping.id": 2}}]})
    members, actions = [], [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "t", "format": {"provider": "parquet"},
                      "schemaString": schema,
                      "partitionColumns": ["bucket"],
                      "configuration": {"delta.columnMapping.mode": "name"}}}]
    for bucket in (0, 1):
        for fi, ks in enumerate([[1, 2], [10, 11]]):
            ks = [k + bucket * 100 for k in ks]
            b = parquet_write({"col-1": ks}, types={"col-1": "INT64"},
                              codec="SNAPPY")
            p = f"b{bucket}-f{fi}.parquet"
            members.append((p, b))
            actions.append({"add": {"path": p, "size": len(b),
                                    "dataChange": True,
                                    "partitionValues": {"col-2": str(bucket)},
                                    "stats": delta_stats({"col-1": ks})}})
    members.append((
        "_delta_log/" + "0" * 20 + ".json",
        ("\n".join(json.dumps(a) for a in actions) + "\n").encode(),
    ))
    tar = tar_build(sorted(members))
    rows, c = delta_partition_scan(
        tar, ["k", "bucket"], {"bucket": 1}, predicate=[("k", ">=", 110)]
    )
    assert rows == [(0, {"k": 110, "bucket": 1}), (0, {"k": 111, "bucket": 1})]
    assert c == {"files_skipped": 2, "files_scanned": 1,
                 "files_skipped_stats": 1}
    rows, c = delta_stats_scan(tar, ["k"], [("k", ">=", 110)])
    assert [r["k"] for r in rows] == [110, 111]
    assert c == {"files_skipped": 3, "files_scanned": 1}


def test_in_commit_timestamp_supersedes_wall_clock():
    """ICT (round 17): commitInfo.inCommitTimestamp is the monotonic
    in-protocol clock — when present it wins over the best-effort
    `timestamp` field for TIMESTAMP AS OF resolution."""
    from yark_spark.operators.deltalog import delta_version_at_timestamp

    a = _pq([1], ["a"])
    actions0 = [
        {"commitInfo": {"timestamp": 5000, "inCommitTimestamp": 1000}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "t", "format": {"provider": "parquet"},
                      "schemaString": _SCHEMA_STRING,
                      "partitionColumns": [], "configuration": {}}},
        {"add": {"path": "a.parquet", "size": len(a),
                 "dataChange": True, "partitionValues": {}}},
    ]
    actions1 = [
        {"commitInfo": {"timestamp": 1, "inCommitTimestamp": 2000}},
        {"add": {"path": "a2.parquet", "size": len(a),
                 "dataChange": True, "partitionValues": {}}},
    ]
    members = [("a.parquet", a), ("a2.parquet", a)]
    for v, acts in enumerate([actions0, actions1]):
        members.append((
            f"_delta_log/{v:020d}.json",
            ("\n".join(json.dumps(x) for x in acts) + "\n").encode(),
        ))
    tar = tar_build(sorted(members))
    # wall clocks (5000, 1) REGRESS; ICT (1000, 2000) is monotonic and
    # must be the resolution basis
    assert delta_version_at_timestamp(tar, 1500) == 0
    assert delta_version_at_timestamp(tar, 2000) == 1
