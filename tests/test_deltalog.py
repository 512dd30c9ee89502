"""Delta-protocol snapshot tests (round 13): log replay semantics
(last action wins, remove → vanish, re-add → resurrect at the new
version), integrity cross-checks, and typed boundaries."""

import json

import pytest

from yark_spark.operators.containers import tar_build
from yark_spark.operators.deltalog import delta_live_files, delta_snapshot_rows
from yark_spark.operators.parquet_write import parquet_write


def _pq(ids):
    return parquet_write(
        {"doc_id": list(ids), "text": [f"t{i}" for i in ids]},
        types={"doc_id": "INT64", "text": "BYTE_ARRAY"},
        codec="SNAPPY",
    )


def _commit(version, *actions):
    return (
        f"_delta_log/{version:020d}.json",
        "\n".join(json.dumps(a) for a in actions).encode(),
    )


_PROTO = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
_META = {"metaData": {"id": "t", "format": {"provider": "parquet"}}}


def _add(path, blob):
    return {"add": {"path": path, "size": len(blob), "dataChange": True}}


def _rm(path):
    return {"remove": {"path": path, "dataChange": True}}


def _table(commits, files):
    return tar_build(list(commits) + list(files))


def test_replay_remove_and_resurrect():
    a, b, b2 = _pq([1, 2]), _pq([3, 4]), _pq([30, 40])
    blob = _table(
        [
            _commit(0, _PROTO, _META, _add("a.parquet", a), _add("b.parquet", b)),
            _commit(1, _rm("b.parquet")),
            _commit(2, _add("b.parquet", b2)),  # compaction rewrite
        ],
        [("a.parquet", a), ("b.parquet", b2)],
    )
    live = delta_live_files(blob)
    assert [(p, v) for p, v, _ in live] == [("a.parquet", 0), ("b.parquet", 2)]
    rows = delta_snapshot_rows(blob, ["doc_id"])
    assert sorted((v, r["doc_id"]) for v, r in rows) == [
        (0, 1), (0, 2), (2, 30), (2, 40),
    ]


def test_gap_in_versions_is_typed():
    a = _pq([1])
    blob = _table(
        [_commit(0, _PROTO, _META, _add("a.parquet", a)), _commit(2)],
        [("a.parquet", a)],
    )
    with pytest.raises(ValueError, match="gapless"):
        delta_live_files(blob)


def test_size_mismatch_is_typed():
    a = _pq([1])
    bad = dict(_add("a.parquet", a))
    bad["add"]["size"] += 1
    blob = _table([_commit(0, _PROTO, _META, bad)], [("a.parquet", a)])
    with pytest.raises(ValueError, match="size mismatch"):
        delta_live_files(blob)


def test_missing_file_and_metadata_typed():
    blob = _table(
        [_commit(0, _PROTO, _META, {"add": {"path": "ghost.parquet", "size": 1}})],
        [],
    )
    with pytest.raises(ValueError, match="missing"):
        delta_live_files(blob)
    a = _pq([1])
    blob = _table([_commit(0, _PROTO, _add("a.parquet", a))], [("a.parquet", a)])
    with pytest.raises(ValueError, match="metaData"):
        delta_live_files(blob)


def test_reader_version_gate():
    a = _pq([1])
    proto2 = {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}
    blob = _table(
        [_commit(0, proto2, _META, _add("a.parquet", a))], [("a.parquet", a)]
    )
    with pytest.raises(NotImplementedError, match="minReaderVersion"):
        delta_live_files(blob)


def test_checkpoint_orphan_is_typed():
    # A checkpoint parquet with NO _last_checkpoint pointer is a
    # corrupt table (round 13 s3 closed the former NotImplementedError
    # boundary — checkpoints now replay; see the tests below).
    a = _pq([1])
    blob = _table(
        [
            _commit(0, _PROTO, _META, _add("a.parquet", a)),
            ("_delta_log/00000000000000000000.checkpoint.parquet", b"x"),
        ],
        [("a.parquet", a)],
    )
    with pytest.raises(ValueError, match="checkpoint"):
        delta_live_files(blob)


def test_empty_commit_is_fine():
    a = _pq([5])
    blob = _table(
        [_commit(0, _PROTO, _META, _add("a.parquet", a)), _commit(1)],
        [("a.parquet", a)],
    )
    assert [(p, v) for p, v, _ in delta_live_files(blob)] == [("a.parquet", 0)]


# ---------------------------------------------------------------------------
# Parquet checkpoints (round 13 s3)
# ---------------------------------------------------------------------------

import io

import pyarrow as pa
import pyarrow.parquet as pq


def _checkpoint(rows):
    """rows: list of dicts with optional 'add'/'remove'/'metaData'/
    'protocol' keys — one action per row, pyarrow nested-struct wire."""
    add_t = pa.struct([("path", pa.string()), ("size", pa.int64())])
    rm_t = pa.struct([("path", pa.string())])
    md_t = pa.struct([("id", pa.string())])
    pr_t = pa.struct([("minReaderVersion", pa.int32())])
    buf = io.BytesIO()
    pq.write_table(
        pa.table(
            {
                "protocol": pa.array([r.get("protocol") for r in rows], type=pr_t),
                "metaData": pa.array([r.get("metaData") for r in rows], type=md_t),
                "add": pa.array([r.get("add") for r in rows], type=add_t),
                "remove": pa.array([r.get("remove") for r in rows], type=rm_t),
            }
        ),
        buf,
    )
    return buf.getvalue()


def _ckpt_members(version, ckpt, last=None):
    return [
        (
            "_delta_log/_last_checkpoint",
            json.dumps(last or {"version": version}).encode(),
        ),
        (f"_delta_log/{version:020d}.checkpoint.parquet", ckpt),
    ]


_CK_BASE = [
    {"protocol": {"minReaderVersion": 1}},
    {"metaData": {"id": "t"}},
]


def test_checkpoint_seeds_state_without_early_commits():
    a, c, d = _pq([1, 2]), _pq([5, 6]), _pq([7, 8])
    ckpt = _checkpoint(
        _CK_BASE
        + [
            {"add": {"path": "a.parquet", "size": len(a)}},
            {"add": {"path": "b.parquet", "size": 999}},  # removed below
            {"remove": {"path": "expired.parquet"}},  # old tombstone
        ]
    )
    blob = _table(
        _ckpt_members(2, ckpt)
        + [
            _commit(3, _add("c.parquet", c)),
            _commit(4, _rm("b.parquet"), _add("d.parquet", d)),
        ],
        [("a.parquet", a), ("c.parquet", c), ("d.parquet", d)],
        # b.parquet vacuumed: removed files' bytes must never be read
    )
    live = delta_live_files(blob)
    assert [(p, v) for p, v, _ in live] == [
        ("a.parquet", 2), ("c.parquet", 3), ("d.parquet", 4),
    ]


def test_checkpoint_commit_gap_is_typed():
    a = _pq([1])
    ckpt = _checkpoint(_CK_BASE + [{"add": {"path": "a.parquet", "size": len(a)}}])
    blob = _table(
        _ckpt_members(2, ckpt) + [_commit(4, _add("a.parquet", a))],
        [("a.parquet", a)],
    )
    with pytest.raises(ValueError, match="gapless"):
        delta_live_files(blob)


def test_checkpoint_missing_parquet_is_typed():
    blob = _table(
        [("_delta_log/_last_checkpoint", json.dumps({"version": 2}).encode())],
        [],
    )
    with pytest.raises(ValueError, match="names missing"):
        delta_live_files(blob)


def test_checkpoint_without_pointer_is_typed():
    ckpt = _checkpoint(_CK_BASE)
    blob = _table(
        [(f"_delta_log/{2:020d}.checkpoint.parquet", ckpt), _commit(0, _PROTO, _META)],
        [],
    )
    with pytest.raises(ValueError, match="without _last_checkpoint"):
        delta_live_files(blob)


def test_checkpoint_without_metadata_is_typed():
    a = _pq([1])
    ckpt = _checkpoint(
        [{"protocol": {"minReaderVersion": 1}},
         {"add": {"path": "a.parquet", "size": len(a)}}]
    )
    blob = _table(_ckpt_members(2, ckpt), [("a.parquet", a)])
    with pytest.raises(ValueError, match="no metaData"):
        delta_live_files(blob)


def test_checkpoint_reader_version_gate():
    ckpt = _checkpoint(
        [{"protocol": {"minReaderVersion": 3}}, {"metaData": {"id": "t"}}]
    )
    blob = _table(_ckpt_members(2, ckpt), [])
    with pytest.raises(NotImplementedError, match="minReaderVersion"):
        delta_live_files(blob)
