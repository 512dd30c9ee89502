"""Iceberg changelog scan (round 17, VERDICT r16 #3): net row changes
per snapshot over the parent chain — inserts from appends, deletes
from removed files and from new position/equality/DV delete files,
nothing from replace (compaction) snapshots, no double emission of
rows an earlier delete had already killed."""

import pytest

from yark_spark.operators.containers import tar_build
from yark_spark.operators.iceberg import (
    iceberg_changelog,
    iceberg_commit,
    iceberg_table_create,
)
from yark_spark.operators.parquet_write import parquet_write

_FIELDS = [{"id": 1, "name": "k", "required": True, "type": "long"}]


def _pq(ks):
    return parquet_write({"k": list(ks)}, types={"k": "INT64"}, codec="SNAPPY")


def _tar(m):
    return tar_build(sorted(m.items()))


def _events(tar, lo, hi):
    return [
        (sid, c, r["k"]) for sid, c, r in iceberg_changelog(tar, lo, hi, ["k"])
    ]


def test_append_remove_eq_delete_chain():
    m = iceberg_table_create(_FIELDS)
    m, s1 = iceberg_commit(m, data_files=[("data/p0.parquet", _pq([1, 2, 3]), 3)])
    m, s2 = iceberg_commit(m, data_files=[("data/p1.parquet", _pq([10, 11]), 2)])
    m, s3 = iceberg_commit(m, remove_files=["data/p1.parquet"])
    m, s4 = iceberg_commit(
        m,
        delete_files=[{
            "path": "data/d0.parquet", "blob": _pq([2]), "content": 2,
            "record_count": 1, "equality_ids": [1],
        }],
    )
    assert _events(_tar(m), s1, s4) == [
        (s2, "insert", 10), (s2, "insert", 11),
        (s3, "delete", 10), (s3, "delete", 11),
        (s4, "delete", 2),
    ]
    # sub-ranges slice exactly
    assert _events(_tar(m), s2, s3) == [(s3, "delete", 10), (s3, "delete", 11)]


def test_removed_file_does_not_reemit_dead_rows():
    """Remove a file AFTER an equality delete killed one of its rows:
    the delete event for that row must not repeat."""
    m = iceberg_table_create(_FIELDS)
    m, s1 = iceberg_commit(m, data_files=[("data/p0.parquet", _pq([1, 2, 3]), 3)])
    m, s2 = iceberg_commit(
        m,
        delete_files=[{
            "path": "data/d0.parquet", "blob": _pq([2]), "content": 2,
            "record_count": 1, "equality_ids": [1],
        }],
    )
    m, s3 = iceberg_commit(m, remove_files=["data/p0.parquet"])
    assert _events(_tar(m), s1, s3) == [
        (s2, "delete", 2),
        (s3, "delete", 1), (s3, "delete", 3),
    ]


def test_position_delete_emits_rows():
    m = iceberg_table_create(_FIELDS)
    m, s1 = iceberg_commit(m, data_files=[("data/p0.parquet", _pq([5, 6, 7]), 3)])
    pos = parquet_write(
        {"file_path": ["data/p0.parquet"], "pos": [1]},
        types={"file_path": "BYTE_ARRAY", "pos": "INT64"},
        codec="SNAPPY",
    )
    m, s2 = iceberg_commit(
        m,
        delete_files=[{
            "path": "data/d0.parquet", "blob": pos, "content": 1,
            "record_count": 1,
        }],
    )
    assert _events(_tar(m), s1, s2) == [(s2, "delete", 6)]


def test_replace_snapshot_emits_nothing():
    m = iceberg_table_create(_FIELDS)
    m, s1 = iceberg_commit(m, data_files=[("data/p0.parquet", _pq([1, 2]), 2)])
    # compaction: rewrite p0 as p0c under operation=replace
    m, s2 = iceberg_commit(
        m,
        data_files=[("data/p0c.parquet", _pq([1, 2]), 2)],
        remove_files=["data/p0.parquet"],
        operation="replace",
    )
    assert _events(_tar(m), s1, s2) == []


def test_missing_operation_is_typed():
    import json

    m = iceberg_table_create(_FIELDS)
    m, s1 = iceberg_commit(m, data_files=[("data/p0.parquet", _pq([1]), 1)])
    m, s2 = iceberg_commit(m, data_files=[("data/p1.parquet", _pq([2]), 1)])
    name = next(n for n in m if n.endswith(".metadata.json"))
    meta = json.loads(m[name])
    del meta["snapshots"][-1]["summary"]
    m[name] = json.dumps(meta).encode()
    with pytest.raises(NotImplementedError, match="operation"):
        iceberg_changelog(_tar(m), s1, s2, ["k"])


def test_non_ancestor_is_typed():
    m = iceberg_table_create(_FIELDS)
    m, s1 = iceberg_commit(m, data_files=[("data/p0.parquet", _pq([1]), 1)])
    with pytest.raises(ValueError, match="not in metadata"):
        iceberg_changelog(_tar(m), 99, s1, ["k"])


class TestSnapshotRefs:
    """Snapshot refs (round 17, VERDICT r16 #9): tags are immutable
    pointers, branches diverge without moving main."""

    def _table(self):
        m = iceberg_table_create(_FIELDS)
        m, s1 = iceberg_commit(m, data_files=[("data/p0.parquet", _pq([1, 2]), 2)])
        return m, s1

    def test_tag_and_branch_divergence(self):
        from yark_spark.operators.iceberg import (
            iceberg_create_ref,
            iceberg_resolve_ref,
            iceberg_snapshot_rows,
        )

        m, s1 = self._table()
        m = iceberg_create_ref(m, "v1", "tag")
        m, s2 = iceberg_commit(m, data_files=[("data/p1.parquet", _pq([3]), 1)])
        m = iceberg_create_ref(m, "audit", "branch", snapshot_id=s1)
        m, s3 = iceberg_commit(
            m, data_files=[("data/p2.parquet", _pq([9]), 1)], branch="audit"
        )
        tar = _tar(m)
        got = {
            ref: sorted(
                r["k"]
                for _, r in iceberg_snapshot_rows(
                    tar, ["k"], snapshot_id=iceberg_resolve_ref(tar, ref)
                )
            )
            for ref in ("main", "v1", "audit")
        }
        assert got == {"main": [1, 2, 3], "v1": [1, 2], "audit": [1, 2, 9]}
        # the audit commit did not move main's head
        assert iceberg_resolve_ref(tar, "main") == s2

    def test_commit_to_tag_is_typed(self):
        from yark_spark.operators.iceberg import iceberg_create_ref

        m, _s1 = self._table()
        m = iceberg_create_ref(m, "v1", "tag")
        with pytest.raises(ValueError, match="tag"):
            iceberg_commit(
                m, data_files=[("data/x.parquet", _pq([7]), 1)], branch="v1"
            )

    def test_unknown_branch_and_duplicate_ref_are_typed(self):
        from yark_spark.operators.iceberg import iceberg_create_ref

        m, s1 = self._table()
        with pytest.raises(ValueError, match="unknown branch"):
            iceberg_commit(
                m, data_files=[("data/x.parquet", _pq([7]), 1)], branch="dev"
            )
        m = iceberg_create_ref(m, "dev", "branch")
        with pytest.raises(ValueError, match="already exists"):
            iceberg_create_ref(m, "dev", "tag")
        with pytest.raises(ValueError, match="not in metadata"):
            iceberg_create_ref(m, "other", "tag", snapshot_id=999)
