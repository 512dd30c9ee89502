"""Lakehouse OPTIMIZE commits (round 17, VERDICT r16 #4): compaction
as a real commit on both protocols — rows identical before/after, file
count drops, incremental consumers see NOTHING (dataChange: false /
replace), deletion vectors and outstanding delete files materialize
away, and fresh column stats keep the skipping layer accurate."""

import json

import pytest

from yark_spark.operators.containers import tar_build
from yark_spark.operators.deltalog import (
    delta_add_deletion_vectors,
    delta_change_feed,
    delta_live_files,
    delta_optimize,
    delta_snapshot_rows,
    delta_stats_scan,
)
from yark_spark.operators.iceberg import (
    iceberg_bounds_scan,
    iceberg_changelog,
    iceberg_commit,
    iceberg_optimize,
    iceberg_plan_snapshot,
    iceberg_snapshot_rows,
    iceberg_table_create,
)
from yark_spark.operators.parquet_write import parquet_write


def _pq(ks):
    return parquet_write({"k": list(ks)}, types={"k": "INT64"}, codec="SNAPPY")


def _delta_table(chunks):
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "t", "format": {"provider": "parquet"}}},
    ]
    members = []
    for i, ks in enumerate(chunks):
        b = _pq(ks)
        members.append((f"p{i}.parquet", b))
        actions.append({"add": {"path": f"p{i}.parquet", "size": len(b),
                                "dataChange": True, "partitionValues": {}}})
    members.append((
        "_delta_log/" + "0" * 20 + ".json",
        ("\n".join(json.dumps(a) for a in actions) + "\n").encode(),
    ))
    return tar_build(sorted(members))


class TestDeltaOptimize:
    def test_rows_identical_files_drop_cdf_silent(self):
        tar = _delta_table([[1, 2], [3, 4], [5, 6]])
        pre = sorted(r["k"] for _, r in delta_snapshot_rows(tar, ["k"]))
        opt, c = delta_optimize(tar)
        post = sorted(r["k"] for _, r in delta_snapshot_rows(opt, ["k"]))
        assert pre == post
        assert c == {"files_in": 3, "files_out": 1}
        assert len(delta_live_files(opt)) == 1
        # the optimize commit emits NOTHING on the change feed
        assert delta_change_feed(opt, 0, 1, columns=["k"]) == []

    def test_dv_purges_physically(self):
        tar = _delta_table([[1, 2], [3, 4]])
        tar = delta_add_deletion_vectors(tar, {"p0.parquet": [0]})
        opt, c = delta_optimize(tar)
        post = sorted(r["k"] for _, r in delta_snapshot_rows(opt, ["k"]))
        assert post == [2, 3, 4]
        # merged file carries NO deletion vector
        path, _v, _data = delta_live_files(opt)[0]
        assert path.startswith("part-opt-")
        assert delta_change_feed(opt, 1, 2, columns=["k"]) == []

    def test_fresh_stats_prune_after_optimize(self):
        tar = _delta_table([[1, 2], [3, 4]])
        opt, _c = delta_optimize(tar)
        _rows, counters = delta_stats_scan(opt, ["k"], [("k", ">=", 100)])
        assert counters == {"files_skipped": 1, "files_scanned": 0}

    def test_noop_when_nothing_to_merge(self):
        tar = _delta_table([[1, 2]])
        opt, c = delta_optimize(tar)
        assert opt == tar and c == {"files_in": 0, "files_out": 0}

    def test_large_files_not_rewritten(self):
        tar = _delta_table([[1, 2], [3, 4], [5, 6]])
        opt, c = delta_optimize(tar, target_file_bytes=1)
        assert c == {"files_in": 0, "files_out": 0}

    def test_history_still_resolves(self):
        tar = _delta_table([[1, 2], [3, 4]])
        opt, _c = delta_optimize(tar)
        rows = delta_snapshot_rows(opt, ["k"], version=0)
        assert sorted(r["k"] for _, r in rows) == [1, 2, 3, 4]


_FIELDS = [{"id": 1, "name": "k", "required": True, "type": "long"}]


class TestIcebergOptimize:
    def _table(self):
        m = iceberg_table_create(_FIELDS)
        m, _ = iceberg_commit(m, data_files=[
            ("data/p0.parquet", _pq([1, 2]), 2),
            ("data/p1.parquet", _pq([3, 4]), 2),
        ])
        return m

    def test_rows_identical_replace_silent(self):
        m = self._table()
        pre = sorted(
            r["k"] for _, r in iceberg_snapshot_rows(
                tar_build(sorted(m.items())), ["k"])
        )
        m2, sid, c = iceberg_optimize(m)
        tar = tar_build(sorted(m2.items()))
        post = sorted(r["k"] for _, r in iceberg_snapshot_rows(tar, ["k"]))
        assert pre == post
        assert c == {"files_in": 2, "files_out": 1}
        _f, dfs, _d = iceberg_plan_snapshot(tar)
        assert len(dfs) == 1 and dfs[0]["path"].startswith("data/opt-")
        assert iceberg_changelog(tar, 1, sid, ["k"]) == []

    def test_outstanding_deletes_materialize(self):
        m = self._table()
        m, s2 = iceberg_commit(m, delete_files=[{
            "path": "data/d0.parquet", "blob": _pq([3]), "content": 2,
            "record_count": 1, "equality_ids": [1],
        }])
        m2, sid, c = iceberg_optimize(m)
        tar = tar_build(sorted(m2.items()))
        post = sorted(r["k"] for _, r in iceberg_snapshot_rows(tar, ["k"]))
        assert post == [1, 2, 4]
        assert iceberg_changelog(tar, s2, sid, ["k"]) == []

    def test_fresh_bounds_prune_after_optimize(self):
        m = self._table()
        m2, _sid, _c = iceberg_optimize(m)
        tar = tar_build(sorted(m2.items()))
        _rows, counters = iceberg_bounds_scan(tar, ["k"], [("k", ">=", 100)])
        assert counters == {"files_skipped": 1, "files_scanned": 0}

    def test_noop_when_nothing_to_merge(self):
        m = self._table()
        m2, sid, c = iceberg_optimize(m, target_file_bytes=1)
        assert sid is None and c == {"files_in": 0, "files_out": 0}

    def test_time_travel_still_resolves(self):
        m = self._table()
        m2, _sid, _c = iceberg_optimize(m)
        tar = tar_build(sorted(m2.items()))
        rows = iceberg_snapshot_rows(tar, ["k"], snapshot_id=1)
        assert sorted(r["k"] for _, r in rows) == [1, 2, 3, 4]
