"""Delta-Lake-style transaction-log snapshot resolution (round 13):
the LAKEHOUSE layer over the columnar substrate — given a table
directory (here a ustar archive: ``_delta_log/*.json`` commits +
``part-*.parquet`` data files, every byte produced by in-repo
writers), replay the commit log per the public Delta protocol
(delta.io PROTOCOL.md) and materialize the LIVE snapshot:

* commits are newline-delimited JSON actions; versions replay in
  ascending 20-digit order with NO GAPS (a missing version is a
  corrupt table, typed);
* ``add`` puts a file into the snapshot (recording the version),
  ``remove`` tombstones it — last action per path wins, and a
  re-``add`` after a ``remove`` resurrects the path at the new
  version (compaction's rewrite shape);
* ``protocol`` gates the reader (``minReaderVersion > 1`` is a typed
  boundary — column mapping/deletion vectors live there);
* ``metaData`` must appear in version 0 (self-describing table);
* each live file's ``size`` must match the actual member length
  (the cheap integrity check real readers apply before ranged
  reads), and its rows are then decoded through the from-scratch
  parquet reader (operators/parquet_data).

This is how a 100 TB lakehouse table IS a table: object stores have
no rename-into-place, so the JSON log is the single source of truth
and every engine (Spark, Trino, DuckDB) resolves the same snapshot
from the same actions. Parquet checkpoints (nested-struct state
dumps) are the documented typed boundary — tables here replay pure
JSON logs.

Reference parity note: the reference archiver tracks files in SQLite
rows (/root/reference/cmds/archive.py); log-structured table state
is driver-mandated pipeline surface (SURVEY.md §2.8).
"""

from __future__ import annotations

import json
import re

from yark_spark.operators.containers import tar_members
from yark_spark.operators.parquet_data import parquet_read_columns

__all__ = ["delta_live_files", "delta_snapshot_rows"]

_COMMIT_RE = re.compile(r"^_delta_log/(\d{20})\.json$")


def delta_live_files(tar_payload: bytes) -> list[tuple[str, int, bytes]]:
    """Replay a table archive's commit log → the live snapshot as
    ``[(path, version_added, file_bytes)]`` in path order."""
    members = dict(tar_members(tar_payload))
    commits: list[tuple[int, bytes]] = []
    for name in members:
        m = _COMMIT_RE.match(name)
        if m:
            commits.append((int(m.group(1)), members[name]))
        elif name.startswith("_delta_log/") and ".checkpoint." in name:
            raise NotImplementedError(
                "delta: parquet checkpoints not supported (JSON log replay only)"
            )
    if not commits:
        raise ValueError("delta: no commit files under _delta_log/")
    commits.sort()
    if [v for v, _ in commits] != list(range(len(commits))):
        raise ValueError("delta: commit versions must be gapless from 0")

    live: dict[str, tuple[int, int | None]] = {}  # path -> (version, logged size)
    saw_metadata = False
    for version, blob in commits:
        for line in blob.splitlines():
            if not line.strip():
                continue
            action = json.loads(line)
            if "protocol" in action:
                if action["protocol"].get("minReaderVersion", 1) > 1:
                    raise NotImplementedError(
                        "delta: minReaderVersion > 1 (column mapping / "
                        "deletion vectors) not supported"
                    )
            elif "metaData" in action:
                saw_metadata = True
            elif "add" in action:
                a = action["add"]
                live[a["path"]] = (version, a.get("size"))
            elif "remove" in action:
                live.pop(action["remove"]["path"], None)
            # commitInfo / txn: informational, skipped
    if not saw_metadata:
        raise ValueError("delta: table has no metaData action")
    # integrity checks apply to the FINAL live set only: files whose
    # every add was later removed may be physically gone (vacuumed) —
    # replay must not require their bytes
    out = []
    for path, (version, size) in sorted(live.items()):
        data = members.get(path)
        if data is None:
            raise ValueError(f"delta: added file {path!r} missing")
        if size is not None and size != len(data):
            raise ValueError(
                f"delta: size mismatch for {path!r} "
                f"(log {size}, actual {len(data)})"
            )
        out.append((path, version, data))
    return out


def delta_snapshot_rows(
    tar_payload: bytes, columns: list[str]
) -> list[tuple[int, dict]]:
    """Live snapshot → rows: ``[(version_added, {col: value})]`` by
    decoding every live file through the from-scratch parquet
    reader."""
    out: list[tuple[int, dict]] = []
    for _path, version, data in delta_live_files(tar_payload):
        cols = parquet_read_columns(data, columns)
        n = len(cols[columns[0]])
        for i in range(n):
            out.append((version, {c: cols[c][i] for c in columns}))
    return out
