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
    ``[(path, version_added, file_bytes)]`` in path order.

    Parquet CHECKPOINTS (round 13 s3): when ``_last_checkpoint``
    names version V, the state is seeded from
    ``<V>.checkpoint.parquet`` — one row per action, actions as
    NESTED STRUCT columns (``add.path``, ``add.size``,
    ``remove.path``, ``metaData.id``, ``protocol.minReaderVersion``)
    read through the from-scratch reader's dotted-path support — and
    only commits V+1..N replay on top. Commits ≤ V may be PHYSICALLY
    ABSENT (log retention deleted them — the whole point of
    checkpoints: a reader that still walks version 0 breaks on any
    real table older than the retention window). Files seeded from
    the checkpoint carry version_added = V, the finest attribution
    the log retains."""
    members = dict(tar_members(tar_payload))
    ckpt_version = None
    lc = members.get("_delta_log/_last_checkpoint")
    if lc is not None:
        ckpt_version = json.loads(lc.decode("utf-8"))["version"]
    commits: list[tuple[int, bytes]] = []
    for name in members:
        m = _COMMIT_RE.match(name)
        if m:
            commits.append((int(m.group(1)), members[name]))
        elif name.startswith("_delta_log/") and ".checkpoint." in name:
            if ckpt_version is None:
                raise ValueError(
                    "delta: checkpoint parquet without _last_checkpoint"
                )
    if ckpt_version is not None:
        ckpt_name = f"_delta_log/{ckpt_version:020d}.checkpoint.parquet"
        if ckpt_name not in members:
            raise ValueError(f"delta: _last_checkpoint names missing {ckpt_name}")
        return _replay_from_checkpoint(
            members, ckpt_version, members[ckpt_name], commits
        )
    if not commits:
        raise ValueError("delta: no commit files under _delta_log/")
    commits.sort()
    if [v for v, _ in commits] != list(range(len(commits))):
        raise ValueError("delta: commit versions must be gapless from 0")

    live: dict[str, tuple[int, int | None]] = {}  # path -> (version, logged size)
    saw_metadata = False
    for version, blob in commits:
        saw_metadata = _apply_commit(blob, version, live) or saw_metadata
    if not saw_metadata:
        raise ValueError("delta: table has no metaData action")
    return _finalize(members, live)


def _apply_commit(blob: bytes, version: int, live: dict) -> bool:
    """Apply one commit's newline-delimited actions to ``live``;
    returns whether a metaData action was seen."""
    saw_metadata = False
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
    return saw_metadata


def _finalize(members: dict, live: dict) -> list[tuple[str, int, bytes]]:
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


def _replay_from_checkpoint(
    members: dict, ckpt_version: int, ckpt_blob: bytes, commits: list
) -> list[tuple[str, int, bytes]]:
    """Seed state from the checkpoint's struct-column rows, then
    replay only the commits AFTER it (earlier JSON may be gone)."""
    cols = parquet_read_columns(
        ckpt_blob,
        [
            "add.path",
            "add.size",
            "remove.path",
            "metaData.id",
            "protocol.minReaderVersion",
        ],
    )
    live: dict[str, tuple[int, int | None]] = {}
    saw_metadata = False
    for i in range(len(cols["add.path"])):
        mrv = cols["protocol.minReaderVersion"][i]
        if mrv is not None and mrv > 1:
            raise NotImplementedError(
                "delta: minReaderVersion > 1 (column mapping / "
                "deletion vectors) not supported"
            )
        if cols["metaData.id"][i] is not None:
            saw_metadata = True
        p = cols["add.path"][i]
        if p is not None:
            live[p] = (ckpt_version, cols["add.size"][i])
        # remove rows are EXPIRED tombstones retained for vacuum
        # bookkeeping — by definition not part of the live state
    if not saw_metadata:
        raise ValueError("delta: checkpoint has no metaData row")
    later = sorted((v, b) for v, b in commits if v > ckpt_version)
    if [v for v, _ in later] != list(
        range(ckpt_version + 1, ckpt_version + 1 + len(later))
    ):
        raise ValueError("delta: commit versions after checkpoint must be gapless")
    for version, blob in later:
        _apply_commit(blob, version, live)
    return _finalize(members, live)


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
