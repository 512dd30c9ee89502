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
from the same actions.

Round 14 closes the write loop and the protocol-v3 gate:

* **checkpoint WRITING** — ``delta_checkpoint_table`` resolves the
  state at version V, emits ``<V>.checkpoint.parquet`` through the
  from-scratch parquet writer's new nested-struct support (one
  action per row: protocol / metaData / add struct columns, the
  layout the round-13 READER consumes) plus ``_last_checkpoint``,
  and DELETES commits ≤ V — replay equivalence against the pure-JSON
  log is pinned by test and by the q_delta_checkpoint_write oracle.
  Without this the log grows without bound; with it, log retention
  can vacuum history exactly like real writers do every 10 commits.
* **deletion vectors** (protocol v3, ``readerFeatures:
  ["deletionVectors"]``) — ``add.deletionVector`` descriptors decode
  through ``operators/roaring`` (Delta's RoaringBitmapArray over
  portable 32-bit roaring): inline ``i`` payloads Z85-decode from the
  descriptor itself, on-disk ``p`` payloads seek into the DV file
  (1-byte format version, 4-byte big-endian length framing, CRC32
  cross-check) — and the dead row indexes drop during materialize.
  Cardinality must match the decoded set (typed). ``u``-style
  UUID-relative paths and writer-side DV emission stay typed
  boundaries, as does checkpointing a table whose live files carry
  DVs (two-level struct nesting).

Reference parity note: the reference archiver tracks files in SQLite
rows (/root/reference/cmds/archive.py); log-structured table state
is driver-mandated pipeline surface (SURVEY.md §2.8).
"""

from __future__ import annotations

import json
import re

from yark_spark.operators.containers import tar_build, tar_members
from yark_spark.operators.parquet_data import parquet_read_columns
from yark_spark.operators.parquet_write import parquet_write
from yark_spark.operators.png import crc32
from yark_spark.operators.roaring import roaring64_array_deserialize, z85_decode

__all__ = [
    "delta_checkpoint_table",
    "delta_live_files",
    "delta_live_files_dv",
    "delta_snapshot_rows",
]

_COMMIT_RE = re.compile(r"^_delta_log/(\d{20})\.json$")


def delta_live_files(tar_payload: bytes) -> list[tuple[str, int, bytes]]:
    """DV-free twin of :func:`delta_live_files_dv`: tables whose live
    files carry deletion vectors must use the DV-aware API (silently
    returning undeleted rows would be a WRONG snapshot, so this is a
    typed error, not a fallback)."""
    out = []
    for path, version, data, dead in delta_live_files_dv(tar_payload):
        if dead:
            raise ValueError(
                "delta: table carries deletion vectors — use delta_live_files_dv"
            )
        out.append((path, version, data))
    return out


def delta_live_files_dv(
    tar_payload: bytes,
) -> list[tuple[str, int, bytes, frozenset]]:
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

    # path -> (version, logged size, deletionVector descriptor | None)
    live: dict[str, tuple[int, int | None, dict | None]] = {}
    saw_metadata = False
    for version, blob in commits:
        saw_metadata = _apply_commit(blob, version, live) or saw_metadata
    if not saw_metadata:
        raise ValueError("delta: table has no metaData action")
    return _finalize(members, live)


def _check_protocol(p: dict) -> None:
    mrv = p.get("minReaderVersion", 1)
    if mrv <= 2:
        # 2 = column mapping (round 14 s3: mode=name resolves through
        # the metaData schema's physicalName annotations)
        return
    if mrv == 3:
        unsupported = set(p.get("readerFeatures") or []) - {
            "deletionVectors",
            "columnMapping",
        }
        if unsupported:
            raise NotImplementedError(
                f"delta: readerFeatures {sorted(unsupported)} not supported"
            )
        return
    raise NotImplementedError(
        f"delta: minReaderVersion {mrv} not supported"
    )


def _apply_commit(blob: bytes, version: int, live: dict) -> bool:
    """Apply one commit's newline-delimited actions to ``live``;
    returns whether a metaData action was seen."""
    saw_metadata = False
    for line in blob.splitlines():
        if not line.strip():
            continue
        action = json.loads(line)
        if "protocol" in action:
            _check_protocol(action["protocol"])
        elif "metaData" in action:
            saw_metadata = True
        elif "add" in action:
            a = action["add"]
            live[a["path"]] = (version, a.get("size"), a.get("deletionVector"))
        elif "remove" in action:
            live.pop(action["remove"]["path"], None)
        # commitInfo / txn: informational, skipped
    return saw_metadata


def _dv_dead_rows(members: dict, dv: dict) -> frozenset:
    """Decode a deletionVector descriptor into its dead row indexes:
    inline ``i`` payloads Z85-decode from the descriptor, on-disk
    ``p`` payloads seek into the DV file (format-version byte 1,
    4-byte big-endian length framing, CRC32 of the bitmap bytes).
    The descriptor's cardinality must equal the decoded set size."""
    st = dv.get("storageType")
    if st == "i":
        decoded = z85_decode(dv["pathOrInlineDv"])
        size = dv["sizeInBytes"]
        # Z85 works in 4-byte words; the payload may carry ≤3 pad bytes
        if not size <= len(decoded) < size + 4:
            raise ValueError("delta: inline DV sizeInBytes mismatch")
        data = decoded[:size]
    elif st == "p":
        blob = members.get(dv["pathOrInlineDv"])
        if blob is None:
            raise ValueError(
                f"delta: DV file {dv['pathOrInlineDv']!r} missing"
            )
        if not blob or blob[0] != 1:
            raise ValueError("delta: DV file format version must be 1")
        off = dv["offset"]
        size = dv["sizeInBytes"]
        if off + 8 + size > len(blob):
            raise ValueError("delta: DV span exceeds file")
        length = int.from_bytes(blob[off : off + 4], "big")
        if length != size:
            raise ValueError("delta: DV length word disagrees with sizeInBytes")
        data = blob[off + 4 : off + 4 + size]
        stored = int.from_bytes(blob[off + 4 + size : off + 8 + size], "big")
        if crc32(data) != stored:
            raise ValueError("delta: DV checksum mismatch")
    elif st == "u":
        raise NotImplementedError(
            "delta: UUID-relative DV paths not supported (needs table-root "
            "path derivation)"
        )
    else:
        raise ValueError(f"delta: unknown DV storageType {st!r}")
    rows = roaring64_array_deserialize(data)
    if len(rows) != dv["cardinality"]:
        raise ValueError(
            f"delta: DV cardinality {dv['cardinality']} != decoded {len(rows)}"
        )
    return frozenset(rows)


def _finalize(members: dict, live: dict) -> list[tuple[str, int, bytes, frozenset]]:
    # integrity checks apply to the FINAL live set only: files whose
    # every add was later removed may be physically gone (vacuumed) —
    # replay must not require their bytes
    out = []
    for path, (version, size, dv) in sorted(live.items()):
        data = members.get(path)
        if data is None:
            raise ValueError(f"delta: added file {path!r} missing")
        if size is not None and size != len(data):
            raise ValueError(
                f"delta: size mismatch for {path!r} "
                f"(log {size}, actual {len(data)})"
            )
        dead = _dv_dead_rows(members, dv) if dv is not None else frozenset()
        out.append((path, version, data, dead))
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
    # DV descriptor columns (round 14 second pass): absent on pre-DV
    # checkpoints — all-None then
    try:
        dvc = parquet_read_columns(
            ckpt_blob,
            [
                "add.deletionVector.storageType",
                "add.deletionVector.pathOrInlineDv",
                "add.deletionVector.offset",
                "add.deletionVector.sizeInBytes",
                "add.deletionVector.cardinality",
            ],
        )
    except ValueError:
        dvc = None
    live: dict[str, tuple[int, int | None, dict | None]] = {}
    saw_metadata = False
    for i in range(len(cols["add.path"])):
        mrv = cols["protocol.minReaderVersion"][i]
        if mrv is not None and mrv not in (1, 3):
            # 3 = deletionVectors (the only v3 feature our own
            # checkpoint writer emits); 2 = column mapping stays typed
            raise NotImplementedError(
                f"delta: checkpointed minReaderVersion {mrv} not supported"
            )
        if cols["metaData.id"][i] is not None:
            saw_metadata = True
        p = cols["add.path"][i]
        if p is not None:
            dv = None
            if dvc is not None and dvc["add.deletionVector.storageType"][i] is not None:
                dv = {
                    "storageType": dvc["add.deletionVector.storageType"][i],
                    "pathOrInlineDv": dvc["add.deletionVector.pathOrInlineDv"][i],
                    "offset": dvc["add.deletionVector.offset"][i],
                    "sizeInBytes": dvc["add.deletionVector.sizeInBytes"][i],
                    "cardinality": dvc["add.deletionVector.cardinality"][i],
                }
            live[p] = (ckpt_version, cols["add.size"][i], dv)
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


def delta_column_mapping(tar_payload: bytes) -> "dict[str, str] | None":
    """Logical → PHYSICAL column names when the table declares
    ``delta.columnMapping.mode = name`` (round 14 s3): the LAST
    metaData action's schemaString carries per-field
    ``delta.columnMapping.physicalName`` annotations, and the parquet
    files store the physical names — a reader that matches logical
    names directly reads nothing on real mapped tables (the mode that
    makes column RENAME a metadata-only operation). Mode ``id`` stays
    a typed boundary (parquet field-id matching); no/"none" mode
    returns None."""
    members = dict(tar_members(tar_payload))
    meta = None
    for name in sorted(members):
        if not _COMMIT_RE.match(name):
            continue
        for line in members[name].splitlines():
            if not line.strip():
                continue
            action = json.loads(line)
            if "metaData" in action:
                meta = action["metaData"]
    if meta is None:
        return None
    mode = (meta.get("configuration") or {}).get(
        "delta.columnMapping.mode", "none"
    )
    if mode in ("none", ""):
        return None
    if mode == "id":
        raise NotImplementedError(
            "delta: columnMapping.mode=id (parquet field-id matching)"
        )
    if mode != "name":
        raise ValueError(f"delta: unknown columnMapping.mode {mode!r}")
    schema = json.loads(meta["schemaString"])
    mapping: dict[str, str] = {}
    for f in schema.get("fields", []):
        phys = (f.get("metadata") or {}).get("delta.columnMapping.physicalName")
        if not phys:
            raise ValueError(
                f"delta: mapped table field {f.get('name')!r} has no "
                "physicalName"
            )
        mapping[f["name"]] = phys
    return mapping


def delta_snapshot_rows(
    tar_payload: bytes, columns: list[str]
) -> list[tuple[int, dict]]:
    """Live snapshot → rows: ``[(version_added, {col: value})]`` by
    decoding every live file through the from-scratch parquet reader;
    rows named by a file's deletion vector drop out (round 14), and
    column-mapped tables resolve logical names through the metaData
    schema's physicalName annotations (round 14 s3)."""
    mapping = delta_column_mapping(tar_payload)
    phys = [mapping.get(c, c) for c in columns] if mapping else list(columns)
    out: list[tuple[int, dict]] = []
    for _path, version, data, dead in delta_live_files_dv(tar_payload):
        cols = parquet_read_columns(data, phys)
        n = len(cols[phys[0]])
        for i in range(n):
            if i in dead:
                continue
            out.append(
                (version, {c: cols[p][i] for c, p in zip(columns, phys)})
            )
    return out


def delta_checkpoint_table(tar_payload: bytes, version: int | None = None) -> bytes:
    """Rewrite a pure-JSON-log table archive into CHECKPOINTED form:
    resolve the state at ``version`` (default: the latest commit),
    emit ``<V>.checkpoint.parquet`` through the from-scratch parquet
    writer (nested-struct action rows — protocol / metaData / add
    struct columns, the exact layout the round-13 reader consumes)
    plus ``_last_checkpoint``, DELETE commits ≤ V (proving replay
    never needs them — real log retention does exactly this), and
    keep later commits verbatim. Live files carrying deletion vectors
    are a typed boundary (their checkpoint rows need two-level struct
    nesting)."""
    members = dict(tar_members(tar_payload))
    if "_delta_log/_last_checkpoint" in members:
        raise ValueError("delta: table is already checkpointed")
    commits: list[tuple[int, bytes]] = []
    for name in members:
        m = _COMMIT_RE.match(name)
        if m:
            commits.append((int(m.group(1)), members[name]))
    if not commits:
        raise ValueError("delta: no commit files under _delta_log/")
    commits.sort()
    if [v for v, _ in commits] != list(range(len(commits))):
        raise ValueError("delta: commit versions must be gapless from 0")
    last = commits[-1][0]
    v = last if version is None else version
    if not 0 <= v <= last:
        raise ValueError(f"delta: checkpoint version {v} outside log range")

    live: dict[str, tuple[int, int | None, dict | None]] = {}
    metadata_action: dict | None = None
    protocol_action: dict | None = None
    for cv, blob in commits:
        if cv > v:
            break
        for line in blob.splitlines():
            if not line.strip():
                continue
            action = json.loads(line)
            if "metaData" in action:
                metadata_action = action["metaData"]
            elif "protocol" in action:
                _check_protocol(action["protocol"])
                protocol_action = action["protocol"]
        _apply_commit(blob, cv, live)
    if metadata_action is None:
        raise ValueError("delta: table has no metaData action")

    # one action per row: protocol, metaData, then adds in path order;
    # live deletion vectors ride as the nested add.deletionVector
    # struct (round 14 second pass — the writer recurses now)
    paths = sorted(live)
    n = 2 + len(paths)
    prs: list = [
        {
            "minReaderVersion": (protocol_action or {}).get("minReaderVersion", 1)
        }
    ] + [None] * (n - 1)
    mds: list = [None, {"id": str(metadata_action.get("id", ""))}] + [None] * (
        n - 2
    )
    adds: list = [None, None]
    for p in paths:
        _ver, size, dv = live[p]
        row = {"path": p, "size": size}
        if dv is not None:
            row["deletionVector"] = {
                "storageType": dv.get("storageType"),
                "pathOrInlineDv": dv.get("pathOrInlineDv"),
                "offset": dv.get("offset"),
                "sizeInBytes": dv.get("sizeInBytes"),
                "cardinality": dv.get("cardinality"),
            }
        else:
            row["deletionVector"] = None
        adds.append(row)
    # the remove column is part of the checkpoint schema even with no
    # unexpired tombstones (the round-13 reader selects it by name)
    rms: list = [None] * n
    ckpt = parquet_write(
        {"protocol": prs, "metaData": mds, "add": adds, "remove": rms},
        types={
            "protocol": {"minReaderVersion": "INT32"},
            "metaData": {"id": "BYTE_ARRAY"},
            "add": {
                "path": "BYTE_ARRAY",
                "size": "INT64",
                "deletionVector": {
                    "storageType": "BYTE_ARRAY",
                    "pathOrInlineDv": "BYTE_ARRAY",
                    "offset": "INT64",
                    "sizeInBytes": "INT64",
                    "cardinality": "INT64",
                },
            },
            "remove": {"path": "BYTE_ARRAY"},
        },
        codec="SNAPPY",
    )
    out = []
    for name, data in members.items():
        m = _COMMIT_RE.match(name)
        if m and int(m.group(1)) <= v:
            continue  # retention: replay must not need these
        out.append((name, data))
    out.append(
        (
            "_delta_log/_last_checkpoint",
            json.dumps({"version": v, "size": n}).encode("utf-8"),
        )
    )
    out.append((f"_delta_log/{v:020d}.checkpoint.parquet", ckpt))
    return tar_build(sorted(out))
