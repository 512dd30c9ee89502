"""Apache-Iceberg-v2-style table snapshot resolution (round 13): the
SECOND lakehouse protocol over the columnar substrate, completing the
table-format pair begun by ``operators/deltalog``. Where Delta is a
JSON commit LOG (state = replay), Iceberg is a metadata TREE
(state = pointer): a table-metadata JSON names the current snapshot,
the snapshot names an Avro MANIFEST LIST, each manifest-list entry
names an Avro MANIFEST whose entries name the parquet data and delete
files. Resolution per the public spec (iceberg.apache.org/spec/, v2):

* ``current-snapshot-id`` (or an explicit time-travel ``snapshot_id``)
  selects one snapshot from ``snapshots``; its ``manifest-list`` file
  is read through the from-scratch Avro OCF reader
  (``operators/avro_ocf``);
* manifest-list entries carry ``content`` (0 = data, 1 = deletes) and
  the manifest's ``sequence_number``; manifest ENTRIES may carry a
  null ``sequence_number``, which INHERITS the manifest-list's number
  — the v2 inheritance trick that lets a writer emit a manifest before
  its commit sequence is known, and lets an old manifest be reused
  verbatim by later snapshots while its entries keep their original
  data sequence numbers;
* entry ``status`` 0/1/2 = EXISTING/ADDED/DELETED — DELETED entries
  drop out of the scan;
* POSITION delete files (``data_file.content`` = 1, columns
  ``file_path`` + ``pos``) apply to a data file when
  ``delete.seq >= data.seq``; EQUALITY delete files (content = 2,
  ``equality_ids`` naming schema field ids) apply only when
  ``delete.seq > data.seq`` STRICTLY — a data file added in the same
  snapshot as an equality delete is NOT affected by it. Both
  inequalities are pinned by the fixture (q_iceberg_snapshot plants an
  equality-deleted key inside the same-sequence data file and expects
  the row to SURVIVE).

Every byte of the tree is produced and consumed by in-repo codecs:
manifests through ``operators/avro_ocf`` (deflate blocks), data and
delete files through ``operators/parquet_write`` /
``operators/parquet_data``. At 100 TB this layout is exactly why
Iceberg scans plan in O(manifests) instead of O(files-listed): the
manifest tree is the index, and delete application is a per-data-file
semi-join — here a per-file set lookup inside a map-only task, on a
cluster a broadcast of the (small) delete-file row sets.

Documented typed boundaries: format-version 1 tables, partition-spec
transforms (fixtures are unpartitioned — ``partition_spec_id`` 0),
and snapshot ``operation`` values beyond append/overwrite raise
``NotImplementedError``; a metadata tree referencing a missing member
or a manifest whose length disagrees with the member is a corrupt
table (typed ``ValueError``), mirroring the size cross-check real
readers run before issuing ranged reads.

Reference parity note: the reference archiver tracks files as SQLite
rows (/root/reference/cmds/archive.py); table-format snapshot
resolution is driver-mandated training-pipeline surface
(SURVEY.md §2.8).
"""

from __future__ import annotations

import json

from yark_spark.operators.avro_ocf import avro_records
from yark_spark.operators.containers import tar_members
from yark_spark.operators.parquet_data import parquet_read_columns

__all__ = [
    "MANIFEST_LIST_SCHEMA",
    "MANIFEST_SCHEMA",
    "iceberg_plan_snapshot",
    "iceberg_snapshot_rows",
]

# Avro schemas for the two metadata file shapes, following the spec's
# field NAMES (subset: the fields resolution actually consumes, plus
# the bookkeeping counts real writers always emit).
MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": "long"},
        {"name": "min_sequence_number", "type": "long"},
        {"name": "added_snapshot_id", "type": "long"},
        {"name": "added_files_count", "type": "int"},
        {"name": "existing_files_count", "type": "int"},
        {"name": "deleted_files_count", "type": "int"},
    ],
}

MANIFEST_SCHEMA = {
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
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    {
                        "name": "equality_ids",
                        "type": ["null", {"type": "array", "items": "int"}],
                    },
                ],
            },
        },
    ],
}

_EXISTING, _ADDED, _DELETED = 0, 1, 2


def _member(members: dict[str, bytes], path: str) -> bytes:
    if path not in members:
        raise ValueError(f"iceberg: metadata references missing member {path!r}")
    return members[path]


def iceberg_plan_snapshot(
    tar_payload: bytes, snapshot_id: int | None = None
) -> tuple[dict, list[dict], list[dict]]:
    """Resolve one snapshot of a table archive into a scan plan:
    ``(schema_fields_by_id, data_files, delete_files)`` where each
    file dict carries ``path``, ``seq``, ``content`` (and
    ``equality_ids`` for equality deletes). Pure metadata walk — no
    data file is opened here, mirroring how real planners touch only
    the manifest tree."""
    members = dict(tar_members(tar_payload))
    meta_names = [n for n in members if n.endswith(".metadata.json")]
    if len(meta_names) != 1:
        raise ValueError("iceberg: expected exactly one *.metadata.json member")
    meta = json.loads(members[meta_names[0]].decode("utf-8"))
    if meta.get("format-version") != 2:
        raise NotImplementedError(
            f"iceberg: format-version {meta.get('format-version')} "
            "(v2 metadata trees only)"
        )
    sid = snapshot_id if snapshot_id is not None else meta.get("current-snapshot-id")
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    if sid not in snaps:
        raise ValueError(f"iceberg: snapshot {sid} not in metadata")
    snap = snaps[sid]
    op = snap.get("summary", {}).get("operation", "append")
    if op not in ("append", "overwrite", "delete"):
        raise NotImplementedError(f"iceberg: snapshot operation {op!r}")
    schema_id = meta.get("current-schema-id", 0)
    schema = next(
        s for s in meta.get("schemas", []) if s.get("schema-id") == schema_id
    )
    fields_by_id = {f["id"]: f["name"] for f in schema["fields"]}

    manifest_list = avro_records(_member(members, snap["manifest-list"]))
    data_files: list[dict] = []
    delete_files: list[dict] = []
    for mf in manifest_list:
        blob = _member(members, mf["manifest_path"])
        if len(blob) != mf["manifest_length"]:
            raise ValueError(
                f"iceberg: manifest {mf['manifest_path']!r} length "
                f"{len(blob)} != declared {mf['manifest_length']}"
            )
        if mf.get("partition_spec_id", 0) != 0:
            raise NotImplementedError(
                "iceberg: partitioned manifests (spec transforms) not supported"
            )
        for entry in avro_records(blob):
            if entry["status"] == _DELETED:
                continue
            seq = entry["sequence_number"]
            if seq is None:
                # v2 sequence-number inheritance: a null entry number
                # takes the manifest-list's number (the sequence the
                # manifest was added at, preserved across reuse).
                seq = mf["sequence_number"]
            df = entry["data_file"]
            if df["file_format"].upper() != "PARQUET":
                raise NotImplementedError(
                    f"iceberg: file format {df['file_format']!r}"
                )
            rec = {
                "path": df["file_path"],
                "seq": seq,
                "content": df["content"],
                "record_count": df["record_count"],
                "size": df["file_size_in_bytes"],
                "equality_ids": df.get("equality_ids"),
            }
            if mf["content"] == 0:
                if df["content"] != 0:
                    raise ValueError("iceberg: delete file in a data manifest")
                data_files.append(rec)
            else:
                if df["content"] not in (1, 2):
                    raise ValueError("iceberg: data file in a delete manifest")
                delete_files.append(rec)
    return fields_by_id, data_files, delete_files


def iceberg_snapshot_rows(
    tar_payload: bytes,
    columns: list[str],
    snapshot_id: int | None = None,
) -> list[tuple[int, dict]]:
    """Materialize the selected snapshot: plan via the manifest tree,
    decode live parquet data files through the from-scratch reader,
    apply position deletes (``delete.seq >= data.seq``) then equality
    deletes (``delete.seq > data.seq``), and yield
    ``(seq_added, row_dict)`` per surviving row in (file, position)
    order."""
    members = dict(tar_members(tar_payload))
    fields_by_id, data_files, delete_files = iceberg_plan_snapshot(
        tar_payload, snapshot_id
    )

    # Decode delete files once; they are small relative to data (the
    # broadcast side of the anti-join at cluster scale).
    pos_deletes: list[tuple[int, dict[str, set[int]]]] = []
    eq_deletes: list[tuple[int, str, set]] = []
    for d in delete_files:
        blob = _member(members, d["path"])
        if len(blob) != d["size"]:
            raise ValueError(f"iceberg: delete file {d['path']!r} size mismatch")
        if d["content"] == 1:
            cols = parquet_read_columns(blob, ["file_path", "pos"])
            by_path: dict[str, set[int]] = {}
            for p, pos in zip(cols["file_path"], cols["pos"]):
                by_path.setdefault(p, set()).add(int(pos))
            pos_deletes.append((d["seq"], by_path))
        else:
            ids = d.get("equality_ids") or []
            if len(ids) != 1:
                raise NotImplementedError(
                    "iceberg: multi-column equality deletes not supported"
                )
            col = fields_by_id.get(ids[0])
            if col is None:
                raise ValueError(
                    f"iceberg: equality_id {ids[0]} not in current schema"
                )
            vals = parquet_read_columns(blob, [col])[col]
            eq_deletes.append((d["seq"], col, set(vals)))

    out: list[tuple[int, dict]] = []
    for f in sorted(data_files, key=lambda r: r["path"]):
        blob = _member(members, f["path"])
        if len(blob) != f["size"]:
            raise ValueError(f"iceberg: data file {f['path']!r} size mismatch")
        need = list(columns)
        for _, col, _vals in eq_deletes:
            if col not in need:
                need.append(col)
        cols = parquet_read_columns(blob, need)
        n = len(cols[need[0]]) if need else 0
        if n != f["record_count"]:
            raise ValueError(
                f"iceberg: data file {f['path']!r} rows {n} != "
                f"declared {f['record_count']}"
            )
        dead = set()
        for seq, by_path in pos_deletes:
            if seq >= f["seq"]:
                dead |= by_path.get(f["path"], set())
        for i in range(n):
            if i in dead:
                continue
            row = {c: cols[c][i] for c in need}
            killed = False
            for seq, col, vals in eq_deletes:
                if seq > f["seq"] and row[col] in vals:
                    killed = True
                    break
            if not killed:
                out.append((f["seq"], {c: row[c] for c in columns}))
    return out


# ---------------------------------------------------------------------------
# Partition pruning (round 13, session 3)
# ---------------------------------------------------------------------------
# The TOP of the scan-skip hierarchy: before any parquet footer is
# touched, an Iceberg planner prunes (1) whole MANIFESTS via the
# manifest-list's per-field summaries (contains_null + lower/upper
# bound, single-value serialization — little-endian for longs) and
# (2) individual FILES via each entry's partition struct. Fixtures
# use a single identity-partitioned long field named "part".

PARTITIONED_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": MANIFEST_LIST_SCHEMA["fields"]
    + [
        {
            "name": "partitions",
            "type": [
                "null",
                {
                    "type": "array",
                    "items": {
                        "type": "record",
                        "name": "field_summary",
                        "fields": [
                            {"name": "contains_null", "type": "boolean"},
                            {"name": "lower_bound", "type": ["null", "bytes"]},
                            {"name": "upper_bound", "type": ["null", "bytes"]},
                        ],
                    },
                },
            ],
        }
    ],
}

PARTITIONED_MANIFEST_SCHEMA = {
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
                            "fields": [{"name": "part", "type": "long"}],
                        },
                    },
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            },
        },
    ],
}


def partition_bound(v: int) -> bytes:
    """Iceberg single-value serialization of a long (8-byte LE)."""
    return int(v).to_bytes(8, "little", signed=True)


def iceberg_partition_scan(
    tar_payload: bytes, columns: list[str], part_value: int
) -> tuple[list[dict], dict[str, int]]:
    """Scan one partition of a partitioned table: manifests whose
    field summaries exclude ``part_value`` are never OPENED
    (manifests_skipped), entries whose partition struct mismatches
    are never READ (files_skipped), and only the surviving parquet
    decodes. Returns (rows, counters) — the counters are the plan
    contract; at 100 TB this two-level prune is why an Iceberg query
    over one partition costs O(one manifest + its files), not
    O(table)."""
    members = dict(tar_members(tar_payload))
    meta_names = [n for n in members if n.endswith(".metadata.json")]
    if len(meta_names) != 1:
        raise ValueError("iceberg: expected exactly one *.metadata.json member")
    meta = json.loads(members[meta_names[0]].decode("utf-8"))
    if meta.get("format-version") != 2:
        raise NotImplementedError("iceberg: v2 metadata trees only")
    snap = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    counters = {
        "manifests_total": 0,
        "manifests_skipped": 0,
        "files_skipped": 0,
        "files_scanned": 0,
    }
    rows: list[dict] = []
    for mf in avro_records(_member(members, snap["manifest-list"])):
        if mf["content"] != 0:
            continue
        counters["manifests_total"] += 1
        summaries = mf.get("partitions")
        if summaries:
            s0 = summaries[0]
            lo = s0.get("lower_bound")
            hi = s0.get("upper_bound")
            if lo is not None and hi is not None:
                lo_v = int.from_bytes(bytes(lo), "little", signed=True)
                hi_v = int.from_bytes(bytes(hi), "little", signed=True)
                if not lo_v <= part_value <= hi_v:
                    counters["manifests_skipped"] += 1
                    continue
        blob = _member(members, mf["manifest_path"])
        if len(blob) != mf["manifest_length"]:
            raise ValueError("iceberg: manifest length mismatch")
        for entry in avro_records(blob):
            if entry["status"] == _DELETED:
                continue
            df = entry["data_file"]
            if df["partition"]["part"] != part_value:
                counters["files_skipped"] += 1
                continue
            data = _member(members, df["file_path"])
            if len(data) != df["file_size_in_bytes"]:
                raise ValueError("iceberg: data file size mismatch")
            cols = parquet_read_columns(data, columns)
            n = len(cols[columns[0]]) if columns else 0
            if n != df["record_count"]:
                raise ValueError("iceberg: data file record count mismatch")
            counters["files_scanned"] += 1
            for i in range(n):
                rows.append({c: cols[c][i] for c in columns})
    return rows, counters
