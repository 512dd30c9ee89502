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

Round 14 closes two of the round-13 boundaries: **format-version 1
tables** read through the same resolver (v1 manifests carry no
sequence numbers — every entry plans at sequence 0 — and no delete
manifests exist by definition), and **partition-spec transforms** per
spec Appendix B — ``identity``, ``bucket[N]`` (Murmur3 x86 32-bit of
the value's single-value serialization, ``(hash & Int.MAX) % N``),
``truncate[W]`` (floored multiple for ints/longs, codepoint prefix
for strings), and the temporal family ``year``/``month``/``day``/
``hour`` (calendar offsets from the Unix epoch, micros in). The
planner reads the metadata's ``partition-specs``, transforms the
probe's SOURCE value, and prunes manifests/files on the TRANSFORMED
key — with field-summary bounds decoded at the transform's RESULT
type width (temporal/bucket results are 4-byte ints on the wire,
long identity/truncate stay 8). Remaining typed boundaries: snapshot
``operation`` values beyond append/overwrite/delete (multi-field
specs prune as a conjunction since round 14 s2; ``void`` spec fields
drop out of it since round 15 — spec evolution's dropped-field
shape); a metadata tree
referencing a missing member or a manifest whose length disagrees
with the member is a corrupt table (typed ``ValueError``), mirroring
the size cross-check real readers run before issuing ranged reads.

Reference parity note: the reference archiver tracks files as SQLite
rows (/root/reference/cmds/archive.py); table-format snapshot
resolution is driver-mandated training-pipeline surface
(SURVEY.md §2.8).
"""

from __future__ import annotations

import json

from yark_spark.operators.avro_ocf import avro_build, avro_records
from yark_spark.operators.containers import tar_build, tar_members
from yark_spark.operators.parquet_data import parquet_read_columns
from yark_spark.operators.parquet_write import parquet_write
from yark_spark.operators.parquet_meta import parquet_footer
from yark_spark.operators.puffin import dv_blob_parse

__all__ = [
    "MANIFEST_LIST_SCHEMA",
    "MANIFEST_SCHEMA",
    "MANIFEST_SCHEMA_V3",
    "V1_MANIFEST_LIST_SCHEMA",
    "V1_MANIFEST_SCHEMA",
    "iceberg_bounds_scan",
    "iceberg_bucket",
    "iceberg_changelog",
    "iceberg_optimize",
    "iceberg_incremental_files",
    "iceberg_plan_snapshot",
    "iceberg_single_value",
    "iceberg_single_value_decode",
    "iceberg_snapshot_at_timestamp",
    "iceberg_snapshot_rows",
    "iceberg_transform",
    "murmur3_x86_32",
    "transform_result_width",
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

# Reader-side manifest schemas (round 16, VERDICT r15 #8): identical
# shapes but with DEFAULTS on every field an older writer may lack, so
# Avro schema resolution (operators/avro_ocf.avro_resolve_decode, E125)
# reads v1-era-subset manifests against the CURRENT reader model:
# missing sequence numbers default null (v2 inheritance applies),
# content defaults 0 (data), equality_ids defaults null, writer-only
# fields are decoded and discarded per the spec. The plan walk passes
# these as ``reader_schema`` — a table whose manifests were written
# before a field existed plans exactly like a current one.
MANIFEST_LIST_READER_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int", "default": 0},
        {"name": "content", "type": "int", "default": 0},
        {"name": "sequence_number", "type": "long", "default": 0},
        {"name": "min_sequence_number", "type": "long", "default": 0},
        {"name": "added_snapshot_id", "type": "long", "default": 0},
        {"name": "added_files_count", "type": "int", "default": 0},
        {"name": "existing_files_count", "type": "int", "default": 0},
        {"name": "deleted_files_count", "type": "int", "default": 0},
    ],
}

# bounds/counts maps (round 17): Iceberg serializes per-column stats
# as arrays of key/value records (Avro maps need string keys; the spec
# uses int field-id keys, hence the k/v-record encoding real manifests
# carry — e.g. k126_v127 in Java-written files)
_KV_LONG = {
    "type": "array",
    "items": {
        "type": "record",
        "name": "k_v_long",
        "fields": [
            {"name": "key", "type": "int"},
            {"name": "value", "type": "long"},
        ],
    },
}

_KV_BYTES = {
    "type": "array",
    "items": {
        "type": "record",
        "name": "k_v_bytes",
        "fields": [
            {"name": "key", "type": "int"},
            {"name": "value", "type": "bytes"},
        ],
    },
}

MANIFEST_READER_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None},
        {"name": "sequence_number", "type": ["null", "long"], "default": None},
        {
            "name": "file_sequence_number",
            "type": ["null", "long"],
            "default": None,
        },
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "data_file",
                "fields": [
                    {"name": "content", "type": "int", "default": 0},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    {
                        "name": "equality_ids",
                        "type": ["null", {"type": "array", "items": "int"}],
                        "default": None,
                    },
                    # Iceberg v3 deletion vectors (round 16): a DV
                    # entry is a content=1 delete whose bytes live in
                    # a PUFFIN file at [content_offset, +size)
                    {
                        "name": "referenced_data_file",
                        "type": ["null", "string"],
                        "default": None,
                    },
                    {
                        "name": "content_offset",
                        "type": ["null", "long"],
                        "default": None,
                    },
                    {
                        "name": "content_size_in_bytes",
                        "type": ["null", "long"],
                        "default": None,
                    },
                    # file-level column stats (round 17, VERDICT r16
                    # #1): single-value-serialized per-field bounds +
                    # counts — the data-skipping layer
                    {
                        "name": "value_counts",
                        "type": ["null", _KV_LONG],
                        "default": None,
                    },
                    {
                        "name": "null_value_counts",
                        "type": ["null", _KV_LONG],
                        "default": None,
                    },
                    {
                        "name": "lower_bounds",
                        "type": ["null", _KV_BYTES],
                        "default": None,
                    },
                    {
                        "name": "upper_bounds",
                        "type": ["null", _KV_BYTES],
                        "default": None,
                    },
                ],
            },
        },
    ],
}

#: v3 writer-side manifest entry schema (round 16): the v2 shape plus
#: the deletion-vector reference fields — fixtures write THIS, and the
#: round-16 reader-schema resolution proves v2 manifests (which lack
#: the fields) still plan identically.
MANIFEST_SCHEMA_V3 = {
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
                    {
                        "name": "referenced_data_file",
                        "type": ["null", "string"],
                    },
                    {"name": "content_offset", "type": ["null", "long"]},
                    {
                        "name": "content_size_in_bytes",
                        "type": ["null", "long"],
                    },
                ],
            },
        },
    ],
}

#: stats-carrying writer schema (round 17): the v2 shape plus the four
#: per-column stats fields — commits with ``stats_by_path`` write THIS,
#: and the reader-schema defaults keep stats-less manifests planning
#: identically.
MANIFEST_SCHEMA_STATS = {
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
                    {"name": "value_counts", "type": ["null", _KV_LONG]},
                    {
                        "name": "null_value_counts",
                        "type": ["null", _KV_LONG],
                    },
                    {"name": "lower_bounds", "type": ["null", _KV_BYTES]},
                    {"name": "upper_bounds", "type": ["null", _KV_BYTES]},
                ],
            },
        },
    ],
}

# v1 shapes (round 14): no sequence numbers, no content field — the
# pre-row-level-delete wire real warehouses still carry everywhere.
V1_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_snapshot_id", "type": "long"},
        {"name": "added_files_count", "type": "int"},
        {"name": "existing_files_count", "type": "int"},
        {"name": "deleted_files_count", "type": "int"},
    ],
}

V1_MANIFEST_SCHEMA = {
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


def _kv_map(records: "list[dict] | None") -> "dict[int, object] | None":
    """Decoded ``[{key, value}]`` k/v-record array → ``{field_id:
    value}`` (the manifest wire for per-column counts/bounds)."""
    if records is None:
        return None
    return {int(r["key"]): r["value"] for r in records}


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
    fmt = meta.get("format-version")
    if fmt not in (1, 2):
        raise NotImplementedError(
            f"iceberg: format-version {fmt} (v1/v2 metadata trees only)"
        )
    sid = snapshot_id if snapshot_id is not None else meta.get("current-snapshot-id")
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    if sid not in snaps:
        raise ValueError(f"iceberg: snapshot {sid} not in metadata")
    snap = snaps[sid]
    op = snap.get("summary", {}).get("operation", "append")
    # replace = compaction/rewrite commits (round 14): same resolution
    # semantics — the manifest list already reflects the rewrite
    if op not in ("append", "overwrite", "delete", "replace"):
        raise NotImplementedError(f"iceberg: snapshot operation {op!r}")
    schema_id = meta.get("current-schema-id", 0)
    schema = next(
        s for s in meta.get("schemas", []) if s.get("schema-id") == schema_id
    )
    fields_by_id = {f["id"]: f["name"] for f in schema["fields"]}

    # resolve manifests against the READER model (round 16): manifests
    # written under an older (v1-era subset) schema gain defaults for
    # the fields they predate instead of KeyErroring the walk
    manifest_list = avro_records(
        _member(members, snap["manifest-list"]),
        reader_schema=MANIFEST_LIST_READER_SCHEMA,
    )
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
        for entry in avro_records(blob, reader_schema=MANIFEST_READER_SCHEMA):
            if entry["status"] == _DELETED:
                continue
            if fmt == 1:
                # v1 manifests carry NO sequence numbers (the concept
                # arrived with v2's row-level deletes): every entry
                # plans at sequence 0, and delete manifests cannot
                # exist — content defaults cover both.
                seq = 0
            else:
                seq = entry["sequence_number"]
                if seq is None:
                    # v2 sequence-number inheritance: a null entry number
                    # takes the manifest-list's number (the sequence the
                    # manifest was added at, preserved across reuse).
                    seq = mf["sequence_number"]
            df = entry["data_file"]
            fmt_name = df["file_format"].upper()
            is_dv = df.get("referenced_data_file") is not None
            # v3 deletion vectors (round 16): PUFFIN-format delete
            # entries referencing one data file; everything else stays
            # parquet-only
            if fmt_name != "PARQUET" and not (fmt_name == "PUFFIN" and is_dv):
                raise NotImplementedError(
                    f"iceberg: file format {df['file_format']!r}"
                )
            rec = {
                "path": df["file_path"],
                "seq": seq,
                "content": df.get("content", 0),
                "record_count": df["record_count"],
                "size": df["file_size_in_bytes"],
                "equality_ids": df.get("equality_ids"),
                "referenced_data_file": df.get("referenced_data_file"),
                "content_offset": df.get("content_offset"),
                "content_size_in_bytes": df.get("content_size_in_bytes"),
                # k/v-record arrays → {field_id: value} (round 17)
                "value_counts": _kv_map(df.get("value_counts")),
                "null_value_counts": _kv_map(df.get("null_value_counts")),
                "lower_bounds": _kv_map(df.get("lower_bounds")),
                "upper_bounds": _kv_map(df.get("upper_bounds")),
            }
            if mf.get("content", 0) == 0:
                if rec["content"] != 0:
                    raise ValueError("iceberg: delete file in a data manifest")
                data_files.append(rec)
            else:
                if fmt == 1:
                    raise ValueError("iceberg: v1 tables cannot carry delete manifests")
                if df["content"] not in (1, 2):
                    raise ValueError("iceberg: data file in a delete manifest")
                delete_files.append(rec)
    return fields_by_id, data_files, delete_files


def _read_by_field_ids(
    blob: bytes, logical: list[str], name_to_id: dict[str, int]
) -> dict[str, list]:
    """Read parquet columns by ICEBERG FIELD ID when the file's schema
    carries ids (spec: name-independent resolution — the key that
    makes column rename metadata-only); files without ids fall back
    to name matching. Returns columns keyed by the LOGICAL names."""
    phys_by_id: dict[int, str] = {}
    for el in parquet_footer(blob)["schema"]:
        fid = el.get("field_id")
        if fid is not None and not el.get("num_children"):
            phys_by_id[fid] = el["name"]
    phys = []
    for c in logical:
        fid = name_to_id.get(c)
        if fid is not None and fid in phys_by_id:
            phys.append(phys_by_id[fid])
        else:
            phys.append(c)
    cols = parquet_read_columns(blob, phys)
    return {c: cols[p] for c, p in zip(logical, phys)}


def _decode_delete_files(
    members: dict,
    delete_files: list[dict],
    fields_by_id: dict,
    name_to_id: dict,
) -> tuple[list, list]:
    """Decode delete-file plan records once (they are small relative
    to data — the broadcast side of the anti-join at cluster scale):
    returns ``(pos_deletes, eq_deletes)`` where pos_deletes =
    ``[(seq, {data_path: {row}})]`` (position files AND v3 Puffin DVs)
    and eq_deletes = ``[(seq, (cols...), {value tuples})]``."""
    pos_deletes: list[tuple[int, dict[str, set[int]]]] = []
    eq_deletes: list[tuple[int, tuple, set]] = []
    for d in delete_files:
        blob = _member(members, d["path"])
        if len(blob) != d["size"]:
            raise ValueError(f"iceberg: delete file {d['path']!r} size mismatch")
        if d["content"] == 1:
            if d.get("referenced_data_file") is not None:
                # v3 deletion vector (round 16): the rows live in a
                # PUFFIN blob at [content_offset, +content_size) —
                # ranged read, CRC-32C-checked, RoaringBitmapArray
                # payload; applies to exactly ONE data file with the
                # same >= sequence rule as position deletes
                off = d.get("content_offset")
                size = d.get("content_size_in_bytes")
                if off is None or size is None:
                    raise ValueError(
                        "iceberg: DV entry missing content_offset/"
                        "content_size_in_bytes"
                    )
                rows_set = dv_blob_parse(blob[off : off + size])
                pos_deletes.append(
                    (
                        d["seq"],
                        {d["referenced_data_file"]: {int(r) for r in rows_set}},
                    )
                )
            else:
                cols = parquet_read_columns(blob, ["file_path", "pos"])
                by_path: dict[str, set[int]] = {}
                for p, pos in zip(cols["file_path"], cols["pos"]):
                    by_path.setdefault(p, set()).add(int(pos))
                pos_deletes.append((d["seq"], by_path))
        else:
            ids = d.get("equality_ids") or []
            if not ids:
                raise ValueError(
                    "iceberg: equality delete file without equality_ids"
                )
            # multi-column equality deletes (round 16, VERDICT r15 #4 —
            # the Flink CDC write shape): the delete row matches on the
            # CONJUNCTION of all id columns, null meaning "equals null"
            del_cols = []
            for fid in ids:
                col = fields_by_id.get(fid)
                if col is None:
                    raise ValueError(
                        f"iceberg: equality_id {fid} not in current schema"
                    )
                del_cols.append(col)
            vals = _read_by_field_ids(blob, del_cols, name_to_id)
            n_del = len(vals[del_cols[0]])
            tuples = {
                tuple(vals[c][i] for c in del_cols) for i in range(n_del)
            }
            eq_deletes.append((d["seq"], tuple(del_cols), tuples))
    return pos_deletes, eq_deletes


def iceberg_snapshot_rows(
    tar_payload: bytes,
    columns: list[str],
    snapshot_id: int | None = None,
    timestamp_ms: "int | None" = None,
) -> list[tuple[int, dict]]:
    """Materialize the selected snapshot: plan via the manifest tree,
    decode live parquet data files through the from-scratch reader,
    apply position deletes (``delete.seq >= data.seq``) then equality
    deletes (``delete.seq > data.seq``), and yield
    ``(seq_added, row_dict)`` per surviving row in (file, position)
    order. ``timestamp_ms`` resolves as-of-timestamp through
    :func:`iceberg_snapshot_at_timestamp` (round 17) — mutually
    exclusive with ``snapshot_id``."""
    if timestamp_ms is not None:
        if snapshot_id is not None:
            raise ValueError(
                "iceberg: give snapshot_id OR timestamp_ms, not both"
            )
        snapshot_id = iceberg_snapshot_at_timestamp(tar_payload, timestamp_ms)
    members = dict(tar_members(tar_payload))
    fields_by_id, data_files, delete_files = iceberg_plan_snapshot(
        tar_payload, snapshot_id
    )
    name_to_id = {v: k for k, v in fields_by_id.items()}
    pos_deletes, eq_deletes = _decode_delete_files(
        members, delete_files, fields_by_id, name_to_id
    )

    out: list[tuple[int, dict]] = []
    for f in sorted(data_files, key=lambda r: r["path"]):
        blob = _member(members, f["path"])
        if len(blob) != f["size"]:
            raise ValueError(f"iceberg: data file {f['path']!r} size mismatch")
        need = list(columns)
        for _, del_cols, _vals in eq_deletes:
            for col in del_cols:
                if col not in need:
                    need.append(col)
        cols = _read_by_field_ids(blob, need, name_to_id)
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
            for seq, del_cols, vals in eq_deletes:
                if seq > f["seq"] and tuple(row[c] for c in del_cols) in vals:
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


def partition_bound(v: int, width: int = 8) -> bytes:
    """Iceberg single-value serialization of an int/long (LE two's
    complement; temporal/bucket transform RESULTS are 4-byte ints,
    identity/truncate over longs stay 8)."""
    return int(v).to_bytes(width, "little", signed=True)


# ---------------------------------------------------------------------------
# Partition-spec transforms (round 14) — spec Appendix B
# ---------------------------------------------------------------------------

_MASK32 = 0xFFFFFFFF


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x86 32-bit (public domain, Austin Appleby) — the
    hash Iceberg's bucket transform mandates (spec Appendix B). Signed
    32-bit result."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & _MASK32
    n = len(data)
    rounds = n // 4
    for i in range(rounds):
        k = int.from_bytes(data[4 * i : 4 * i + 4], "little")
        k = (k * c1) & _MASK32
        k = ((k << 15) | (k >> 17)) & _MASK32
        k = (k * c2) & _MASK32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _MASK32
        h = (h * 5 + 0xE6546B64) & _MASK32
    tail = data[4 * rounds :]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & _MASK32
        k = ((k << 15) | (k >> 17)) & _MASK32
        k = (k * c2) & _MASK32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _MASK32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _MASK32
    h ^= h >> 16
    return h - (1 << 32) if h & 0x80000000 else h


def iceberg_bucket(value, n: int, src_type: str = "long") -> int:
    """bucket[N]: ``(murmur3_x86_32(serialized) & Int.MAX) % N``.
    int/long/date/time/timestamp hash their 8-byte little-endian long
    form; strings hash raw UTF-8 (spec: hashes must agree across the
    int→long promotion, hence the shared 8-byte form)."""
    if src_type in ("int", "long", "date", "time", "timestamp", "timestamptz"):
        raw = int(value).to_bytes(8, "little", signed=True)
    elif src_type == "string":
        raw = str(value).encode("utf-8")
    elif src_type in ("binary", "fixed"):
        raw = bytes(value)
    else:
        raise NotImplementedError(f"iceberg: bucket over {src_type!r}")
    return (murmur3_x86_32(raw) & 0x7FFFFFFF) % n


_MICROS_PER_HOUR = 3_600_000_000
_MICROS_PER_DAY = 86_400_000_000

_TRANSFORM_RE = None  # lazy-compiled (keeps import cheap)


def iceberg_transform(transform: str, value, src_type: str = "long"):
    """Apply a partition transform to a source value. Temporal
    transforms take timestamp MICROS (or date DAYS for ``date``
    sources) and return calendar offsets from the Unix epoch — year/
    month as year/month counts, day as epoch days, hour as epoch
    hours — all floored toward -inf like the spec's Java impl."""
    global _TRANSFORM_RE
    if _TRANSFORM_RE is None:
        import re as _re

        _TRANSFORM_RE = _re.compile(r"^(identity|void|year|month|day|hour)$|^(bucket|truncate)\[(\d+)\]$")
    m = _TRANSFORM_RE.match(transform)
    if not m:
        raise NotImplementedError(f"iceberg: unknown transform {transform!r}")
    if value is None:
        return None
    if m.group(1) == "identity":
        return value
    if m.group(1) == "void":
        return None
    if m.group(2) == "bucket":
        return iceberg_bucket(value, int(m.group(3)), src_type)
    if m.group(2) == "truncate":
        w = int(m.group(3))
        if w <= 0:
            raise ValueError("iceberg: truncate width must be positive")
        if src_type in ("int", "long"):
            return int(value) - (int(value) % w)  # Python % floors: W·⌊v/W⌋
        if src_type == "string":
            return str(value)[:w]
        raise NotImplementedError(f"iceberg: truncate over {src_type!r}")
    # temporal family
    if src_type == "date":
        days = int(value)
    elif src_type in ("timestamp", "timestamptz"):
        days = int(value) // _MICROS_PER_DAY
    else:
        raise NotImplementedError(
            f"iceberg: temporal transform over {src_type!r}"
        )
    kind = m.group(1)
    if kind == "day":
        return days
    if kind == "hour":
        if src_type == "date":
            raise ValueError("iceberg: hour transform needs a timestamp source")
        return int(value) // _MICROS_PER_HOUR
    import datetime as _dt

    d = _dt.date(1970, 1, 1) + _dt.timedelta(days=days)
    if kind == "year":
        return d.year - 1970
    return (d.year - 1970) * 12 + (d.month - 1)  # month


def transform_result_width(transform: str, src_type: str = "long") -> int:
    """Byte width of the transform RESULT's single-value serialization
    (field-summary bounds wire): temporal + bucket results are ints
    (4), identity/truncate keep the source width."""
    if transform in ("year", "month", "day", "hour") or transform.startswith(
        "bucket["
    ):
        return 4
    if src_type == "int":
        return 4
    return 8


def iceberg_partition_scan(
    tar_payload: bytes,
    columns: list[str],
    part_value=None,
    source_value=None,
    source_values: "dict[str, object] | None" = None,
    predicate: "list[tuple[str, str, object]] | None" = None,
) -> tuple[list[dict], dict[str, int]]:
    """Scan one partition of a partitioned table: manifests whose
    field summaries exclude the partition key are never OPENED
    (manifests_skipped), entries whose partition struct mismatches
    are never READ (files_skipped), and only the surviving parquet
    decodes. ``source_value`` gives the probe in SOURCE-column terms;
    the planner reads the metadata's ``partition-specs``, applies the
    spec's transform to it (round 14), and prunes on the TRANSFORMED
    key — ``part_value`` passes an already-transformed key directly
    (and is the identity-spec legacy form). Returns (rows, counters)
    — the counters are the plan contract; at 100 TB this two-level
    prune is why an Iceberg query over one partition costs O(one
    manifest + its files), not O(table)."""
    members = dict(tar_members(tar_payload))
    meta_names = [n for n in members if n.endswith(".metadata.json")]
    if len(meta_names) != 1:
        raise ValueError("iceberg: expected exactly one *.metadata.json member")
    meta = json.loads(members[meta_names[0]].decode("utf-8"))
    if meta.get("format-version") not in (1, 2):
        raise NotImplementedError("iceberg: v1/v2 metadata trees only")
    snap = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )

    # resolve the partition spec: per-field (name, transform, source
    # type) — identity over "part" when no spec is declared. Multi-
    # field specs (round 14 second pass) prune as a CONJUNCTION: a
    # manifest survives only if EVERY field's summary admits its key,
    # a file only if every partition-struct field matches.
    fields_meta: list[tuple[str, str, str]] = [("part", "identity", "long")]
    specs = meta.get("partition-specs")
    if specs:
        spec = next(
            (s for s in specs if s.get("spec-id") == meta.get("default-spec-id", 0)),
            specs[0],
        )
        schema_id = meta.get("current-schema-id", 0)
        schema = next(
            s for s in meta.get("schemas", []) if s.get("schema-id") == schema_id
        )
        by_id = {f["id"]: f["type"] for f in schema["fields"]}
        fields_meta = [
            (f["name"], f["transform"], by_id.get(f.get("source-id"), "long"))
            for f in spec.get("fields", [])
        ]
        if not fields_meta:
            raise ValueError("iceberg: empty partition spec")

    if source_values is not None:
        probes = dict(source_values)
    elif source_value is not None:
        if len(fields_meta) != 1:
            raise ValueError(
                "iceberg: multi-field spec needs source_values by field name"
            )
        probes = {fields_meta[0][0]: source_value}
    else:
        probes = None  # part_value is an already-transformed single key

    part_keys: dict[str, int | str] = {}
    widths: dict[str, int] = {}
    for name, transform, src_type in fields_meta:
        if transform == "void":
            # spec EVOLUTION leaves dropped fields behind as void —
            # they partition nothing and match every file, so they
            # drop out of the conjunction (round 15; previously typed)
            continue
        if probes is not None:
            if name not in probes:
                raise ValueError(f"iceberg: no probe for partition field {name!r}")
            key = iceberg_transform(transform, probes[name], src_type)
            if key is None:
                raise ValueError("iceberg: null probe cannot select a partition")
        else:
            key = part_value
        part_keys[name] = key
        widths[name] = transform_result_width(transform, src_type)
    if not part_keys:
        raise ValueError("iceberg: every spec field is void — nothing to prune on")

    counters = {
        "manifests_total": 0,
        "manifests_skipped": 0,
        "files_skipped": 0,
        "files_scanned": 0,
    }
    if predicate is not None:
        counters["files_skipped_stats"] = 0
    manifest_list = avro_records(_member(members, snap["manifest-list"]))

    # row-level deletes apply INSIDE the surviving partition too (round
    # 15 — previously the scan skipped delete manifests entirely and
    # would have returned deleted rows on any v2 table carrying them):
    # decode the (small) delete files once, same sequence rules as
    # iceberg_snapshot_rows.
    schema_fields = {}
    if meta.get("schemas"):
        sch = next(
            s for s in meta["schemas"]
            if s.get("schema-id") == meta.get("current-schema-id", 0)
        )
        schema_fields = {f["id"]: f["name"] for f in sch["fields"]}
    name_to_id = {v: k for k, v in schema_fields.items()}
    pos_deletes: list[tuple[int, dict]] = []
    eq_deletes: list[tuple[int, tuple, set]] = []
    for mf in manifest_list:
        if mf.get("content", 0) != 1:
            continue
        dblob = _member(members, mf["manifest_path"])
        if len(dblob) != mf["manifest_length"]:
            raise ValueError("iceberg: manifest length mismatch")
        for entry in avro_records(dblob):
            if entry["status"] == _DELETED:
                continue
            seq = entry.get("sequence_number")
            if seq is None:
                seq = mf["sequence_number"]
            df = entry["data_file"]
            fblob = _member(members, df["file_path"])
            if len(fblob) != df["file_size_in_bytes"]:
                raise ValueError("iceberg: delete file size mismatch")
            if df.get("content") == 1:
                cols = parquet_read_columns(fblob, ["file_path", "pos"])
                by_path: dict[str, set] = {}
                for p, pos_ in zip(cols["file_path"], cols["pos"]):
                    by_path.setdefault(p, set()).add(int(pos_))
                pos_deletes.append((seq, by_path))
            elif df.get("content") == 2:
                ids = df.get("equality_ids") or []
                if not ids:
                    raise ValueError(
                        "iceberg: equality delete file without equality_ids"
                    )
                # multi-column (round 16): conjunctive tuple match
                del_cols = []
                for fid in ids:
                    col = schema_fields.get(fid)
                    if col is None:
                        raise ValueError(
                            f"iceberg: equality_id {fid} not in current schema"
                        )
                    del_cols.append(col)
                vals = _read_by_field_ids(fblob, del_cols, name_to_id)
                n_del = len(vals[del_cols[0]])
                tuples = {
                    tuple(vals[c][i] for c in del_cols) for i in range(n_del)
                }
                eq_deletes.append((seq, tuple(del_cols), tuples))
            else:
                raise ValueError("iceberg: data file in a delete manifest")

    rows: list[dict] = []
    for mf in manifest_list:
        if mf.get("content", 0) != 0:
            continue
        counters["manifests_total"] += 1
        summaries = mf.get("partitions")
        excluded = False
        if summaries:
            if len(summaries) < len(fields_meta):
                raise ValueError("iceberg: field summaries shorter than spec")
            for fi, (name, transform, _st) in enumerate(fields_meta):
                if name not in part_keys:
                    continue  # void field: no constraint
                s0 = summaries[fi]
                lo = s0.get("lower_bound")
                hi = s0.get("upper_bound")
                key = part_keys[name]
                if lo is None or hi is None or not isinstance(key, int):
                    continue
                if len(lo) != widths[name] or len(hi) != widths[name]:
                    raise ValueError(
                        "iceberg: field-summary bound width mismatch for "
                        f"{transform} (want {widths[name]} bytes)"
                    )
                lo_v = int.from_bytes(bytes(lo), "little", signed=True)
                hi_v = int.from_bytes(bytes(hi), "little", signed=True)
                if not lo_v <= key <= hi_v:
                    excluded = True
                    break
        if excluded:
            counters["manifests_skipped"] += 1
            continue
        blob = _member(members, mf["manifest_path"])
        if len(blob) != mf["manifest_length"]:
            raise ValueError("iceberg: manifest length mismatch")
        for entry in avro_records(blob):
            if entry["status"] == _DELETED:
                continue
            df = entry["data_file"]
            if any(
                df["partition"][name] != part_keys[name]
                for name, _t, _s in fields_meta
                if name in part_keys
            ):
                counters["files_skipped"] += 1
                continue
            if predicate:
                # E195 bounds beside the partition record (round 17):
                # partition-surviving files still skip on stats
                types_by_id = {
                    fid: meta_type
                    for fid, meta_type in (
                        (f["id"], f["type"])
                        for s0 in meta.get("schemas", [])
                        if s0.get("schema-id")
                        == meta.get("current-schema-id", 0)
                        for f in s0["fields"]
                    )
                }
                rec = {
                    "value_counts": _kv_map(df.get("value_counts")),
                    "null_value_counts": _kv_map(df.get("null_value_counts")),
                    "lower_bounds": _kv_map(df.get("lower_bounds")),
                    "upper_bounds": _kv_map(df.get("upper_bounds")),
                }
                admitted = True
                for col, op, value in predicate:
                    fid = name_to_id.get(col)
                    if fid is None:
                        raise ValueError(
                            f"iceberg: predicate column {col!r} not in schema"
                        )
                    if not _bounds_admit(
                        rec, fid, types_by_id.get(fid, "long"), op, value
                    ):
                        admitted = False
                        break
                if not admitted:
                    counters["files_skipped_stats"] += 1
                    continue
            data = _member(members, df["file_path"])
            if len(data) != df["file_size_in_bytes"]:
                raise ValueError("iceberg: data file size mismatch")
            data_seq = entry.get("sequence_number")
            if data_seq is None:
                data_seq = mf.get("sequence_number", 0)
            need = list(columns)
            for _sq, del_cols, _vals in eq_deletes:
                for col in del_cols:
                    if col not in need:
                        need.append(col)
            for col, _op, _v in predicate or ():
                if col not in need:
                    need.append(col)
            cols = _read_by_field_ids(data, need, name_to_id)
            n = len(cols[need[0]]) if need else 0
            if n != df["record_count"]:
                raise ValueError("iceberg: data file record count mismatch")
            counters["files_scanned"] += 1
            dead: set = set()
            for sq, by_path in pos_deletes:
                if sq >= data_seq:
                    dead |= by_path.get(df["file_path"], set())
            for i in range(n):
                if i in dead:
                    continue
                if any(
                    sq > data_seq
                    and tuple(cols[c][i] for c in del_cols) in vals
                    for sq, del_cols, vals in eq_deletes
                ):
                    continue
                if predicate and not _predicate_row_ok(
                    {c: cols[c][i] for c in need}, predicate
                ):
                    continue
                rows.append({c: cols[c][i] for c in columns})
    return rows, counters


def _predicate_row_ok(row: dict, predicate: list) -> bool:
    for col, op, value in predicate:
        v = row.get(col)
        if op == "is_null":
            if v is not None:
                return False
            continue
        if op == "not_null":
            if v is None:
                return False
            continue
        if v is None:
            return False
        if op == "==" and not v == value:
            return False
        if op == "<" and not v < value:
            return False
        if op == "<=" and not v <= value:
            return False
        if op == ">" and not v > value:
            return False
        if op == ">=" and not v >= value:
            return False
    return True


# ---------------------------------------------------------------------------
# table WRITING — round 14, session 3: the commit loop
# ---------------------------------------------------------------------------
#
# The Delta side gained its write loop in session 2 (checkpoint
# writing, deltalog.py); this is the Iceberg twin: a create/commit API
# over an object-store-shaped ``{path: bytes}`` member dict, emitting
# the same wire the resolver above consumes — manifests through the
# from-scratch Avro OCF writer (null entry sequence numbers, so the
# reader's v2 INHERITANCE path is exercised on every commit), manifest
# lists that REUSE prior manifests verbatim (their entries keep their
# original data sequence via the carried-forward list record), and a
# single current *.metadata.json whose ``snapshots`` array preserves
# the full lineage for time travel. Spec: iceberg.apache.org/spec/.


def _partitioned_manifest_schema(
    part_record: dict, with_stats: bool = False
) -> dict:
    """MANIFEST_SCHEMA with a per-spec partition record spliced into
    data_file (commit-side twin of PARTITIONED_MANIFEST_SCHEMA);
    ``with_stats`` appends the four E195 stats fields (round 17 —
    the partition+stats composition)."""
    df_fields = [
        {"name": "content", "type": "int"},
        {"name": "file_path", "type": "string"},
        {"name": "file_format", "type": "string"},
        {"name": "partition", "type": part_record},
        {"name": "record_count", "type": "long"},
        {"name": "file_size_in_bytes", "type": "long"},
    ]
    if with_stats:
        df_fields += [
            {"name": "value_counts", "type": ["null", _KV_LONG]},
            {"name": "null_value_counts", "type": ["null", _KV_LONG]},
            {"name": "lower_bounds", "type": ["null", _KV_BYTES]},
            {"name": "upper_bounds", "type": ["null", _KV_BYTES]},
        ]
    return {
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
                    "fields": df_fields,
                },
            },
        ],
    }


def iceberg_table_create(
    fields: list[dict],
    location: str = "tbl",
    table_uuid: str | None = None,
    partition_spec: list[dict] | None = None,
    format_version: int = 2,
) -> dict[str, bytes]:
    """New empty table: ``fields`` = [{"id", "name", "type",
    "required"}] in spec schema-JSON shape; ``partition_spec`` =
    [{"name", "transform", "source-id", "field-id"}] declares the
    default spec (commits then REQUIRE per-file partition values and
    emit partitioned manifests with field summaries). Returns the
    member dict holding ``metadata/v1.metadata.json``.
    ``format_version=1`` (round 17) creates a v1 table — commits then
    write the PRE-row-level-delete wire (no sequence numbers, no
    delete manifests) the round-14 reader already resolves."""
    if format_version not in (1, 2):
        raise NotImplementedError(
            f"iceberg: format-version {format_version}"
        )
    meta = {
        "format-version": format_version,
        "table-uuid": table_uuid
        or "00000000-0000-0000-0000-000000000000",
        "location": location,
        "last-sequence-number": 0,
        "current-snapshot-id": None,
        "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": fields}],
        "snapshots": [],
        "metadata-log": [],
    }
    if partition_spec:
        meta["partition-specs"] = [
            {"spec-id": 0, "fields": partition_spec}
        ]
        meta["default-spec-id"] = 0
    return {"metadata/v1.metadata.json": json.dumps(meta).encode("utf-8")}


def _current_metadata(members: dict[str, bytes]) -> tuple[str, dict]:
    names = [n for n in members if n.endswith(".metadata.json")]
    if len(names) != 1:
        raise ValueError("iceberg: expected exactly one *.metadata.json")
    return names[0], json.loads(members[names[0]].decode("utf-8"))


def iceberg_commit(
    members: dict[str, bytes],
    data_files: list[tuple[str, bytes, int]] | None = None,
    delete_files: list[dict] | None = None,
    operation: str | None = None,
    extra_summary: "dict[str, str] | None" = None,
    stats_by_path: "dict[str, dict] | None" = None,
    remove_files: "list[str] | None" = None,
    branch: str = "main",
) -> tuple[dict[str, bytes], int]:
    """One snapshot commit. ``data_files`` = [(path, parquet_bytes,
    record_count)] — or [(path, size_in_bytes, record_count)] with an
    int second element for files ALREADY written to the table location
    by executors (manifest-only commit: the driver never holds the
    data bytes, the 100 TB streaming-sink shape);
    ``delete_files`` = [{"path", "blob", "content"
    (1 positional | 2 equality), "record_count", "equality_ids"}].
    Returns ``(new_members, snapshot_id)``; the input dict is not
    mutated. Commit mechanics per the v2 spec:

    * sequence number = last-sequence-number + 1 (also the snapshot
      id here — deterministic, no clock);
    * the commit's files go into fresh manifests whose ENTRIES carry
      null sequence numbers — inherited from the manifest-list record
      at read time (the write-before-sequence-known trick);
    * the new manifest list carries every prior manifest record
      VERBATIM (reuse: their entries keep their original sequence)
      plus the new manifests at this commit's sequence;
    * a new vN metadata replaces the old one (single-current-pointer
      discipline; the replaced name is recorded in metadata-log, and
      the whole snapshot lineage stays embedded for time travel).

    ``stats_by_path`` (round 17, VERDICT r16 #1) attaches per-column
    file stats to data files: ``{path: {"value_counts": {fid: n},
    "null_value_counts": {fid: n}, "lower_bounds": {fid: value},
    "upper_bounds": {fid: value}}}`` with PYTHON values — bounds are
    single-value-serialized here by the schema field's type, and the
    manifest is written with the stats-carrying schema so readers can
    data-skip (``iceberg_bounds_scan``).
    """
    data_files = data_files or []
    delete_files = delete_files or []
    remove_files = remove_files or []
    if not data_files and not delete_files and not remove_files:
        raise ValueError("iceberg: empty commit")
    meta_name, meta = _current_metadata(members)
    fmt = meta.get("format-version")
    if fmt not in (1, 2):
        raise NotImplementedError("iceberg: commits write v1/v2 tables only")
    if fmt == 1:
        # v1 commits (round 17): the pre-row-level-delete wire — no
        # sequence numbers anywhere, delete files cannot exist, and
        # the features layered on the v2 wire stay v2-only (typed)
        if delete_files:
            raise ValueError("iceberg: v1 tables cannot carry delete files")
        for unsupported_name, unsupported_val in (
            ("stats_by_path", stats_by_path),
            ("remove_files", remove_files),
        ):
            if unsupported_val:
                raise NotImplementedError(
                    f"iceberg: {unsupported_name} on a v1 table"
                )
        if meta.get("partition-specs"):
            raise NotImplementedError(
                "iceberg: partitioned v1 commits"
            )
        return _iceberg_commit_v1(
            members, meta_name, meta, data_files, operation, extra_summary,
            branch,
        )
    seq = meta.get("last-sequence-number", 0) + 1
    snapshot_id = seq
    # snapshot refs (round 17, VERDICT r16 #9): the commit extends the
    # named BRANCH — "main" is implicitly the current-snapshot-id when
    # no refs map exists yet; a tag is immutable (typed); an unknown
    # non-main branch is typed (create it first)
    refs = dict(meta.get("refs") or {})
    if branch in refs:
        if refs[branch].get("type") == "tag":
            # per the spec, tags name immutable history
            raise ValueError(f"iceberg: cannot commit to tag {branch!r}")
        parent = refs[branch]["snapshot-id"]
    elif branch == "main":
        parent = meta.get("current-snapshot-id")
    else:
        raise ValueError(f"iceberg: unknown branch {branch!r}")

    # partitioned table? (round 14 s3 second pass): data files then
    # arrive as 4-tuples (path, blob, record_count, {field: value})
    # and the commit emits partitioned manifests + field summaries
    spec_fields: list[dict] = []
    specs = meta.get("partition-specs")
    if specs:
        spec = next(
            (
                sp
                for sp in specs
                if sp.get("spec-id") == meta.get("default-spec-id", 0)
            ),
            specs[0],
        )
        spec_fields = spec.get("fields", [])
    if spec_fields and data_files and len(data_files[0]) != 4:
        raise ValueError(
            "iceberg: partitioned table commits need (path, blob, "
            "record_count, partition) data files"
        )

    out = dict(members)

    def _entry(path, blob, content, nrec, eq_ids=None, partition=None):
        size = len(blob) if isinstance(blob, (bytes, bytearray)) else int(blob)
        df = {
            "content": content,
            "file_path": path,
            "file_format": "PARQUET",
            "record_count": nrec,
            "file_size_in_bytes": size,
            "equality_ids": eq_ids,
        }
        if partition is not None:
            df = {
                "content": content,
                "file_path": path,
                "file_format": "PARQUET",
                "partition": partition,
                "record_count": nrec,
                "file_size_in_bytes": size,
            }
        return {
            "status": 1,  # ADDED
            "snapshot_id": None,
            "sequence_number": None,  # inherit (v2)
            "file_sequence_number": None,
            "data_file": df,
        }

    def _list_record(path, blob, content, added):
        return {
            "manifest_path": path,
            "manifest_length": len(blob),
            "partition_spec_id": 0,
            "content": content,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": snapshot_id,
            "added_files_count": added,
            "existing_files_count": 0,
            "deleted_files_count": 0,
        }

    new_list_records: list[dict] = []
    if parent is not None:
        prev = next(
            s for s in meta["snapshots"] if s["snapshot-id"] == parent
        )
        prior_records = list(
            avro_records(_member(out, prev["manifest-list"]))
        )
        if remove_files:
            # DELETE/overwrite shape (round 17): manifests whose live
            # entries name a removed path are REWRITTEN — removed
            # entries flip to status DELETED (snapshot_id = this
            # commit), survivors become EXISTING, and every entry gets
            # its resolved sequence number EXPLICITLY (a null would
            # wrongly inherit this commit's sequence from the new list
            # record). Untouched manifests carry verbatim.
            if spec_fields:
                raise NotImplementedError(
                    "iceberg: remove_files on a partitioned table"
                )
            pending = set(remove_files)
            rw_idx = 0
            for rec in prior_records:
                if rec.get("content", 0) != 0:
                    new_list_records.append(rec)
                    continue
                blob = _member(out, rec["manifest_path"])
                entries = list(
                    avro_records(blob, reader_schema=MANIFEST_READER_SCHEMA)
                )
                live_paths = {
                    e["data_file"]["file_path"]
                    for e in entries
                    if e["status"] != 2
                }
                hit = live_paths & pending
                if not hit:
                    new_list_records.append(rec)
                    continue
                pending -= hit
                new_entries = []
                entry_seqs = []
                n_existing = n_deleted = 0
                for e in entries:
                    if e["status"] == 2:
                        continue  # prior tombstones drop from the rewrite
                    e_seq = e.get("sequence_number")
                    if e_seq is None:
                        e_seq = rec.get("sequence_number", 0)
                    entry_seqs.append(e_seq)
                    df = e["data_file"]
                    removed = df["file_path"] in hit
                    if removed:
                        n_deleted += 1
                    else:
                        n_existing += 1
                    new_entries.append(
                        {
                            "status": 2 if removed else 0,
                            "snapshot_id": (
                                snapshot_id if removed else e.get("snapshot_id")
                            ),
                            "sequence_number": e_seq,
                            "file_sequence_number": e.get(
                                "file_sequence_number"
                            ),
                            "data_file": {
                                "content": df.get("content", 0),
                                "file_path": df["file_path"],
                                "file_format": df.get(
                                    "file_format", "PARQUET"
                                ),
                                "record_count": df["record_count"],
                                "file_size_in_bytes": df[
                                    "file_size_in_bytes"
                                ],
                                "equality_ids": df.get("equality_ids"),
                                "value_counts": df.get("value_counts"),
                                "null_value_counts": df.get(
                                    "null_value_counts"
                                ),
                                "lower_bounds": df.get("lower_bounds"),
                                "upper_bounds": df.get("upper_bounds"),
                            },
                        }
                    )
                m_path = f"metadata/m{seq}-rw{rw_idx}.avro"
                rw_idx += 1
                m_blob = avro_build(
                    MANIFEST_SCHEMA_STATS, new_entries, codec="deflate"
                )
                out[m_path] = m_blob
                new_list_records.append(
                    {
                        "manifest_path": m_path,
                        "manifest_length": len(m_blob),
                        "partition_spec_id": 0,
                        "content": 0,
                        "sequence_number": seq,
                        "min_sequence_number": (
                            min(entry_seqs) if entry_seqs else seq
                        ),
                        "added_snapshot_id": snapshot_id,
                        "added_files_count": 0,
                        "existing_files_count": n_existing,
                        "deleted_files_count": n_deleted,
                    }
                )
            if pending:
                raise ValueError(
                    f"iceberg: remove targets not in the live snapshot: "
                    f"{sorted(pending)}"
                )
        else:
            new_list_records.extend(prior_records)
    elif remove_files:
        raise ValueError(
            f"iceberg: remove targets not in the live snapshot: "
            f"{sorted(set(remove_files))}"
        )
    if data_files:
        if spec_fields:
            schema_fields = {
                f["id"]: f for f in meta["schemas"][0]["fields"]
            }
            # partition values are nullable on the wire (spec: identity
            # over a null source column yields a null partition value)
            part_schema = {
                "type": "record",
                "name": "r102",
                "fields": [
                    {"name": sf["name"], "type": ["null", "long"]}
                    for sf in spec_fields
                ],
            }
            m_schema = _partitioned_manifest_schema(
                part_schema, with_stats=bool(stats_by_path)
            )
            entries = [
                _entry(p, b, 0, n, partition=part)
                for p, b, n, part in data_files
            ]
            if stats_by_path:
                # partition+stats composition (round 17): bounds ride
                # beside the partition record, serialized by schema type
                types_by_id = {
                    f["id"]: f["type"] for f in meta["schemas"][0]["fields"]
                }
                for e, (p, _b, _n, _part) in zip(entries, data_files):
                    st = stats_by_path.get(p) or {}
                    dfd = e["data_file"]
                    dfd["value_counts"] = _kv_records(st.get("value_counts"))
                    dfd["null_value_counts"] = _kv_records(
                        st.get("null_value_counts")
                    )
                    dfd["lower_bounds"] = _kv_records(
                        st.get("lower_bounds"), types_by_id
                    )
                    dfd["upper_bounds"] = _kv_records(
                        st.get("upper_bounds"), types_by_id
                    )
            for p, b, _n, _part in data_files:
                if isinstance(b, (bytes, bytearray)):
                    out[p] = b  # int size → file already at the location
            # per-field summaries over THIS manifest's files
            summaries = []
            for sf in spec_fields:
                src = schema_fields.get(sf.get("source-id"), {})
                width = transform_result_width(
                    sf["transform"], src.get("type", "long")
                )
                vals = [part[sf["name"]] for _p, _b, _n, part in data_files]
                # a data file may carry a null partition value (spec:
                # identity over a null source column); bounds are over
                # the non-null values only, contains_null records the
                # rest — min()/max() over None would TypeError.
                non_null = [v for v in vals if v is not None]
                summaries.append(
                    {
                        "contains_null": len(non_null) < len(vals),
                        "lower_bound": partition_bound(min(non_null), width)
                        if non_null
                        else None,
                        "upper_bound": partition_bound(max(non_null), width)
                        if non_null
                        else None,
                    }
                )
            m_path = f"metadata/m{seq}-data.avro"
            m_blob = avro_build(m_schema, entries, codec="deflate")
            out[m_path] = m_blob
            rec = _list_record(m_path, m_blob, 0, len(data_files))
            rec["partitions"] = summaries
            new_list_records.append(rec)
        else:
            entries = [_entry(p, b, 0, n) for p, b, n in data_files]
            for p, b, _n in data_files:
                if isinstance(b, (bytes, bytearray)):
                    out[p] = b  # int size → file already at the location
            m_schema = MANIFEST_SCHEMA
            if stats_by_path:
                # stats-carrying manifest (round 17): bounds serialize
                # by the schema field's type; every entry carries the
                # four fields (null when the file has no stats)
                m_schema = MANIFEST_SCHEMA_STATS
                types_by_id = {
                    f["id"]: f["type"] for f in meta["schemas"][0]["fields"]
                }
                for e, (p, _b, _n) in zip(entries, data_files):
                    st = stats_by_path.get(p) or {}
                    dfd = e["data_file"]
                    dfd["value_counts"] = _kv_records(st.get("value_counts"))
                    dfd["null_value_counts"] = _kv_records(
                        st.get("null_value_counts")
                    )
                    dfd["lower_bounds"] = _kv_records(
                        st.get("lower_bounds"), types_by_id
                    )
                    dfd["upper_bounds"] = _kv_records(
                        st.get("upper_bounds"), types_by_id
                    )
            m_path = f"metadata/m{seq}-data.avro"
            m_blob = avro_build(m_schema, entries, codec="deflate")
            out[m_path] = m_blob
            new_list_records.append(
                _list_record(m_path, m_blob, 0, len(data_files))
            )
    if delete_files:
        entries = []
        # v3 deletion vectors (round 16): entries carrying
        # referenced_data_file write the extended manifest schema and
        # a PUFFIN file format marker
        has_dv = any(d.get("referenced_data_file") for d in delete_files)
        for d in delete_files:
            if d["content"] not in (1, 2):
                raise ValueError("iceberg: delete content must be 1 or 2")
            e = _entry(
                d["path"],
                d["blob"],
                d["content"],
                d["record_count"],
                d.get("equality_ids"),
            )
            if has_dv:
                dfd = e["data_file"]
                dfd["referenced_data_file"] = d.get("referenced_data_file")
                dfd["content_offset"] = d.get("content_offset")
                dfd["content_size_in_bytes"] = d.get("content_size_in_bytes")
                if d.get("referenced_data_file") is not None:
                    dfd["file_format"] = "PUFFIN"
            entries.append(e)
            out[d["path"]] = d["blob"]
        m_path = f"metadata/m{seq}-deletes.avro"
        m_blob = avro_build(
            MANIFEST_SCHEMA_V3 if has_dv else MANIFEST_SCHEMA,
            entries,
            codec="deflate",
        )
        out[m_path] = m_blob
        new_list_records.append(
            _list_record(m_path, m_blob, 1, len(delete_files))
        )
    list_path = f"metadata/snap-{snapshot_id}.avro"
    if spec_fields:
        for rec in new_list_records:
            rec.setdefault("partitions", None)
        out[list_path] = avro_build(
            PARTITIONED_MANIFEST_LIST_SCHEMA, new_list_records, codec="deflate"
        )
    else:
        out[list_path] = avro_build(
            MANIFEST_LIST_SCHEMA, new_list_records, codec="deflate"
        )

    if operation:
        op = operation
    elif remove_files:
        op = "overwrite" if (data_files or delete_files) else "delete"
    else:
        op = "overwrite" if delete_files else "append"
    summary = {"operation": op}
    if extra_summary:
        # e.g. the streaming sink's batch-id stamp — the replay
        # idempotency marker real engines put here too
        summary.update({str(k): str(v) for k, v in extra_summary.items()})
    snap = {
        "snapshot-id": snapshot_id,
        "sequence-number": seq,
        "timestamp-ms": seq,  # deterministic lineage clock
        "manifest-list": list_path,
        "summary": summary,
    }
    if parent is not None:
        snap["parent-snapshot-id"] = parent
    meta = dict(meta)
    meta["snapshots"] = [*meta.get("snapshots", []), snap]
    refs[branch] = {"snapshot-id": snapshot_id, "type": "branch"}
    meta["refs"] = refs
    if branch == "main":
        # the main branch IS the table head (spec: main mirrors
        # current-snapshot-id); other branches leave it untouched
        meta["current-snapshot-id"] = snapshot_id
    meta["last-sequence-number"] = seq
    meta["metadata-log"] = [
        *meta.get("metadata-log", []),
        {"metadata-file": meta_name, "timestamp-ms": seq - 1},
    ]
    version = int(meta_name.rsplit("/v", 1)[1].split(".")[0]) + 1
    del out[meta_name]
    out[f"metadata/v{version}.metadata.json"] = json.dumps(meta).encode(
        "utf-8"
    )
    return out, snapshot_id


def iceberg_incremental_files(
    tar_payload: bytes,
    from_snapshot: int,
    to_snapshot: "int | None" = None,
) -> list[tuple[int, dict]]:
    """INCREMENTAL APPEND SCAN (round 16, the Iceberg twin of Delta's
    change feed): the data files ADDED by snapshots in
    ``(from_snapshot, to_snapshot]``, walked down the
    parent-snapshot-id chain, as ``[(snapshot_id, file_rec)]``. Per
    the spec's incremental read: only ``append`` snapshots qualify —
    an overwrite/delete/replace in the range is a typed error (its
    removals cannot be represented as appends; Spark's
    incremental-scan raises exactly here). Files are taken from
    manifests the snapshot itself added (``added_snapshot_id``
    match) with ADDED-status entries — a reused manifest from an
    earlier snapshot contributes nothing."""
    members = dict(tar_members(tar_payload))
    meta_names = [n for n in members if n.endswith(".metadata.json")]
    if len(meta_names) != 1:
        raise ValueError("iceberg: expected exactly one *.metadata.json member")
    meta = json.loads(members[meta_names[0]].decode("utf-8"))
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    to_id = (
        to_snapshot
        if to_snapshot is not None
        else meta.get("current-snapshot-id")
    )
    if to_id not in snaps:
        raise ValueError(f"iceberg: snapshot {to_id} not in metadata")
    if from_snapshot not in snaps:
        raise ValueError(f"iceberg: snapshot {from_snapshot} not in metadata")
    # walk to → from along the parent chain
    chain: list[dict] = []
    cur = to_id
    while cur != from_snapshot:
        if cur is None or cur not in snaps:
            raise ValueError(
                f"iceberg: snapshot {from_snapshot} is not an ancestor "
                f"of {to_id}"
            )
        chain.append(snaps[cur])
        cur = snaps[cur].get("parent-snapshot-id")
    out: list[tuple[int, dict]] = []
    for snap in reversed(chain):  # oldest first
        # summary/operation is OPTIONAL in v1-era metadata (ADVICE r16):
        # a snapshot without it cannot be PROVEN an append, and silently
        # scanning an unproven overwrite/delete as one emits wrong
        # incremental results — typed, like the non-append case
        op = snap.get("summary", {}).get("operation")
        if op is None:
            raise NotImplementedError(
                "iceberg: incremental scan over a snapshot with no "
                "summary.operation (cannot prove it was an append)"
            )
        if op != "append":
            raise NotImplementedError(
                f"iceberg: incremental scan over a {op!r} snapshot"
            )
        sid = snap["snapshot-id"]
        for mf in avro_records(
            _member(members, snap["manifest-list"]),
            reader_schema=MANIFEST_LIST_READER_SCHEMA,
        ):
            if mf.get("added_snapshot_id") != sid or mf.get("content", 0) != 0:
                continue
            blob = _member(members, mf["manifest_path"])
            if len(blob) != mf["manifest_length"]:
                raise ValueError("iceberg: manifest length mismatch")
            for entry in avro_records(
                blob, reader_schema=MANIFEST_READER_SCHEMA
            ):
                if entry["status"] != 1:  # ADDED only
                    continue
                df = entry["data_file"]
                out.append(
                    (
                        sid,
                        {
                            "path": df["file_path"],
                            "record_count": df["record_count"],
                            "size": df["file_size_in_bytes"],
                        },
                    )
                )
    return out


# ---------------------------------------------------------------------------
# File-level column-stats data skipping — round 17 (VERDICT r16 #1)
# ---------------------------------------------------------------------------
# The Iceberg twin of Delta's add.stats pruning: each data_file entry
# may carry lower_bounds / upper_bounds / value_counts /
# null_value_counts keyed by schema FIELD ID, values in the spec's
# single-value serialization (Appendix D). The planner consults them
# beside the partition conjunction, BEFORE any parquet footer read.

import struct as _struct


def iceberg_single_value(value, typ: str) -> bytes:
    """Single-value serialization (spec Appendix D): the bounds wire.
    int/date 4-byte LE, long/timestamp(tz) 8-byte LE, float/double
    IEEE LE, boolean 1 byte, string raw UTF-8, binary raw."""
    if typ in ("int", "date"):
        return int(value).to_bytes(4, "little", signed=True)
    if typ in ("long", "time", "timestamp", "timestamptz"):
        return int(value).to_bytes(8, "little", signed=True)
    if typ == "float":
        return _struct.pack("<f", float(value))
    if typ == "double":
        return _struct.pack("<d", float(value))
    if typ == "boolean":
        return b"\x01" if value else b"\x00"
    if typ == "string":
        return str(value).encode("utf-8")
    if typ in ("binary", "fixed"):
        return bytes(value)
    raise NotImplementedError(f"iceberg: single-value type {typ!r}")


def iceberg_single_value_decode(raw: bytes, typ: str):
    """Inverse of :func:`iceberg_single_value` (width-checked for the
    fixed-width types — a wrong-width bound is a corrupt manifest)."""
    raw = bytes(raw)
    if typ in ("int", "date"):
        if len(raw) != 4:
            raise ValueError(f"iceberg: {typ} bound must be 4 bytes")
        return int.from_bytes(raw, "little", signed=True)
    if typ in ("long", "time", "timestamp", "timestamptz"):
        if len(raw) != 8:
            raise ValueError(f"iceberg: {typ} bound must be 8 bytes")
        return int.from_bytes(raw, "little", signed=True)
    if typ == "float":
        return _struct.unpack("<f", raw)[0]
    if typ == "double":
        return _struct.unpack("<d", raw)[0]
    if typ == "boolean":
        return raw != b"\x00"
    if typ == "string":
        return raw.decode("utf-8")
    if typ in ("binary", "fixed"):
        return raw
    raise NotImplementedError(f"iceberg: single-value type {typ!r}")


def _kv_records(
    mapping: "dict[int, object] | None",
    types_by_id: "dict[int, str] | None" = None,
) -> "list[dict] | None":
    """{field_id: value} → the manifest's k/v-record array; with
    ``types_by_id`` the values single-value-serialize (bounds),
    without they stay longs (counts)."""
    if mapping is None:
        return None
    out = []
    for fid in sorted(mapping):
        v = mapping[fid]
        if types_by_id is not None:
            v = iceberg_single_value(v, types_by_id.get(fid, "long"))
        out.append({"key": int(fid), "value": v})
    return out


def _bounds_admit(
    rec: dict, fid: int, typ: str, op: str, value
) -> bool:
    """Can data file ``rec`` (a plan record carrying decoded stats
    maps) contain a row matching ``field op value``? Missing stats
    admit — pruning never invents evidence. Mirrors the Delta pruner's
    semantics (NULL never matches a comparison)."""
    if op not in ("==", "<", "<=", ">", ">=", "is_null", "not_null"):
        raise ValueError(f"iceberg: unknown predicate op {op!r}")
    nulls = (rec.get("null_value_counts") or {}).get(fid)
    n_vals = (rec.get("value_counts") or {}).get(fid)
    if op == "is_null":
        return not (nulls == 0)
    if op == "not_null":
        return not (
            nulls is not None and n_vals is not None and nulls == n_vals
        )
    if nulls is not None and n_vals is not None and nulls == n_vals:
        return False  # every value NULL
    lo_raw = (rec.get("lower_bounds") or {}).get(fid)
    hi_raw = (rec.get("upper_bounds") or {}).get(fid)
    if lo_raw is None or hi_raw is None:
        return True
    lo = iceberg_single_value_decode(lo_raw, typ)
    hi = iceberg_single_value_decode(hi_raw, typ)
    try:
        if op == "==":
            return lo <= value <= hi
        if op == "<":
            return lo < value
        if op == "<=":
            return lo <= value
        if op == ">":
            return hi > value
        if op == ">=":
            return hi >= value
    except TypeError:
        return True
    return True


def iceberg_bounds_scan(
    tar_payload: bytes,
    columns: list[str],
    predicate: "list[tuple[str, str, object]]",
    snapshot_id: "int | None" = None,
) -> tuple[list[dict], dict[str, int]]:
    """Bounds-PRUNED snapshot scan (round 17): data files whose
    lower/upper bounds + null/value counts prove the conjunctive
    ``predicate`` (``[(col, op, value)]``) cannot match are never
    OPENED — the ``files_skipped``/``files_scanned`` counters are the
    plan contract. Delete files are NEVER pruned by data bounds
    (a position/equality delete applies regardless of the probe);
    survivors decode, deletes apply with the usual sequence rules,
    and the predicate re-applies exactly per row."""
    members = dict(tar_members(tar_payload))
    fields_by_id, data_files, delete_files = iceberg_plan_snapshot(
        tar_payload, snapshot_id
    )
    name_to_id = {v: k for k, v in fields_by_id.items()}
    meta_names = [n for n in members if n.endswith(".metadata.json")]
    meta = json.loads(members[meta_names[0]].decode("utf-8"))
    schema = next(
        s
        for s in meta.get("schemas", [])
        if s.get("schema-id") == meta.get("current-schema-id", 0)
    )
    types_by_id = {f["id"]: f["type"] for f in schema["fields"]}
    probes: list[tuple[int, str, str, object]] = []
    for col, op, value in predicate:
        fid = name_to_id.get(col)
        if fid is None:
            raise ValueError(f"iceberg: predicate column {col!r} not in schema")
        probes.append((fid, types_by_id.get(fid, "long"), op, value))

    # delete files decode unconditionally (never bounds-pruned)
    pos_deletes, eq_deletes = _decode_delete_files(
        members, delete_files, fields_by_id, name_to_id
    )

    counters = {"files_skipped": 0, "files_scanned": 0}
    out: list[dict] = []
    for f in sorted(data_files, key=lambda r: r["path"]):
        if not all(
            _bounds_admit(f, fid, typ, op, value)
            for fid, typ, op, value in probes
        ):
            counters["files_skipped"] += 1
            continue
        blob = _member(members, f["path"])
        if len(blob) != f["size"]:
            raise ValueError(f"iceberg: data file {f['path']!r} size mismatch")
        counters["files_scanned"] += 1
        need = list(columns)
        for col, _op, _v in predicate:
            if col not in need:
                need.append(col)
        for _sq, del_cols, _vals in eq_deletes:
            for col in del_cols:
                if col not in need:
                    need.append(col)
        cols = _read_by_field_ids(blob, need, name_to_id)
        n = len(cols[need[0]]) if need else 0
        if n != f["record_count"]:
            raise ValueError(
                f"iceberg: data file {f['path']!r} rows {n} != "
                f"declared {f['record_count']}"
            )
        dead: set = set()
        for sq, by_path in pos_deletes:
            if sq >= f["seq"]:
                dead |= by_path.get(f["path"], set())
        for i in range(n):
            if i in dead:
                continue
            row = {c: cols[c][i] for c in need}
            if any(
                sq > f["seq"]
                and tuple(row[c] for c in del_cols) in vals
                for sq, del_cols, vals in eq_deletes
            ):
                continue
            ok = True
            for col, op, value in predicate:
                v = row.get(col)
                if op == "is_null":
                    ok = v is None
                elif op == "not_null":
                    ok = v is not None
                elif v is None:
                    ok = False
                elif op == "==":
                    ok = v == value
                elif op == "<":
                    ok = v < value
                elif op == "<=":
                    ok = v <= value
                elif op == ">":
                    ok = v > value
                elif op == ">=":
                    ok = v >= value
                if not ok:
                    break
            if ok:
                out.append({c: row[c] for c in columns})
    return out, counters


def _dead_indexes(f: dict, vals: dict, n: int, pos_dels: list, eq_dels: list) -> set:
    """Row indexes of data file ``f`` killed by the given decoded
    delete sets under the sequence rules (pos: >=, eq: strict >)."""
    dead: set = set()
    for sq, by_path in pos_dels:
        if sq >= f["seq"]:
            dead |= {i for i in by_path.get(f["path"], set()) if i < n}
    for i in range(n):
        if i in dead:
            continue
        for sq, del_cols, tuples in eq_dels:
            if sq > f["seq"] and tuple(vals[c][i] for c in del_cols) in tuples:
                dead.add(i)
                break
    return dead


def iceberg_changelog(
    tar_payload: bytes,
    from_snapshot: int,
    to_snapshot: "int | None" = None,
    columns: "list[str] | None" = None,
) -> list[tuple[int, str, dict]]:
    """CHANGELOG SCAN (round 17, VERDICT r16 #3 — the CDC consumer's
    view): the NET row changes committed by each snapshot in
    ``(from_snapshot, to_snapshot]``, walked down the parent chain, as
    ``[(snapshot_id, change_type, row)]`` with change_type ``insert``
    / ``delete``. Where the incremental append scan raises on
    overwrite/delete snapshots, this emits their removals too:

    * ``append`` — added files' LIVE rows as inserts (a file added
      together with a delete that already covers some rows inserts
      only the survivors);
    * ``delete`` / ``overwrite`` — rows of REMOVED files that were
      still live at the parent snapshot emit as deletes (rows a prior
      delete file had killed do NOT re-emit); NEW delete files
      (position, equality, or v3 DV) emit exactly the rows they kill
      among files live across the hop; added files emit inserts;
    * ``replace`` (compaction) — emits NOTHING: the data did not
      change, only its layout — a consumer re-emitting compacted rows
      double-counts every rewrite;
    * a snapshot with no ``summary.operation`` cannot be classified —
      typed, same rule as the incremental scan.

    Planning is a FILE-LEVEL DIFF of adjacent snapshots' manifest
    trees (O(changed manifests), never O(table)) — row bytes are read
    only for changed files, which is what makes tailing a 100 TB
    table O(changes)."""
    members = dict(tar_members(tar_payload))
    meta_names = [n for n in members if n.endswith(".metadata.json")]
    if len(meta_names) != 1:
        raise ValueError("iceberg: expected exactly one *.metadata.json member")
    meta = json.loads(members[meta_names[0]].decode("utf-8"))
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    to_id = (
        to_snapshot
        if to_snapshot is not None
        else meta.get("current-snapshot-id")
    )
    if to_id not in snaps:
        raise ValueError(f"iceberg: snapshot {to_id} not in metadata")
    if from_snapshot not in snaps:
        raise ValueError(f"iceberg: snapshot {from_snapshot} not in metadata")
    chain: list[dict] = []
    cur = to_id
    while cur != from_snapshot:
        if cur is None or cur not in snaps:
            raise ValueError(
                f"iceberg: snapshot {from_snapshot} is not an ancestor "
                f"of {to_id}"
            )
        chain.append(snaps[cur])
        cur = snaps[cur].get("parent-snapshot-id")
    cols = columns or ["doc_id"]
    out: list[tuple[int, str, dict]] = []
    prev_id = from_snapshot
    for snap in reversed(chain):  # oldest first
        sid = snap["snapshot-id"]
        op = snap.get("summary", {}).get("operation")
        if op is None:
            raise NotImplementedError(
                "iceberg: changelog over a snapshot with no "
                "summary.operation"
            )
        if op not in ("append", "overwrite", "delete", "replace"):
            raise NotImplementedError(
                f"iceberg: changelog over a {op!r} snapshot"
            )
        if op == "replace":
            prev_id = sid
            continue
        fields_by_id, prev_data, prev_dels = iceberg_plan_snapshot(
            tar_payload, prev_id
        )
        _f2, cur_data, cur_dels = iceberg_plan_snapshot(tar_payload, sid)
        name_to_id = {v: k for k, v in fields_by_id.items()}
        prev_by_path = {f["path"]: f for f in prev_data}
        cur_by_path = {f["path"]: f for f in cur_data}
        prev_del_paths = {d["path"] for d in prev_dels}
        new_dels = [d for d in cur_dels if d["path"] not in prev_del_paths]
        prev_pos, prev_eq = _decode_delete_files(
            members, prev_dels, fields_by_id, name_to_id
        )
        cur_pos, cur_eq = _decode_delete_files(
            members, cur_dels, fields_by_id, name_to_id
        )
        new_pos, new_eq = _decode_delete_files(
            members, new_dels, fields_by_id, name_to_id
        )
        eq_cols = sorted(
            {c for _s, dcs, _v in (*prev_eq, *cur_eq) for c in dcs}
        )

        def _read(f):
            blob = _member(members, f["path"])
            if len(blob) != f["size"]:
                raise ValueError(
                    f"iceberg: data file {f['path']!r} size mismatch"
                )
            need = list(cols)
            for c in eq_cols:
                if c not in need:
                    need.append(c)
            vals = _read_by_field_ids(blob, need, name_to_id)
            n = len(vals[need[0]]) if need else 0
            if n != f["record_count"]:
                raise ValueError(
                    f"iceberg: data file {f['path']!r} rows {n} != "
                    f"declared {f['record_count']}"
                )
            return vals, n

        # inserts: files this snapshot added, minus deletes already
        # covering them in the CURRENT snapshot
        for p in sorted(set(cur_by_path) - set(prev_by_path)):
            f = cur_by_path[p]
            vals, n = _read(f)
            dead = _dead_indexes(f, vals, n, cur_pos, cur_eq)
            for i in range(n):
                if i not in dead:
                    out.append((sid, "insert", {c: vals[c][i] for c in cols}))
        # removed files: rows still live at the PARENT emit as deletes
        for p in sorted(set(prev_by_path) - set(cur_by_path)):
            f = prev_by_path[p]
            vals, n = _read(f)
            dead = _dead_indexes(f, vals, n, prev_pos, prev_eq)
            for i in range(n):
                if i not in dead:
                    out.append((sid, "delete", {c: vals[c][i] for c in cols}))
        # new delete files: exactly the rows they kill among carried
        # files (not rows a prior delete had already killed)
        if new_dels:
            for p in sorted(set(prev_by_path) & set(cur_by_path)):
                f = cur_by_path[p]
                vals, n = _read(f)
                dead_old = _dead_indexes(f, vals, n, prev_pos, prev_eq)
                dead_new = _dead_indexes(f, vals, n, new_pos, new_eq)
                for i in sorted(dead_new - dead_old):
                    out.append((sid, "delete", {c: vals[c][i] for c in cols}))
        prev_id = sid
    return out


def iceberg_optimize(
    members: dict[str, bytes], target_file_bytes: int = 1 << 22
) -> tuple[dict[str, bytes], "int | None", dict[str, int]]:
    """OPTIMIZE / compaction commit (round 17, VERDICT r16 #4, the
    Delta twin): merge live data files smaller than
    ``target_file_bytes`` into fewer files and commit a ``replace``
    snapshot — removed inputs via the manifest-rewrite path (DELETED
    entries), merged outputs as ordinary adds, prior manifests reused
    by the carry-forward. The changelog emits NOTHING for a replace
    snapshot, and snapshot rows are identical before/after:

    * outstanding position/equality/DV deletes covering an input are
      MATERIALIZED — only live rows land in the merged file, and the
      new file's higher data sequence puts it beyond every existing
      delete's reach (pos deletes name old paths; equality deletes
      apply strictly-newer only), so nothing double-applies;
    * merged files carry fresh column stats (bounds keep pruning
      after compaction) for primitive-typed fields;
    * partitioned tables stay typed (remove_files is unpartitioned).

    Returns ``(new_members, snapshot_id | None, {"files_in",
    "files_out"})`` — snapshot_id None when nothing needed rewriting."""
    fields_by_id, data_files, delete_files = iceberg_plan_snapshot(
        tar_build(sorted(members.items()))
    )
    name_to_id = {v: k for k, v in fields_by_id.items()}
    meta_names = [n for n in members if n.endswith(".metadata.json")]
    meta = json.loads(members[meta_names[0]].decode("utf-8"))
    schema = next(
        s
        for s in meta.get("schemas", [])
        if s.get("schema-id") == meta.get("current-schema-id", 0)
    )
    types_by_id = {f["id"]: f["type"] for f in schema["fields"]}
    pos_dels, eq_dels = _decode_delete_files(
        members, delete_files, fields_by_id, name_to_id
    )

    counters = {"files_in": 0, "files_out": 0}
    candidates = sorted(
        (f for f in data_files if f["size"] < target_file_bytes),
        key=lambda f: f["path"],
    )
    groups: list[list[dict]] = []
    bin_files: list[dict] = []
    bin_bytes = 0
    for f in candidates:
        if bin_files and bin_bytes + f["size"] > target_file_bytes:
            groups.append(bin_files)
            bin_files, bin_bytes = [], 0
        bin_files.append(f)
        bin_bytes += f["size"]
    if bin_files:
        groups.append(bin_files)

    def _has_deletes(f):
        for sq, by_path in pos_dels:
            if sq >= f["seq"] and by_path.get(f["path"]):
                return True
        return bool(eq_dels)

    groups = [g for g in groups if len(g) >= 2 or _has_deletes(g[0])]
    if not groups:
        return dict(members), None, counters

    _pw = parquet_write
    eq_cols = sorted({c for _s, dcs, _v in eq_dels for c in dcs})
    out = dict(members)
    merged_files: list[tuple[str, bytes, int]] = []
    stats_by_path: dict[str, dict] = {}
    remove: list[str] = []
    import hashlib as _hashlib

    names = [fields_by_id[fid] for fid in sorted(fields_by_id)]
    for g in groups:
        counters["files_in"] += len(g)
        merged: dict[str, list] = {n: [] for n in names}
        p_types: "dict[str, str] | None" = None
        for f in g:
            blob = _member(members, f["path"])
            if len(blob) != f["size"]:
                raise ValueError(
                    f"iceberg: data file {f['path']!r} size mismatch"
                )
            need = list(names)
            for c in eq_cols:
                if c not in need:
                    need.append(c)
            vals = _read_by_field_ids(blob, need, name_to_id)
            n = len(vals[need[0]]) if need else 0
            if n != f["record_count"]:
                raise ValueError(
                    f"iceberg: data file {f['path']!r} record count mismatch"
                )
            if p_types is None:
                fo = parquet_footer(blob)["schema"]
                leaf = {
                    el["name"]: el["type"]
                    for el in fo
                    if not el.get("num_children")
                }
                phys_by_id = {
                    el.get("field_id"): el["name"]
                    for el in fo
                    if el.get("field_id") is not None
                    and not el.get("num_children")
                }
                p_types = {
                    c: leaf.get(
                        phys_by_id.get(name_to_id.get(c), c), "BYTE_ARRAY"
                    )
                    for c in names
                }
            dead = _dead_indexes(f, vals, n, pos_dels, eq_dels)
            for i in range(n):
                if i in dead:
                    continue  # materialize outstanding deletes
                for c in names:
                    merged[c].append(vals[c][i])
        blob = _pw(merged, types=p_types, codec="SNAPPY")
        path = f"data/opt-{_hashlib.md5(blob).hexdigest()}.parquet"
        n_rows = len(merged[names[0]]) if names else 0
        merged_files.append((path, blob, n_rows))
        counters["files_out"] += 1
        remove.extend(f["path"] for f in g)
        st: dict = {"value_counts": {}, "null_value_counts": {},
                    "lower_bounds": {}, "upper_bounds": {}}
        for c in names:
            fid = name_to_id[c]
            typ = types_by_id.get(fid, "long")
            vals_c = merged[c]
            non_null = [v for v in vals_c if v is not None]
            st["value_counts"][fid] = len(vals_c)
            st["null_value_counts"][fid] = len(vals_c) - len(non_null)
            if non_null and typ in (
                "int", "long", "date", "time", "timestamp", "timestamptz",
                "float", "double", "boolean", "string",
            ):
                st["lower_bounds"][fid] = min(non_null)
                st["upper_bounds"][fid] = max(non_null)
        stats_by_path[path] = st
    new_members, sid = iceberg_commit(
        out,
        data_files=merged_files,
        remove_files=remove,
        operation="replace",
        stats_by_path=stats_by_path,
    )
    return new_members, sid, counters


def iceberg_snapshot_at_timestamp(tar_payload: bytes, ts_ms: int) -> int:
    """AS-OF-TIMESTAMP resolution (round 17, VERDICT r16 #5): the
    latest snapshot on the CURRENT ancestry chain whose
    ``timestamp-ms`` is ≤ the probe — Spark's rule for
    ``as-of-timestamp`` (snapshots on abandoned branches never
    resolve). A probe older than the chain's earliest snapshot is
    typed; a snapshot without timestamp-ms is typed (unorderable)."""
    members = dict(tar_members(tar_payload))
    meta_names = [n for n in members if n.endswith(".metadata.json")]
    if len(meta_names) != 1:
        raise ValueError("iceberg: expected exactly one *.metadata.json member")
    meta = json.loads(members[meta_names[0]].decode("utf-8"))
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    cur = meta.get("current-snapshot-id")
    chain: list[dict] = []
    while cur is not None:
        snap = snaps.get(cur)
        if snap is None:
            raise ValueError(f"iceberg: broken parent chain at {cur}")
        chain.append(snap)
        cur = snap.get("parent-snapshot-id")
    if not chain:
        raise ValueError("iceberg: table has no snapshots")
    best = None
    for snap in chain:
        ts = snap.get("timestamp-ms")
        if ts is None:
            raise NotImplementedError(
                f"iceberg: snapshot {snap['snapshot-id']} carries no "
                "timestamp-ms — cannot resolve as-of-timestamp"
            )
        if ts <= ts_ms and (best is None or ts > best[0]):
            best = (ts, snap["snapshot-id"])
    if best is None:
        raise ValueError(
            f"iceberg: timestamp {ts_ms} predates the earliest snapshot"
        )
    return best[1]


def iceberg_create_ref(
    members: dict[str, bytes],
    name: str,
    ref_type: str = "tag",
    snapshot_id: "int | None" = None,
) -> dict[str, bytes]:
    """Create a snapshot REF (round 17, VERDICT r16 #9): a ``tag``
    names immutable history, a ``branch`` can be committed to via
    ``iceberg_commit(branch=...)``. Defaults to the current head;
    naming an unknown snapshot or redefining an existing ref is
    typed. Returns a new member dict (input not mutated)."""
    if ref_type not in ("tag", "branch"):
        raise ValueError(f"iceberg: ref type {ref_type!r}")
    meta_name, meta = _current_metadata(members)
    sid = snapshot_id if snapshot_id is not None else meta.get(
        "current-snapshot-id"
    )
    snaps = {s["snapshot-id"] for s in meta.get("snapshots", [])}
    if sid not in snaps:
        raise ValueError(f"iceberg: snapshot {sid} not in metadata")
    refs = dict(meta.get("refs") or {})
    if name in refs or name == "main":
        raise ValueError(f"iceberg: ref {name!r} already exists")
    refs[name] = {"snapshot-id": sid, "type": ref_type}
    meta = dict(meta)
    meta["refs"] = refs
    out = dict(members)
    out[meta_name] = json.dumps(meta).encode("utf-8")
    return out


def iceberg_resolve_ref(tar_payload: bytes, name: str) -> int:
    """Resolve a ref name to its snapshot id — ``main`` falls back to
    the current head when no refs map exists (pre-refs metadata)."""
    members = dict(tar_members(tar_payload))
    meta_names = [n for n in members if n.endswith(".metadata.json")]
    if len(meta_names) != 1:
        raise ValueError("iceberg: expected exactly one *.metadata.json member")
    meta = json.loads(members[meta_names[0]].decode("utf-8"))
    refs = meta.get("refs") or {}
    if name in refs:
        return refs[name]["snapshot-id"]
    if name == "main":
        sid = meta.get("current-snapshot-id")
        if sid is not None:
            return sid
    raise ValueError(f"iceberg: unknown ref {name!r}")


def _iceberg_commit_v1(
    members: dict[str, bytes],
    meta_name: str,
    meta: dict,
    data_files: list,
    operation: "str | None",
    extra_summary: "dict[str, str] | None",
    branch: str,
) -> tuple[dict[str, bytes], int]:
    """v1 snapshot commit (round 17): V1_MANIFEST_SCHEMA entries (no
    sequence numbers — the reader plans every entry at sequence 0),
    V1_MANIFEST_LIST_SCHEMA records, prior manifests reused verbatim.
    Snapshot ids keep the deterministic counter discipline."""
    if not data_files:
        raise ValueError("iceberg: empty commit")
    snapshot_id = len(meta.get("snapshots", [])) + 1
    refs = dict(meta.get("refs") or {})
    if branch in refs:
        if refs[branch].get("type") == "tag":
            raise ValueError(f"iceberg: cannot commit to tag {branch!r}")
        parent = refs[branch]["snapshot-id"]
    elif branch == "main":
        parent = meta.get("current-snapshot-id")
    else:
        raise ValueError(f"iceberg: unknown branch {branch!r}")
    out = dict(members)
    entries = []
    for p, b, nrec in data_files:
        size = len(b) if isinstance(b, (bytes, bytearray)) else int(b)
        if isinstance(b, (bytes, bytearray)):
            out[p] = b
        entries.append(
            {
                "status": 1,  # ADDED
                "snapshot_id": snapshot_id,
                "data_file": {
                    "file_path": p,
                    "file_format": "PARQUET",
                    "record_count": nrec,
                    "file_size_in_bytes": size,
                },
            }
        )
    m_path = f"metadata/m{snapshot_id}-v1-data.avro"
    m_blob = avro_build(V1_MANIFEST_SCHEMA, entries, codec="deflate")
    out[m_path] = m_blob
    new_records = []
    if parent is not None:
        prev = next(
            s for s in meta["snapshots"] if s["snapshot-id"] == parent
        )
        new_records.extend(avro_records(_member(out, prev["manifest-list"])))
    new_records.append(
        {
            "manifest_path": m_path,
            "manifest_length": len(m_blob),
            "partition_spec_id": 0,
            "added_snapshot_id": snapshot_id,
            "added_files_count": len(entries),
            "existing_files_count": 0,
            "deleted_files_count": 0,
        }
    )
    list_path = f"metadata/snap-{snapshot_id}.avro"
    out[list_path] = avro_build(
        V1_MANIFEST_LIST_SCHEMA, new_records, codec="deflate"
    )
    summary = {"operation": operation or "append"}
    if extra_summary:
        summary.update({str(k): str(v) for k, v in extra_summary.items()})
    snap = {
        "snapshot-id": snapshot_id,
        "timestamp-ms": snapshot_id,
        "manifest-list": list_path,
        "summary": summary,
    }
    if parent is not None:
        snap["parent-snapshot-id"] = parent
    meta = dict(meta)
    meta["snapshots"] = [*meta.get("snapshots", []), snap]
    refs[branch] = {"snapshot-id": snapshot_id, "type": "branch"}
    meta["refs"] = refs
    if branch == "main":
        meta["current-snapshot-id"] = snapshot_id
    meta["metadata-log"] = [
        *meta.get("metadata-log", []),
        {"metadata-file": meta_name, "timestamp-ms": snapshot_id - 1},
    ]
    version = int(meta_name.rsplit("/v", 1)[1].split(".")[0]) + 1
    del out[meta_name]
    out[f"metadata/v{version}.metadata.json"] = json.dumps(meta).encode(
        "utf-8"
    )
    return out, snapshot_id
