"""Parquet VARIANT binary encoding (round 17): the semi-structured
column type behind Delta's ``variantType`` reader feature, per the
public spec (apache/parquet-format VariantEncoding.md; Delta
PROTOCOL.md "Variant Data Type"). A variant cell is TWO binary
buffers:

* ``metadata`` — a string dictionary: header byte
  ``(offset_size-1)<<6 | sorted<<4 | version`` (version must be 1),
  then ``dictionary_size`` (offset_size bytes LE), then
  ``dictionary_size+1`` offsets (offset_size bytes LE each), then the
  concatenated UTF-8 key bytes. This writer always emits a
  lexicographically sorted dictionary (``sorted_strings=1``) so object
  field lookups can binary-search, like the reference Java writer.
* ``value`` — a tagged tree. First byte packs
  ``basic_type (bits 1-0)`` and ``value_header (bits 7-2)``:

  - basic_type 0, primitive — value_header is the type id:
    0 null, 1 true, 2 false, 3 int8, 4 int16, 5 int32, 6 int64
    (little-endian two's complement), 7 double (IEEE LE), 11 date
    (4-byte LE days), 13 timestamp without time zone (8-byte LE
    micros), 14 float, 15 binary (4-byte LE length + bytes),
    16 string (4-byte LE length + UTF-8). Decimals (8/9/10), tz
    timestamps (12) and the nanos/uuid ids (17-20) are typed
    boundaries here — named, not guessed.
  - basic_type 1, short string — value_header is the byte length
    (0..63), bytes follow inline (the hot path for small strings).
  - basic_type 2, object — value_header =
    ``is_large<<4 | (field_id_size-1)<<2 | (field_offset_size-1)``;
    then num_elements (1 byte, 4 when large), ``num`` field ids
    (LE, ORDERED by the dictionary key they name — the spec's
    binary-search invariant), ``num+1`` field offsets into the
    concatenated child values, then the children.
  - basic_type 3, array — value_header =
    ``is_large<<2 | (field_offset_size-1)``; then num_elements,
    ``num+1`` offsets, children.

Both sides live here so the wire is exercised encode→decode in every
test; integers encode at their SMALLEST width (the spec's writer
recommendation) and the decoder accepts any width.

Reference parity note: the reference archiver (SupBlizard/yark)
stores opaque JSON blobs in SQLite; semi-structured column decoding
is driver-mandated training-pipeline surface (SURVEY.md §2.8).
"""

from __future__ import annotations

import struct

__all__ = [
    "variant_from_python",
    "variant_metadata_build",
    "variant_to_python",
]

_VERSION = 1


def _min_bytes(n: int) -> int:
    """Smallest 1-4 byte width that holds unsigned ``n``."""
    for w in (1, 2, 3, 4):
        if n < (1 << (8 * w)):
            return w
    raise ValueError(f"variant: size {n} exceeds 4-byte addressing")


def variant_metadata_build(keys: "list[str]") -> tuple[bytes, dict[str, int]]:
    """Build a sorted dictionary metadata buffer for ``keys`` →
    ``(metadata_bytes, {key: field_id})``."""
    uniq = sorted(set(keys))
    encoded = [k.encode("utf-8") for k in uniq]
    total = sum(len(b) for b in encoded)
    offset_size = _min_bytes(max(total, len(uniq)))
    header = ((offset_size - 1) << 6) | (1 << 4) | _VERSION
    out = bytearray([header])
    out += len(uniq).to_bytes(offset_size, "little")
    pos = 0
    for b in encoded:
        out += pos.to_bytes(offset_size, "little")
        pos += len(b)
    out += pos.to_bytes(offset_size, "little")
    for b in encoded:
        out += b
    return bytes(out), {k: i for i, k in enumerate(uniq)}


def _metadata_parse(meta: bytes) -> list[str]:
    if not meta:
        raise ValueError("variant: empty metadata")
    header = meta[0]
    if header & 0x0F != _VERSION:
        raise NotImplementedError(
            f"variant: metadata version {header & 0x0F}"
        )
    if header & 0x20:
        raise ValueError("variant: reserved metadata header bit set")
    offset_size = ((header >> 6) & 0x3) + 1
    pos = 1
    n = int.from_bytes(meta[pos : pos + offset_size], "little")
    pos += offset_size
    offsets = []
    for _ in range(n + 1):
        offsets.append(int.from_bytes(meta[pos : pos + offset_size], "little"))
        pos += offset_size
    base = pos
    keys = []
    for i in range(n):
        keys.append(meta[base + offsets[i] : base + offsets[i + 1]].decode("utf-8"))
    return keys


def _collect_keys(obj, keys: list) -> None:
    if isinstance(obj, dict):
        for k, v in obj.items():
            keys.append(str(k))
            _collect_keys(v, keys)
    elif isinstance(obj, (list, tuple)):
        for v in obj:
            _collect_keys(v, keys)


def _encode_value(obj, ids: dict[str, int]) -> bytes:
    if obj is None:
        return bytes([0 << 2 | 0])
    if obj is True:
        return bytes([1 << 2 | 0])
    if obj is False:
        return bytes([2 << 2 | 0])
    if isinstance(obj, int):
        for type_id, width in ((3, 1), (4, 2), (5, 4), (6, 8)):
            if -(1 << (8 * width - 1)) <= obj < (1 << (8 * width - 1)):
                return bytes([type_id << 2 | 0]) + obj.to_bytes(
                    width, "little", signed=True
                )
        raise ValueError("variant: integer exceeds int64")
    if isinstance(obj, float):
        return bytes([7 << 2 | 0]) + struct.pack("<d", obj)
    if isinstance(obj, (bytes, bytearray)):
        return (
            bytes([15 << 2 | 0])
            + len(obj).to_bytes(4, "little")
            + bytes(obj)
        )
    if isinstance(obj, str):
        b = obj.encode("utf-8")
        if len(b) <= 63:
            return bytes([len(b) << 2 | 1]) + b
        return bytes([16 << 2 | 0]) + len(b).to_bytes(4, "little") + b
    if isinstance(obj, dict):
        # field ids ORDERED by key name (the binary-search invariant);
        # with the sorted dictionary this is ascending-id order too
        items = sorted(((str(k), v) for k, v in obj.items()))
        children = [_encode_value(v, ids) for _k, v in items]
        field_ids = [ids[k] for k, _v in items]
        n = len(items)
        offsets = [0]
        for c in children:
            offsets.append(offsets[-1] + len(c))
        id_size = _min_bytes(max(field_ids) if field_ids else 0)
        off_size = _min_bytes(offsets[-1])
        large = n > 255
        header = (int(large) << 4) | ((id_size - 1) << 2) | (off_size - 1)
        out = bytearray([header << 2 | 2])
        out += n.to_bytes(4 if large else 1, "little")
        for fid in field_ids:
            out += fid.to_bytes(id_size, "little")
        for off in offsets:
            out += off.to_bytes(off_size, "little")
        for c in children:
            out += c
        return bytes(out)
    if isinstance(obj, (list, tuple)):
        children = [_encode_value(v, ids) for v in obj]
        n = len(children)
        offsets = [0]
        for c in children:
            offsets.append(offsets[-1] + len(c))
        off_size = _min_bytes(offsets[-1])
        large = n > 255
        header = (int(large) << 2) | (off_size - 1)
        out = bytearray([header << 2 | 3])
        out += n.to_bytes(4 if large else 1, "little")
        for off in offsets:
            out += off.to_bytes(off_size, "little")
        for c in children:
            out += c
        return bytes(out)
    raise NotImplementedError(
        f"variant: cannot encode {type(obj).__name__}"
    )


def variant_from_python(obj) -> tuple[bytes, bytes]:
    """Python value → ``(metadata, value)`` buffers. Dict keys become
    the metadata dictionary; scalars get an empty (but valid, versioned)
    dictionary."""
    keys: list = []
    _collect_keys(obj, keys)
    meta, ids = variant_metadata_build(keys)
    return meta, _encode_value(obj, ids)


def _decode_value(value: bytes, pos: int, keys: list[str]) -> tuple[object, int]:
    if pos >= len(value):
        raise ValueError("variant: truncated value")
    head = value[pos]
    basic = head & 0x3
    header = head >> 2
    pos += 1
    if basic == 0:  # primitive
        if header == 0:
            return None, pos
        if header == 1:
            return True, pos
        if header == 2:
            return False, pos
        if header in (3, 4, 5, 6):
            width = {3: 1, 4: 2, 5: 4, 6: 8}[header]
            return (
                int.from_bytes(value[pos : pos + width], "little", signed=True),
                pos + width,
            )
        if header == 7:
            return struct.unpack("<d", value[pos : pos + 8])[0], pos + 8
        if header == 11:
            return (
                int.from_bytes(value[pos : pos + 4], "little", signed=True),
                pos + 4,
            )
        if header == 13:
            return (
                int.from_bytes(value[pos : pos + 8], "little", signed=True),
                pos + 8,
            )
        if header == 14:
            return struct.unpack("<f", value[pos : pos + 4])[0], pos + 4
        if header in (15, 16):
            n = int.from_bytes(value[pos : pos + 4], "little")
            raw = value[pos + 4 : pos + 4 + n]
            if len(raw) != n:
                raise ValueError("variant: truncated string/binary")
            return (
                raw.decode("utf-8") if header == 16 else bytes(raw),
                pos + 4 + n,
            )
        raise NotImplementedError(
            f"variant: primitive type id {header} (decimal/tz/nanos/uuid "
            "are typed boundaries)"
        )
    if basic == 1:  # short string
        raw = value[pos : pos + header]
        if len(raw) != header:
            raise ValueError("variant: truncated short string")
        return raw.decode("utf-8"), pos + header
    if basic == 2:  # object
        large = (header >> 4) & 0x1
        id_size = ((header >> 2) & 0x3) + 1
        off_size = (header & 0x3) + 1
        n = int.from_bytes(value[pos : pos + (4 if large else 1)], "little")
        pos += 4 if large else 1
        field_ids = []
        for _ in range(n):
            field_ids.append(
                int.from_bytes(value[pos : pos + id_size], "little")
            )
            pos += id_size
        offsets = []
        for _ in range(n + 1):
            offsets.append(
                int.from_bytes(value[pos : pos + off_size], "little")
            )
            pos += off_size
        base = pos
        out = {}
        for i, fid in enumerate(field_ids):
            if fid >= len(keys):
                raise ValueError(
                    f"variant: field id {fid} outside the dictionary"
                )
            child, end = _decode_value(value, base + offsets[i], keys)
            if end != base + offsets[i + 1]:
                raise ValueError("variant: object child length mismatch")
            out[keys[fid]] = child
        return out, base + offsets[n]
    # basic == 3: array
    large = (header >> 2) & 0x1
    off_size = (header & 0x3) + 1
    n = int.from_bytes(value[pos : pos + (4 if large else 1)], "little")
    pos += 4 if large else 1
    offsets = []
    for _ in range(n + 1):
        offsets.append(int.from_bytes(value[pos : pos + off_size], "little"))
        pos += off_size
    base = pos
    out = []
    for i in range(n):
        child, end = _decode_value(value, base + offsets[i], keys)
        if end != base + offsets[i + 1]:
            raise ValueError("variant: array child length mismatch")
        out.append(child)
    return out, base + offsets[n]


def variant_to_python(metadata: bytes, value: bytes):
    """Decode a variant cell back to a Python value (dicts/lists/
    scalars). Every child span is cross-checked against the offsets —
    a corrupt buffer raises instead of mis-parsing."""
    keys = _metadata_parse(bytes(metadata))
    obj, end = _decode_value(bytes(value), 0, keys)
    if end != len(value):
        raise ValueError(
            f"variant: {len(value) - end} trailing bytes after the value"
        )
    return obj
