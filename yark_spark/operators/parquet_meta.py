"""Parquet footer reader from scratch (round 12): the PAR1 trailer
(4-byte little-endian footer length before the magic), the Apache
Thrift COMPACT protocol (short/long-form field headers with delta
field ids, zigzag varints, bool-in-header encoding, size-in-header
lists, nested structs) as a generic parser, and the parquet.thrift
``FileMetaData`` model (schema elements, row groups, column chunks,
column metadata with type/codec enums) mapped onto it — nothing
imported.

Why the ENGINE needs this even though Spark reads parquet natively:
the footer IS the planning surface of a 100 TB lake — row-group
pruning, size-based shard assignment (operators/packing), compaction
planning (operators/layout) and scan-cost estimation all read exactly
these structs, and a tool that can audit them WITHOUT spinning up a
JVM (a driver-side planner, a layout linter, an ingest validator) is
how the layout operators verify their own output. It is also the
fourth Thrift-family wire beside protobuf (TFRecord), Avro binary and
MessagePack — the engine now speaks all four schema-carrying record
encodings' substrates.

Oracle design (the strongest differential in the repo): DuckDB ships
an INDEPENDENT C++ parquet reader exposed as ``parquet_metadata()`` —
the from-scratch Thrift parse of the SAME committed fixture file must
hash-match its row-group/column rows (ids, paths, types, codecs,
offsets, sizes, value counts) exactly. Two unrelated implementations
of the full footer grammar agreeing column-by-column.

Parse raises typed ``ValueError`` on malformed input (bad magic,
truncated footer, unknown compact type, struct bomb) so corrupt files
quarantine as rows.
"""

from __future__ import annotations

import struct

__all__ = ["parquet_footer", "footer_rows", "PHYSICAL_TYPES", "CODECS"]

PHYSICAL_TYPES = {
    0: "BOOLEAN",
    1: "INT32",
    2: "INT64",
    3: "INT96",
    4: "FLOAT",
    5: "DOUBLE",
    6: "BYTE_ARRAY",
    7: "FIXED_LEN_BYTE_ARRAY",
}

CODECS = {
    0: "UNCOMPRESSED",
    1: "SNAPPY",
    2: "GZIP",
    3: "LZO",
    4: "BROTLI",
    5: "LZ4",
    6: "ZSTD",
    7: "LZ4_RAW",
}

# thrift compact wire types
_CT_STOP = 0
_CT_TRUE = 1
_CT_FALSE = 2
_CT_BYTE = 3
_CT_I16 = 4
_CT_I32 = 5
_CT_I64 = 6
_CT_DOUBLE = 7
_CT_BINARY = 8
_CT_LIST = 9
_CT_SET = 10
_CT_MAP = 11
_CT_STRUCT = 12


def _uvarint(b: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(b):
            raise ValueError("thrift: truncated varint")
        if shift >= 70:
            raise ValueError("thrift: varint too long")
        byte = b[pos]
        pos += 1
        result |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return result, pos
        shift += 7


def _zigzag(b: bytes, pos: int) -> tuple[int, int]:
    v, pos = _uvarint(b, pos)
    return (v >> 1) ^ -(v & 1), pos


def _read_value(b: bytes, pos: int, ctype: int, depth: int, in_container: bool = False):
    if depth > 32:
        raise ValueError("thrift: nesting too deep")
    if ctype in (_CT_TRUE, _CT_FALSE):
        # Struct fields encode bool IN the field header (the ctype itself
        # says true/false); collection ELEMENTS encode one byte each
        # (0x01 true / 0x02 false) — ADVICE r12: consuming zero bytes
        # here desyncs any footer struct carrying bool lists.
        if not in_container:
            return ctype == _CT_TRUE, pos
        if pos >= len(b):
            raise ValueError("thrift: truncated bool element")
        v = b[pos]
        if v not in (_CT_TRUE, _CT_FALSE):
            raise ValueError(f"thrift: invalid bool element byte {v:#04x}")
        return v == _CT_TRUE, pos + 1
    if ctype == _CT_BYTE:
        if pos >= len(b):
            raise ValueError("thrift: truncated byte")
        v = b[pos]
        return (v - 256 if v >= 128 else v), pos + 1
    if ctype in (_CT_I16, _CT_I32, _CT_I64):
        return _zigzag(b, pos)
    if ctype == _CT_DOUBLE:
        if pos + 8 > len(b):
            raise ValueError("thrift: truncated double")
        return struct.unpack_from("<d", b, pos)[0], pos + 8
    if ctype == _CT_BINARY:
        n, pos = _uvarint(b, pos)
        if pos + n > len(b):
            raise ValueError("thrift: truncated binary")
        return bytes(b[pos : pos + n]), pos + n
    if ctype in (_CT_LIST, _CT_SET):
        if pos >= len(b):
            raise ValueError("thrift: truncated list header")
        header = b[pos]
        pos += 1
        size = header >> 4
        elem_type = header & 0x0F
        if size == 15:
            size, pos = _uvarint(b, pos)
        if size > 1_000_000:
            raise ValueError("thrift: list size bomb")
        out = []
        for _ in range(size):
            v, pos = _read_value(b, pos, elem_type, depth + 1, in_container=True)
            out.append(v)
        return out, pos
    if ctype == _CT_MAP:
        size, pos = _uvarint(b, pos)
        if size == 0:
            return {}, pos
        if pos >= len(b):
            raise ValueError("thrift: truncated map header")
        kv = b[pos]
        pos += 1
        ktype, vtype = kv >> 4, kv & 0x0F
        out = {}
        for _ in range(size):
            k, pos = _read_value(b, pos, ktype, depth + 1, in_container=True)
            v, pos = _read_value(b, pos, vtype, depth + 1, in_container=True)
            out[k] = v
        return out, pos
    if ctype == _CT_STRUCT:
        return _read_struct(b, pos, depth + 1)
    raise ValueError(f"thrift: unknown compact type {ctype}")


def _read_struct(b: bytes, pos: int, depth: int = 0) -> tuple[dict, int]:
    """Generic compact-protocol struct → {field_id: value}."""
    fields: dict[int, object] = {}
    last_id = 0
    while True:
        if pos >= len(b):
            raise ValueError("thrift: truncated struct")
        header = b[pos]
        pos += 1
        if header == _CT_STOP:
            return fields, pos
        delta = header >> 4
        ctype = header & 0x0F
        if delta:
            field_id = last_id + delta
        else:  # long form: explicit zigzag field id
            field_id, pos = _zigzag(b, pos)
        last_id = field_id
        fields[field_id], pos = _read_value(b, pos, ctype, depth)
    # unreachable


def parquet_footer(payload: bytes) -> dict:
    """Parse a parquet file's footer into the FileMetaData shape:
    {version, num_rows, created_by, schema: [...], row_groups: [...]}
    with column metadata decoded per parquet.thrift field ids."""
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"PAR1" or b[-4:] != b"PAR1":
        raise ValueError("parquet: missing PAR1 magic")
    (flen,) = struct.unpack("<I", b[-8:-4])
    start = len(b) - 8 - flen
    if start < 4:
        raise ValueError("parquet: footer length out of range")
    raw, _ = _read_struct(b, start)

    def _schema_element(d: dict) -> dict:
        return {
            "type": PHYSICAL_TYPES.get(d.get(1), d.get(1)),
            "type_length": d.get(2),
            "repetition": d.get(3),
            "name": d.get(4, b"").decode("utf-8"),
            "num_children": d.get(5, 0),
            # ConvertedType (5 = DECIMAL) + its scale/precision — the
            # FLBA decimal surface (round 13 s3)
            "converted_type": d.get(6),
            "scale": d.get(7),
            "precision": d.get(8),
            # Iceberg/engine field ids (round 14 s3): the key that
            # makes column RENAME metadata-only
            "field_id": d.get(9),
            # LogicalType union (round 16): raw {union-field-id: struct}
            # — TIMESTAMP (8) carries isAdjustedToUTC, the bit that
            # distinguishes an instant from timestampNtz
            "logical_type": d.get(10),
        }

    def _column(d: dict) -> dict:
        md = d.get(3, {})
        st = md.get(12) or {}
        return {
            "file_offset": d.get(2),
            "type": PHYSICAL_TYPES.get(md.get(1), md.get(1)),
            "encodings": md.get(2, []),
            "path_in_schema": [p.decode("utf-8") for p in md.get(3, [])],
            "codec": CODECS.get(md.get(4), md.get(4)),
            "num_values": md.get(5),
            "total_uncompressed_size": md.get(6),
            "total_compressed_size": md.get(7),
            "data_page_offset": md.get(9),
            "index_page_offset": md.get(10),
            "dictionary_page_offset": md.get(11),
            # Statistics (parquet.thrift field 12): the row-group
            # pruning surface — null_count + the modern min_value/
            # max_value pair (round 13 s3).
            "statistics": {
                "null_count": st.get(3),
                "distinct_count": st.get(4),
                "max_value": st.get(5),
                "min_value": st.get(6),
            }
            if st
            else None,
            "bloom_filter_offset": md.get(14),
            "bloom_filter_length": md.get(15),
            # Page-index locations (ColumnChunk fields 4-7): the
            # page-granular pruning surface (round 13 s3).
            "offset_index_offset": d.get(4),
            "offset_index_length": d.get(5),
            "column_index_offset": d.get(6),
            "column_index_length": d.get(7),
        }

    def _row_group(d: dict) -> dict:
        return {
            "columns": [_column(c) for c in d.get(1, [])],
            "total_byte_size": d.get(2),
            "num_rows": d.get(3),
        }

    return {
        "version": raw.get(1),
        "schema": [_schema_element(s) for s in raw.get(2, [])],
        "num_rows": raw.get(3),
        "row_groups": [_row_group(g) for g in raw.get(4, [])],
        "created_by": (raw.get(6) or b"").decode("utf-8", "replace"),
    }


def footer_rows(payload: bytes) -> list[dict]:
    """Flatten the footer into per-(row_group, column) rows — the
    ``parquet_metadata()`` differential shape."""
    meta = parquet_footer(payload)
    out = []
    for gid, rg in enumerate(meta["row_groups"]):
        for cid, col in enumerate(rg["columns"]):
            out.append(
                {
                    "row_group_id": gid,
                    "row_group_num_rows": rg["num_rows"],
                    "column_id": cid,
                    # nested paths join with ", " — the parquet_metadata()
                    # presentation, so the differential is byte-equal
                    "path_in_schema": ", ".join(col["path_in_schema"]),
                    "type": col["type"],
                    "num_values": col["num_values"],
                    "compression": col["codec"],
                    "data_page_offset": col["data_page_offset"],
                    "total_compressed_size": col["total_compressed_size"],
                    "total_uncompressed_size": col["total_uncompressed_size"],
                }
            )
    return out


# ---------------------------------------------------------------------------
# Split-block bloom filters (parquet-format BloomFilter.md, round 13 s3)
# ---------------------------------------------------------------------------
# The spec's SBBF: the bitset is a sequence of 256-bit blocks (8 x u32
# words); a value's xxHash64 picks a block with the 32x32->high-32
# multiply trick on the TOP half, and each of the 8 words gets exactly
# one bit from the LOW half via the fixed salt multipliers. Shared by
# the writer (insert) and the pruning reader (contains); the hash
# value itself comes from the caller (operators/zstd.xxh64 over the
# value's plain bytes) so this module stays dependency-free.

_SBBF_SALT = (
    0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
    0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31,
)


def _sbbf_mask(h: int):
    lo = h & 0xFFFFFFFF
    return [(1 << (((lo * s) & 0xFFFFFFFF) >> 27)) for s in _SBBF_SALT]


def _sbbf_block(h: int, num_blocks: int) -> int:
    return ((h >> 32) * num_blocks) >> 32


def sbbf_insert(bitset: bytearray, h: int) -> None:
    """Set the value's 8 bits (one per word) in its block."""
    num_blocks = len(bitset) // 32
    base = _sbbf_block(h, num_blocks) * 32
    mask = _sbbf_mask(h)
    for w in range(8):
        off = base + w * 4
        word = int.from_bytes(bitset[off : off + 4], "little") | mask[w]
        bitset[off : off + 4] = word.to_bytes(4, "little")


def sbbf_contains(bitset: bytes, h: int) -> bool:
    """True iff all 8 of the value's bits are set (no false negatives)."""
    num_blocks = len(bitset) // 32
    base = _sbbf_block(h, num_blocks) * 32
    mask = _sbbf_mask(h)
    for w in range(8):
        word = int.from_bytes(bitset[base + w * 4 : base + w * 4 + 4], "little")
        if not word & mask[w]:
            return False
    return True


def sbbf_size_bytes(n_distinct: int) -> int:
    """Power-of-two bitset size targeting ~10 bits/value (the
    parquet-mr default ~1% fpp), floor 32 bytes, 128 KiB cap."""
    want = max(32, (n_distinct * 10 + 7) // 8)
    size = 32
    while size < want and size < (1 << 17):
        size <<= 1
    return size


def sbbf_serialize(bitset: bytes) -> bytes:
    """BloomFilterHeader (thrift compact) + bitset: numBytes i32, then
    the three single-variant unions (BlockSplitBloomFilter / XxHash /
    Uncompressed) each as an empty struct in field 1."""
    out = bytearray()
    out.append(0x15)  # field 1, i32
    v = len(bitset)
    z = (v << 1) ^ (v >> 63)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            break
    for _ in range(3):  # fields 2,3,4: struct, delta 1 each
        out += b"\x1c\x1c\x00\x00"
    out.append(0x00)
    return bytes(out) + bitset


def sbbf_parse(buf: bytes, pos: int = 0) -> bytes:
    """Parse header + bitset at ``pos``; validates the algorithm/hash/
    compression unions name the one spec variant each."""
    hdr, p = _read_struct(bytes(buf), pos)
    n = hdr.get(1)
    for fid, what in ((2, "algorithm"), (3, "hash"), (4, "compression")):
        union = hdr.get(fid)
        if not isinstance(union, dict) or list(union) != [1]:
            raise ValueError(f"parquet: bloom {what} variant not supported")
    if not isinstance(n, int) or n <= 0 or n % 32 or p + n > len(buf):
        raise ValueError("parquet: bad bloom filter length")
    return bytes(buf[p : p + n])


# ---------------------------------------------------------------------------
# Page index (parquet.thrift ColumnIndex / OffsetIndex, round 13 s3)
# ---------------------------------------------------------------------------


def parquet_column_index(payload: bytes, col: dict) -> "dict | None":
    """Parse a chunk's ColumnIndex: per-page ``null_pages`` /
    ``min_values`` / ``max_values`` (plain-encoded bounds) +
    ``boundary_order`` + ``null_counts``. None when the writer emitted
    no page index."""
    off = col.get("column_index_offset")
    if off is None:
        return None
    d, _ = _read_struct(bytes(payload), off)
    pages = d.get(2, [])
    return {
        "null_pages": d.get(1, [False] * len(pages)),
        "min_values": pages,
        "max_values": d.get(3, []),
        "boundary_order": d.get(4, 0),
        "null_counts": d.get(5),
    }


def parquet_offset_index(payload: bytes, col: dict) -> "list[dict] | None":
    """Parse a chunk's OffsetIndex into page locations:
    ``[{offset, compressed_page_size, first_row_index}]`` in row
    order — the ranged-fetch plan for page-granular reads."""
    off = col.get("offset_index_offset")
    if off is None:
        return None
    d, _ = _read_struct(bytes(payload), off)
    out = []
    for p in d.get(1, []):
        if 1 not in p or 3 not in p:
            raise ValueError("parquet: PageLocation missing offset/first_row")
        out.append(
            {
                "offset": p[1],
                "compressed_page_size": p.get(2),
                "first_row_index": p[3],
            }
        )
    return out


def timestamp_ntz_flag(schema_element: dict) -> "bool | None":
    """Whether a schema element's TIMESTAMP LogicalType declares a
    NAIVE (wall-clock) timestamp — ``isAdjustedToUTC == False``, the
    parquet representation behind Delta's ``timestampNtz`` reader
    feature (round 16). Returns ``True`` for NTZ, ``False`` for a
    UTC-adjusted instant, ``None`` when the element carries no
    TIMESTAMP logical type. Thrift shape: SchemaElement field 10 is
    the LogicalType union; union field 8 = TIMESTAMP
    {1: isAdjustedToUTC(bool), 2: unit union}."""
    lt = schema_element.get("logical_type")
    if not isinstance(lt, dict):
        return None
    ts = lt.get(8)
    if not isinstance(ts, dict):
        return None
    return not bool(ts.get(1, True))
