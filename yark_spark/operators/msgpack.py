"""MessagePack codec from scratch (round 12): the complete public
wire specification — fixint/fixstr/fixarray/fixmap one-byte forms,
the sized uint/int 8–64 families, float32/64, str/bin 8/16/32,
array/map 16/32, nil/booleans, and ext/fixext passthrough — both
directions, nothing imported.

MessagePack is the record encoding of the MosaicML StreamingDataset
ecosystem ('mds' columns encode scalars this way), of Redis/Kafka
side-channels, and of many dataset staging pipelines that outgrew
JSON parsing cost but kept its data model; a ``.msgpack`` shard is a
plain concatenation of top-level objects (the streaming convention),
which makes the listing a single linear walk. It joins JSON-lines
(.jsonl.zst/.gz/.lz4), tf.Example protobuf (TFRecord) and Avro binary
as the fourth record encoding in the shard-wire family.

Encoder determinism: the encoder always emits the SMALLEST form that
fits (fixint before uint8 before uint16 …), map keys in insertion
order; the decoder accepts any legal form, so foreign writers
interoperate. int64 range enforced (the Avro/protobuf discipline);
floats encode as float64 unless float32 roundtrips exactly.

Decode raises typed ``ValueError`` on malformed input (truncation,
reserved byte 0xc1, depth bomb, element-count bomb) so the quarantine
path keeps corrupt rows as rows.

Oracle recipe: the shard family's — documents packed as concatenated
msgpack maps, one applyInPandas per shard group, listing walks the
stream and digest-checks each text against DuckDB's md5(text). Wire
vectors from the spec's examples + roundtrip fuzz live in
tests/test_msgpack.py.
"""

from __future__ import annotations

import struct

__all__ = ["msgpack_encode", "msgpack_decode", "msgpack_stream_decode"]


def msgpack_encode(obj) -> bytes:
    """Encode one object (None, bool, int, float, str, bytes, list,
    dict) in the smallest legal form."""
    out = bytearray()
    _enc(obj, out, 0)
    return bytes(out)


_MAX_DEPTH = 64


def _enc(obj, out: bytearray, depth: int) -> None:
    if depth > _MAX_DEPTH:
        raise ValueError("msgpack: nesting too deep")
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, int):
        if not -(1 << 63) <= obj < 1 << 64:
            raise ValueError("msgpack: integer out of 64-bit range")
        if 0 <= obj <= 0x7F:
            out.append(obj)
        elif -32 <= obj < 0:
            out.append(obj & 0xFF)
        elif obj >= 0:
            if obj <= 0xFF:
                out += struct.pack(">BB", 0xCC, obj)
            elif obj <= 0xFFFF:
                out += struct.pack(">BH", 0xCD, obj)
            elif obj <= 0xFFFFFFFF:
                out += struct.pack(">BI", 0xCE, obj)
            else:
                out += struct.pack(">BQ", 0xCF, obj)
        else:
            if obj >= -(1 << 7):
                out += struct.pack(">Bb", 0xD0, obj)
            elif obj >= -(1 << 15):
                out += struct.pack(">Bh", 0xD1, obj)
            elif obj >= -(1 << 31):
                out += struct.pack(">Bi", 0xD2, obj)
            else:
                out += struct.pack(">Bq", 0xD3, obj)
    elif isinstance(obj, float):
        try:
            f32 = struct.unpack(">f", struct.pack(">f", obj))[0]
        except OverflowError:  # |x| beyond float32 range stays float64
            f32 = None
        if f32 is not None and (f32 == obj or (f32 != f32 and obj != obj)):
            out += struct.pack(">Bf", 0xCA, obj)  # NaN-safe exact check
        else:
            out += struct.pack(">Bd", 0xCB, obj)
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        n = len(b)
        if n <= 31:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += struct.pack(">BB", 0xD9, n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xDA, n)
        else:
            out += struct.pack(">BI", 0xDB, n)
        out += b
    elif isinstance(obj, (bytes, bytearray, memoryview)):
        b = bytes(obj)
        n = len(b)
        if n <= 0xFF:
            out += struct.pack(">BB", 0xC4, n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xC5, n)
        else:
            out += struct.pack(">BI", 0xC6, n)
        out += b
    elif (
        isinstance(obj, tuple)
        and len(obj) == 3
        and obj[0] == "__ext__"
        and isinstance(obj[1], int)
        and isinstance(obj[2], (bytes, bytearray))
    ):
        # ext passthrough: re-emit what the decoder surfaced, so a
        # rewrite/repack pipeline preserves foreign ext types
        # (timestamps etc.) instead of degrading them to arrays
        ext_type, data = obj[1], bytes(obj[2])
        if not -128 <= ext_type <= 127:
            raise ValueError("msgpack: ext type out of int8 range")
        n = len(data)
        if n in (1, 2, 4, 8, 16):
            out.append(0xD4 + n.bit_length() - 1)
        elif n <= 0xFF:
            out += struct.pack(">BB", 0xC7, n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xC8, n)
        else:
            out += struct.pack(">BI", 0xC9, n)
        out += struct.pack(">b", ext_type)
        out += data
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xDC, n)
        else:
            out += struct.pack(">BI", 0xDD, n)
        for v in obj:
            _enc(v, out, depth + 1)
    elif isinstance(obj, dict):
        n = len(obj)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xDE, n)
        else:
            out += struct.pack(">BI", 0xDF, n)
        for k, v in obj.items():
            _enc(k, out, depth + 1)
            _enc(v, out, depth + 1)
    else:
        raise ValueError(f"msgpack: cannot encode {type(obj).__name__}")


def _need(buf, pos: int, n: int) -> None:
    if pos + n > len(buf):
        raise ValueError("msgpack: truncated")


def _dec(buf, pos: int, depth: int, max_elems: int):
    if depth > _MAX_DEPTH:
        raise ValueError("msgpack: nesting too deep")
    _need(buf, pos, 1)
    b = buf[pos]
    pos += 1
    if b <= 0x7F:  # positive fixint
        return b, pos
    if b >= 0xE0:  # negative fixint
        return b - 256, pos
    if 0x80 <= b <= 0x8F:
        return _dec_map(buf, pos, b & 0x0F, depth, max_elems)
    if 0x90 <= b <= 0x9F:
        return _dec_array(buf, pos, b & 0x0F, depth, max_elems)
    if 0xA0 <= b <= 0xBF:
        n = b & 0x1F
        _need(buf, pos, n)
        return bytes(buf[pos : pos + n]).decode("utf-8"), pos + n
    if b == 0xC0:
        return None, pos
    if b == 0xC1:
        raise ValueError("msgpack: reserved byte 0xc1")
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b in (0xC4, 0xC5, 0xC6):  # bin 8/16/32
        width = 1 << (b - 0xC4)
        _need(buf, pos, width)
        n = int.from_bytes(buf[pos : pos + width], "big")
        pos += width
        if n > max_elems:
            raise ValueError("msgpack: bin exceeds bomb guard")
        _need(buf, pos, n)
        return bytes(buf[pos : pos + n]), pos + n
    if b in (0xC7, 0xC8, 0xC9):  # ext 8/16/32 → (type, data) passthrough
        width = 1 << (b - 0xC7)
        _need(buf, pos, width + 1)
        n = int.from_bytes(buf[pos : pos + width], "big")
        pos += width
        ext_type = struct.unpack_from(">b", buf, pos)[0]
        pos += 1
        if n > max_elems:
            raise ValueError("msgpack: ext exceeds bomb guard")
        _need(buf, pos, n)
        return ("__ext__", ext_type, bytes(buf[pos : pos + n])), pos + n
    if b == 0xCA:
        _need(buf, pos, 4)
        return struct.unpack_from(">f", buf, pos)[0], pos + 4
    if b == 0xCB:
        _need(buf, pos, 8)
        return struct.unpack_from(">d", buf, pos)[0], pos + 8
    if b in (0xCC, 0xCD, 0xCE, 0xCF):  # uint 8/16/32/64
        width = 1 << (b - 0xCC)
        _need(buf, pos, width)
        return int.from_bytes(buf[pos : pos + width], "big"), pos + width
    if b in (0xD0, 0xD1, 0xD2, 0xD3):  # int 8/16/32/64
        width = 1 << (b - 0xD0)
        _need(buf, pos, width)
        return int.from_bytes(buf[pos : pos + width], "big", signed=True), pos + width
    if b in (0xD4, 0xD5, 0xD6, 0xD7, 0xD8):  # fixext 1/2/4/8/16
        n = 1 << (b - 0xD4)
        _need(buf, pos, 1 + n)
        ext_type = struct.unpack_from(">b", buf, pos)[0]
        return ("__ext__", ext_type, bytes(buf[pos + 1 : pos + 1 + n])), pos + 1 + n
    if b in (0xD9, 0xDA, 0xDB):  # str 8/16/32
        width = 1 << (b - 0xD9)
        _need(buf, pos, width)
        n = int.from_bytes(buf[pos : pos + width], "big")
        pos += width
        if n > max_elems:
            raise ValueError("msgpack: str exceeds bomb guard")
        _need(buf, pos, n)
        return bytes(buf[pos : pos + n]).decode("utf-8"), pos + n
    if b in (0xDC, 0xDD):  # array 16/32
        width = 2 << (b - 0xDC)
        _need(buf, pos, width)
        n = int.from_bytes(buf[pos : pos + width], "big")
        return _dec_array(buf, pos + width, n, depth, max_elems)
    # 0xDE, 0xDF: map 16/32
    width = 2 << (b - 0xDE)
    _need(buf, pos, width)
    n = int.from_bytes(buf[pos : pos + width], "big")
    return _dec_map(buf, pos + width, n, depth, max_elems)


def _dec_array(buf, pos: int, n: int, depth: int, max_elems: int):
    if n > max_elems:
        raise ValueError("msgpack: array exceeds bomb guard")
    out = []
    for _ in range(n):
        v, pos = _dec(buf, pos, depth + 1, max_elems)
        out.append(v)
    return out, pos


def _dec_map(buf, pos: int, n: int, depth: int, max_elems: int):
    if n > max_elems:
        raise ValueError("msgpack: map exceeds bomb guard")
    out = {}
    for _ in range(n):
        k, pos = _dec(buf, pos, depth + 1, max_elems)
        if isinstance(k, (list, dict)):
            raise ValueError("msgpack: unhashable map key")
        out[k], pos = _dec(buf, pos, depth + 1, max_elems)
    return out, pos


def msgpack_decode(payload: bytes, max_elems: int = 1 << 24):
    """Decode exactly one top-level object; trailing bytes raise."""
    buf = memoryview(payload)
    obj, pos = _dec(buf, 0, 0, max_elems)
    if pos != len(buf):
        raise ValueError("msgpack: trailing bytes after object")
    return obj


def msgpack_stream_decode(payload: bytes, max_elems: int = 1 << 24) -> list:
    """Decode a concatenated stream of top-level objects (the
    ``.msgpack`` shard convention)."""
    buf = memoryview(payload)
    out = []
    pos = 0
    while pos < len(buf):
        obj, pos = _dec(buf, pos, 0, max_elems)
        out.append(obj)
    return out
