"""Base-128 varint primitives shared by the wire codecs (round 12
review cleanup): protobuf/TFRecord (``operators/tfrecord``), snappy's
length preamble (``operators/snappy``) and Avro's zigzag longs
(``operators/avro_ocf``) all speak the same little-endian-group
encoding — one implementation, parameterized by the caller's shift
cap and error-message prefix, replaces the three that had already
begun to drift."""

from __future__ import annotations

__all__ = ["write_uvarint", "read_uvarint"]


def write_uvarint(n: int) -> bytes:
    """Encode a non-negative integer as a base-128 varint."""
    if n < 0:
        raise ValueError("varint: value must be non-negative")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_uvarint(
    buf, pos: int, max_shift: int = 70, what: str = "varint"
) -> tuple[int, int]:
    """Decode a base-128 varint at ``pos``; returns (value, next_pos).
    ``max_shift`` bounds the encoding width (70 → 64-bit payloads,
    35 → 32-bit); ``what`` prefixes the typed errors so each wire
    format keeps its own diagnostics."""
    result = 0
    shift = 0
    n = len(buf)
    while True:
        if pos >= n:
            raise ValueError(f"{what}: truncated varint")
        if shift >= max_shift:
            raise ValueError(f"{what}: varint too long")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
