"""Snappy block codec from scratch (round 12): the varint-preamble +
tagged-element wire of Google's format description (literals with
1/2/3/4-byte extended lengths; copies with 1-byte 11-bit, 2-byte and
4-byte little-endian offsets; overlapping copies as RLE) — nothing
imported.

Snappy is the default codec of the Hadoop-lineage data stack: Avro
object-container files, Parquet pages, ORC stripes, SequenceFiles all
ship snappy-compressed by default, so an engine that ingests published
Avro/Hadoop corpora needs the block codec (the Avro reader in
``operators/avro_ocf`` dispatches into it). Like LZ4 it trades ratio
for speed — the codec you meet when decode CPU, not network, bounds
the scan.

The encoder is a greedy 4-byte-hash matcher (the reference scheme of
the public format description): matches of 4..64 bytes become copies
(longer matches emit multiple 64-byte copies), everything else joins
the pending literal run. Decode raises typed ``ValueError`` on
malformed input (offset 0 / out-of-window, truncation, declared-size
mismatch, bomb) so the quarantine path keeps corrupt rows as rows.

Oracle recipe: snappy rides inside the Avro container key
(q_avro_scan — md5(decode(encode(text))) vs DuckDB's md5(text));
hand-derived wire vectors + roundtrip fuzz live in tests/test_snappy.py.
"""

from __future__ import annotations

from yark_spark.operators.varint import read_uvarint, write_uvarint

__all__ = ["snappy_compress", "snappy_decompress"]


def _write_varint(n: int) -> bytes:
    return write_uvarint(n)


def _read_varint(buf, pos: int) -> tuple[int, int]:
    # 35 → the 32-bit preamble cap of the snappy format
    return read_uvarint(buf, pos, max_shift=35, what="snappy")


def snappy_decompress(payload: bytes, max_output: int | None = None) -> bytes:
    """Decode one snappy block. Verifies the declared uncompressed
    length; ``max_output`` bombs out oversized declarations before any
    allocation."""
    buf = memoryview(payload)
    declared, pos = _read_varint(buf, 0)
    if max_output is not None and declared > max_output:
        raise ValueError("snappy: declared size exceeds bomb guard")
    out = bytearray()
    n = len(buf)
    while pos < n:
        tag = buf[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nbytes = ln - 59
                if pos + nbytes > n:
                    raise ValueError("snappy: truncated literal length")
                ln = int.from_bytes(buf[pos : pos + nbytes], "little")
                pos += nbytes
            ln += 1
            if pos + ln > n:
                raise ValueError("snappy: truncated literal")
            out += buf[pos : pos + ln]
            pos += ln
        else:
            if kind == 1:  # 1-byte offset copy, len 4..11, offset 11 bits
                if pos >= n:
                    raise ValueError("snappy: truncated copy")
                length = ((tag >> 2) & 0x7) + 4
                offset = ((tag >> 5) << 8) | buf[pos]
                pos += 1
            elif kind == 2:  # 2-byte LE offset, len 1..64
                if pos + 2 > n:
                    raise ValueError("snappy: truncated copy")
                length = (tag >> 2) + 1
                offset = int.from_bytes(buf[pos : pos + 2], "little")
                pos += 2
            else:  # 4-byte LE offset
                if pos + 4 > n:
                    raise ValueError("snappy: truncated copy")
                length = (tag >> 2) + 1
                offset = int.from_bytes(buf[pos : pos + 4], "little")
                pos += 4
            if offset == 0 or offset > len(out):
                raise ValueError("snappy: copy offset out of window")
            start = len(out) - offset
            if offset >= length:
                out += out[start : start + length]
            else:  # overlapping copy — byte-serial semantics (RLE)
                for i in range(length):
                    out.append(out[start + i])
        if len(out) > declared:
            raise ValueError("snappy: output exceeds declared size")
    if len(out) != declared:
        raise ValueError("snappy: declared/actual size mismatch")
    return bytes(out)


def _emit_literal(out: bytearray, data, start: int, end: int) -> None:
    ln = end - start
    if ln <= 0:
        return
    v = ln - 1
    if v < 60:
        out.append(v << 2)
    else:
        nbytes = (v.bit_length() + 7) // 8
        out.append((59 + nbytes) << 2)
        out += v.to_bytes(nbytes, "little")
    out += data[start:end]


def _emit_copy(out: bytearray, offset: int, length: int) -> None:
    # prefer the compact 1-byte-offset form when it fits
    while length > 0:
        if length > 64:
            chunk = 64 if length - 64 >= 4 else length - 4
        else:
            chunk = length
        if 4 <= chunk <= 11 and offset < 2048:
            out.append(((offset >> 8) << 5) | ((chunk - 4) << 2) | 1)
            out.append(offset & 0xFF)
        elif offset < 65536:
            out.append(((chunk - 1) << 2) | 2)
            out += offset.to_bytes(2, "little")
        else:
            out.append(((chunk - 1) << 2) | 3)
            out += offset.to_bytes(4, "little")
        length -= chunk


def snappy_compress(raw: bytes) -> bytes:
    """Encode one snappy block: greedy 4-byte-hash matcher, min match
    4, copies capped at 64 bytes (the wire maximum), compact tag forms
    preferred.

    Output is BYTE-IDENTICAL to the straightforward per-byte loop (the
    reference copy lives in tests/test_snappy.py and is compared across
    payload classes); only the per-position work is vectorized — this is
    the hot codec of the streaming-sink parquet parts and the OPTIMIZE
    rewrite, so its per-byte Python cost is the per-task bill:

    - the 4-byte hash keys are precomputed per 256K-position SEGMENT with
      one numpy pass + ``tolist`` (a plain-int list lookup beats a
      per-position ``raw[i:i+4]`` slice + ``int.from_bytes``); segments a
      long match jumps clean over are never materialized, so repetitive
      data pays almost nothing;
    - match extension compares 32-byte windows (one C memcmp each)
      before the per-byte tail, so long matches cost length/32 compares.

    Measured (1 MB blocks): random bytes 0.53-0.68 s -> 0.37-0.38 s,
    csv-like text 0.19 s -> 0.15 s, zero page 0.10 s -> 0.015 s,
    repeated 256-byte block 0.097 s -> 0.020 s."""
    n = len(raw)
    out = bytearray(_write_varint(n))
    if n == 0:
        return bytes(out)
    table: dict[int, int] = {}
    lit_start = 0
    i = 0
    last = n - 4
    if last >= 0:
        import numpy as np

        a = np.frombuffer(raw, dtype=np.uint8)
        u32 = np.uint32
    SEG = 1 << 18
    keys: list = []
    seg_base = 0
    seg_end = 0
    while i <= last:
        if i >= seg_end:
            seg_base = i
            seg_end = min(i + SEG, last + 1)
            keys = (
                a[seg_base:seg_end].astype(u32)
                | (a[seg_base + 1 : seg_end + 1].astype(u32) << u32(8))
                | (a[seg_base + 2 : seg_end + 2].astype(u32) << u32(16))
                | (a[seg_base + 3 : seg_end + 3].astype(u32) << u32(24))
            ).tolist()
        key = keys[i - seg_base]
        cand = table.get(key)
        table[key] = i
        if cand is not None:
            # a hit IS a 4-byte match: table keys are the literal 4
            # bytes (not a hash), so no verify compare is needed.
            # extend the match: 32-byte memcmp strides, per-byte tail
            length = 4
            while (
                i + length + 32 <= n
                and raw[cand + length : cand + length + 32]
                == raw[i + length : i + length + 32]
            ):
                length += 32
            while i + length < n and raw[cand + length] == raw[i + length]:
                length += 1
            # emit, with the two wire forms that dominate real data
            # inlined (the helper calls were ~30% of match-dense encode)
            ln = i - lit_start
            if ln:
                if ln <= 60:
                    out.append((ln - 1) << 2)
                    out += raw[lit_start:i]
                else:
                    _emit_literal(out, raw, lit_start, i)
            offset = i - cand
            if length <= 64:
                if length <= 11 and offset < 2048:
                    out.append(((offset >> 8) << 5) | ((length - 4) << 2) | 1)
                    out.append(offset & 0xFF)
                elif offset < 65536:
                    out.append(((length - 1) << 2) | 2)
                    out += offset.to_bytes(2, "little")
                else:
                    out.append(((length - 1) << 2) | 3)
                    out += offset.to_bytes(4, "little")
            else:
                _emit_copy(out, offset, length)
            i += length
            lit_start = i
        else:
            i += 1
    _emit_literal(out, raw, lit_start, n)
    return bytes(out)
