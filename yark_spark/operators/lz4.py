"""LZ4 codec from scratch (round 12): the block format (token /
literal-run / offset+match-length sequences with 255-continuation
lengths and overlapping copies), the frame format (magic 0x184D2204,
FLG/BD descriptor with header-checksum byte, independent blocks,
optional content size, per-block and whole-content XXH32 checksums),
and XXH32 itself — nothing imported.

`.jsonl.lz4` sits beside `.jsonl.zst` and `.jsonl.gz` in public corpus
distribution (HuggingFace dataset shards, internal crawl staging), so
the container family (operators/containers: gzip/tar/WARC; operators/
zstd: RFC 8878) gains the third modern wire codec here. LZ4 trades
ratio for speed — at 100 TB it is the codec you pick when decode CPU,
not network, bounds the scan, which makes its ingest path exactly as
mandate-relevant as zstd's.

The encoder is a real greedy hash-chain matcher (the reference
algorithm of the public spec: 4-byte hash → candidate position →
extend), honoring the spec's end-of-block rules (last 5 bytes are
literals; no match starts within the final 12 bytes). Decode raises
typed ``ValueError`` on malformed input (bad magic, offset 0 /
out-of-window, truncation, checksum mismatch, declared-size mismatch)
so the quarantine path keeps corrupt rows as rows.

Oracle recipe: same as gzip/zstd ingest — md5(decompress(compress(
text))) must equal DuckDB's md5(text); one digest certifies the whole
token/copy/frame wire. Roundtrip fuzz + hand-derived wire vectors live
in tests/test_lz4.py.
"""

from __future__ import annotations

import struct

__all__ = [
    "xxh32",
    "lz4_block_compress",
    "lz4_block_decompress",
    "lz4_frame_compress",
    "lz4_frame_decompress",
]

_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393
_M32 = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 (public xxHash spec) — LZ4 frames use it for the header
    checksum byte and the block/content checksums."""
    data = bytes(data)
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while i <= n - 16:
            l1, l2, l3, l4 = struct.unpack_from("<IIII", data, i)
            v1 = (_rotl((v1 + l1 * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl((v2 + l2 * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl((v3 + l3 * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl((v4 + l4 * _P2) & _M32, 13) * _P1) & _M32
            i += 16
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while i <= n - 4:
        (l,) = struct.unpack_from("<I", data, i)
        h = (_rotl((h + l * _P3) & _M32, 17) * _P4) & _M32
        i += 4
    while i < n:
        h = (_rotl((h + data[i] * _P5) & _M32, 11) * _P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# ---------------------------------------------------------------------------
# Block format
# ---------------------------------------------------------------------------

_MINMATCH = 4
_MFLIMIT = 12  # no match may start within the last 12 bytes
_LASTLITERALS = 5  # the last 5 bytes are always literals


def lz4_block_decompress(src: bytes, max_output: int = 1 << 26) -> bytes:
    """LZ4 block → raw bytes. ``max_output`` is the bomb guard (the
    format has no declared size at block level)."""
    src = bytes(src)
    n = len(src)
    dst = bytearray()
    i = 0
    if n == 0:
        raise ValueError("lz4: empty block")
    while True:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if i >= n:
                    raise ValueError("lz4: truncated literal length")
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if i + lit > n:
            raise ValueError("lz4: literal run past end of block")
        dst += src[i : i + lit]
        i += lit
        if len(dst) > max_output:
            raise ValueError("lz4: output exceeds bomb guard")
        if i == n:
            break  # the final sequence carries literals only
        if i + 2 > n:
            raise ValueError("lz4: truncated match offset")
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise ValueError("lz4: match offset 0")
        if offset > len(dst):
            raise ValueError("lz4: match offset outside window")
        mlen = token & 0xF
        if mlen == 15:
            while True:
                if i >= n:
                    raise ValueError("lz4: truncated match length")
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        mlen += _MINMATCH
        if len(dst) + mlen > max_output:
            raise ValueError("lz4: output exceeds bomb guard")
        start = len(dst) - offset
        if offset >= mlen:
            dst += dst[start : start + mlen]
        else:
            # overlapping copy is byte-serial BY DEFINITION (RLE-style)
            for k in range(mlen):
                dst.append(dst[start + k])
    return bytes(dst)


def _hash4(v: int) -> int:
    return ((v * _P1) & _M32) >> 19  # 13-bit table


def lz4_block_compress(src: bytes) -> bytes:
    """Raw bytes → LZ4 block (greedy single-entry hash matcher — the
    public reference algorithm's fast path). Honors the end-of-block
    rules so any conformant decoder accepts the output."""
    src = bytes(src)
    n = len(src)
    out = bytearray()

    def emit(anchor: int, end: int, offset: int = 0, mlen: int = 0) -> None:
        lit = end - anchor
        tok_lit = 15 if lit >= 15 else lit
        tok_m = 0
        if mlen:
            m = mlen - _MINMATCH
            tok_m = 15 if m >= 15 else m
        out.append((tok_lit << 4) | tok_m)
        if lit >= 15:
            rem = lit - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out.extend(src[anchor:end])
        if mlen:
            out.extend(struct.pack("<H", offset))
            if mlen - _MINMATCH >= 15:
                rem = mlen - _MINMATCH - 15
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)

    if n < _MFLIMIT + 1:
        emit(0, n)
        return bytes(out)

    table: dict[int, int] = {}
    anchor = 0
    i = 0
    match_limit = n - _MFLIMIT  # last legal match START
    mend_limit = n - _LASTLITERALS  # matches may not extend past here
    while i <= match_limit:
        v = int.from_bytes(src[i : i + 4], "little")
        h = _hash4(v)
        cand = table.get(h)
        table[h] = i
        if (
            cand is not None
            and i - cand <= 0xFFFF
            and int.from_bytes(src[cand : cand + 4], "little") == v
        ):
            mlen = _MINMATCH
            while (
                i + mlen < mend_limit and src[cand + mlen] == src[i + mlen]
            ):
                mlen += 1
            emit(anchor, i, i - cand, mlen)
            i += mlen
            anchor = i
        else:
            i += 1
    emit(anchor, n)
    return bytes(out)


# ---------------------------------------------------------------------------
# Frame format
# ---------------------------------------------------------------------------

_FRAME_MAGIC = 0x184D2204
_BLOCK_MAX = {4: 64 << 10, 5: 256 << 10, 6: 1 << 20, 7: 4 << 20}


def lz4_frame_compress(
    data: bytes,
    block_size_id: int = 4,
    content_checksum: bool = True,
    block_checksum: bool = False,
    store_content_size: bool = True,
) -> bytes:
    """Raw bytes → LZ4 frame (version 01, independent blocks). Blocks
    that don't shrink are stored raw with the high bit set, per spec."""
    data = bytes(data)
    if block_size_id not in _BLOCK_MAX:
        raise ValueError(f"lz4: bad block size id {block_size_id}")
    flg = (1 << 6) | (1 << 5)  # version 01, block independence
    if block_checksum:
        flg |= 1 << 4
    if store_content_size:
        flg |= 1 << 3
    if content_checksum:
        flg |= 1 << 2
    bd = block_size_id << 4
    desc = bytes([flg, bd])
    if store_content_size:
        desc += struct.pack("<Q", len(data))
    out = bytearray()
    out += struct.pack("<I", _FRAME_MAGIC)
    out += desc
    out.append((xxh32(desc) >> 8) & 0xFF)
    bmax = _BLOCK_MAX[block_size_id]
    for off in range(0, len(data), bmax):
        chunk = data[off : off + bmax]
        comp = lz4_block_compress(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp))
            out += comp
            if block_checksum:
                out += struct.pack("<I", xxh32(comp))
        else:
            out += struct.pack("<I", 0x80000000 | len(chunk))
            out += chunk
            if block_checksum:
                out += struct.pack("<I", xxh32(chunk))
    out += struct.pack("<I", 0)  # end mark
    if content_checksum:
        out += struct.pack("<I", xxh32(data))
    return bytes(out)


def lz4_frame_decompress(payload: bytes, max_output: int = 1 << 26) -> bytes:
    """LZ4 frame → raw bytes, verifying the header-checksum byte, any
    block checksums, the content checksum, and the declared content
    size. Dictionaries and dependent blocks raise typed errors (the
    encoder never emits them; real `.lz4` corpus shards don't either)."""
    b = bytes(payload)
    if len(b) < 7 or struct.unpack_from("<I", b)[0] != _FRAME_MAGIC:
        raise ValueError("lz4: bad frame magic")
    pos = 4
    flg = b[pos]
    bd = b[pos + 1]
    if (flg >> 6) != 1:
        raise ValueError(f"lz4: unsupported frame version {flg >> 6}")
    b_indep = bool(flg & (1 << 5))
    b_csum = bool(flg & (1 << 4))
    c_size = bool(flg & (1 << 3))
    c_csum = bool(flg & (1 << 2))
    if flg & 0x02:
        raise ValueError("lz4: reserved FLG bit set")
    if flg & 0x01:
        raise ValueError("lz4: dictionary frames not supported")
    if not b_indep:
        raise ValueError("lz4: dependent blocks not supported")
    bsid = bd >> 4
    if bsid not in _BLOCK_MAX or bd & 0x8F:
        raise ValueError(f"lz4: invalid BD byte 0x{bd:02x}")
    desc_len = 2 + (8 if c_size else 0)
    desc = b[pos : pos + desc_len]
    if len(desc) != desc_len or pos + desc_len >= len(b):
        raise ValueError("lz4: truncated frame descriptor")
    declared = struct.unpack_from("<Q", b, pos + 2)[0] if c_size else None
    if declared is not None and declared > max_output:
        raise ValueError("lz4: declared content size exceeds bomb guard")
    hc = b[pos + desc_len]
    if hc != (xxh32(desc) >> 8) & 0xFF:
        raise ValueError("lz4: header checksum mismatch")
    pos += desc_len + 1

    bmax = _BLOCK_MAX[bsid]
    out = bytearray()
    while True:
        if pos + 4 > len(b):
            raise ValueError("lz4: truncated block header")
        word = struct.unpack_from("<I", b, pos)[0]
        pos += 4
        if word == 0:
            break  # end mark
        raw = bool(word & 0x80000000)
        size = word & 0x7FFFFFFF
        if size > bmax + (0 if raw else bmax):
            raise ValueError("lz4: block larger than frame maximum")
        blk = b[pos : pos + size]
        if len(blk) != size:
            raise ValueError("lz4: truncated block")
        pos += size
        if b_csum:
            if pos + 4 > len(b):
                raise ValueError("lz4: truncated block checksum")
            if struct.unpack_from("<I", b, pos)[0] != xxh32(blk):
                raise ValueError("lz4: block checksum mismatch")
            pos += 4
        if raw:
            out += blk
        else:
            out += lz4_block_decompress(blk, max_output=max_output - len(out))
        if len(out) > max_output:
            raise ValueError("lz4: output exceeds bomb guard")
    if c_csum:
        if pos + 4 > len(b):
            raise ValueError("lz4: truncated content checksum")
        if struct.unpack_from("<I", b, pos)[0] != xxh32(bytes(out)):
            raise ValueError("lz4: content checksum mismatch")
        pos += 4
    if declared is not None and declared != len(out):
        raise ValueError("lz4: content size mismatch")
    return bytes(out)
