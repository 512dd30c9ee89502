"""Roaring bitmaps (round 14): the 32-bit PORTABLE serialization
(RoaringFormatSpec — array / bitmap / run containers, the run-aware
12347 cookie and the no-run 12346 cookie, offset headers at the
4-container threshold) plus Delta Lake's 64-bit "RoaringBitmapArray"
wrapper (magic 1681511377, little-endian bucket count, one 32-bit
portable bitmap per 2^32 bucket) and the Z85 text encoding inline
deletion vectors ride in — everything a Delta protocol-v3 reader
needs to turn ``deletionVector`` descriptors back into row sets.

Both directions are from scratch (no roaring library ships in this
container), pinned by hand-derived spec vectors in
tests/test_roaring.py: container-type selection thresholds
(array ≤ 4096 entries, bitmap above, run when it wins), the
cardinality-1 and length-1 minus-one wire conventions, and the
offset-header presence rule.

Reference parity note: the reference archiver (SupBlizard/yark)
stores row state in SQLite; compressed row-id sets are
driver-mandated lakehouse surface (SURVEY.md §2.8).
"""

from __future__ import annotations

import struct

__all__ = [
    "roaring32_deserialize",
    "roaring32_serialize",
    "roaring64_array_deserialize",
    "roaring64_array_serialize",
    "z85_decode",
    "z85_encode",
]

_SERIAL_COOKIE = 12347  # run containers possible
_SERIAL_COOKIE_NO_RUN = 12346
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096


# ---------------------------------------------------------------------------
# 32-bit portable serialization
# ---------------------------------------------------------------------------


def roaring32_serialize(values: "list[int] | set[int]") -> bytes:
    """Serialize a set of uint32s to the portable format. Container
    per high-16 key: a run container when runs are the smallest
    encoding, else array (≤4096 values) or 8 KiB bitmap."""
    by_key: dict[int, list[int]] = {}
    for v in sorted(set(values)):
        if not 0 <= v <= 0xFFFFFFFF:
            raise ValueError("roaring: value out of uint32 range")
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(by_key)
    containers: list[tuple[int, int, bytes, bool]] = []  # key, card, body, is_run
    for k in keys:
        lows = by_key[k]
        runs: list[tuple[int, int]] = []
        for lo in lows:
            if runs and lo == runs[-1][0] + runs[-1][1]:
                runs[-1] = (runs[-1][0], runs[-1][1] + 1)
            else:
                runs.append((lo, 1))
        run_size = 2 + 4 * len(runs)
        arr_size = 2 * len(lows)
        bmp_size = 8192
        best = min(run_size, arr_size if len(lows) <= _ARRAY_MAX else bmp_size,
                   bmp_size)
        if best == run_size:
            body = struct.pack("<H", len(runs)) + b"".join(
                struct.pack("<HH", s, ln - 1) for s, ln in runs
            )
            containers.append((k, len(lows), body, True))
        elif len(lows) <= _ARRAY_MAX and best == arr_size:
            body = b"".join(struct.pack("<H", lo) for lo in lows)
            containers.append((k, len(lows), body, False))
        else:
            bits = bytearray(8192)
            for lo in lows:
                bits[lo >> 3] |= 1 << (lo & 7)
            containers.append((k, len(lows), bytes(bits), False))

    n = len(containers)
    has_run = any(c[3] for c in containers)
    out = bytearray()
    if has_run:
        out += struct.pack("<I", _SERIAL_COOKIE | ((n - 1) << 16))
        flags = bytearray((n + 7) // 8)
        for i, c in enumerate(containers):
            if c[3]:
                flags[i // 8] |= 1 << (i % 8)
        out += flags
    else:
        out += struct.pack("<I", _SERIAL_COOKIE_NO_RUN)
        out += struct.pack("<I", n)
    for k, card, _body, _r in containers:
        out += struct.pack("<HH", k, card - 1)
    if (not has_run) or n >= _NO_OFFSET_THRESHOLD:
        at = len(out) + 4 * n
        for _k, _card, body, _r in containers:
            out += struct.pack("<I", at)
            at += len(body)
    for _k, _card, body, _r in containers:
        out += body
    return bytes(out)


def roaring32_deserialize(data: bytes, pos: int = 0) -> tuple[set[int], int]:
    """Parse one portable 32-bit bitmap at ``pos``; returns (values,
    next position). Typed errors on bad cookies/truncation."""
    if pos + 4 > len(data):
        raise ValueError("roaring: truncated cookie")
    cookie = struct.unpack_from("<I", data, pos)[0]
    pos += 4
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        nbytes = (n + 7) // 8
        if pos + nbytes > len(data):
            raise ValueError("roaring: truncated run flags")
        flags = data[pos : pos + nbytes]
        pos += nbytes
        is_run = [bool(flags[i // 8] & (1 << (i % 8))) for i in range(n)]
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        if pos + 4 > len(data):
            raise ValueError("roaring: truncated container count")
        n = struct.unpack_from("<I", data, pos)[0]
        pos += 4
        is_run = [False] * n
        has_offsets = True
    else:
        raise ValueError(f"roaring: unknown cookie {cookie & 0xFFFF}")
    if pos + 4 * n > len(data):
        raise ValueError("roaring: truncated descriptive headers")
    heads = [struct.unpack_from("<HH", data, pos + 4 * i) for i in range(n)]
    pos += 4 * n
    if has_offsets:
        pos += 4 * n  # offsets are a seek aid; sequential decode ignores them
    out: set[int] = set()
    for i, (key, card_m1) in enumerate(heads):
        card = card_m1 + 1
        base = key << 16
        if is_run[i]:
            if pos + 2 > len(data):
                raise ValueError("roaring: truncated run container")
            n_runs = struct.unpack_from("<H", data, pos)[0]
            pos += 2
            if pos + 4 * n_runs > len(data):
                raise ValueError("roaring: truncated run container")
            for _ in range(n_runs):
                s, ln_m1 = struct.unpack_from("<HH", data, pos)
                pos += 4
                out.update(range(base + s, base + s + ln_m1 + 1))
        elif card > _ARRAY_MAX:
            if pos + 8192 > len(data):
                raise ValueError("roaring: truncated bitmap container")
            chunk = data[pos : pos + 8192]
            pos += 8192
            for byte_i, b in enumerate(chunk):
                while b:
                    bit = b & (-b)
                    out.add(base + byte_i * 8 + bit.bit_length() - 1)
                    b ^= bit
        else:
            if pos + 2 * card > len(data):
                raise ValueError("roaring: truncated array container")
            for j in range(card):
                out.add(base + struct.unpack_from("<H", data, pos + 2 * j)[0])
            pos += 2 * card
    return out, pos


# ---------------------------------------------------------------------------
# Delta's 64-bit RoaringBitmapArray wrapper
# ---------------------------------------------------------------------------

_RBA_MAGIC = 1681511377


def roaring64_array_serialize(values: "list[int] | set[int]") -> bytes:
    """Delta's RoaringBitmapArray: magic, little-endian bucket count,
    then one portable 32-bit bitmap per ascending 2^32 bucket."""
    buckets: dict[int, set[int]] = {}
    for v in sorted(set(values)):
        if v < 0:
            raise ValueError("roaring: row indexes are non-negative")
        buckets.setdefault(v >> 32, set()).add(v & 0xFFFFFFFF)
    n_buckets = (max(buckets) + 1) if buckets else 0
    out = bytearray(struct.pack("<iq", _RBA_MAGIC, n_buckets))
    for b in range(n_buckets):
        out += roaring32_serialize(buckets.get(b, set()))
    return bytes(out)


def roaring64_array_deserialize(data: bytes) -> set[int]:
    if len(data) < 12:
        raise ValueError("roaring: truncated bitmap array header")
    magic, n_buckets = struct.unpack_from("<iq", data, 0)
    if magic != _RBA_MAGIC:
        raise ValueError(f"roaring: bad RoaringBitmapArray magic {magic}")
    pos = 12
    out: set[int] = set()
    for b in range(n_buckets):
        vals, pos = roaring32_deserialize(data, pos)
        out.update((b << 32) | v for v in vals)
    if pos != len(data):
        raise ValueError("roaring: trailing bytes after last bucket")
    return out


# ---------------------------------------------------------------------------
# Z85 (ZeroMQ base-85) — inline deletion vectors ride in this alphabet
# ---------------------------------------------------------------------------

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    ".-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DECODE = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85: length must be a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_ALPHABET[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85: length must be a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for ch in text[i : i + 5]:
            if ch not in _Z85_DECODE:
                raise ValueError(f"z85: invalid character {ch!r}")
            v = v * 85 + _Z85_DECODE[ch]
        if v > 0xFFFFFFFF:
            raise ValueError("z85: chunk overflows 32 bits")
        out += v.to_bytes(4, "big")
    return bytes(out)
