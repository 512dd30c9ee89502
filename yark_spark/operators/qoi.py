"""QOI image codec from scratch (round 12): the complete "Quite OK
Image" format (qoiformat.org, public single-page spec) — 14-byte
big-endian header, the six-op pixel stream (RGB / RGBA literals, the
64-entry (3r+5g+7b+11a) mod 64 index, 2-bit DIFF, LUMA green-anchored
diffs, 62-cap RUN), the zero-initialized index array and the
7×0x00+0x01 end marker — both directions, nothing imported.

QOI matters to a training-data pipeline as the cheap lossless
interchange format: encode/decode is a single linear pass (no entropy
coder), so it is the codec you stage decoded-but-not-yet-resized
images in when PNG's DEFLATE CPU dominates the pass — the same
CPU-vs-ratio trade LZ4 makes against gzip for text. It joins the
image-codec matrix (PNG/JPEG/WebP-VP8L/GIF/TIFF/BMP/netpbm) as the
seventh from-scratch decoder behind ``multimodal.decode_image``'s
magic dispatch.

Wrap-around arithmetic: all DIFF/LUMA deltas are modulo-256 per the
spec ("wraparound"), so the codec is exact for any byte image. RUN
lengths 63/64 are illegal on the wire (their tags collide with the
RGB/RGBA literals) — the encoder caps at 62 and the decoder rejects
nothing there because the tags are unambiguous by construction.

Decode raises typed ``ValueError`` on malformed input (bad magic,
channels/colorspace out of spec, truncation, pixel overflow, missing
or wrong end marker, bomb) so the quarantine path keeps corrupt rows
as rows.

Oracle recipe: the PNG one — QOI is lossless, so the decoded mean of
the 16×16 quadrant fixture is analytically (a+b+c+d)/4 (RGB) or
(3·(a+b+c+d)/4 + 255)/4 (RGBA with opaque alpha), values DuckDB
computes with no image code. Spec-derived wire vectors + roundtrip
fuzz live in tests/test_qoi.py.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_qoi", "decode_qoi"]

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"

_OP_INDEX = 0x00
_OP_DIFF = 0x40
_OP_LUMA = 0x80
_OP_RUN = 0xC0
_OP_RGB = 0xFE
_OP_RGBA = 0xFF


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(arr: np.ndarray, colorspace: int = 0) -> bytes:
    """Encode an (H, W), (H, W, 3) or (H, W, 4) uint8 array. Grayscale
    input broadcasts to RGB (QOI has no 1-channel mode)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError("qoi: expected (H, W[, 3|4]) uint8 array")
    h, w, channels = arr.shape
    out = bytearray(_MAGIC)
    out += struct.pack(">IIBB", w, h, channels, colorspace)

    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    flat = arr.reshape(-1, channels)
    for px in flat:
        if channels == 4:
            cur = (int(px[0]), int(px[1]), int(px[2]), int(px[3]))
        else:
            cur = (int(px[0]), int(px[1]), int(px[2]), 255)
        if cur == prev:
            run += 1
            if run == 62:
                out.append(_OP_RUN | (run - 1))
                run = 0
            continue
        if run:
            out.append(_OP_RUN | (run - 1))
            run = 0
        idx = _hash(*cur)
        if index[idx] == cur:
            out.append(_OP_INDEX | idx)
        else:
            index[idx] = cur
            r, g, b, a = cur
            pr, pg, pb, pa = prev
            if a == pa:
                dr = (r - pr + 128) % 256 - 128
                dg = (g - pg + 128) % 256 - 128
                db = (b - pb + 128) % 256 - 128
                dr_dg = dr - dg
                db_dg = db - dg
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(_OP_DIFF | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
                elif -32 <= dg <= 31 and -8 <= dr_dg <= 7 and -8 <= db_dg <= 7:
                    out.append(_OP_LUMA | (dg + 32))
                    out.append(((dr_dg + 8) << 4) | (db_dg + 8))
                else:
                    out += bytes((_OP_RGB, r, g, b))
            else:
                out += bytes((_OP_RGBA, r, g, b, a))
        prev = cur
    if run:
        out.append(_OP_RUN | (run - 1))
    out += _END
    return bytes(out)


def decode_qoi(payload: bytes, max_pixels: int = 64_000_000) -> np.ndarray:
    """Decode a QOI payload to an (H, W, channels) uint8 array."""
    if len(payload) < 22:  # header + end marker
        raise ValueError("qoi: truncated header")
    if payload[:4] != _MAGIC:
        raise ValueError("qoi: bad magic")
    w, h, channels, colorspace = struct.unpack(">IIBB", payload[4:14])
    if channels not in (3, 4):
        raise ValueError(f"qoi: invalid channels {channels}")
    if colorspace not in (0, 1):
        raise ValueError(f"qoi: invalid colorspace {colorspace}")
    n_px = w * h
    if n_px == 0:
        raise ValueError("qoi: zero-dimension image")
    if n_px > max_pixels:
        raise ValueError("qoi: pixel count exceeds bomb guard")

    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    out = np.empty((n_px, 4), dtype=np.uint8)
    buf = payload
    pos = 14
    end = len(buf) - 8
    filled = 0
    while filled < n_px:
        if pos >= end:
            raise ValueError("qoi: truncated pixel stream")
        tag = buf[pos]
        pos += 1
        if tag == _OP_RGB:
            if pos + 3 > end:
                raise ValueError("qoi: truncated RGB literal")
            r, g, b = buf[pos], buf[pos + 1], buf[pos + 2]
            pos += 3
        elif tag == _OP_RGBA:
            if pos + 4 > end:
                raise ValueError("qoi: truncated RGBA literal")
            r, g, b, a = buf[pos], buf[pos + 1], buf[pos + 2], buf[pos + 3]
            pos += 4
        else:
            op = tag & 0xC0
            if op == _OP_INDEX:
                r, g, b, a = index[tag & 0x3F]
            elif op == _OP_DIFF:
                r = (r + ((tag >> 4) & 3) - 2) % 256
                g = (g + ((tag >> 2) & 3) - 2) % 256
                b = (b + (tag & 3) - 2) % 256
            elif op == _OP_LUMA:
                if pos >= end:
                    raise ValueError("qoi: truncated LUMA op")
                dg = (tag & 0x3F) - 32
                rb = buf[pos]
                pos += 1
                r = (r + dg + ((rb >> 4) & 0xF) - 8) % 256
                g = (g + dg) % 256
                b = (b + dg + (rb & 0xF) - 8) % 256
            else:  # _OP_RUN
                run = (tag & 0x3F) + 1
                if filled + run > n_px:
                    raise ValueError("qoi: run overflows pixel count")
                out[filled : filled + run] = (r, g, b, a)
                filled += run
                continue
        index[_hash(r, g, b, a)] = (r, g, b, a)
        out[filled] = (r, g, b, a)
        filled += 1
    if buf[pos : pos + 8] != _END:
        raise ValueError("qoi: missing end marker")
    img = out.reshape(h, w, 4)
    return img[:, :, :channels].copy()
