"""Pure-numpy baseline JPEG codec (SURVEY.md §2.8 E4, VERDICT r7
next-round #8).

Lifts the one reference data shape the codec layer rejected: the
reference archives real thumbnails as JPEG/WebP blobs
(`cmds/archive.py:88-91`), and this container ships no PIL/cv2. The
codec implements ITU-T T.81 baseline sequential DCT:

- ``decode_jpeg``: SOI/APPn/DQT/DHT/SOF0/SOS parsing, Huffman entropy
  decode (tables read from the FILE, so standard Annex-K streams decode
  too), 0xFF00 unstuffing, dequantization, inverse zigzag, orthonormal
  8x8 IDCT, general sampling factors with replication upsampling
  (4:4:4 / 4:2:2 / 4:2:0), JFIF YCbCr→RGB. Progressive (SOF2),
  arithmetic coding, restart intervals and 12-bit precision raise
  NotImplementedError — a documented boundary, not silent corruption.
- ``encode_jpeg``: the roundtrip half — libjpeg-style quality-scaled
  Annex-K quantization tables, 4:4:4 (color) or single-component
  (gray), and GENERATED canonical Huffman tables (fixed-length: 4-bit
  DC, 9-bit AC) declared in DHT. Generated tables trade compression for
  zero transcription risk — the decoder reads whatever DHT declares, so
  correctness never depends on hard-coded Annex-K code tables. A
  production encoder would emit the Annex-K tables for size.

Performance posture: the DCT/quant/color stages are vectorized numpy;
Huffman entropy (de)coding is per-symbol Python — fine for thumbnails
(the archive shape: ~10^2 KB payloads decoded inside mapInPandas
batches), not for megapixel scans. The Spark-side plumbing
(operators/multimodal.decode_image_features) is format-agnostic and
unchanged.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag[i] = natural (row-major) index of the i-th zigzag coefficient
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: Annex-K luminance/chrominance base quantization tables (natural order)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)


def _quality_scaled(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 1..100 → per-entry divisors in 1..255."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255)


def _dct_matrix() -> np.ndarray:
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    d = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    d[0, :] /= np.sqrt(2.0)
    return d


_D = _dct_matrix()  # orthonormal: block = _D.T @ coeffs @ _D


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """JPEG canonical Huffman construction: symbol -> (length, code)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


# generated fixed-length tables for the encoder (see module docstring):
# DC: symbols 0..11 (size ≤ 11) at 4 bits; AC: the 162 symbols baseline
# allows — EOB, ZRL, and (run 0-15, size 1-10) — at 8 bits (162 < 256
# code space, and a DHT length bucket is a u8 so ≤ 255 codes/length)
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_ENC_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_ENC_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per T.81
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise EOFError("entropy stream exhausted")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else 0
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise EOFError("marker inside entropy stream")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _magnitude(value: int) -> tuple[int, int]:
    """value -> (size, appended bits) per T.81 F.1.2.1."""
    if value == 0:
        return 0, 0
    size = int(value if value > 0 else -value).bit_length()
    bits = value if value >= 0 else value + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    """appended bits -> signed value (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1) + 0.5, 0, 255).astype(np.uint8)


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H8, W8) plane -> (H8/8 * W8/8, 8, 8) blocks, raster order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def encode_jpeg(arr: np.ndarray, quality: int = 85) -> bytes:
    """Encode uint8 (H, W) grayscale or (H, W, 3) RGB to baseline JPEG
    (4:4:4, generated Huffman tables — see module docstring)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        planes = [arr.astype(np.float64)]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        ycc = _rgb_to_ycbcr(arr.astype(np.float64))
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    else:
        raise ValueError("expected (H, W) gray or (H, W, 3) RGB uint8")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qts = [_quality_scaled(QUANT_LUMA, quality), _quality_scaled(QUANT_CHROMA, quality)]
    ncomp = len(planes)

    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)

    # entropy-coded data: components interleaved per MCU (one 8x8 block
    # per component at 4:4:4)
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    comp_blocks = []
    for ci, p in enumerate(planes):
        padded = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") - 128.0
        coeffs = np.einsum("ux,nxy,vy->nuv", _D, _blocks(padded), _D)
        q = qts[1 if ci else 0].reshape(8, 8)
        # baseline AC categories stop at size 10: clamp quantized coeffs
        # to ±1023 (only reachable at quality ≈ 100 on synthetic extremes)
        comp_blocks.append(
            np.clip(np.round(coeffs / q), -1023, 1023).astype(np.int64)
        )

    bw = _BitWriter()
    pred = [0] * ncomp
    n_blocks = comp_blocks[0].shape[0]
    for bi in range(n_blocks):
        for ci in range(ncomp):
            blk = comp_blocks[ci][bi].reshape(64)[ZIGZAG]
            diff = int(blk[0]) - pred[ci]
            pred[ci] = int(blk[0])
            size, bits = _magnitude(diff)
            length, code = dc_codes[size]
            bw.write(code, length)
            if size:
                bw.write(bits, size)
            run = 0
            nz = np.flatnonzero(blk[1:])
            last = int(nz[-1]) + 1 if nz.size else 0
            for k in range(1, last + 1):
                v = int(blk[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    length, code = ac_codes[0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                size, bits = _magnitude(v)
                length, code = ac_codes[(run << 4) | size]
                bw.write(code, length)
                bw.write(bits, size)
                run = 0
            if last < 63:
                length, code = ac_codes[0x00]  # EOB
                bw.write(code, length)
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti in range(2 if ncomp == 3 else 1):
        zz = qts[ti][ZIGZAG].astype(np.uint8).tobytes()
        out += seg(0xFFDB, bytes([ti]) + zz)
    comps = b"".join(
        bytes([ci + 1, 0x11, 1 if ci else 0]) for ci in range(ncomp)
    )
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, ncomp) + comps)
    for cls, bits, vals in ((0, _ENC_DC_BITS, _ENC_DC_VALS), (1, _ENC_AC_BITS, _ENC_AC_VALS)):
        payload = bytes([cls << 4]) + bytes(bits) + bytes(vals)
        out += seg(0xFFC4, payload)
    if ncomp == 3:  # second table pair, identical codes, id 1
        for cls, bits, vals in ((0, _ENC_DC_BITS, _ENC_DC_VALS), (1, _ENC_AC_BITS, _ENC_AC_VALS)):
            payload = bytes([(cls << 4) | 1]) + bytes(bits) + bytes(vals)
            out += seg(0xFFC4, payload)
    scomps = b"".join(
        bytes([ci + 1, 0x11 if ci else 0x00]) for ci in range(ncomp)
    )
    out += seg(0xFFDA, bytes([ncomp]) + scomps + b"\x00\x3f\x00")
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG to uint8 (H, W) or (H, W, 3)."""
    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    scan = None
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(seg, np.uint8, 64, sp + 1).astype(np.float64)
                nat = np.empty(64)
                nat[ZIGZAG] = zz
                qtables[tq] = nat
                sp += 65
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                cls, tid = seg[sp] >> 4, seg[sp] & 0x0F
                bits = list(seg[sp + 1 : sp + 17])
                nvals = sum(bits)
                vals = list(seg[sp + 17 : sp + 17 + nvals])
                fwd = _canonical_codes(bits, vals)
                htables[(cls, tid)] = {lc: sym for sym, lc in fwd.items()}
                sp += 17 + nvals
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("12-bit precision")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential DCT (SOF0/1)")
        elif marker == 0xDD:  # DRI
            (interval,) = struct.unpack_from(">H", seg, 0)
            if interval:
                raise NotImplementedError("restart intervals")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            spec = {}
            for ci in range(ns):
                cid, tt = seg[1 + 2 * ci : 3 + 2 * ci]
                spec[cid] = (tt >> 4, tt & 0x0F)
            scan = {"spec": spec, "start": pos + seglen}
            break
        pos += seglen
    if frame is None or scan is None:
        raise ValueError("no SOF/SOS found")

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps
    }
    br = _BitReader(data[scan["start"] :])

    def read_symbol(table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 17:
            code = (code << 1) | br.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    pred = {c["id"]: 0 for c in comps}
    for my in range(mcuy):
        for mx in range(mcux):
            for c in comps:
                td, ta = scan["spec"][c["id"]]
                dct_t, act_t = htables[(0, td)], htables[(1, ta)]
                q = qtables[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64)
                        size = read_symbol(dct_t)
                        diff = _extend(br.read_bits(size), size)
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = read_symbol(act_t)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.read_bits(size), size)
                            k += 1
                        nat = np.zeros(64)
                        nat[ZIGZAG] = zz
                        block = _D.T @ ((nat * q).reshape(8, 8)) @ _D + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = block

    h, w = frame["h"], frame["w"]
    full = {}
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full[c["id"]] = p[:h, :w]
    if len(comps) == 1:
        only = full[comps[0]["id"]]
        return np.clip(only + 0.5, 0, 255).astype(np.uint8)
    ids = [c["id"] for c in comps]
    return _ycbcr_to_rgb(full[ids[0]], full[ids[1]], full[ids[2]])
