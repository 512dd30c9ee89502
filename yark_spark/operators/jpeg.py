"""Pure-numpy baseline JPEG codec (SURVEY.md §2.8 E4, VERDICT r7
next-round #8).

Lifts the one reference data shape the codec layer rejected: the
reference archives real thumbnails as JPEG/WebP blobs
(`cmds/archive.py:88-91`), and this container ships no PIL/cv2. The
codec implements ITU-T T.81 baseline sequential DCT:

- ``decode_jpeg``: SOI/APPn/DQT/DHT/SOF0/1/2/SOS parsing, Huffman
  entropy decode (tables read from the FILE, so standard Annex-K streams
  decode too), 0xFF00 unstuffing, restart intervals (DRI/RSTn, baseline
  AND progressive), PROGRESSIVE DCT (SOF2: spectral selection,
  successive approximation, DC/AC first+refinement scans, EOB runs —
  round 9, VERDICT r8 next-round #2), dequantization, inverse zigzag,
  batched orthonormal 8x8 IDCT, general sampling factors with
  replication upsampling (4:4:4 / 4:2:2 / 4:2:0), JFIF YCbCr→RGB, and
  LOSSLESS frames (SOF3, round 11: Annex-H predictive coding, all
  seven predictors, 2-16-bit precision, mod-2^16 differences with the
  SSSS=16 case, point transform). 16-bit (Pq=1) quantization tables
  parse per T.81 B.2.4.1, and 12-bit extended-sequential/progressive
  frames decode with precision-scaled level shift and clip (round 11).
  Arithmetic coding (SOF9/10) and hierarchical frames raise
  NotImplementedError — a documented boundary, not silent corruption.
- ``encode_jpeg`` / ``encode_jpeg_progressive``: the roundtrip half —
  libjpeg-style quality-scaled Annex-K quantization tables, 4:4:4
  (color) or single-component (gray), optional restart intervals, and
  GENERATED canonical Huffman tables (fixed-length: 4-bit DC, 8-bit AC)
  declared in DHT. Generated tables trade compression for zero
  transcription risk — the decoder reads whatever DHT declares, so
  correctness never depends on hard-coded Annex-K code tables. A
  production encoder would emit the Annex-K tables for size. The
  progressive encoder emits a 10-scan script (DC first+refine, per-band
  AC first+refine per component) over the SAME quantized coefficients as
  the baseline encoder, so progressive-decode output must be bit-equal
  to baseline-decode output — the constructed-exact oracle for the
  refinement paths.

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

    def pad_align(self) -> None:
        """Byte-align with 1-bits (T.81 B.2.1) — before a restart marker."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)

    def raw(self, data: bytes) -> None:
        """Append marker bytes verbatim (no stuffing); must be aligned."""
        assert self.nbits == 0
        self.out += data

    def flush(self) -> bytes:
        self.pad_align()
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

    def restart(self) -> None:
        """Consume an RSTn marker at a restart boundary: discard the
        padding bits of the current byte, then the two marker bytes."""
        self.acc = 0
        self.nbits = 0
        p = self.pos
        while p + 1 < len(self.data) and self.data[p] == 0xFF and self.data[p + 1] == 0xFF:
            p += 1  # optional fill bytes
        if (
            p + 1 < len(self.data)
            and self.data[p] == 0xFF
            and 0xD0 <= self.data[p + 1] <= 0xD7
        ):
            self.pos = p + 2
        else:
            raise ValueError("expected restart marker")


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


def _ycbcr_to_rgb(y, cb, cr, prec: int = 8) -> np.ndarray:
    center = float(1 << (prec - 1))
    maxv = (1 << prec) - 1
    r = y + 1.402 * (cr - center)
    g = y - 0.344136 * (cb - center) - 0.714136 * (cr - center)
    b = y + 1.772 * (cb - center)
    out = np.clip(np.stack([r, g, b], axis=-1) + 0.5, 0, maxv)
    return out.astype(np.uint8 if prec == 8 else np.uint16)


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H8, W8) plane -> (H8/8 * W8/8, 8, 8) blocks, raster order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _quantized_zz(arr: np.ndarray, quality: int):
    """Shared front half of both encoders: → ``(zz_comps, qts, h, w)``
    where ``zz_comps[ci]`` is the (n_blocks, 64) int64 array of quantized
    coefficients in ZIGZAG order (4:4:4, raster block order). Baseline
    and progressive encode the SAME coefficients — which is what makes
    the cross-mode bit-equality test an exact oracle."""
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
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    zz_comps = []
    for ci, p in enumerate(planes):
        padded = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") - 128.0
        coeffs = np.einsum("ux,nxy,vy->nuv", _D, _blocks(padded), _D)
        q = qts[1 if ci else 0].reshape(8, 8)
        # baseline AC categories stop at size 10: clamp quantized coeffs
        # to ±1023 (only reachable at quality ≈ 100 on synthetic extremes)
        quant = np.clip(np.round(coeffs / q), -1023, 1023).astype(np.int64)
        zz_comps.append(quant.reshape(-1, 64)[:, ZIGZAG])
    return zz_comps, qts, h, w


def _emit_headers(
    ncomp: int, h: int, w: int, qts, sof_marker: int, restart_interval: int
) -> bytearray:
    """SOI/APP0/DQT/SOF/DHT[/DRI] — identical for both encoders except
    the SOF marker (0xFFC0 baseline, 0xFFC2 progressive)."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti in range(2 if ncomp == 3 else 1):
        zz = qts[ti][ZIGZAG].astype(np.uint8).tobytes()
        out += _seg(0xFFDB, bytes([ti]) + zz)
    comps = b"".join(bytes([ci + 1, 0x11, 1 if ci else 0]) for ci in range(ncomp))
    out += _seg(sof_marker, struct.pack(">BHHB", 8, h, w, ncomp) + comps)
    for tid in range(2 if ncomp == 3 else 1):
        for cls, bits, vals in (
            (0, _ENC_DC_BITS, _ENC_DC_VALS),
            (1, _ENC_AC_BITS, _ENC_AC_VALS),
        ):
            out += _seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    return out


def _sos(spec: list[tuple[int, int, int]], ss: int, se: int, ah: int, al: int) -> bytes:
    """SOS header: spec = [(comp_id, dc_table, ac_table), ...]."""
    body = bytes([len(spec)])
    for cid, td, ta in spec:
        body += bytes([cid, (td << 4) | ta])
    return _seg(0xFFDA, body + bytes([ss, se, (ah << 4) | al]))


class _RestartWriter:
    """Wraps a _BitWriter with the per-unit restart protocol: every
    ``interval`` data units, byte-align (1-padding), emit RST(n mod 8),
    and tell the caller to reset DC predictors / EOB state."""

    def __init__(self, bw: _BitWriter, interval: int):
        self.bw = bw
        self.interval = interval
        self.unit = 0
        self.n = 0

    def boundary(self) -> bool:
        """Call before each data unit; True = state was just reset."""
        if self.interval and self.unit and self.unit % self.interval == 0:
            self.bw.pad_align()
            self.bw.raw(bytes([0xFF, 0xD0 + (self.n % 8)]))
            self.n += 1
            self.unit += 1
            return True
        self.unit += 1
        return False


def _write_ac_band(bw, blk, ss: int, se: int, al: int, ac_codes) -> None:
    """AC first-scan band coding (Ah=0): baseline run/size with the
    point transform applied, per-block EOB (EOBRUN=1, zero extra bits)."""
    band = [int(blk[k]) for k in range(ss, se + 1)]
    shifted = [v // (1 << al) if v >= 0 else -((-v) >> al) for v in band]
    # -((-v) >> al) == truncation toward zero for negatives (T.81 G.1.2.2)
    nz = [i for i, v in enumerate(shifted) if v]
    last = nz[-1] + 1 if nz else 0
    run = 0
    for v in shifted[:last]:
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_codes[0xF0]
            bw.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        length, code = ac_codes[(run << 4) | size]
        bw.write(code, length)
        bw.write(bits, size)
        run = 0
    if last < len(shifted):
        length, code = ac_codes[0x00]  # EOB (run of 1)
        bw.write(code, length)


def _write_ac_refine(bw, blk, ss: int, se: int, al: int, ac_codes) -> None:
    """AC refinement coding (Ah=Al+1): newly nonzero coefficients are
    Huffman-coded with s=1 + sign bit; already-nonzero coefficients
    append buffered correction bits; per-block EOB flushes the rest —
    the exact inverse of the decoder's G.1.2.3 correction protocol."""
    absvals = []
    eobk = -1
    for i, k in enumerate(range(ss, se + 1)):
        t = abs(int(blk[k])) >> al
        absvals.append(t)
        if t == 1:
            eobk = i
    run = 0
    pending: list[int] = []
    for i, k in enumerate(range(ss, se + 1)):
        t = absvals[i]
        if t == 0:
            run += 1
            continue
        # the ZRL check runs at ANY nonzero coefficient (before the
        # history-bit branch): the decoder's 16-zero advance stops at the
        # 16th zero, so correction bits pended BEFORE those zeros must be
        # flushed with the ZRL, while this coefficient's own bit belongs
        # to the NEXT symbol (libjpeg encode_mcu_AC_refine ordering)
        while run > 15 and i <= eobk:
            length, code = ac_codes[0xF0]
            bw.write(code, length)
            run -= 16
            for b in pending:
                bw.write(b, 1)
            pending = []
        if t > 1:
            pending.append(t & 1)  # correction bit for a history coeff
            continue
        length, code = ac_codes[(run << 4) | 1]
        bw.write(code, length)
        bw.write(1 if int(blk[k]) >= 0 else 0, 1)
        for b in pending:
            bw.write(b, 1)
        pending = []
        run = 0
    if run > 0 or pending:
        length, code = ac_codes[0x00]  # EOB (run of 1)
        bw.write(code, length)
        for b in pending:
            bw.write(b, 1)


def encode_jpeg(arr: np.ndarray, quality: int = 85, restart_interval: int = 0) -> bytes:
    """Encode uint8 (H, W) grayscale or (H, W, 3) RGB to baseline JPEG
    (4:4:4, generated Huffman tables — see module docstring). A nonzero
    ``restart_interval`` emits DRI + RSTn markers every that many MCUs."""
    zz_comps, qts, h, w = _quantized_zz(arr, quality)
    ncomp = len(zz_comps)
    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)

    bw = _BitWriter()
    rst = _RestartWriter(bw, restart_interval)
    pred = [0] * ncomp
    n_blocks = zz_comps[0].shape[0]
    for bi in range(n_blocks):
        if rst.boundary():
            pred = [0] * ncomp
        for ci in range(ncomp):
            blk = zz_comps[ci][bi]
            diff = int(blk[0]) - pred[ci]
            pred[ci] = int(blk[0])
            size, bits = _magnitude(diff)
            length, code = dc_codes[size]
            bw.write(code, length)
            if size:
                bw.write(bits, size)
            _write_ac_band(bw, blk, 1, 63, 0, ac_codes)
    entropy = bw.flush()

    out = _emit_headers(ncomp, h, w, qts, 0xFFC0, restart_interval)
    out += _sos([(ci + 1, 1 if ci else 0, 1 if ci else 0) for ci in range(ncomp)], 0, 63, 0, 0)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 85, restart_interval: int = 0
) -> bytes:
    """Encode to PROGRESSIVE JPEG (SOF2) with a scan script that
    exercises every decode path: interleaved DC first scan at Al=1, DC
    refinement, then per-component AC band scans (1-5, 6-63) at Al=1
    followed by their refinement scans at Al=0. Quantized coefficients
    are shared with ``encode_jpeg``, so both decodes must be bit-equal."""
    zz_comps, qts, h, w = _quantized_zz(arr, quality)
    ncomp = len(zz_comps)
    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    n_blocks = zz_comps[0].shape[0]

    out = _emit_headers(ncomp, h, w, qts, 0xFFC2, restart_interval)

    # scan 1: DC first, all components interleaved, Ah=0, Al=1
    bw = _BitWriter()
    rst = _RestartWriter(bw, restart_interval)
    pred = [0] * ncomp
    for bi in range(n_blocks):
        if rst.boundary():
            pred = [0] * ncomp
        for ci in range(ncomp):
            v = int(zz_comps[ci][bi][0]) >> 1  # DC point transform: arith shift
            diff = v - pred[ci]
            pred[ci] = v
            size, bits = _magnitude(diff)
            length, code = dc_codes[size]
            bw.write(code, length)
            if size:
                bw.write(bits, size)
    out += _sos([(ci + 1, 1 if ci else 0, 0) for ci in range(ncomp)], 0, 0, 0, 1)
    out += bw.flush()

    # scan 2: DC refinement (raw bits, no Huffman), Ah=1, Al=0
    bw = _BitWriter()
    rst = _RestartWriter(bw, restart_interval)
    for bi in range(n_blocks):
        rst.boundary()
        for ci in range(ncomp):
            bw.write(int(zz_comps[ci][bi][0]) & 1, 1)
    out += _sos([(ci + 1, 0, 0) for ci in range(ncomp)], 0, 0, 1, 0)
    out += bw.flush()

    # AC scans: single-component by construction (T.81 G.1.1.1)
    for ci in range(ncomp):
        tid = 1 if ci else 0
        for ss, se in ((1, 5), (6, 63)):
            bw = _BitWriter()
            rst = _RestartWriter(bw, restart_interval)
            for bi in range(n_blocks):
                rst.boundary()
                _write_ac_band(bw, zz_comps[ci][bi], ss, se, 1, ac_codes)
            out += _sos([(ci + 1, 0, tid)], ss, se, 0, 1)
            out += bw.flush()
    for ci in range(ncomp):
        tid = 1 if ci else 0
        for ss, se in ((1, 5), (6, 63)):
            bw = _BitWriter()
            rst = _RestartWriter(bw, restart_interval)
            for bi in range(n_blocks):
                rst.boundary()
                _write_ac_refine(bw, zz_comps[ci][bi], ss, se, 0, ac_codes)
            out += _sos([(ci + 1, 0, tid)], ss, se, 1, 0)
            out += bw.flush()

    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _ac_first_scan(br, blk, act, ss, se, al, eobrun) -> int:
    """Progressive AC first scan (Ah=0), one block: T.81 G.1.2.2 —
    run/size coding with the point transform and EOB runs."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _read_symbol(br, act)
        r, s = rs >> 4, rs & 0x0F
        if s:
            k += r
            if k > se:
                raise ValueError("AC index overflow")
            blk[k] = _extend(br.read_bits(s), s) << al
            k += 1
        else:
            if r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += br.read_bits(r)
                return eobrun - 1
            k += 16  # ZRL
    return 0


def _ac_refine_scan(br, blk, act, ss, se, al, eobrun) -> int:
    """Progressive AC refinement (Ah=Al+1), one block: T.81 G.1.2.3 —
    newly nonzero coefficients arrive as s=1 Huffman symbols + sign bit;
    every already-nonzero coefficient in the path appends one correction
    bit (mirrors libjpeg's decode_mcu_AC_refine control flow)."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _read_symbol(br, act)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s:
                if s != 1:
                    raise ValueError("invalid refinement symbol")
                newval = p1 if br.read_bit() else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += br.read_bits(r)
                break  # EOB: fall through to the correction tail
            while k <= se:
                v = int(blk[k])
                if v:
                    if br.read_bit() and (v & p1) == 0:
                        blk[k] = v + (p1 if v >= 0 else m1)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if s and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            v = int(blk[k])
            if v and br.read_bit() and (v & p1) == 0:
                blk[k] = v + (p1 if v >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(frame, scan, coef) -> None:
    """Entropy-decode one scan into the per-component zigzag coefficient
    arrays. Handles interleaved (ns>1: MCU geometry) and non-interleaved
    (ns=1: the component's own block grid — T.81 A.2.2) layouts, restart
    intervals, and all four progressive scan kinds. Baseline is the
    degenerate single scan Ss=0..63, Ah=Al=0."""
    comps = {c["id"]: c for c in frame["comps"]}
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    br = _BitReader(scan["data"])
    htables = scan["htables"]
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    progressive = frame["progressive"]
    ri = scan["ri"]
    pred = {cid: 0 for cid, _, _ in scan["spec"]}
    eobrun = 0

    def tables(td, ta):
        dct = htables.get((0, td))
        act = htables.get((1, ta))
        return dct, act

    def decode_block(blk, cid, dct, act):
        nonlocal eobrun
        if not progressive:
            size = _read_symbol(br, dct)
            pred[cid] += _extend(br.read_bits(size), size)
            blk[0] = pred[cid]
            k = 1
            while k < 64:
                rs = _read_symbol(br, act)
                run, size = rs >> 4, rs & 0x0F
                if size == 0:
                    if run == 15:
                        k += 16  # ZRL
                        continue
                    break  # EOB
                k += run
                if k > 63:
                    raise ValueError("AC index overflow")
                blk[k] = _extend(br.read_bits(size), size)
                k += 1
        elif ss == 0:
            if ah == 0:  # DC first: arithmetic-shifted diffs
                size = _read_symbol(br, dct)
                pred[cid] += _extend(br.read_bits(size), size)
                blk[0] = pred[cid] << al
            else:  # DC refinement: one raw bit
                if br.read_bit():
                    blk[0] = int(blk[0]) | (1 << al)
        elif ah == 0:
            eobrun = _ac_first_scan(br, blk, act, ss, se, al, eobrun)
        else:
            eobrun = _ac_refine_scan(br, blk, act, ss, se, al, eobrun)

    def maybe_restart(unit):
        nonlocal eobrun
        if ri and unit and unit % ri == 0:
            br.restart()
            for cid in pred:
                pred[cid] = 0
            eobrun = 0

    if len(scan["spec"]) > 1:  # interleaved: MCU order
        mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
        mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
        unit = 0
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart(unit)
                unit += 1
                for cid, td, ta in scan["spec"]:
                    c = comps[cid]
                    dct, act = tables(td, ta)
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            decode_block(
                                coef[cid][my * c["v"] + by, mx * c["h"] + bx],
                                cid,
                                dct,
                                act,
                            )
    else:  # non-interleaved: the component's own block grid
        cid, td, ta = scan["spec"][0]
        c = comps[cid]
        dct, act = tables(td, ta)
        cw = (frame["w"] * c["h"] + hmax - 1) // hmax
        ch = (frame["h"] * c["v"] + vmax - 1) // vmax
        nbx = (cw + 7) // 8
        nby = (ch + 7) // 8
        unit = 0
        for byy in range(nby):
            for bxx in range(nbx):
                maybe_restart(unit)
                unit += 1
                decode_block(coef[cid][byy, bxx], cid, dct, act)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/1) or progressive (SOF2) JPEG — restart
    intervals included — to uint8 (H, W) or (H, W, 3)."""
    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    scans: list[dict] = []
    ri = 0
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
                if pq == 0:  # 8-bit entries
                    zz = np.frombuffer(seg, np.uint8, 64, sp + 1).astype(np.float64)
                    sp += 65
                elif pq == 1:  # 16-bit big-endian entries (T.81 B.2.4.1)
                    zz = (
                        np.frombuffer(seg, ">u2", 64, sp + 1).astype(np.float64)
                    )
                    sp += 129
                else:
                    raise ValueError(f"DQT precision Pq={pq} out of range")
                nat = np.empty(64)
                nat[ZIGZAG] = zz
                qtables[tq] = nat
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
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0/1/2 DCT, SOF3 lossless
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if marker == 0xC0 and prec != 8:
                raise ValueError("baseline SOF0 is 8-bit by definition")
            if marker in (0xC1, 0xC2) and prec not in (8, 12):
                raise ValueError(f"DCT precision {prec} (T.81 allows 8 or 12)")
            if marker == 0xC3 and prec not in range(2, 17):
                raise ValueError("lossless precision out of range 2-16")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {
                "h": fh,
                "w": fw,
                "prec": prec,
                "comps": comps,
                "progressive": marker == 0xC2,
                "lossless": marker == 0xC3,
            }
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only Huffman DCT (SOF0/1/2) and lossless (SOF3) frames; "
                "arithmetic coding and hierarchical frames unsupported"
            )
        elif marker == 0xDD:  # DRI — applies to following scans
            (ri,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            spec = []
            for ci in range(ns):
                cid, tt = seg[1 + 2 * ci : 3 + 2 * ci]
                spec.append((cid, tt >> 4, tt & 0x0F))
            sss, sse, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            start = pos + seglen
            p = start
            n = len(data)
            while p < n:  # entropy data ends at the first non-RST marker
                if (
                    data[p] == 0xFF
                    and p + 1 < n
                    and data[p + 1] != 0x00
                    and not (0xD0 <= data[p + 1] <= 0xD7)
                ):
                    break
                p += 1
            scans.append(
                {
                    "spec": spec,
                    "ss": sss,
                    "se": sse,
                    "ah": ahal >> 4,
                    "al": ahal & 0x0F,
                    "data": data[start:p],
                    "htables": dict(htables),
                    "ri": ri,
                }
            )
            pos = p
            continue
        pos += seglen
    if frame is None or not scans:
        raise ValueError("no SOF/SOS found")
    if frame.get("lossless"):
        return _decode_lossless(frame, scans)

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    # per-component quantized coefficients in zigzag order, accumulated
    # across scans (progressive refinement is bitwise on these ints)
    coef = {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in comps
    }
    for scan in scans:
        _decode_scan(frame, scan, coef)

    h, w = frame["h"], frame["w"]
    full = {}
    for c in comps:
        q = qtables[c["tq"]]
        zz = coef[c["id"]].astype(np.float64)
        nby, nbx = zz.shape[:2]
        nat = np.zeros_like(zz)
        nat[..., ZIGZAG] = zz
        blocks = (nat * q).reshape(nby, nbx, 8, 8)
        # batched orthonormal IDCT: D.T @ B @ D for every block at once
        # (level shift and clip range follow the frame precision — 12-bit
        # extended/progressive frames decode since round 11)
        prec = frame["prec"]
        out = np.einsum("ux,ghuv,vy->ghxy", _D, blocks, _D) + float(1 << (prec - 1))
        plane = out.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        full[c["id"]] = plane[:h, :w]
    prec = frame["prec"]
    maxv = (1 << prec) - 1
    dtype = np.uint8 if prec == 8 else np.uint16
    if len(comps) == 1:
        only = full[comps[0]["id"]]
        return np.clip(only + 0.5, 0, maxv).astype(dtype)
    ids = [c["id"] for c in comps]
    return _ycbcr_to_rgb(full[ids[0]], full[ids[1]], full[ids[2]], prec=prec)


# ---------------------------------------------------------------------------
# Lossless JPEG (T.81 Annex H, SOF3) — round 11
# ---------------------------------------------------------------------------

#: encoder-side generated table for the lossless difference categories
#: 0..16 — seventeen symbols at a fixed 5 bits (17 <= 32 code space),
#: declared in DHT like the DCT encoders' generated tables
_ENC_LL_VALS = list(range(17))
_ENC_LL_BITS = [0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]


def _ll_predict(plane, x: int, y: int, sel: int, default: int) -> int:
    """T.81 H.1.2.1 prediction: the very first sample (and conceptually
    each restart) predicts 2^(P-Pt-1); the rest of the first line uses
    Ra (left); the first sample of later lines uses Rb (above); all
    other positions use the scan's selected predictor 1-7."""
    if y == 0:
        return int(plane[0, x - 1]) if x > 0 else default
    if x == 0:
        return int(plane[y - 1, 0])
    a = int(plane[y, x - 1])
    b = int(plane[y - 1, x])
    c = int(plane[y - 1, x - 1])
    if sel == 1:
        return a
    if sel == 2:
        return b
    if sel == 3:
        return c
    if sel == 4:
        return a + b - c
    if sel == 5:
        return a + ((b - c) >> 1)
    if sel == 6:
        return b + ((a - c) >> 1)
    if sel == 7:
        return (a + b) >> 1
    raise ValueError(f"lossless predictor selector {sel} out of range 1-7")


def encode_jpeg_lossless(
    arr: np.ndarray,
    predictor: int = 7,
    point_transform: int = 0,
    restart_rows: int = 0,
) -> bytes:
    """Encode to LOSSLESS JPEG (T.81 Annex H, SOF3): predictive coding
    of the raw samples — no DCT, no quantization — with the Huffman
    difference-category machinery the DCT encoders already use. uint8
    (H, W) -> 8-bit grayscale; (H, W, 3) -> three interleaved components
    (carried as-is: lossless JPEG does not mandate a color transform);
    uint16 (H, W) -> 16-bit precision. ``predictor`` selects H.1
    formula 1-7 for the interior; ``point_transform`` (Pt) right-shifts
    samples before coding (the decoder re-scales by 2^Pt — the ONLY
    lossy knob, off by default). Decoding the result reproduces the
    input bit-exactly at Pt=0; differences are coded modulo 2^16 with
    the SSSS=16 no-extra-bits special case.

    ``restart_rows`` > 0 (round 11) emits DRI + RSTn every that many
    SAMPLE ROWS (Ri = restart_rows * width MCUs — the row-aligned shape
    encoders emit for error resilience): each restart segment is coded
    as a fresh scan start (T.81 H.2.2 forbids predicting from
    pre-restart samples), so its first row uses the first-line rules."""
    arr = np.asarray(arr)
    if arr.dtype == np.uint16:
        prec = 16
        if arr.ndim != 2:
            raise ValueError("16-bit lossless encode takes 2-D arrays")
    elif arr.dtype == np.uint8:
        prec = 8
    else:
        raise ValueError("lossless encode takes uint8 or uint16 arrays")
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1-7")
    if not 0 <= point_transform < prec:
        raise ValueError("point transform out of range")
    planes = (
        [arr.astype(np.int64) >> point_transform]
        if arr.ndim == 2
        else [arr[:, :, i].astype(np.int64) >> point_transform for i in range(3)]
    )
    h, w = arr.shape[:2]
    ncomp = len(planes)
    codes = _canonical_codes(_ENC_LL_BITS, _ENC_LL_VALS)
    default = 1 << (prec - point_transform - 1)
    if restart_rows < 0 or restart_rows > h:
        raise ValueError("restart_rows out of range")
    if restart_rows and restart_rows * w > 0xFFFF:
        raise ValueError(
            f"restart interval {restart_rows * w} MCUs exceeds the 16-bit DRI field"
        )
    seg_rows = restart_rows or h

    def _encode_segment(views) -> bytes:
        bw = _BitWriter()
        sh = views[0].shape[0]
        for y in range(sh):
            for x in range(w):
                for view in views:
                    px = _ll_predict(view, x, y, predictor, default)
                    d = (int(view[y, x]) - px) & 0xFFFF
                    if d == 32768:  # T.81 H.1.2.2: SSSS=16, no appended bits
                        length, code = codes[16]
                        bw.write(code, length)
                        continue
                    d = d - 65536 if d >= 32768 else d
                    size, bits = _magnitude(d)
                    length, code = codes[size]
                    bw.write(code, length)
                    if size:
                        bw.write(bits, size)
        return bw.flush()

    segments = [
        _encode_segment([p[y0 : y0 + seg_rows] for p in planes])
        for y0 in range(0, h, seg_rows)
    ]
    entropy = bytearray(segments[0])
    for i, seg_bytes in enumerate(segments[1:]):
        entropy += bytes([0xFF, 0xD0 + (i % 8)])
        entropy += seg_bytes
    entropy = bytes(entropy)

    out = bytearray(b"\xff\xd8")  # SOI (no DQT/APP0 — nothing to quantize)
    sof = struct.pack(">BHHB", prec, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])  # h=v=1; Tq unused in lossless
    out += _seg(0xFFC3, sof)
    dht = bytes([0x00]) + bytes(_ENC_LL_BITS) + bytes(_ENC_LL_VALS)
    out += _seg(0xFFC4, dht)
    if restart_rows:
        out += _seg(0xFFDD, struct.pack(">H", restart_rows * w))
    out += _sos(
        [(ci + 1, 0, 0) for ci in range(ncomp)], predictor, 0, 0, point_transform
    )
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def _decode_lossless(frame: dict, scans: list) -> np.ndarray:
    """Scan decoder for SOF3 frames: raster order, one sample per
    component per MCU (all sampling factors 1), differences EXTENDed
    from their category and accumulated modulo 2^16 onto the H.1
    prediction. Returns uint8 for 8-bit precision, uint16 above."""
    comps = frame["comps"]
    if any(c["h"] != 1 or c["v"] != 1 for c in comps):
        raise NotImplementedError("lossless JPEG with subsampling")
    h, w, prec = frame["h"], frame["w"], frame["prec"]
    planes = {c["id"]: np.zeros((h, w), dtype=np.int64) for c in comps}
    for scan in scans:
        ri = scan.get("ri") or 0
        if ri % w:
            # mid-row restarts would predict across the forbidden
            # boundary; encoders emit row-aligned intervals
            raise NotImplementedError("lossless restart interval not row-aligned")
        seg_rows = (ri // w) if ri else h
        sel = scan["ss"]
        pt = scan["al"]
        default = 1 << (prec - pt - 1)
        tables = {
            cid: scan["htables"][(0, td)] for cid, td, _ in scan["spec"]
        }
        br = _BitReader(scan["data"])
        order = [cid for cid, _, _ in scan["spec"]]
        seg_start = 0
        for y in range(h):
            if y - seg_start == seg_rows:
                # restart boundary: re-sync the reader, and code the
                # segment as a fresh scan (T.81 H.2.2 — pre-restart
                # samples must not feed the prediction)
                br.restart()
                seg_start = y
            for x in range(w):
                for cid in order:
                    s = _read_symbol(br, tables[cid])
                    if s == 16:
                        d = 32768
                    elif s:
                        d = _extend(br.read_bits(s), s)
                    else:
                        d = 0
                    plane = planes[cid]
                    view = plane[seg_start:]
                    px = _ll_predict(view, x, y - seg_start, sel, default)
                    plane[y, x] = (px + d) & 0xFFFF
        if pt:
            for cid in order:
                planes[cid] <<= pt  # inverse point transform
    dtype = np.uint8 if prec == 8 else np.uint16
    maxv = (1 << prec) - 1
    outs = [np.clip(planes[c["id"]], 0, maxv).astype(dtype) for c in comps]
    return outs[0] if len(outs) == 1 else np.stack(outs, axis=-1)
