"""Pure-Python/numpy WebP **VP8L (lossless)** codec — the last thumbnail
format a real yark archive contains whose pixels we could not decode
(reference: ``cmds/archive.py:88-91`` stores whatever thumbnail format
YouTube serves, which today is WebP; VERDICT r9 next-round #3).

Like ``operators/jpeg``, this exists so the Spark-side multimodal
pipeline (decode → feature-extract over ``mapInPandas``) has a REAL,
deterministic codec for its binary columns without an image library in
the container: the encoder builds conformant VP8L bitstreams for test
payloads, the decoder implements the published "WebP Lossless Bitstream
Specification" — prefix-coded ARGB with LZ77 backward references, color
cache, meta prefix (entropy image), and all four transforms (predictor,
color, subtract-green, color-indexing incl. pixel bundling).

Scope / documented boundaries:

* Lossy **VP8** frames raise ``NotImplementedError`` (a DCT video codec
  is out of scope — the VP8X/ALPH path likewise). Header dims for those
  still come from ``multimodal.extract_image_dims``.
* The close-neighborhood distance table (plane codes 1..120) is
  GENERATED from the spec's ordering rule (all (dx, dy) with
  dy ∈ 0..7, dx ∈ −7..8 minus the non-causal dy=0, dx≤0 half-row;
  sorted by dx²+dy², ties by larger dy first, +dx before −dx) rather
  than transcribed — the rule was verified against the spec's table for
  the first ~25 distance classes.
* Prefix codes built here are canonical and length-limited to 15 (7 for
  the code-length code); a pathological histogram that needs limiting
  may produce a slightly over-complete... sub-optimal (never invalid)
  code.

Decoder conventions follow the spec's reference decoder: LSB-first bit
reader, prefix codes read most-significant code bit first (the DEFLATE
packing), canonical code assignment over (length, symbol), single-symbol
codes consume zero bits.
"""

from __future__ import annotations

import struct
from collections import Counter

import numpy as np

# ---------------------------------------------------------------------------
# bit IO
# ---------------------------------------------------------------------------


class _BitWriter:
    """LSB-first bit packer (``write``); prefix codes go MSB-first via
    ``write_code`` (the DEFLATE convention VP8L shares)."""

    def __init__(self) -> None:
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


class _BitReader:
    """LSB-first bit reader; reading past the end yields zero bits (the
    flush padding), which a well-formed stream never consumes as data."""

    def __init__(self, data: bytes) -> None:
        self.d = data
        self.pos = 0
        self.bit = 0

    def read(self, nbits: int) -> int:
        v = 0
        for i in range(nbits):
            byte = self.d[self.pos] if self.pos < len(self.d) else 0
            v |= ((byte >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """sym -> (code, length); canonical assignment over (length, symbol)."""
    pairs = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    out: dict[int, tuple[int, int]] = {}
    code = 0
    prev = 0
    for l, s in pairs:
        code <<= l - prev
        out[s] = (code, l)
        code += 1
        prev = l
    return out


class _PrefixCode:
    """Decoder side: bit-by-bit walk of a canonical code. A code with a
    single symbol consumes ZERO bits per read (spec behavior)."""

    def __init__(self, lengths: list[int]) -> None:
        used = [s for s, l in enumerate(lengths) if l > 0]
        if not used:
            raise ValueError("prefix code with no symbols")
        if len(used) == 1:
            self.single: int | None = used[0]
            self.map: dict[tuple[int, int], int] = {}
            self.maxlen = 0
        else:
            self.single = None
            codes = _canonical_codes(lengths)
            self.map = {(l, c): s for s, (c, l) in codes.items()}
            self.maxlen = max(l for _, l in codes.values())

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        ln = 0
        while ln < self.maxlen:
            code = (code << 1) | br.read(1)
            ln += 1
            sym = self.map.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code in stream")


class _EncCode:
    """Encoder side: sym -> emit; single-symbol codes emit nothing."""

    def __init__(self, lengths: list[int]) -> None:
        used = [s for s, l in enumerate(lengths) if l > 0]
        self.single = used[0] if len(used) == 1 else None
        self.codes = {} if self.single is not None else _canonical_codes(lengths)

    def emit(self, bw: _BitWriter, sym: int) -> None:
        if self.single is not None:
            if sym != self.single:
                raise ValueError("symbol outside single-entry code")
            return
        code, ln = self.codes[sym]
        bw.write_code(code, ln)


def _huffman_lengths(freqs: dict[int, int], alphabet: int, maxlen: int = 15) -> list[int]:
    """Huffman code lengths, limited to ``maxlen`` (clamp + Kraft repair)."""
    import heapq

    items = sorted((f, s) for s, f in freqs.items() if f > 0)
    lengths = [0] * alphabet
    if not items:
        return lengths
    if len(items) == 1:
        lengths[items[0][1]] = 1
        return lengths
    cnt = 0
    heap: list = []
    for f, s in items:
        heap.append((f, cnt, ("leaf", s)))
        cnt += 1
    heapq.heapify(heap)
    while len(heap) > 1:
        f1, _, n1 = heapq.heappop(heap)
        f2, _, n2 = heapq.heappop(heap)
        heapq.heappush(heap, (f1 + f2, cnt, ("node", n1, n2)))
        cnt += 1
    stack = [(heap[0][2], 0)]
    while stack:
        node, d = stack.pop()
        if node[0] == "leaf":
            lengths[node[1]] = max(1, d)
        else:
            stack.append((node[1], d + 1))
            stack.append((node[2], d + 1))
    if max(lengths) > maxlen:
        for s, l in enumerate(lengths):
            if l > maxlen:
                lengths[s] = maxlen
        kraft = sum(1 << (maxlen - l) for l in lengths if l > 0)
        while kraft > (1 << maxlen):
            l, s = max((l, s) for s, l in enumerate(lengths) if 0 < l < maxlen)
            lengths[s] = l + 1
            kraft -= 1 << (maxlen - l - 1)
    return lengths


# ---------------------------------------------------------------------------
# code-length code (the 19-symbol alphabet that compresses code lengths)
# ---------------------------------------------------------------------------

_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _rle_code_lengths(lengths: list[int]) -> list[tuple[int, int, int]]:
    """(symbol, extra_bits, extra_value) stream: literals 0-15, 16 =
    repeat previous non-zero 3-6, 17 = 3-10 zeros, 18 = 11-138 zeros."""
    out: list[tuple[int, int, int]] = []
    i = 0
    n = len(lengths)
    while i < n:
        l = lengths[i]
        if l == 0:
            j = i
            while j < n and lengths[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                r = min(run, 138)
                out.append((18, 7, r - 11))
                run -= r
            while run >= 3:
                r = min(run, 10)
                out.append((17, 3, r - 3))
                run -= r
            out.extend((0, 0, 0) for _ in range(run))
            i = j
        else:
            out.append((l, 0, 0))
            j = i + 1
            while j < n and lengths[j] == l:
                j += 1
            run = j - i - 1
            while run >= 3:
                r = min(run, 6)
                out.append((16, 2, r - 3))
                run -= r
            out.extend((l, 0, 0) for _ in range(run))
            i = j
    return out


def _write_code_lengths(bw: _BitWriter, lengths: list[int]) -> None:
    toks = _rle_code_lengths(lengths)
    clfreq = Counter(sym for sym, _, _ in toks)
    cl_lengths = _huffman_lengths(dict(clfreq), 19, maxlen=7)
    num_cl = 4
    for i, s in enumerate(_CL_ORDER):
        if cl_lengths[s] > 0:
            num_cl = max(num_cl, i + 1)
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    bw.write(0, 1)  # no explicit max_symbol
    enc = _EncCode(cl_lengths)
    for sym, eb, ev in toks:
        enc.emit(bw, sym)
        bw.write(ev, eb)


def _read_code_lengths(br: _BitReader, alphabet: int) -> list[int]:
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl = _PrefixCode(cl_lengths)
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    sym = 0
    prev = 8
    while sym < alphabet and max_symbol > 0:
        max_symbol -= 1
        c = cl.read(br)
        if c < 16:
            lengths[sym] = c
            sym += 1
            if c:
                prev = c
        elif c == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if sym < alphabet:
                    lengths[sym] = prev
                    sym += 1
        elif c == 17:
            sym += 3 + br.read(3)
        else:
            sym += 11 + br.read(7)
    return lengths


def _read_prefix_code(br: _BitReader, alphabet: int) -> _PrefixCode:
    if br.read(1):  # simple code: 1 or 2 symbols stored directly
        n = br.read(1) + 1
        if br.read(1):
            s0 = br.read(8)
        else:
            s0 = br.read(1)
        syms = [s0]
        if n == 2:
            syms.append(br.read(8))
        lengths = [0] * alphabet
        if n == 1:
            lengths[s0] = 1  # _PrefixCode treats single symbol as 0-bit
        else:
            lengths[syms[0]] = 1
            lengths[syms[1]] = 1
        return _PrefixCode(lengths)
    return _PrefixCode(_read_code_lengths(br, alphabet))


def _write_prefix_code(bw: _BitWriter, freqs: dict[int, int], alphabet: int) -> _EncCode:
    used = sorted(s for s, f in freqs.items() if f > 0)
    if not used:
        used = [0]
        freqs = {0: 1}
    if len(used) <= 2 and max(used) <= 255:
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        s0 = used[0]
        if s0 > 1:
            bw.write(1, 1)
            bw.write(s0, 8)
        else:
            bw.write(0, 1)
            bw.write(s0, 1)
        if len(used) == 2:
            bw.write(used[1], 8)
        lengths = [0] * alphabet
        if len(used) == 1:
            lengths[s0] = 1
        else:
            lengths[used[0]] = 1
            lengths[used[1]] = 1
        return _EncCode(lengths)
    bw.write(0, 1)
    lengths = _huffman_lengths(freqs, alphabet, maxlen=15)
    _write_code_lengths(bw, lengths)
    return _EncCode(lengths)


# ---------------------------------------------------------------------------
# LZ77 prefix values and the close-neighborhood distance map
# ---------------------------------------------------------------------------


def _lz77_read(code: int, br: _BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _lz77_sym(v: int) -> tuple[int, int, int]:
    """value -> (prefix symbol, extra bits, extra value); inverse of
    ``_lz77_read``."""
    if v <= 4:
        return v - 1, 0, 0
    for code in range(4, 40):
        extra = (code - 2) >> 1
        offset = (2 + (code & 1)) << extra
        if offset + 1 <= v <= offset + (1 << extra):
            return code, extra, v - 1 - offset
    raise ValueError(f"value {v} out of LZ77 prefix range")


def _make_plane_table() -> list[tuple[int, int]]:
    """The 120 close-neighborhood (dx, dy) offsets for distance codes
    1..120, generated from the spec's ordering (module docstring)."""
    pairs = [
        (dx, dy)
        for dy in range(8)
        for dx in range(-7, 9)
        if not (dy == 0 and dx <= 0)
    ]
    pairs.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], abs(p[0]), 0 if p[0] > 0 else 1))
    return pairs


_PLANE = _make_plane_table()


def _plane_to_dist(dist_code: int, xsize: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    dx, dy = _PLANE[dist_code - 1]
    return max(1, dy * xsize + dx)


# ---------------------------------------------------------------------------
# ARGB pixel helpers (pixels are python ints 0xAARRGGBB)
# ---------------------------------------------------------------------------


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 255) + ((b >> 24) & 255)) >> 1) << 24
        | ((((a >> 16) & 255) + ((b >> 16) & 255)) >> 1) << 16
        | ((((a >> 8) & 255) + ((b >> 8) & 255)) >> 1) << 8
        | ((((a) & 255) + ((b) & 255)) >> 1)
    )


def _add_px(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 255) + ((b >> 24) & 255)) & 255) << 24
        | ((((a >> 16) & 255) + ((b >> 16) & 255)) & 255) << 16
        | ((((a >> 8) & 255) + ((b >> 8) & 255)) & 255) << 8
        | ((((a) & 255) + ((b) & 255)) & 255)
    )


def _sub_px(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 255) - ((b >> 24) & 255)) & 255) << 24
        | ((((a >> 16) & 255) - ((b >> 16) & 255)) & 255) << 16
        | ((((a >> 8) & 255) - ((b >> 8) & 255)) & 255) << 8
        | ((((a) & 255) - ((b) & 255)) & 255)
    )


def _clamp255(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _predict(mode: int, L: int, T: int, TL: int, TR: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:  # Select: whichever of T/L is closer to the gradient
        pa = 0
        pb = 0
        for sh in (24, 16, 8, 0):
            lc = (L >> sh) & 255
            tc = (T >> sh) & 255
            tlc = (TL >> sh) & 255
            p = lc + tc - tlc
            pa += abs(p - tc)
            pb += abs(p - lc)
        return T if pa <= pb else L
    if mode == 12:  # ClampAddSubtractFull
        out = 0
        for sh in (24, 16, 8, 0):
            out |= _clamp255(((L >> sh) & 255) + ((T >> sh) & 255) - ((TL >> sh) & 255)) << sh
        return out
    if mode == 13:  # ClampAddSubtractHalf
        ave = _avg2(L, T)
        out = 0
        for sh in (24, 16, 8, 0):
            a = (ave >> sh) & 255
            b = (TL >> sh) & 255
            out |= _clamp255(a + int((a - b) / 2)) << sh  # C trunc division
        return out
    raise ValueError(f"predictor mode {mode} out of range")


def _i8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    return (_i8(t) * _i8(c)) >> 5  # arithmetic shift of the signed product


def _ceil_div(a: int, b: int) -> int:
    return (a + b - 1) // b


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _decode_pixels(br: _BitReader, xsize: int, ysize: int, level0: bool) -> list[int]:
    npix = xsize * ysize
    cache_bits = br.read(4) if br.read(1) else 0
    cache = [0] * (1 << cache_bits) if cache_bits else None
    meta = None
    pb = 0
    mw = 0
    n_groups = 1
    if level0 and br.read(1):  # meta prefix (entropy image)
        pb = br.read(3) + 2
        mw = _ceil_div(xsize, 1 << pb)
        mh = _ceil_div(ysize, 1 << pb)
        mimg = _decode_image_stream(br, mw, mh, level0=False)
        meta = [((p >> 8) & 0xFFFF) for p in mimg]  # (red << 8) | green
        n_groups = max(meta) + 1
    cache_extra = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(n_groups):
        green = _read_prefix_code(br, 256 + 24 + cache_extra)
        red = _read_prefix_code(br, 256)
        blue = _read_prefix_code(br, 256)
        alpha = _read_prefix_code(br, 256)
        dist = _read_prefix_code(br, 40)
        groups.append((green, red, blue, alpha, dist))
    out = [0] * npix
    pos = 0
    shift = 32 - cache_bits if cache_bits else 0
    while pos < npix:
        if meta is not None:
            x = pos % xsize
            y = pos // xsize
            green, red, blue, alpha, dist = groups[meta[(y >> pb) * mw + (x >> pb)]]
        else:
            green, red, blue, alpha, dist = groups[0]
        s = green.read(br)
        if s < 256:  # literal
            r = red.read(br)
            b = blue.read(br)
            a = alpha.read(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> shift] = px
        elif s < 280:  # LZ77 backward reference
            length = _lz77_read(s - 256, br)
            dcode = _lz77_read(dist.read(br), br)
            d = _plane_to_dist(dcode, xsize)
            if d > pos:
                raise ValueError("backward reference before image start")
            for _ in range(length):
                if pos >= npix:
                    raise ValueError("backward reference past image end")
                px = out[pos - d]
                out[pos] = px
                pos += 1
                if cache is not None:
                    cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> shift] = px
        else:  # color cache hit
            if cache is None:
                raise ValueError("cache symbol without color cache")
            out[pos] = cache[s - 280]
            pos += 1
    return out


def _decode_image_stream(br: _BitReader, xsize: int, ysize: int, level0: bool) -> list[int]:
    transforms: list[tuple] = []
    cur_x = xsize
    if level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("duplicate transform")
            seen.add(ttype)
            if ttype == 2:  # subtract green
                transforms.append(("subgreen",))
            elif ttype in (0, 1):  # predictor / color transform
                sb = br.read(3) + 2
                tw = _ceil_div(cur_x, 1 << sb)
                th = _ceil_div(ysize, 1 << sb)
                sub = _decode_image_stream(br, tw, th, level0=False)
                transforms.append(("pred" if ttype == 0 else "color", sb, tw, sub))
            else:  # color indexing
                n = br.read(8) + 1
                raw = _decode_image_stream(br, n, 1, level0=False)
                palette = []
                prev = 0
                for p in raw:  # entries are stored as component deltas
                    prev = _add_px(prev, p)
                    palette.append(prev)
                xbits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
                transforms.append(("palette", palette, xbits, cur_x))
                if xbits:
                    cur_x = _ceil_div(cur_x, 1 << xbits)
    px = _decode_pixels(br, cur_x, ysize, level0)
    for t in reversed(transforms):
        if t[0] == "subgreen":
            px = [
                (p & 0xFF000000)
                | ((((p >> 16) & 255) + ((p >> 8) & 255)) & 255) << 16
                | (p & 0xFF00)
                | (((p & 255) + ((p >> 8) & 255)) & 255)
                for p in px
            ]
        elif t[0] == "pred":
            _, sb, tw, sub = t
            px = _inverse_predictor(px, cur_x, ysize, sb, tw, sub)
        elif t[0] == "color":
            _, sb, tw, sub = t
            px = _inverse_color(px, cur_x, ysize, sb, tw, sub)
        else:  # palette
            _, palette, xbits, orig_x = t
            px = _inverse_palette(px, cur_x, ysize, palette, xbits, orig_x)
            cur_x = orig_x
    return px


def _inverse_predictor(px, w, h, sb, tw, sub):
    out = list(px)
    for i in range(w * h):
        x = i % w
        y = i // w
        if x == 0 and y == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = out[i - 1]
        elif x == 0:
            pred = out[i - w]
        else:
            mode = (sub[(y >> sb) * tw + (x >> sb)] >> 8) & 0xFF
            # flat-index neighbors, matching the reference decoder: the
            # top-right of the last column wraps to the current row's
            # first pixel (already reconstructed)
            pred = _predict(mode, out[i - 1], out[i - w], out[i - w - 1], out[i - w + 1])
        out[i] = _add_px(out[i], pred)
    return out


def _inverse_color(px, w, h, sb, tw, sub):
    out = list(px)
    for i in range(w * h):
        x = i % w
        y = i // w
        cte = sub[(y >> sb) * tw + (x >> sb)]
        g2r = cte & 0xFF  # blue byte
        g2b = (cte >> 8) & 0xFF  # green byte
        r2b = (cte >> 16) & 0xFF  # red byte
        p = out[i]
        g = (p >> 8) & 255
        r = ((p >> 16) & 255) + _ct_delta(g2r, g)
        r &= 255
        b = (p & 255) + _ct_delta(g2b, g)
        b = (b + _ct_delta(r2b, r)) & 255
        out[i] = (p & 0xFF000000) | (r << 16) | (p & 0xFF00) | b
    return out


def _inverse_palette(px, packed_w, h, palette, xbits, orig_w):
    n = len(palette)
    if xbits == 0:
        out = []
        for p in px:
            idx = (p >> 8) & 255
            if idx >= n:
                raise ValueError("palette index out of range")
            out.append(palette[idx])
        return out
    bit_depth = 8 >> xbits
    per = 1 << xbits
    mask = (1 << bit_depth) - 1
    out = []
    for y in range(h):
        cnt = 0
        for p in px[y * packed_w : (y + 1) * packed_w]:
            g = (p >> 8) & 255
            for k in range(per):
                if cnt >= orig_w:
                    break
                idx = (g >> (k * bit_depth)) & mask
                if idx >= n:
                    raise ValueError("palette index out of range")
                out.append(palette[idx])
                cnt += 1
    return out


def decode_vp8l(data: bytes) -> np.ndarray:
    """Decode a raw VP8L chunk payload to an (h, w, 4) uint8 RGBA array."""
    if not data or data[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _BitReader(data)
    br.read(8)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    px = _decode_image_stream(br, w, h, level0=True)
    arr = np.array(px, dtype=np.uint32).reshape(h, w)
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[..., 0] = (arr >> 16) & 255  # R
    out[..., 1] = (arr >> 8) & 255  # G
    out[..., 2] = arr & 255  # B
    out[..., 3] = (arr >> 24) & 255  # A
    return out


def decode_webp(payload: bytes) -> np.ndarray:
    """Decode a WebP container: lossless (VP8L) frames fully; lossy VP8
    (a DCT video intra-frame) stays a documented NotImplementedError
    boundary, like arithmetic-coded JPEG in ``operators/jpeg``."""
    payload = bytes(payload)
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    off = 12
    while off + 8 <= len(payload):
        tag = payload[off : off + 4]
        (sz,) = struct.unpack("<I", payload[off + 4 : off + 8])
        body = payload[off + 8 : off + 8 + sz]
        if tag == b"VP8L":
            return decode_vp8l(body)
        if tag == b"VP8 ":
            raise NotImplementedError("lossy VP8 decode not supported (DCT codec)")
        off += 8 + sz + (sz & 1)
    raise ValueError("no VP8L chunk in WebP container")


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _tokenize(px: list[int], use_lz77: bool) -> list[tuple]:
    toks: list[tuple] = []
    i = 0
    n = len(px)
    while i < n:
        if use_lz77 and i > 0:
            j = i
            prev = px[i - 1]
            while j < n and px[j] == prev and j - i < 4096:
                j += 1
            if j - i >= 4:
                toks.append(("copy", j - i))
                i = j
                continue
        toks.append(("lit", px[i]))
        i += 1
    return toks


def _encode_pixels(
    bw: _BitWriter,
    px: list[int],
    level0: bool,
    use_lz77: bool,
    use_plane_codes: bool,
    xsize: int = 0,
    cache_bits: int = 0,
    meta_bits: int = 0,
) -> None:
    """Emit one entropy-coded pixel stream. ``cache_bits`` > 0 enables
    the color cache (cache-hit symbols replace repeat literals);
    ``meta_bits`` > 0 (level 0 only) splits the image into vertical
    stripe groups of ``1 << meta_bits`` columns, each with its own five
    prefix codes behind an entropy (meta prefix) image — both exist to
    exercise the decoder paths real encoders use."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    n_groups = 1
    group_of_pos = None
    if level0:
        if meta_bits:
            bw.write(1, 1)
            bw.write(meta_bits - 2, 3)
            mw = _ceil_div(xsize, 1 << meta_bits)
            mh = _ceil_div(len(px) // xsize, 1 << meta_bits)
            n_groups = mw  # one group per stripe of meta columns
            meta_img = [0xFF000000 | (mx << 8) for _ in range(mh) for mx in range(mw)]
            _encode_pixels_sub(bw, meta_img)

            def group_of_pos(pos):  # noqa: E306 — token-start group rule
                return (pos % xsize) >> meta_bits

        else:
            bw.write(0, 1)
    toks = _tokenize_cached(px, use_lz77, cache_bits)
    # distance 1 (repeat previous pixel) as plane code 2 = offset (1, 0),
    # or as the plain form 1 + 120
    dist_code = 2 if use_plane_codes else 121
    dsym, dex, dval = _lz77_sym(dist_code)
    cache_extra = (1 << cache_bits) if cache_bits else 0
    hists = [
        (Counter(), Counter(), Counter(), Counter(), Counter())
        for _ in range(n_groups)
    ]
    for pos, t in toks:
        gh, rh, bh, ah, dh = hists[group_of_pos(pos) if group_of_pos else 0]
        if t[0] == "lit":
            p = t[1]
            gh[(p >> 8) & 255] += 1
            rh[(p >> 16) & 255] += 1
            bh[p & 255] += 1
            ah[(p >> 24) & 255] += 1
        elif t[0] == "copy":
            lsym, _, _ = _lz77_sym(t[1])
            gh[256 + lsym] += 1
            dh[dsym] += 1
        else:  # cache hit
            gh[256 + 24 + t[1]] += 1
    groups = []
    for gh, rh, bh, ah, dh in hists:
        green = _write_prefix_code(bw, dict(gh), 256 + 24 + cache_extra)
        red = _write_prefix_code(bw, dict(rh), 256)
        blue = _write_prefix_code(bw, dict(bh), 256)
        alpha = _write_prefix_code(bw, dict(ah), 256)
        dist = _write_prefix_code(bw, dict(dh), 40)
        groups.append((green, red, blue, alpha, dist))
    for pos, t in toks:
        green, red, blue, alpha, dist = groups[group_of_pos(pos) if group_of_pos else 0]
        if t[0] == "lit":
            p = t[1]
            green.emit(bw, (p >> 8) & 255)
            red.emit(bw, (p >> 16) & 255)
            blue.emit(bw, p & 255)
            alpha.emit(bw, (p >> 24) & 255)
        elif t[0] == "copy":
            lsym, lex, lval = _lz77_sym(t[1])
            green.emit(bw, 256 + lsym)
            bw.write(lval, lex)
            dist.emit(bw, dsym)
            bw.write(dval, dex)
        else:
            green.emit(bw, 256 + 24 + t[1])


def _encode_pixels_sub(bw: _BitWriter, px: list[int]) -> None:
    """Plain literal/LZ77 sub-image stream (meta images, transforms)."""
    _encode_pixels(bw, px, level0=False, use_lz77=True, use_plane_codes=False)


def _tokenize_cached(px: list[int], use_lz77: bool, cache_bits: int):
    """(start_pos, token) stream; with a color cache, repeat literals
    become cache-hit tokens and every emitted pixel updates the cache —
    mirroring the decoder exactly (copies update it too)."""
    if not cache_bits:
        toks = []
        i = 0
        for t in _tokenize(px, use_lz77):
            toks.append((i, t))
            i += t[1] if t[0] == "copy" else 1
        return toks
    shift = 32 - cache_bits
    cache = [None] * (1 << cache_bits)
    toks = []
    i = 0
    n = len(px)
    while i < n:
        if use_lz77 and i > 0:
            j = i
            prev = px[i - 1]
            while j < n and px[j] == prev and j - i < 4096:
                j += 1
            if j - i >= 4:
                toks.append((i, ("copy", j - i)))
                for k in range(i, j):
                    cache[((0x1E35A7BD * px[k]) & 0xFFFFFFFF) >> shift] = px[k]
                i = j
                continue
        p = px[i]
        h = ((0x1E35A7BD * p) & 0xFFFFFFFF) >> shift
        if cache[h] == p:
            toks.append((i, ("cache", h)))
        else:
            toks.append((i, ("lit", p)))
            cache[h] = p
        i += 1
    return toks


def _forward_predictor(px, w, h, mode, sb):
    res = [0] * len(px)
    for i in range(w * h):
        x = i % w
        y = i // w
        if x == 0 and y == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = px[i - 1]
        elif x == 0:
            pred = px[i - w]
        else:
            pred = _predict(mode, px[i - 1], px[i - w], px[i - w - 1], px[i - w + 1])
        res[i] = _sub_px(px[i], pred)
    return res


def _to_argb_list(arr: np.ndarray) -> tuple[list[int], int, int]:
    arr = np.asarray(arr)
    if arr.ndim == 2:
        h, w = arr.shape
        a = np.full((h, w), 255, dtype=np.uint32)
        r = g = b = arr.astype(np.uint32)
    elif arr.ndim == 3 and arr.shape[2] == 3:
        h, w = arr.shape[:2]
        a = np.full((h, w), 255, dtype=np.uint32)
        r, g, b = (arr[..., i].astype(np.uint32) for i in range(3))
    elif arr.ndim == 3 and arr.shape[2] == 4:
        h, w = arr.shape[:2]
        r, g, b, a = (arr[..., i].astype(np.uint32) for i in range(4))
    else:
        raise ValueError("expected (h,w), (h,w,3) or (h,w,4) uint8 array")
    packed = (a << 24) | (r << 16) | (g << 8) | b
    return [int(v) for v in packed.reshape(-1)], w, h


def encode_webp_vp8l(
    arr: np.ndarray,
    use_lz77: bool = True,
    use_plane_codes: bool = False,
    subtract_green: bool = False,
    predictor: int | None = None,
    predictor_size_bits: int = 2,
    color_transform: tuple[int, int, int] | None = None,
    color_size_bits: int = 2,
    palette: bool = False,
    cache_bits: int = 0,
    meta_bits: int = 0,
) -> bytes:
    """Encode an image as a lossless WebP (VP8L in a RIFF container).

    Transform options exist to exercise every inverse path in the
    decoder (roundtrip tests): ``subtract_green``; ``predictor`` (a
    uniform mode 0-13 over ``1 << (size_bits + 2)`` blocks);
    ``color_transform`` = (green_to_red, green_to_blue, red_to_blue)
    int8 elements applied uniformly; ``palette`` (requires <= 256
    distinct colors; widths pack when <= 16 entries). Forward order is
    subtract-green -> color -> predictor -> palette; the decoder inverts
    in reverse, per the spec's last-read-first-inverted rule."""
    px, w, h = _to_argb_list(arr)
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("dims out of VP8L range")
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    has_alpha = any(((p >> 24) & 255) != 255 for p in px)
    bw.write(1 if has_alpha else 0, 1)
    bw.write(0, 3)  # version
    cur = px
    cur_w = w
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        cur = [
            (p & 0xFF000000)
            | ((((p >> 16) & 255) - ((p >> 8) & 255)) & 255) << 16
            | (p & 0xFF00)
            | (((p & 255) - ((p >> 8) & 255)) & 255)
            for p in cur
        ]
    if color_transform is not None:
        g2r, g2b, r2b = (v & 0xFF for v in color_transform)
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(color_size_bits - 2, 3)
        tw = _ceil_div(cur_w, 1 << color_size_bits)
        th = _ceil_div(h, 1 << color_size_bits)
        cte = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
        _encode_pixels(bw, [cte] * (tw * th), level0=False, use_lz77=True, use_plane_codes=False)
        nxt = []
        for p in cur:
            g = (p >> 8) & 255
            r0 = (p >> 16) & 255
            nr = (r0 - _ct_delta(g2r, g)) & 255
            nb = ((p & 255) - _ct_delta(g2b, g) - _ct_delta(r2b, r0)) & 255
            nxt.append((p & 0xFF000000) | (nr << 16) | (p & 0xFF00) | nb)
        cur = nxt
    if predictor is not None:
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(predictor_size_bits - 2, 3)
        tw = _ceil_div(cur_w, 1 << predictor_size_bits)
        th = _ceil_div(h, 1 << predictor_size_bits)
        sub = [0xFF000000 | (predictor << 8)] * (tw * th)
        cur = _forward_predictor(cur, cur_w, h, predictor, predictor_size_bits)
        _encode_pixels(bw, sub, level0=False, use_lz77=True, use_plane_codes=False)
    if palette:
        colors = sorted(set(cur))
        n = len(colors)
        if n > 256:
            raise ValueError("palette transform needs <= 256 distinct colors")
        index = {c: i for i, c in enumerate(colors)}
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(n - 1, 8)
        deltas = []
        prev = 0
        for c in colors:  # palette entries ship as component deltas
            deltas.append(_sub_px(c, prev))
            prev = c
        _encode_pixels(bw, deltas, level0=False, use_lz77=False, use_plane_codes=False)
        xbits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
        if xbits == 0:
            cur = [0xFF000000 | (index[p] << 8) for p in cur]
        else:
            bit_depth = 8 >> xbits
            per = 1 << xbits
            packed_w = _ceil_div(cur_w, per)
            packed = []
            for y in range(h):
                row = cur[y * cur_w : (y + 1) * cur_w]
                for px0 in range(0, cur_w, per):
                    g = 0
                    for k, p in enumerate(row[px0 : px0 + per]):
                        g |= index[p] << (k * bit_depth)
                    packed.append(0xFF000000 | (g << 8))
            cur = packed
            cur_w = packed_w
    bw.write(0, 1)  # no more transforms
    _encode_pixels(
        bw,
        cur,
        level0=True,
        use_lz77=use_lz77,
        use_plane_codes=use_plane_codes,
        xsize=cur_w,
        cache_bits=cache_bits,
        meta_bits=meta_bits,
    )
    body = bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
