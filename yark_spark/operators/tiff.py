"""TIFF codec from scratch (round 12): baseline TIFF 6.0 reader —
both byte orders, IFD entry walk with inline-vs-offset values, strip
assembly, uncompressed / PackBits / LZW compression, the horizontal-
differencing predictor, and grayscale (both polarities) + RGB photo-
metrics — plus an encoder for every combination so each decode path is
pinned by roundtrips.

TIFF is the archival format scientific/scanned-document image datasets
actually arrive in (and the container inside many ML dataset dumps),
so it joins PNG/JPEG/GIF/WebP/BMP/netpbm in the decode family. Two
spec quirks make it a genuinely distinct implementation rather than a
re-skin of the GIF work:

* **TIFF LZW is the OTHER bit order.** GIF packs codes LSB-first;
  TIFF packs MSB-first, and switches code widths ONE CODE EARLIER
  ("early change", the historic off-by-one the spec canonized). The
  table logic is shared knowledge, the wire is not — hand-packed code
  sequences in tests/test_tiff.py pin the MSB layout and the early
  width switch independently of the encoder.
* **Values live inline or behind offsets** depending on their byte
  size, so a structurally valid reader must honor both forms (the
  3-value BitsPerSample of an RGB image never fits inline; the 1-value
  width always does).

Reference parity note: the reference archiver stores media bytes
opaquely (/root/reference/cmds/archive.py:88-91); decoding them is
mandate-side training-pipeline surface, same as operators/png et al.

Round 14 s3 closes three of the original boundaries both directions:
TILED layout (the tile grid with edge padding; the predictor restarts
per tile — each tile is an independent compression unit), PALETTE
color (photometric 3, 16-bit ColorMap), and PLANAR configuration 2
(plane-major strip order). Remaining boundaries (documented, typed):
bit depths other than 8, tiled planar-2, multi-page IFD chains, and
the fax/JPEG-in-TIFF compressions raise ``NotImplementedError``;
malformed structures raise ``ValueError`` so the decode quarantine
keeps corrupt rows as rows.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_tiff", "encode_tiff"]


# ---------------------------------------------------------------------------
# PackBits (TIFF 6.0 §9)
# ---------------------------------------------------------------------------


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        ctrl = data[i]
        i += 1
        if ctrl < 128:  # ctrl+1 literal bytes
            run = ctrl + 1
            if i + run > n:
                raise ValueError("tiff: PackBits literal past end")
            out += data[i : i + run]
            i += run
        elif ctrl > 128:  # repeat next byte 257-ctrl times
            if i >= n:
                raise ValueError("tiff: PackBits run past end")
            out += bytes([data[i]]) * (257 - ctrl)
            i += 1
        # ctrl == 128: no-op per spec
    if len(out) != expected:
        raise ValueError("tiff: PackBits output size mismatch")
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        run = 1
        while run < 128 and i + run < n and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        # literal stretch until the next >=3 run (2-runs aren't worth it)
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF LZW (TIFF 6.0 §13): MSB-first code packing, early width change
# ---------------------------------------------------------------------------

_CLEAR = 256
_EOI = 257


def lzw_decode(
    data: bytes, max_output: int = 1 << 26, early_change: bool = True
) -> bytes:
    """``early_change=True`` is the TIFF 6.0 §13 discipline (widths bump
    one code early — the historic off-by-one the spec canonized) and
    ALSO PDF's ``/EarlyChange 1`` default; ``early_change=False`` is
    PDF ``/EarlyChange 0`` (spec-exact widening, ISO 32000-1 §7.4.4.2),
    where the decoder widens one table entry later."""
    out = bytearray()
    early = 2 if early_change else 1
    bitpos, nbits = 0, len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            raise ValueError("tiff: LZW stream truncated")
        end = bitpos + width
        lo, hi = bitpos >> 3, (end + 7) >> 3
        chunk = int.from_bytes(data[lo:hi], "big")
        bitpos = end
        return (chunk >> ((hi << 3) - end)) & ((1 << width) - 1)

    table: list[bytes] | None = None
    width = 9
    prev: bytes | None = None
    while True:
        code = read_code(width)
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width, prev = 9, None
            continue
        if code == _EOI:
            break
        if table is None:
            raise ValueError("tiff: LZW code before initial Clear")
        if prev is None:
            if code >= 256:
                raise ValueError("tiff: invalid first LZW code")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):  # KwKwK
                entry = prev + prev[:1]
            else:
                raise ValueError("tiff: LZW code beyond table")
            table.append(prev + entry[:1])
        out += entry
        if len(out) > max_output:
            raise ValueError("tiff: LZW output exceeds bomb guard")
        prev = entry
        # EARLY CHANGE (TIFF 6.0 §13): widths bump after table entry
        # 510/1022/2046 lands — and the decoder's table lags the
        # encoder's by exactly one entry at the same wire position, so
        # it widens at (1<<width)-2 where the encoder uses (1<<width)-1
        if len(table) == (1 << width) - early and width < 12:
            width += 1
    return bytes(out)


def lzw_encode(data: bytes, early_change: bool = True) -> bytes:
    out = bytearray()
    early = 2 if early_change else 1
    acc, nacc = 0, 0

    def write_code(code: int, width: int) -> None:
        nonlocal acc, nacc
        acc = (acc << width) | code
        nacc += width
        while nacc >= 8:
            nacc -= 8
            out.append((acc >> nacc) & 0xFF)
        acc &= (1 << nacc) - 1

    def fresh() -> tuple[dict[bytes, int], int]:
        return {bytes([i]): i for i in range(256)}, 258

    # Width discipline (round-12 fuzz find): the DECODER appends a
    # speculative table entry after EVERY data code except the first
    # since Clear — including the encoder's final flush code, which
    # adds no encoder-side entry. Keying the width bump off the
    # encoder's own table (the old next_code == (1<<width)-1 rule)
    # desynchronized exactly when that phantom append crossed the
    # early-change threshold on the flush code: the decoder widened
    # and misread the 9-bit EOI ("LZW code beyond table" on ~0.1% of
    # random 254-byte inputs). Simulate the decoder's table size and
    # bump IT — both sides now widen at the same wire position by
    # construction.
    width = 9
    write_code(_CLEAR, width)
    table, next_code = fresh()
    dec_table = 258  # decoder table size after its Clear reset
    first_since_clear = True

    def emit(code: int) -> None:
        nonlocal width, dec_table, first_since_clear
        if dec_table == (1 << width) - early and width < 12:
            width += 1  # early change, at the decoder's position
        write_code(code, width)
        if first_since_clear:
            first_since_clear = False  # decoder appends nothing here
        else:
            dec_table += 1

    def emit_clear() -> None:
        nonlocal width, dec_table, first_since_clear, table, next_code, w
        if dec_table == (1 << width) - early and width < 12:
            width += 1
        write_code(_CLEAR, width)
        width = 9
        dec_table = 258
        first_since_clear = True
        table, next_code = fresh()
        w = b""

    w = b""
    for byte in data:
        c = bytes([byte])
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        w = c
        if next_code == 4094:
            emit(table[w])
            emit_clear()
    if w:
        emit(table[w])
    if dec_table == (1 << width) - early and width < 12:
        width += 1  # the decoder reads EOI at the bumped width too
    write_code(_EOI, width)
    if nacc:
        write_code(0, 8 - nacc)  # pad final byte
    return bytes(out)


# ---------------------------------------------------------------------------
# IFD structures
# ---------------------------------------------------------------------------

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


def _read_entry_values(b: bytes, ent: bytes, bo: str) -> list[int]:
    tag, typ, count = struct.unpack(bo + "HHI", ent[:8])
    if typ not in _TYPE_SIZE:
        return []  # unknown types are skippable per spec
    size = _TYPE_SIZE[typ] * count
    raw = ent[8:12] if size <= 4 else None
    if raw is None:
        (off,) = struct.unpack(bo + "I", ent[8:12])
        raw = b[off : off + size]
        if len(raw) != size:
            raise ValueError("tiff: IFD value offset past end")
    if typ == 1 or typ == 2:
        return list(raw[:count])
    if typ == 3:
        return list(struct.unpack(bo + f"{count}H", raw[: 2 * count]))
    if typ == 4:
        return list(struct.unpack(bo + f"{count}I", raw[: 4 * count]))
    # RATIONAL → numerator/denominator pairs, returned flat
    return list(struct.unpack(bo + f"{2 * count}I", raw[: 8 * count]))


def _parse_ifd(b: bytes, bo: str, off: int) -> dict[int, list[int]]:
    if off + 2 > len(b):
        raise ValueError("tiff: IFD offset past end")
    (n,) = struct.unpack_from(bo + "H", b, off)
    tags: dict[int, list[int]] = {}
    pos = off + 2
    if pos + 12 * n > len(b):
        raise ValueError("tiff: IFD entries past end")
    for _ in range(n):
        ent = b[pos : pos + 12]
        (tag,) = struct.unpack(bo + "H", ent[:2])
        tags[tag] = _read_entry_values(b, ent, bo)
        pos += 12
    return tags


def decode_tiff(payload: bytes) -> np.ndarray:
    """Baseline TIFF → uint8 array, (H, W) for grayscale or (H, W, 3)
    for RGB. First IFD only (the poster image — multi-page stays a
    documented boundary, like GIF's poster frame did in round 11).
    WhiteIsZero grayscale is inverted to standard intensity so both
    polarities produce identical pixel statistics."""
    b = bytes(payload)
    if len(b) < 8:
        raise ValueError("tiff: truncated header")
    if b[:2] == b"II":
        bo = "<"
    elif b[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("tiff: bad byte-order mark")
    magic, ifd_off = struct.unpack_from(bo + "HI", b, 2)
    if magic != 42:
        raise ValueError(f"tiff: bad magic {magic}")
    tags = _parse_ifd(b, bo, ifd_off)

    def one(tag: int, default: int | None = None) -> int:
        vals = tags.get(tag)
        if not vals:
            if default is None:
                raise ValueError(f"tiff: missing required tag {tag}")
            return default
        return vals[0]

    width = one(256)
    height = one(257)
    if width <= 0 or height <= 0 or width * height > (1 << 26):
        raise ValueError("tiff: unreasonable dimensions")
    spp = one(277, 1)
    bits = tags.get(258, [8])
    compression = one(259, 1)
    photometric = one(262)
    predictor = one(317, 1)
    planar = one(284, 1)
    if planar not in (1, 2):
        raise NotImplementedError(f"tiff: planar configuration {planar}")
    if photometric not in (0, 1, 2, 3):
        raise NotImplementedError(f"tiff: photometric {photometric}")
    if any(v != 8 for v in bits) or len(bits) != spp:
        raise NotImplementedError(f"tiff: bits per sample {bits}")
    if spp not in (1, 3):
        raise NotImplementedError(f"tiff: {spp} samples per pixel")
    if (photometric == 2) != (spp == 3):
        raise ValueError("tiff: photometric/sample-count mismatch")
    if photometric == 3 and spp != 1:
        raise ValueError("tiff: palette images carry one sample")
    if predictor not in (1, 2):
        raise NotImplementedError(f"tiff: predictor {predictor}")
    if compression not in (1, 5, 32773):
        raise NotImplementedError(f"tiff: compression {compression}")
    tiled = 322 in tags or 323 in tags

    def _expand(strip: bytes, expected: int) -> bytes:
        if compression == 1:
            if len(strip) < expected:
                raise ValueError("tiff: uncompressed segment short")
            return strip[:expected]
        if compression == 5:
            raw = lzw_decode(strip, max_output=expected)
            if len(raw) != expected:
                raise ValueError("tiff: LZW segment size mismatch")
            return raw
        return packbits_decode(strip, expected)

    if tiled:
        # tiled layout (TIFF 6.0 §15): a grid of fixed-size tiles,
        # each compressed independently and PADDED to full tile size;
        # edge tiles crop. Tiles are plane-interleaved (chunky) only.
        if planar != 1:
            raise NotImplementedError("tiff: tiled planar-2 layout")
        tw = one(322)
        th = one(323)
        if tw <= 0 or th <= 0 or tw % 16 or th % 16:
            raise ValueError("tiff: tile dims must be positive multiples of 16")
        offsets = tags.get(324)
        counts = tags.get(325)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("tiff: missing/mismatched tile tags")
        across = (width + tw - 1) // tw
        down = (height + th - 1) // th
        if len(offsets) != across * down:
            raise ValueError("tiff: tile count mismatch")
        arr = np.zeros((height, width, spp), dtype=np.uint8)
        expected = th * tw * spp
        for ti, (off, cnt) in enumerate(zip(offsets, counts)):
            tile = b[off : off + cnt]
            if len(tile) != cnt:
                raise ValueError("tiff: tile past end of file")
            raw = _expand(tile, expected)
            t_arr = np.frombuffer(raw, dtype=np.uint8).reshape(th, tw, spp)
            if predictor == 2:
                t_arr = np.cumsum(t_arr.astype(np.uint32), axis=1).astype(
                    np.uint8
                )
            r0 = (ti // across) * th
            c0 = (ti % across) * tw
            arr[r0 : r0 + th, c0 : c0 + tw] = t_arr[
                : min(th, height - r0), : min(tw, width - c0)
            ]
    else:
        offsets = tags.get(273)
        counts = tags.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("tiff: missing/mismatched strip tags")
        rows_per_strip = one(278, height)
        n_planes = spp if planar == 2 else 1
        per_plane = (height + rows_per_strip - 1) // rows_per_strip
        if planar == 2 and len(offsets) != per_plane * n_planes:
            raise ValueError("tiff: planar strip count mismatch")
        plane_w = width if planar == 2 else width * spp
        planes = []
        for p in range(n_planes):
            rows = bytearray()
            remaining = height
            for k in range(per_plane if planar == 2 else len(offsets)):
                off = offsets[p * per_plane + k] if planar == 2 else offsets[k]
                cnt = counts[p * per_plane + k] if planar == 2 else counts[k]
                strip = b[off : off + cnt]
                if len(strip) != cnt:
                    raise ValueError("tiff: strip past end of file")
                nrows = min(rows_per_strip, remaining)
                rows += _expand(strip, nrows * plane_w)
                remaining -= nrows
            if remaining != 0:
                raise ValueError("tiff: strips do not cover the image")
            planes.append(
                np.frombuffer(bytes(rows), dtype=np.uint8).reshape(
                    height, width, 1 if planar == 2 else spp
                )
            )
        arr = np.concatenate(planes, axis=2) if planar == 2 else planes[0]
        if predictor == 2:
            # horizontal differencing runs per sample along each row
            arr = np.cumsum(arr.astype(np.uint32), axis=1).astype(np.uint8)
    if photometric == 3:
        cmap = tags.get(320)
        if not cmap or len(cmap) != 3 * 256:
            raise NotImplementedError(
                "tiff: palette images need a 3x256 16-bit ColorMap"
            )
        lut = (
            np.array(cmap, dtype=np.uint32).reshape(3, 256).T >> 8
        ).astype(np.uint8)
        return lut[arr[:, :, 0]].copy()
    if photometric == 0:  # WhiteIsZero → invert to standard intensity
        arr = 255 - arr
    return arr[:, :, 0].copy() if spp == 1 else arr.copy()


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

_COMP_CODES = {"none": 1, "lzw": 5, "packbits": 32773}


def encode_tiff(
    img: np.ndarray,
    compression: str = "lzw",
    predictor: int = 1,
    rows_per_strip: int = 8,
    byte_order: str = "<",
    white_is_zero: bool = False,
    layout: str = "strips",
    tile_size: tuple[int, int] = (16, 16),
    palette: "np.ndarray | None" = None,
    planar: int = 1,
) -> bytes:
    """uint8 (H, W) grayscale or (H, W, 3) RGB → baseline TIFF. Strip
    layout (``rows_per_strip``) so small images still cross strip
    boundaries; predictor 2 applies horizontal differencing before
    compression; ``byte_order`` exercises both II and MM readers.
    Round 14 s3: ``layout='tiled'`` writes the tile grid (edge tiles
    padded to full size), ``palette`` (a (256, 3) uint8 LUT, image =
    indices) writes photometric-3 with a 16-bit ColorMap, and
    ``planar=2`` separates RGB strips plane-major."""
    a = np.asarray(img)
    if a.dtype != np.uint8 or a.ndim not in (2, 3):
        raise ValueError("tiff: encoder wants uint8 (H,W) or (H,W,3)")
    if a.ndim == 3 and a.shape[2] != 3:
        raise ValueError("tiff: encoder supports 1 or 3 channels")
    if compression not in _COMP_CODES:
        raise ValueError(f"tiff: unknown compression {compression!r}")
    if predictor not in (1, 2):
        raise ValueError(f"tiff: unsupported predictor {predictor}")
    if byte_order not in ("<", ">"):
        raise ValueError("tiff: byte_order must be '<' or '>'")
    if layout not in ("strips", "tiled"):
        raise ValueError(f"tiff: unknown layout {layout!r}")
    if planar not in (1, 2):
        raise ValueError("tiff: planar must be 1 or 2")
    gray = a.ndim == 2
    if white_is_zero and not gray:
        raise ValueError("tiff: WhiteIsZero is a grayscale photometric")
    if palette is not None:
        pal = np.asarray(palette)
        if not gray or pal.shape != (256, 3) or pal.dtype != np.uint8:
            raise ValueError(
                "tiff: palette wants index image (H,W) + (256,3) uint8 LUT"
            )
    if planar == 2 and (gray or layout == "tiled"):
        raise ValueError("tiff: planar-2 writes chunky-RGB strips only")
    h, w = a.shape[:2]
    spp = 1 if gray else 3
    px = a[:, :, None] if gray else a
    if white_is_zero:
        px = 255 - px
    if predictor == 2:
        diff = px.astype(np.int16)
        diff[:, 1:, :] = diff[:, 1:, :] - diff[:, :-1, :]
        px = (diff & 0xFF).astype(np.uint8)

    def _pack(raw: bytes) -> bytes:
        if compression == "none":
            return raw
        if compression == "lzw":
            return lzw_encode(raw)
        return packbits_encode(raw)

    tiled = layout == "tiled"
    if tiled:
        # the predictor restarts per TILE (each tile is an independent
        # compression unit), so differencing applies after tiling —
        # undo the global pass above and re-apply per tile
        if predictor == 2:
            px = np.cumsum(px.astype(np.uint32), axis=1).astype(np.uint8)
        tw, th = tile_size
        if tw % 16 or th % 16 or tw <= 0 or th <= 0:
            raise ValueError("tiff: tile dims must be positive multiples of 16")
        across = (w + tw - 1) // tw
        down = (h + th - 1) // th
        full = np.zeros((down * th, across * tw, spp), dtype=np.uint8)
        full[:h, :w] = px
        strips = []
        for r0 in range(0, down * th, th):
            for c0 in range(0, across * tw, tw):
                tile = full[r0 : r0 + th, c0 : c0 + tw]
                if predictor == 2:
                    diff = tile.astype(np.int16)
                    diff[:, 1:, :] = diff[:, 1:, :] - diff[:, :-1, :]
                    tile = (diff & 0xFF).astype(np.uint8)
                strips.append(_pack(tile.tobytes()))
    elif planar == 2:
        strips = [
            _pack(px[r0 : r0 + rows_per_strip, :, p].tobytes())
            for p in range(spp)
            for r0 in range(0, h, rows_per_strip)
        ]
    else:
        strips = [
            _pack(px[r0 : r0 + rows_per_strip].tobytes())
            for r0 in range(0, h, rows_per_strip)
        ]

    bo = byte_order
    if palette is not None:
        photometric = 3
    else:
        photometric = 2 if spp == 3 else (0 if white_is_zero else 1)
    entries: list[tuple[int, int, int, list[int]]] = [
        (256, 4, 1, [w]),
        (257, 4, 1, [h]),
        (258, 3, spp, [8] * spp),
        (259, 3, 1, [_COMP_CODES[compression]]),
        (262, 3, 1, [photometric]),
        (277, 3, 1, [spp]),
    ]
    if tiled:
        entries += [
            (322, 4, 1, [tw]),
            (323, 4, 1, [th]),
            (324, 4, len(strips), [0] * len(strips)),  # patched below
            (325, 4, len(strips), [len(s) for s in strips]),
        ]
    else:
        entries += [
            (273, 4, len(strips), [0] * len(strips)),  # patched below
            (278, 4, 1, [rows_per_strip]),
            (279, 4, len(strips), [len(s) for s in strips]),
        ]
    if planar == 2:
        entries.append((284, 3, 1, [2]))
    if palette is not None:
        cmap = [int(v) * 257 for v in pal.T.reshape(-1)]
        entries.append((320, 3, len(cmap), cmap))
    if predictor == 2:
        entries.append((317, 3, 1, [2]))
    entries.sort(key=lambda e: e[0])

    # layout: header(8) + IFD + overflow values + strip data
    ifd_len = 2 + 12 * len(entries) + 4
    overflow = bytearray()
    packed: list[bytes] = []

    def pack_values(typ: int, vals: list[int]) -> bytes:
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        return struct.pack(bo + fmt * len(vals), *vals)

    # first pass to size the overflow region
    ovf_base = 8 + ifd_len
    for tag, typ, count, vals in entries:
        blob = pack_values(typ, vals)
        if len(blob) > 4:
            overflow += blob
    data_base = ovf_base + len(overflow)
    # patch strip offsets now that the data base is known
    strip_offsets = []
    pos = data_base
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    entries = [
        (tag, typ, count, strip_offsets if tag in (273, 324) else vals)
        for tag, typ, count, vals in entries
    ]

    overflow = bytearray()
    out = bytearray()
    out += (b"II" if bo == "<" else b"MM") + struct.pack(bo + "HI", 42, 8)
    out += struct.pack(bo + "H", len(entries))
    for tag, typ, count, vals in entries:
        blob = pack_values(typ, vals)
        out += struct.pack(bo + "HHI", tag, typ, count)
        if len(blob) <= 4:
            out += blob + b"\x00" * (4 - len(blob))
        else:
            out += struct.pack(bo + "I", ovf_base + len(overflow))
            overflow += blob
    out += struct.pack(bo + "I", 0)  # no next IFD
    out += overflow
    for s in strips:
        out += s
    return bytes(out)
