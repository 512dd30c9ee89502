"""MP3 frame-header scan from scratch (round 12): MPEG-1 audio frame
headers (11-bit sync, version/layer fields, the published Layer III
bitrate and sample-rate tables, padding bit, 144·bitrate/rate frame
sizing), ID3v2 prefix skip (syncsafe size), ID3v1 trailer parse
(fixed 128-byte TAG layout) — a LISTING pass, nothing imported.

The psychoacoustic DECODE stays the documented boundary (a real MDCT
+ Huffman Layer III decoder needs an audio library's worth of tables)
— but a curation pipeline doesn't need waveforms to triage crawled
audio: duration, bitrate, CBR/VBR shape and tag metadata decide
keep/route/transcode long before anything is decoded, and all of
those live in the frame HEADERS. This is the ``avi_scan`` stance
(container grammar without frame decode) applied to the dominant
crawled-audio format.

Scan raises typed ``ValueError`` on malformed input (lost sync, bad
version/layer/bitrate/rate fields, truncated frame, frame bomb); an
ID3v1 trailer is returned when present (title/artist fields,
space/NUL-stripped per convention).

Oracle recipe: fixture streams are built frame-exactly from the
document's md5 codes (frame count = 10 + a % 20, bitrate cycled
through the Layer III table, 32 kHz so per-frame duration is an
EXACT 36 ms integer), the ID3v1 title carries the doc id — so frame
count, byte math, duration and tag recovery are all analytic SQL.
Header vectors live in tests/test_mp3.py.
"""

from __future__ import annotations

__all__ = ["mp3_build", "mp3_scan", "V1L3_BITRATES"]

#: MPEG-1 Layer III bitrate table (kbps), index 1..14 (0 = free, 15 = bad).
V1L3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

_RATES = {0: 44100, 1: 48000, 2: 32000}
_SAMPLES_PER_FRAME = 1152


def _frame_size(bitrate_kbps: int, rate_hz: int, padding: int) -> int:
    return (144 * bitrate_kbps * 1000) // rate_hz + padding


def _header(
    bitrate_index: int, rate_index: int, padding: int = 0, mode: int = 3
) -> bytes:
    # sync(11)=all ones | version(2)=11 (MPEG1) | layer(2)=01 (III) |
    # protection(1)=1 (none) ; then bitrate(4) rate(2) padding(1)
    # private(1) ; then mode(2) (11 mono / 00 stereo) + zeros
    b0 = 0xFF
    b1 = 0xFB  # 1111 1 011: sync tail, MPEG1, Layer III, no CRC
    b2 = (bitrate_index << 4) | (rate_index << 2) | (padding << 1)
    b3 = mode << 6
    return bytes((b0, b1, b2, b3))


def _id3v1(title: str, artist: str = "yark_spark") -> bytes:
    def f(s: str, n: int) -> bytes:
        raw = s.encode("latin-1", "replace")[:n]
        return raw + b"\x00" * (n - len(raw))

    return (
        b"TAG"
        + f(title, 30)
        + f(artist, 30)
        + f("fixtures", 30)
        + b"2024"
        + f("", 28)
        + b"\x00\x01"  # track 1
        + b"\x0c"  # genre
    )


def mp3_build(
    n_frames: int,
    bitrate_index: int = 9,
    rate_index: int = 2,
    title: str = "untitled",
    with_id3v2: bool = True,
    vbr_indices: tuple[int, ...] | None = None,
) -> bytes:
    """Build an MPEG-1 Layer III stream: optional ID3v2 prefix
    (syncsafe-sized junk the scanner must skip), ``n_frames`` frames
    with deterministic filler payloads, an ID3v1 trailer.
    ``vbr_indices`` cycles per-frame bitrate indices (a VBR stream)."""
    out = bytearray()
    if with_id3v2:
        body = b"\x00" * 37  # junk tag body
        out += b"ID3\x03\x00\x00" + bytes((0, 0, 0, len(body))) + body
    rate = _RATES[rate_index]
    for i in range(n_frames):
        bi = vbr_indices[i % len(vbr_indices)] if vbr_indices else bitrate_index
        bitrate = V1L3_BITRATES[bi]
        padding = 0  # 32 kHz Layer III sizes divide exactly; no padding
        size = _frame_size(bitrate, rate, padding)
        header = _header(bi, rate_index, padding)
        filler = bytes(((i + j) * 37 + 11) % 251 for j in range(size - 4))
        out += header + filler
    out += _id3v1(title)
    return bytes(out)


def mp3_scan(payload: bytes, max_frames: int = 1_000_000) -> dict:
    """Walk the frame headers: returns {n_frames, bitrate_kbps (None
    when VBR), sample_rate, n_samples, duration_ms, cbr, id3_title}.
    duration_ms floors the exact sample count over the rate."""
    b = bytes(payload)
    pos = 0
    end = len(b)
    # ID3v2 prefix: 'ID3' ver(2) flags(1) syncsafe size(4)
    if b[:3] == b"ID3":
        if len(b) < 10:
            raise ValueError("mp3: truncated ID3v2 header")
        if any(x & 0x80 for x in b[6:10]):
            raise ValueError("mp3: ID3v2 size bytes must be syncsafe")
        size = (b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9]
        pos = 10 + size
        if pos > end:
            raise ValueError("mp3: ID3v2 size exceeds payload")
    # ID3v1 trailer
    title = None
    if end - pos >= 128 and b[end - 128 : end - 125] == b"TAG":
        title = (
            b[end - 125 : end - 95].split(b"\x00", 1)[0].decode("latin-1").strip()
        )
        end -= 128
    n_frames = 0
    bitrates = set()
    rate = None
    while pos < end:
        if end - pos < 4:
            raise ValueError("mp3: truncated frame header")
        if n_frames >= max_frames:
            raise ValueError("mp3: frame count exceeds bomb guard")
        h0, h1, h2, _h3 = b[pos : pos + 4]
        if h0 != 0xFF or (h1 & 0xE0) != 0xE0:
            raise ValueError(f"mp3: lost frame sync at byte {pos}")
        if (h1 & 0x18) != 0x18 or (h1 & 0x06) != 0x02:
            raise ValueError("mp3: only MPEG-1 Layer III streams scan here")
        bitrate_index = h2 >> 4
        if bitrate_index in (0, 15):
            raise ValueError("mp3: free-format/invalid bitrate index")
        rate_index = (h2 >> 2) & 0x3
        if rate_index == 3:
            raise ValueError("mp3: reserved sample-rate index")
        padding = (h2 >> 1) & 0x1
        this_rate = _RATES[rate_index]
        if rate is None:
            rate = this_rate
        elif rate != this_rate:
            raise ValueError("mp3: sample rate changed mid-stream")
        bitrate = V1L3_BITRATES[bitrate_index]
        bitrates.add(bitrate)
        size = _frame_size(bitrate, rate, padding)
        if pos + size > end:
            raise ValueError("mp3: truncated final frame")
        pos += size
        n_frames += 1
    if n_frames == 0:
        raise ValueError("mp3: no audio frames")
    n_samples = n_frames * _SAMPLES_PER_FRAME
    cbr = len(bitrates) == 1
    return {
        "n_frames": n_frames,
        "bitrate_kbps": next(iter(bitrates)) if cbr else None,
        "cbr": cbr,
        "sample_rate": rate,
        "n_samples": n_samples,
        "duration_ms": (n_samples * 1000) // rate,
        "id3_title": title,
    }


# ---------------------------------------------------------------------------
# Layer III structural decode (round 13): side info + bit reservoir +
# scalefactors, both directions. The spectral Huffman stage stays the
# documented boundary (ISO 11172-3 Table B.7 is literal spec data with
# no in-container source to transcribe from; fixtures therefore carry
# big_values = 0 and part2_3_length = exact scalefactor bits — a
# spec-valid silent granule whose every OTHER field round-trips).
# ---------------------------------------------------------------------------

#: slen1/slen2 per scalefac_compress (ISO 11172-3 §2.4.2.7)
SLEN = (
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3),
)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        if value < 0 or value >> bits:
            raise ValueError("mp3: field value out of range")
        self.acc = (self.acc << bits) | value
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def pad_to_byte(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        if self.n:
            raise ValueError("mp3: writer not byte-aligned")
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, bits: int) -> int:
        if self.pos + bits > len(self.data) * 8:
            raise ValueError("mp3: bitstream truncated")
        out = 0
        p = self.pos
        for _ in range(bits):
            out = (out << 1) | ((self.data[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return out


def _granule_fields(a: int, b: int, c: int, d: int, i: int, g: int) -> dict:
    """Deterministic per-granule side-info fields from the doc's md5
    codes — ARITHMETIC ONLY, so a SQL oracle can re-derive each one."""
    short = (i + g) % 5 == 0
    sc = (c + i + g) % 16
    slen1, slen2 = SLEN[sc]
    if short:
        n_sf = 18 + 18  # 6 bands x 3 windows under slen1, 6 x 3 under slen2
        part2 = 18 * slen1 + 18 * slen2
    else:
        n_sf = 21  # bands 0-10 slen1, 11-20 slen2
        part2 = 11 * slen1 + 10 * slen2
    return {
        "short": short,
        "global_gain": (b + 7 * i + 3 * g) % 256,
        "scalefac_compress": sc,
        "slen1": slen1,
        "slen2": slen2,
        "part2": part2,
        "n_sf": n_sf,
        "preflag": 0 if short else (d + i + g) % 2,
        "scalefac_scale": (a + i + g) % 2,
        "subblock_gain": ((d + i) % 8, (d + i + 1) % 8, (d + i + 2) % 8),
        "table_select": ((b + g) % 32, (c + g) % 32, (d + g) % 32),
        "sf_value": lambda j, slen, _d=d, _i=i, _g=g: (
            (_d + _i + _g + j) % (1 << slen) if slen else 0
        ),
    }


# scfsi bands (ISO 11172-3 2.4.2.7): scalefactor index ranges whose
# granule-1 values may REUSE granule 0's when the scfsi bit is set
_SCFSI_BANDS = ((0, 6), (6, 11), (11, 16), (16, 21))


def _stereo_granule_fields(a, b, c, d, i, g, ch) -> dict:
    """Per-(granule, channel) fields for the stereo fixture — the mono
    arithmetic with the channel mixed in (SQL re-derivable)."""
    f = _granule_fields(a + 5 * ch, b + 11 * ch, c + 2 * ch, d + 5 * ch, i, g)
    return f


def _scfsi_value(a, b, i, ch, short0, short1) -> int:
    """Per-channel scfsi nibble: nonzero only when BOTH granules are
    long (the spec forbids reuse into/out of short blocks)."""
    if short0 or short1:
        return 0
    return (a + b + i + 3 * ch) % 16


def mp3_build_deep(
    a: int, b: int, c: int, d: int, stereo: bool = False
) -> bytes:
    """Layer III stream whose SIDE INFO, SCALEFACTORS and BIT
    RESERVOIR are all real: MPEG-1 at 32 kHz / 96 kbps, frame and
    granule fields pure arithmetic over the four md5 codes, and
    main_data_begin = (a + 7·i) % 120 for i ≥ 1 so nearly every frame
    reads its data back out of earlier frames' areas (ancillary
    stuffing fills the gaps, exactly how real encoders pad).
    ``stereo=True`` (round 14 s3) emits the 2-channel layout — 32-byte
    side info, 3 private bits, per-channel scfsi nibbles with REAL
    granule-1 scalefactor reuse wherever both granules are long."""
    n_frames = 6 + a % 6
    rate_index, bitrate_index = 2, 6  # 32 kHz, 96 kbps -> 432-byte frames
    size = _frame_size(V1L3_BITRATES[bitrate_index], _RATES[rate_index], 0)
    nch = 2 if stereo else 1
    si_len = 32 if stereo else 17
    cap = size - 4 - si_len  # main-data area per frame

    sideinfos = []
    main_bits = []
    mdbs = []
    for i in range(n_frames):
        mdb = 0 if i == 0 else (a + 7 * i) % 120
        mdbs.append(mdb)
        w = _BitWriter()
        w.write(mdb, 9)
        w.write(0, 3 if stereo else 5)  # private_bits
        scfsis = []
        for ch in range(nch):
            if stereo:
                f0 = _stereo_granule_fields(a, b, c, d, i, 0, ch)
                f1 = _stereo_granule_fields(a, b, c, d, i, 1, ch)
                sv = _scfsi_value(a, b, i, ch, f0["short"], f1["short"])
            else:
                sv = 0  # mono fixture granules differ, no reuse
            scfsis.append(sv)
            w.write(sv, 4)
        md = _BitWriter()
        for g in range(2):
            for ch in range(nch):
                if stereo:
                    f = _stereo_granule_fields(a, b, c, d, i, g, ch)
                else:
                    f = _granule_fields(a, b, c, d, i, g)
                # which scalefactor indices does this granule transmit?
                if g == 1 and scfsis[ch] and not f["short"]:
                    skip = set()
                    for band, (lo, hi) in enumerate(_SCFSI_BANDS):
                        if (scfsis[ch] >> (3 - band)) & 1:
                            skip.update(range(lo, hi))
                else:
                    skip = set()
                if f["short"]:
                    idxs = list(range(36))
                    part2 = 18 * f["slen1"] + 18 * f["slen2"]
                else:
                    idxs = [j for j in range(21) if j not in skip]
                    part2 = sum(
                        f["slen1"] if j < 11 else f["slen2"] for j in idxs
                    )
                w.write(part2, 12)  # part2_3_length == transmitted bits
                w.write(0, 9)  # big_values = 0: silent spectrum
                w.write(f["global_gain"], 8)
                w.write(f["scalefac_compress"], 4)
                if f["short"]:
                    w.write(1, 1)  # window_switching_flag
                    w.write(2, 2)  # block_type: short
                    w.write(0, 1)  # mixed_block_flag
                    for t in f["table_select"][:2]:
                        w.write(t, 5)
                    for sg in f["subblock_gain"]:
                        w.write(sg, 3)
                else:
                    w.write(0, 1)
                    for t in f["table_select"]:
                        w.write(t, 5)
                    w.write((a + i) % 16, 4)  # region0_count
                    w.write((b + i) % 8, 3)  # region1_count
                w.write(f["preflag"], 1)
                w.write(f["scalefac_scale"], 1)
                w.write((c + i + g) % 2, 1)  # count1table_select
                # the granule's main data: its transmitted scalefactors
                if f["short"]:
                    for j in range(18):
                        md.write(f["sf_value"](j, f["slen1"]), f["slen1"])
                    for j in range(18, 36):
                        md.write(f["sf_value"](j, f["slen2"]), f["slen2"])
                else:
                    for j in idxs:
                        slen = f["slen1"] if j < 11 else f["slen2"]
                        md.write(f["sf_value"](j, slen), slen)
        md.pad_to_byte()
        sideinfos.append(w.bytes())
        main_bits.append(md.bytes())

    # lay the main-data stream into the concatenated frame areas,
    # honoring each frame's back-pointer; ancillary filler between
    areas = bytearray(cap * n_frames)
    write_pos = 0  # position in the concatenated area stream
    for i in range(n_frames):
        start = i * cap - mdbs[i]
        if start < write_pos:
            raise ValueError("mp3: reservoir fixture would overlap")
        for p in range(write_pos, start):  # deterministic ancillary fill
            areas[p] = (p * 31 + 7) % 251
        areas[start : start + len(main_bits[i])] = main_bits[i]
        write_pos = start + len(main_bits[i])
    for p in range(write_pos, len(areas)):
        areas[p] = (p * 31 + 7) % 251

    out = bytearray()
    for i in range(n_frames):
        out += _header(bitrate_index, rate_index, 0, mode=0 if stereo else 3)
        out += sideinfos[i]
        out += areas[i * cap : (i + 1) * cap]
    return bytes(out)


def mp3_parse_deep(payload: bytes, max_frames: int = 100_000) -> list[dict]:
    """Structural Layer III decode: frame walk, side-info parse (both
    block shapes), BIT-RESERVOIR reassembly via main_data_begin, and
    scalefactor extraction, verifying part2_3_length consumes exactly
    (big_values must be 0 here — the spectral Huffman stage is the
    documented boundary, typed). Returns one dict per granule."""
    b = bytes(payload)
    pos = 0
    reservoir = bytearray()  # concatenated main-data areas so far
    out = []
    frame_no = 0
    while pos < len(b):
        if frame_no >= max_frames:
            raise ValueError("mp3: frame count exceeds bomb guard")
        if len(b) - pos < 4:
            raise ValueError("mp3: truncated frame header")
        h0, h1, h2, h3 = b[pos : pos + 4]
        if h0 != 0xFF or (h1 & 0xE0) != 0xE0:
            raise ValueError(f"mp3: lost frame sync at byte {pos}")
        if (h1 & 0x18) != 0x18 or (h1 & 0x06) != 0x02:
            raise ValueError("mp3: only MPEG-1 Layer III parses here")
        nch = 1 if (h3 >> 6) == 3 else 2
        bitrate_index, rate_index = h2 >> 4, (h2 >> 2) & 3
        if bitrate_index in (0, 15) or rate_index == 3:
            raise ValueError("mp3: invalid bitrate/rate index")
        size = _frame_size(
            V1L3_BITRATES[bitrate_index], _RATES[rate_index], (h2 >> 1) & 1
        )
        if pos + size > len(b):
            raise ValueError("mp3: truncated frame")
        si_len = 17 if nch == 1 else 32
        si = _BitReader(b[pos + 4 : pos + 4 + si_len])
        mdb = si.read(9)
        si.read(5 if nch == 1 else 3)  # private_bits
        scfsis = [si.read(4) for _ in range(nch)]
        area = b[pos + 4 + si_len : pos + size]
        data_start = len(reservoir) - mdb
        if data_start < 0:
            raise ValueError("mp3: main_data_begin reaches before stream start")
        reservoir += area
        rd = _BitReader(bytes(reservoir))
        rd.pos = data_start * 8
        g0_sfs: list[list[int] | None] = [None] * nch
        g0_short: list[bool] = [False] * nch
        for g in range(2):
            for ch in range(nch):
                part23 = si.read(12)
                big_values = si.read(9)
                if big_values:
                    raise NotImplementedError(
                        "mp3: spectral Huffman decode (Table B.7) not implemented"
                    )
                gg = si.read(8)
                sc = si.read(4)
                slen1, slen2 = SLEN[sc]
                wsf = si.read(1)
                block_type, sub_gains, tables = 0, (0, 0, 0), ()
                if wsf:
                    block_type = si.read(2)
                    mixed = si.read(1)
                    if block_type != 2 or mixed:
                        raise NotImplementedError(
                            "mp3: only normal/short block shapes parse here"
                        )
                    tables = (si.read(5), si.read(5))
                    sub_gains = (si.read(3), si.read(3), si.read(3))
                else:
                    tables = (si.read(5), si.read(5), si.read(5))
                    si.read(4)  # region0_count
                    si.read(3)  # region1_count
                preflag = si.read(1)
                sf_scale = si.read(1)
                si.read(1)  # count1table_select
                at = rd.pos
                reused = 0
                if wsf:
                    sfs = [rd.read(slen1) for _ in range(18)]
                    sfs += [rd.read(slen2) for _ in range(18)]
                else:
                    # scfsi (2.4.2.7): a set band makes granule 1 COPY
                    # granule 0's scalefactors instead of reading bits;
                    # the spec forbids reuse when either granule of the
                    # channel is short (scfsi must then be 0)
                    if scfsis[ch] and g == 1:
                        if g0_short[ch] or g0_sfs[ch] is None:
                            raise ValueError(
                                "mp3: scfsi set against a short granule"
                            )
                    sfs = []
                    for j in range(21):
                        band = next(
                            k
                            for k, (lo, hi) in enumerate(_SCFSI_BANDS)
                            if lo <= j < hi
                        )
                        if (
                            g == 1
                            and scfsis[ch]
                            and (scfsis[ch] >> (3 - band)) & 1
                        ):
                            sfs.append(g0_sfs[ch][j])
                            reused += 1
                        else:
                            sfs.append(rd.read(slen1 if j < 11 else slen2))
                if rd.pos - at != part23:
                    raise ValueError(
                        "mp3: part2_3_length does not match scalefactor bits"
                    )
                if g == 0:
                    g0_sfs[ch] = sfs if not wsf else None
                    g0_short[ch] = bool(wsf)
                out.append(
                    {
                        "frame": frame_no,
                        "granule": g,
                        "channel": ch,
                        "main_data_begin": mdb,
                        "block_type": block_type if wsf else 0,
                        "global_gain": gg,
                        "scalefac_compress": sc,
                        "preflag": preflag,
                        "scalefac_scale": sf_scale,
                        "table_select": tables,
                        "subblock_gain": sub_gains,
                        "scalefacs": sfs,
                        "scfsi": scfsis[ch],
                        "n_reused": reused,
                    }
                )
        # granule reads advance rd; main data beyond is the next
        # frame's (or ancillary) — the back-pointer finds it again
        pos += size
        frame_no += 1
        if len(reservoir) > 1 << 16:  # only the tail can be referenced
            drop = len(reservoir) - 4096
            reservoir = reservoir[drop:]
    if not out:
        raise ValueError("mp3: no frames")
    return out
