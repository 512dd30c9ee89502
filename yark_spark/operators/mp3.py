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


def _header(bitrate_index: int, rate_index: int, padding: int = 0) -> bytes:
    # sync(11)=all ones | version(2)=11 (MPEG1) | layer(2)=01 (III) |
    # protection(1)=1 (none) ; then bitrate(4) rate(2) padding(1)
    # private(1) ; then mode(2)=11 mono + zeros
    b0 = 0xFF
    b1 = 0xFB  # 1111 1 011: sync tail, MPEG1, Layer III, no CRC
    b2 = (bitrate_index << 4) | (rate_index << 2) | (padding << 1)
    b3 = 0xC0  # mono
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
