"""EXIF metadata codec from scratch (round 12): the JPEG APP1
segment walk (marker grammar between SOI and SOS), the Exif TIFF
structure inside it (II/MM byte orders, IFD entry tables, SHORT/
LONG/ASCII/RATIONAL types, value-vs-offset packing for ≤4-byte
values), the Exif and GPS sub-IFD pointers (tags 0x8769 / 0x8825),
GPS coordinates as degree/minute/second RATIONAL triples with
hemisphere refs — reader, writer, and a REDACTION pass, nothing
imported.

Why this is a curation operator, not a codec curiosity: crawled
images carry location PII in their GPS IFDs — publishing a training
set without stripping it leaks photographers' home addresses. The
text side of this engine already has PII detection (SURVEY §2.8
quality family); ``exif_strip`` is the image-side twin, and the
oracle key proves the two properties a redaction pass must have:
(1) after stripping, no GPS survives; (2) the PIXELS are untouched
(the stripped JPEG still decodes to the analytic quadrant mean).
Segment-level removal — drop the whole APP1 Exif block — is the
same stance as exiftool's ``-all=``: metadata is untrusted input,
so redaction removes the container rather than trusting itself to
patch structures inside it.

Parse raises typed ``ValueError`` on malformed input (bad SOI/
marker grammar, truncated segment, bad TIFF magic, IFD walks past
the payload, entry-count bomb) so the quarantine keeps corrupt rows
as rows; images WITHOUT an Exif block parse to an empty dict (absence
is data, not an error).

Oracle recipe: the fixture writes integer-exact fields derived from
the doc's md5 (orientation, GPS degrees) into real APP1 bytes; the
Spark side must re-read them through the marker + IFD grammar and
hash-match the analytic truth, with the post-strip mean-pixel
column simultaneously pinning pixel preservation. Wire vectors +
fuzz live in tests/test_exif.py.
"""

from __future__ import annotations

import struct

__all__ = ["exif_build", "exif_parse", "exif_strip", "jpeg_insert_app1"]

_TYPE_BYTE, _TYPE_ASCII, _TYPE_SHORT, _TYPE_LONG, _TYPE_RATIONAL = 1, 2, 3, 4, 5
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}

_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_DATETIME = 0x0132
_TAG_EXIF_IFD = 0x8769
_TAG_GPS_IFD = 0x8825
_GPS_LAT_REF, _GPS_LAT = 0x0001, 0x0002
_GPS_LON_REF, _GPS_LON = 0x0003, 0x0004


# ---------------------------------------------------------------------------
# TIFF-structure writer (little-endian) — enough for the Exif fixture
# ---------------------------------------------------------------------------


def _rational(v: int) -> bytes:
    return struct.pack("<II", v, 1)


def _ifd(entries: list[tuple[int, int, int, bytes]], base: int) -> tuple[bytes, bytes]:
    """Build one IFD at offset ``base`` from (tag, type, count,
    value_bytes). Values ≤ 4 bytes pack inline; larger ones append to a
    data area after the table. Returns (table, data_area)."""
    table = struct.pack("<H", len(entries))
    data = bytearray()
    data_at = base + 2 + 12 * len(entries) + 4
    for tag, typ, count, vb in sorted(entries):
        if len(vb) <= 4:
            inline = vb + b"\x00" * (4 - len(vb))
            table += struct.pack("<HHI", tag, typ, count) + inline
        else:
            table += struct.pack("<HHII", tag, typ, count, data_at + len(data))
            data += vb
    table += struct.pack("<I", 0)  # no next IFD
    return table, bytes(data)


def exif_build(
    orientation: int = 1,
    make: str = "yark",
    model: str = "spark",
    datetime: str = "2024:01:01 00:00:00",
    gps: tuple[float, float] | None = None,
) -> bytes:
    """Build an Exif APP1 payload (``Exif\\0\\0`` + little-endian TIFF)
    with IFD0 (orientation/make/model/datetime) and, when ``gps`` is
    given, a GPS sub-IFD holding (lat, lon) as whole-degree d/m/s
    rationals with hemisphere refs."""
    make_b = make.encode("ascii") + b"\x00"
    model_b = model.encode("ascii") + b"\x00"
    dt_b = datetime.encode("ascii") + b"\x00"

    # layout: header(8) | IFD0 | IFD0 data | [GPS IFD | GPS data]
    ifd0_entries = [
        (_TAG_MAKE, _TYPE_ASCII, len(make_b), make_b),
        (_TAG_MODEL, _TYPE_ASCII, len(model_b), model_b),
        (_TAG_ORIENTATION, _TYPE_SHORT, 1, struct.pack("<H", orientation)),
        (_TAG_DATETIME, _TYPE_ASCII, len(dt_b), dt_b),
    ]
    if gps is not None:
        ifd0_entries.append((_TAG_GPS_IFD, _TYPE_LONG, 1, b"\x00\x00\x00\x00"))

    # two passes: sizes depend on the GPS pointer value
    ifd0_base = 8
    table, data = _ifd(ifd0_entries, ifd0_base)
    gps_at = ifd0_base + len(table) + len(data)
    if gps is not None:
        lat, lon = gps
        lat_ref = b"N\x00" if lat >= 0 else b"S\x00"
        lon_ref = b"E\x00" if lon >= 0 else b"W\x00"
        la, lo = abs(lat), abs(lon)
        lat_dms = _rational(int(la)) + _rational(int(la * 60) % 60) + _rational(0)
        lon_dms = _rational(int(lo)) + _rational(int(lo * 60) % 60) + _rational(0)
        gps_entries = [
            (_GPS_LAT_REF, _TYPE_ASCII, 2, lat_ref),
            (_GPS_LAT, _TYPE_RATIONAL, 3, lat_dms),
            (_GPS_LON_REF, _TYPE_ASCII, 2, lon_ref),
            (_GPS_LON, _TYPE_RATIONAL, 3, lon_dms),
        ]
        gps_table, gps_data = _ifd(gps_entries, gps_at)
        ifd0_entries[-1] = (_TAG_GPS_IFD, _TYPE_LONG, 1, struct.pack("<I", gps_at))
        table, data = _ifd(ifd0_entries, ifd0_base)
    else:
        gps_table = gps_data = b""

    tiff = b"II" + struct.pack("<HI", 42, 8) + table + data + gps_table + gps_data
    return b"Exif\x00\x00" + tiff


def jpeg_insert_app1(jpeg: bytes, app1_payload: bytes) -> bytes:
    """Insert an APP1 segment immediately after SOI (where Exif
    belongs)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("exif: not a JPEG (missing SOI)")
    seg = b"\xff\xe1" + struct.pack(">H", len(app1_payload) + 2) + app1_payload
    return jpeg[:2] + seg + jpeg[2:]


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------


def _jpeg_segments(jpeg: bytes):
    """Yield (marker, payload_start, payload_len) until SOS; validates
    the marker grammar."""
    if len(jpeg) < 2 or jpeg[:2] != b"\xff\xd8":
        raise ValueError("exif: not a JPEG (missing SOI)")
    pos = 2
    n = len(jpeg)
    while pos + 4 <= n:
        if jpeg[pos] != 0xFF:
            raise ValueError("exif: broken JPEG marker grammar")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker — real camera files use them for alignment
        while pos + 4 <= n and jpeg[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > n:
            break
        marker = jpeg[pos + 1]
        if marker == 0xD9:  # EOI
            return
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:  # standalone
            pos += 2
            continue
        (seg_len,) = struct.unpack(">H", jpeg[pos + 2 : pos + 4])
        if seg_len < 2 or pos + 2 + seg_len > n:
            raise ValueError("exif: truncated JPEG segment")
        yield marker, pos, seg_len
        if marker == 0xDA:  # SOS — entropy data follows, stop walking
            return
        pos += 2 + seg_len


def _read_ifd(tiff: bytes, off: int, bo: str, max_entries: int = 512) -> dict:
    if off + 2 > len(tiff):
        raise ValueError("exif: IFD offset out of range")
    (count,) = struct.unpack_from(bo + "H", tiff, off)
    if count > max_entries:
        raise ValueError("exif: IFD entry-count bomb")
    entries = {}
    for i in range(count):
        at = off + 2 + 12 * i
        if at + 12 > len(tiff):
            raise ValueError("exif: truncated IFD entry")
        tag, typ, n = struct.unpack_from(bo + "HHI", tiff, at)
        size = _TYPE_SIZES.get(typ, 1) * n
        if size <= 4:
            raw = tiff[at + 8 : at + 8 + size]
        else:
            (voff,) = struct.unpack_from(bo + "I", tiff, at + 8)
            if voff + size > len(tiff):
                raise ValueError("exif: IFD value offset out of range")
            raw = tiff[voff : voff + size]
        entries[tag] = (typ, n, raw)
    return entries


def _value(typ: int, n: int, raw: bytes, bo: str):
    if typ == _TYPE_ASCII:
        return raw.split(b"\x00", 1)[0].decode("ascii", "replace")
    if typ == _TYPE_SHORT:
        return list(struct.unpack(bo + f"{n}H", raw[: 2 * n]))
    if typ == _TYPE_LONG:
        return list(struct.unpack(bo + f"{n}I", raw[: 4 * n]))
    if typ == _TYPE_RATIONAL:
        vals = struct.unpack(bo + f"{2 * n}I", raw[: 8 * n])
        return [(vals[2 * i], vals[2 * i + 1]) for i in range(n)]
    return raw


def exif_parse(jpeg: bytes) -> dict:
    """Extract Exif fields from a JPEG: {orientation, make, model,
    datetime, gps_lat_deg, gps_lon_deg, gps_lat_ref, gps_lon_ref} —
    only the keys present. No Exif APP1 → empty dict."""
    app1 = None
    for marker, pos, seg_len in _jpeg_segments(bytes(jpeg)):
        if marker == 0xE1:
            payload = jpeg[pos + 4 : pos + 2 + seg_len]
            if payload[:6] == b"Exif\x00\x00":
                app1 = payload[6:]
                break
    if app1 is None:
        return {}
    if app1[:2] == b"II":
        bo = "<"
    elif app1[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("exif: bad TIFF byte-order mark")
    magic, ifd0_off = struct.unpack_from(bo + "HI", app1, 2)
    if magic != 42:
        raise ValueError("exif: bad TIFF magic")
    ifd0 = _read_ifd(app1, ifd0_off, bo)
    out: dict = {}
    for tag, key in (
        (_TAG_ORIENTATION, "orientation"),
        (_TAG_MAKE, "make"),
        (_TAG_MODEL, "model"),
        (_TAG_DATETIME, "datetime"),
    ):
        if tag in ifd0:
            typ, n, raw = ifd0[tag]
            v = _value(typ, n, raw, bo)
            out[key] = v[0] if isinstance(v, list) else v
    if _TAG_GPS_IFD in ifd0:
        typ, n, raw = ifd0[_TAG_GPS_IFD]
        (gps_off,) = struct.unpack(bo + "I", raw[:4])
        gps = _read_ifd(app1, gps_off, bo)
        for ref_tag, val_tag, ref_key, deg_key in (
            (_GPS_LAT_REF, _GPS_LAT, "gps_lat_ref", "gps_lat_deg"),
            (_GPS_LON_REF, _GPS_LON, "gps_lon_ref", "gps_lon_deg"),
        ):
            if ref_tag in gps:
                typ, n, raw = gps[ref_tag]
                out[ref_key] = _value(typ, n, raw, bo)
            if val_tag in gps:
                typ, n, raw = gps[val_tag]
                dms = _value(typ, n, raw, bo)
                num, den = dms[0]
                out[deg_key] = num // den if den else 0
    return out


def exif_strip(jpeg: bytes) -> bytes:
    """Remove every APP1 Exif segment — the image-side PII redaction
    pass. Pixel/entropy data is untouched (segments are removed whole,
    the exiftool ``-all=`` stance); non-Exif APP1 (XMP) survives."""
    jpeg = bytes(jpeg)
    drops: list[tuple[int, int]] = []
    for marker, pos, seg_len in _jpeg_segments(jpeg):
        if marker == 0xE1 and jpeg[pos + 4 : pos + 10] == b"Exif\x00\x00":
            drops.append((pos, pos + 2 + seg_len))
    out = bytearray()
    last = 0
    for a, b in drops:
        out += jpeg[last:a]
        last = b
    out += jpeg[last:]
    return bytes(out)
