"""EXIF codec tests (round 12): IFD wire layout (inline vs offset
values, both byte orders), the JPEG marker walk, GPS d/m/s rationals
with hemisphere refs, strip semantics (byte-exact segment removal,
XMP APP1 survival, pixel preservation), typed errors, and fuzz."""

import struct

import numpy as np
import pytest

from yark_spark.operators.exif import (
    exif_build,
    exif_parse,
    exif_strip,
    jpeg_insert_app1,
)
from yark_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _jpeg(v=99):
    return encode_jpeg(np.full((16, 16), v, dtype=np.uint8), quality=100)


def _with_exif(gps=(37.0, -122.0), orientation=6, **kw):
    return jpeg_insert_app1(_jpeg(), exif_build(orientation=orientation, gps=gps, **kw))


# ---------------------------------------------------------------------------
# Parse
# ---------------------------------------------------------------------------


def test_parse_full_fields():
    meta = exif_parse(_with_exif(datetime="2024:05:06 07:08:09"))
    assert meta["orientation"] == 6
    assert meta["make"] == "yark" and meta["model"] == "spark"
    assert meta["datetime"] == "2024:05:06 07:08:09"
    assert (meta["gps_lat_deg"], meta["gps_lat_ref"]) == (37, "N")
    assert (meta["gps_lon_deg"], meta["gps_lon_ref"]) == (122, "W")


def test_hemisphere_refs():
    meta = exif_parse(_with_exif(gps=(-10.0, 20.0)))
    assert meta["gps_lat_ref"] == "S" and meta["gps_lon_ref"] == "E"


def test_no_gps_ifd():
    meta = exif_parse(_with_exif(gps=None))
    assert meta["orientation"] == 6
    assert "gps_lat_deg" not in meta


def test_no_exif_is_empty_not_error():
    assert exif_parse(_jpeg()) == {}


def test_big_endian_tiff_parses():
    """A hand-built MM (big-endian) Exif block — the writer emits II,
    so this pins the reader's independent byte-order path."""
    # MM header, IFD0 at 8, one entry: orientation SHORT 1 value 8
    ifd = struct.pack(">H", 1)
    ifd += struct.pack(">HHI", 0x0112, 3, 1) + struct.pack(">H", 8) + b"\x00\x00"
    ifd += struct.pack(">I", 0)
    tiff = b"MM" + struct.pack(">HI", 42, 8) + ifd
    jj = jpeg_insert_app1(_jpeg(), b"Exif\x00\x00" + tiff)
    assert exif_parse(jj) == {"orientation": 8}


def test_inline_vs_offset_values():
    # 'make' strings > 4 bytes go through the offset path, orientation
    # through the inline path — both already exercised; pin a SHORT
    # make that fits inline
    jj = jpeg_insert_app1(_jpeg(), exif_build(make="ab", gps=None))
    assert exif_parse(jj)["make"] == "ab"


# ---------------------------------------------------------------------------
# Strip
# ---------------------------------------------------------------------------


def test_strip_removes_exif_byte_exactly():
    base = _jpeg()
    jj = jpeg_insert_app1(base, exif_build(gps=(1.0, 2.0)))
    stripped = exif_strip(jj)
    assert exif_parse(stripped) == {}
    assert stripped == base  # segment removal restores the original


def test_strip_preserves_pixels():
    jj = _with_exif()
    assert np.array_equal(decode_jpeg(exif_strip(jj)), decode_jpeg(_jpeg()))


def test_strip_keeps_non_exif_app1():
    # an XMP APP1 (not Exif-prefixed) must survive the redaction
    base = _jpeg()
    xmp = b"http://ns.adobe.com/xap/1.0/\x00<x:xmpmeta/>"
    jj = jpeg_insert_app1(jpeg_insert_app1(base, exif_build()), xmp)
    stripped = exif_strip(jj)
    assert xmp in stripped
    assert exif_parse(stripped) == {}


def test_strip_noop_without_exif():
    assert exif_strip(_jpeg()) == _jpeg()


# ---------------------------------------------------------------------------
# Errors
# ---------------------------------------------------------------------------


def test_errors():
    with pytest.raises(ValueError, match="SOI"):
        exif_parse(b"nota jpeg")
    jj = bytearray(_with_exif())
    # corrupt the TIFF byte-order mark
    pos = bytes(jj).find(b"Exif\x00\x00") + 6
    jj[pos : pos + 2] = b"XX"
    with pytest.raises(ValueError, match="byte-order"):
        exif_parse(bytes(jj))
    # truncated segment: declared length beyond buffer
    jj = bytearray(_with_exif())
    pos = bytes(jj).find(b"\xff\xe1") + 2
    struct.pack_into(">H", jj, pos, 0xFFFF)
    with pytest.raises(ValueError, match="truncated"):
        exif_parse(bytes(jj))


def test_entry_count_bomb():
    ifd = struct.pack("<H", 60000)  # absurd entry count
    tiff = b"II" + struct.pack("<HI", 42, 8) + ifd
    jj = jpeg_insert_app1(_jpeg(), b"Exif\x00\x00" + tiff)
    with pytest.raises(ValueError, match="bomb"):
        exif_parse(jj)


def test_fuzz_gps_degrees():
    for lat, lon in [(0.0, 0.0), (89.0, 179.0), (-89.0, -179.0), (45.5, -0.5)]:
        meta = exif_parse(_with_exif(gps=(lat, lon)))
        assert meta["gps_lat_deg"] == int(abs(lat))
        assert meta["gps_lon_deg"] == int(abs(lon))


def test_fill_bytes_before_marker_tolerated():
    """Review finding: T.81 B.1.1.2 allows 0xFF fill bytes before any
    marker; real camera JPEGs use them, and the PII strip must not
    push those files to quarantine unredacted."""
    jj = _with_exif()
    pos = jj.find(b"\xff\xe1")
    padded = jj[:pos] + b"\xff" + jj[pos:]  # one fill byte before APP1
    assert exif_parse(padded)["orientation"] == 6
    stripped = exif_strip(padded)
    assert exif_parse(stripped) == {}
