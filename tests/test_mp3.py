"""MP3 frame-header scan tests (round 12): header field layout,
bitrate/rate tables, frame-size math, ID3v2 syncsafe skip, ID3v1
parse, VBR detection, typed errors."""

import pytest

from yark_spark.operators.mp3 import V1L3_BITRATES, mp3_build, mp3_scan


def test_cbr_scan():
    m = mp3_scan(mp3_build(25, bitrate_index=9, rate_index=2, title="doc 42"))
    assert m == {
        "n_frames": 25, "bitrate_kbps": 128, "cbr": True,
        "sample_rate": 32000, "n_samples": 28800, "duration_ms": 900,
        "id3_title": "doc 42",
    }


def test_frame_size_math():
    # 144 * 128000 / 32000 = 576 bytes per frame; ID3v2 = 10 + 37
    blob = mp3_build(25, bitrate_index=9, rate_index=2)
    assert len(blob) == 47 + 25 * 576 + 128


def test_header_wire_layout():
    blob = mp3_build(1, bitrate_index=9, rate_index=2, with_id3v2=False)
    assert blob[0] == 0xFF and blob[1] == 0xFB  # sync + MPEG1 Layer III
    assert blob[2] >> 4 == 9 and (blob[2] >> 2) & 3 == 2


def test_bitrate_table():
    assert V1L3_BITRATES[5] == 64 and V1L3_BITRATES[9] == 128
    assert V1L3_BITRATES[11] == 192 and V1L3_BITRATES[14] == 320


def test_vbr_detected():
    m = mp3_scan(mp3_build(10, vbr_indices=(5, 9, 12)))
    assert m["cbr"] is False and m["bitrate_kbps"] is None
    assert m["n_frames"] == 10 and m["duration_ms"] == 360


def test_rates_and_no_id3():
    m = mp3_scan(mp3_build(4, rate_index=0, with_id3v2=False))
    assert m["sample_rate"] == 44100
    assert m["duration_ms"] == (4 * 1152 * 1000) // 44100
    assert m["id3_title"] is not None  # ID3v1 trailer still present


def test_errors():
    with pytest.raises(ValueError, match="sync"):
        mp3_scan(b"\x00" * 64)
    with pytest.raises(ValueError, match="truncated final"):
        mp3_scan(mp3_build(5, with_id3v2=False)[:-200])
    blob = bytearray(mp3_build(2, with_id3v2=False))
    blob[2] = 0xF0 | (blob[2] & 0x0F)  # bitrate index 15
    with pytest.raises(ValueError, match="bitrate"):
        mp3_scan(bytes(blob))
    bad_id3 = b"ID3\x03\x00\x00" + bytes((0, 0, 0, 120)) + b"\x00" * 10
    with pytest.raises(ValueError, match="exceeds payload"):
        mp3_scan(bad_id3)
    with pytest.raises(ValueError, match="syncsafe"):
        mp3_scan(b"ID3\x03\x00\x00" + bytes((0, 0, 0, 0x80)) + b"\x00" * 10)
    with pytest.raises(ValueError, match="bomb"):
        mp3_scan(mp3_build(10, with_id3v2=False), max_frames=5)
    with pytest.raises(ValueError, match="no audio frames"):
        mp3_scan(mp3_build(0, with_id3v2=False))
