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


# ---------------------------------------------------------------------------
# Round-13: Layer III structural decode (side info / reservoir /
# scalefactors)
# ---------------------------------------------------------------------------


def test_deep_roundtrip_all_fields():
    from yark_spark.operators.mp3 import (
        _granule_fields,
        mp3_build_deep,
        mp3_parse_deep,
    )

    for a, b, c, d in [(97, 98, 99, 100), (48, 102, 57, 101), (0, 0, 0, 0)]:
        rows = mp3_parse_deep(mp3_build_deep(a, b, c, d))
        assert len(rows) == (6 + a % 6) * 2
        for r in rows:
            f = _granule_fields(a, b, c, d, r["frame"], r["granule"])
            assert r["global_gain"] == f["global_gain"]
            assert r["scalefac_compress"] == f["scalefac_compress"]
            assert r["block_type"] == (2 if f["short"] else 0)
            assert r["preflag"] == f["preflag"]
            assert r["scalefac_scale"] == f["scalefac_scale"]
            if f["short"]:
                assert r["subblock_gain"] == f["subblock_gain"]
                assert r["table_select"] == f["table_select"][:2]
                n1, n2, hi = 18, 36, True
            else:
                assert r["table_select"] == f["table_select"]
                n1, n2, hi = 11, 21, False
            exp = [f["sf_value"](j, f["slen1"]) for j in range(n1)]
            exp += [f["sf_value"](j, f["slen2"]) for j in range(n1, n2)]
            assert r["scalefacs"] == exp


def test_deep_reservoir_pointers_are_live():
    from yark_spark.operators.mp3 import mp3_build_deep, mp3_parse_deep

    rows = mp3_parse_deep(mp3_build_deep(101, 55, 16, 77))
    mdbs = [r["main_data_begin"] for r in rows if r["granule"] == 0]
    assert mdbs[0] == 0
    # nearly every later frame reads back into earlier areas
    assert sum(1 for m in mdbs[1:] if m > 0) >= len(mdbs) - 2
    assert all(m == (101 + 7 * i) % 120 for i, m in enumerate(mdbs) if i)


def test_deep_typed_boundaries():
    from yark_spark.operators.mp3 import mp3_build_deep, mp3_parse_deep

    blob = bytearray(mp3_build_deep(97, 98, 99, 100))
    # big_values != 0: flip a bit inside granule 0's big_values field
    # (side info starts at byte 4; big_values bits 18..26 of side info)
    tampered = bytearray(blob)
    tampered[4 + 3] ^= 0x02  # a bit inside big_values
    with pytest.raises(NotImplementedError, match="Huffman"):
        mp3_parse_deep(bytes(tampered))
    # a mono stream relabelled stereo misparses loudly (the 32-byte
    # side-info layout doesn't fit mono bytes), never silently
    tampered = bytearray(blob)
    tampered[3] = 0x00  # mode 00 = stereo
    with pytest.raises((ValueError, NotImplementedError)):
        mp3_parse_deep(bytes(tampered))
    # scfsi bit flipped on a stream whose granule 1 did NOT shorten its
    # scalefactor run: the reduced-read expectation breaks part2
    tampered = bytearray(blob)
    tampered[4 + 1] ^= 0x01  # lowest bit of scfsi nibble
    with pytest.raises(ValueError, match="part2|scfsi|short"):
        mp3_parse_deep(bytes(tampered))
    # main_data_begin reaching before the stream start: force frame 0
    tampered = bytearray(blob)
    tampered[4] = 0xFF  # top bits of mdb
    with pytest.raises(ValueError, match="before stream start"):
        mp3_parse_deep(bytes(tampered))


def test_deep_part23_mismatch_is_typed():
    from yark_spark.operators.mp3 import mp3_build_deep, mp3_parse_deep

    blob = bytearray(mp3_build_deep(97, 98, 99, 100))
    # part2_3_length occupies side-info bits 18..29 (after mdb 9,
    # private 5, scfsi 4); bump its low bit -> scalefactor bit count
    # no longer matches
    si0 = 4
    bit = 18 + 11  # low bit of part2_3_length, bit offset in side info
    tampered = bytearray(blob)
    tampered[si0 + bit // 8] ^= 1 << (7 - bit % 8)
    with pytest.raises(ValueError, match="part2_3_length"):
        mp3_parse_deep(bytes(tampered))


def test_stereo_scfsi_reuse_roundtrip():
    """Stereo layout + scfsi: reused granule-1 bands carry granule 0's
    VALUES (at granule-0 slen widths) and part2_3_length shrinks by
    exactly the skipped bits — verified against the fixture arithmetic
    across code combinations."""
    import itertools

    from yark_spark.operators.mp3 import (
        _SCFSI_BANDS,
        _stereo_granule_fields,
        mp3_build_deep,
        mp3_parse_deep,
    )

    total_reused = 0
    for a, b, c, d in itertools.product([97, 102], [98, 48], [99], [100, 52]):
        rows = mp3_parse_deep(mp3_build_deep(a, b, c, d, stereo=True))
        n_frames = 6 + a % 6
        assert len(rows) == n_frames * 2 * 2
        for r in rows:
            i, g, ch = r["frame"], r["granule"], r["channel"]
            f = _stereo_granule_fields(a, b, c, d, i, g, ch)
            assert r["global_gain"] == f["global_gain"]
            assert (r["block_type"] == 2) == f["short"]
            total_reused += r["n_reused"]
            if f["short"]:
                continue
            f0 = _stereo_granule_fields(a, b, c, d, i, 0, ch)
            sv = r["scfsi"]
            for j, got in enumerate(r["scalefacs"]):
                band = next(
                    k for k, (lo, hi) in enumerate(_SCFSI_BANDS) if lo <= j < hi
                )
                if g == 1 and sv and (sv >> (3 - band)) & 1:
                    slen = f0["slen1"] if j < 11 else f0["slen2"]
                    assert got == f0["sf_value"](j, slen), (i, g, ch, j)
                else:
                    slen = f["slen1"] if j < 11 else f["slen2"]
                    assert got == f["sf_value"](j, slen), (i, g, ch, j)
    assert total_reused > 0  # the fixture really exercises reuse
