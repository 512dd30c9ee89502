"""QOI codec tests (round 12): spec-derived wire vectors (built
byte-by-byte from the qoiformat.org layout, no encoder involvement),
every op's decode path, wraparound arithmetic, run/index semantics,
corruption/truncation typed errors, bomb guard, roundtrip fuzz, and
cross-codec pixel equality against the in-repo PNG codec."""

import struct

import numpy as np
import pytest

from yark_spark.operators.qoi import decode_qoi, encode_qoi

END = b"\x00" * 7 + b"\x01"


def _header(w, h, ch=3, cs=0):
    return b"qoif" + struct.pack(">IIBB", w, h, ch, cs)


# ---------------------------------------------------------------------------
# Hand-built wire vectors
# ---------------------------------------------------------------------------


def test_hand_vector_rgb_literal():
    wire = _header(1, 1) + bytes([0xFE, 10, 20, 30]) + END
    assert np.array_equal(decode_qoi(wire), [[[10, 20, 30]]])


def test_hand_vector_rgba_literal():
    wire = _header(1, 1, ch=4) + bytes([0xFF, 10, 20, 30, 40]) + END
    assert np.array_equal(decode_qoi(wire), [[[10, 20, 30, 40]]])


def test_hand_vector_diff_wraparound():
    # start pixel is (0,0,0,255); DIFF dr=-1 wraps to 255
    wire = _header(1, 1) + bytes([0x40 | (1 << 4) | (2 << 2) | 2]) + END
    assert np.array_equal(decode_qoi(wire), [[[255, 0, 0]]])


def test_hand_vector_luma():
    # dg=+31, dr-dg=+7, db-dg=-8 → r=38, g=31, b=23
    wire = _header(1, 1) + bytes([0x80 | (31 + 32), ((7 + 8) << 4) | 0]) + END
    assert np.array_equal(decode_qoi(wire), [[[38, 31, 23]]])


def test_hand_vector_run_repeats_previous():
    # RGB(5,6,7) then RUN of 3 → 4 identical pixels
    wire = _header(4, 1) + bytes([0xFE, 5, 6, 7, 0xC0 | 2]) + END
    img = decode_qoi(wire)
    assert img.shape == (1, 4, 3)
    assert np.array_equal(img, np.tile([5, 6, 7], (1, 4, 1)))


def test_hand_vector_index_recall():
    # pixel A, pixel B, INDEX back to A
    a, b = (5, 6, 7), (100, 101, 102)
    ia = (5 * 3 + 6 * 5 + 7 * 7 + 255 * 11) % 64
    wire = (
        _header(3, 1)
        + bytes([0xFE, *a, 0xFE, *b, 0x00 | ia])
        + END
    )
    img = decode_qoi(wire)
    assert tuple(img[0, 0]) == a and tuple(img[0, 1]) == b and tuple(img[0, 2]) == a


def test_hand_vector_index_zero_initialized():
    # INDEX op before any pixel → the zero entry (0,0,0,0)
    wire = _header(1, 1, ch=4) + bytes([0x00]) + END
    assert np.array_equal(decode_qoi(wire), [[[0, 0, 0, 0]]])


# ---------------------------------------------------------------------------
# Errors
# ---------------------------------------------------------------------------


def test_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        decode_qoi(b"qoix" + _header(1, 1)[4:] + bytes([0xFE, 1, 2, 3]) + END)


def test_bad_channels_and_colorspace():
    with pytest.raises(ValueError, match="channels"):
        decode_qoi(b"qoif" + struct.pack(">IIBB", 1, 1, 2, 0) + b"\x00" * 12)
    with pytest.raises(ValueError, match="colorspace"):
        decode_qoi(b"qoif" + struct.pack(">IIBB", 1, 1, 3, 7) + b"\x00" * 12)


def test_truncation_and_missing_end_marker():
    good = encode_qoi(np.full((4, 4, 3), 9, dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_qoi(good[:-1])
    bad = bytearray(good)
    bad[-1] = 0x02
    with pytest.raises(ValueError, match="end marker"):
        decode_qoi(bytes(bad))


def test_run_overflow_rejected():
    # 1x1 image but a RUN of 2
    wire = _header(1, 1) + bytes([0xFE, 1, 2, 3, 0xC0 | 1]) + END
    with pytest.raises(ValueError, match="run overflows|end marker"):
        decode_qoi(wire)


def test_bomb_guard():
    wire = _header(1 << 16, 1 << 16) + END
    with pytest.raises(ValueError, match="bomb"):
        decode_qoi(wire)


def test_zero_dimension_rejected():
    with pytest.raises(ValueError, match="zero"):
        decode_qoi(_header(0, 5) + END)


# ---------------------------------------------------------------------------
# Roundtrip
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(1, 1, 3), (16, 16, 3), (7, 13, 4), (16, 16)])
def test_roundtrip_shapes(shape):
    rng = np.random.RandomState(11)
    a = rng.randint(0, 256, size=shape).astype(np.uint8)
    ref = a if a.ndim == 3 else np.repeat(a[:, :, None], 3, axis=2)
    assert np.array_equal(decode_qoi(encode_qoi(a)), ref)


def test_roundtrip_long_runs():
    a = np.full((100, 100, 3), 42, dtype=np.uint8)  # run >> 62
    assert np.array_equal(decode_qoi(encode_qoi(a)), a)


def test_roundtrip_alpha_transitions():
    rng = np.random.RandomState(12)
    a = rng.randint(0, 256, size=(9, 9, 4)).astype(np.uint8)
    assert np.array_equal(decode_qoi(encode_qoi(a)), a)


def test_roundtrip_fuzz():
    rng = np.random.RandomState(13)
    for _ in range(40):
        h, w = rng.randint(1, 24), rng.randint(1, 24)
        ch = rng.choice([3, 4])
        # low-cardinality palettes exercise INDEX/RUN; full-range the literals
        alpha = rng.choice([4, 256])
        a = (rng.randint(0, alpha, size=(h, w, ch)) * (256 // alpha)).astype(np.uint8)
        assert np.array_equal(decode_qoi(encode_qoi(a)), a)


def test_encoder_compresses_flat_image():
    a = np.zeros((64, 64, 3), dtype=np.uint8)
    assert len(encode_qoi(a)) < 120  # 4096 px collapse into runs


def test_cross_codec_pixel_equality_with_png():
    """The same image through QOI and the in-repo PNG codec must decode
    to identical pixels — two independent lossless stacks agreeing."""
    from yark_spark.operators.png import decode_png, encode_png

    rng = np.random.RandomState(14)
    a = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    assert np.array_equal(decode_qoi(encode_qoi(a)), decode_png(encode_png(a)))


def test_dispatch_through_decode_image():
    from yark_spark.operators.multimodal import decode_image

    a = np.full((8, 8, 3), 33, dtype=np.uint8)
    assert np.array_equal(decode_image(encode_qoi(a)), a)
