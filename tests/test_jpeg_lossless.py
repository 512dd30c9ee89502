"""operators/jpeg lossless mode (T.81 Annex H, SOF3 — round 11):
roundtrip matrix over all seven predictors / shapes / precisions, the
mod-2^16 SSSS=16 special case, point-transform semantics, and container
validation. Sparkless (pure numpy kernels; the Spark plumbing is pinned
by q_image_decode_jpeg_lossless's oracle row)."""

import numpy as np
import pytest

from yark_spark.operators.jpeg import decode_jpeg, encode_jpeg_lossless

_RNG = np.random.RandomState(11)


@pytest.mark.parametrize("pred", range(1, 8))
def test_roundtrip_all_predictors_gray_and_rgb(pred):
    g = _RNG.randint(0, 256, size=(16, 16)).astype(np.uint8)
    assert (decode_jpeg(encode_jpeg_lossless(g, predictor=pred)) == g).all()
    c = _RNG.randint(0, 256, size=(7, 5, 3)).astype(np.uint8)
    got = decode_jpeg(encode_jpeg_lossless(c, predictor=pred))
    assert got.shape == c.shape and (got == c).all()


def test_roundtrip_16bit_and_extreme_diffs():
    g16 = _RNG.randint(0, 65536, size=(9, 4)).astype(np.uint16)
    got = decode_jpeg(encode_jpeg_lossless(g16, predictor=4))
    assert got.dtype == np.uint16 and (got == g16).all()
    # alternating extremes force the mod-2^16 wrap and the SSSS=16
    # (difference == 32768, no appended bits) special case
    z = np.zeros((4, 4), dtype=np.uint16)
    z[::2, ::2] = 65535
    for pred in (1, 2, 4, 7):
        assert (decode_jpeg(encode_jpeg_lossless(z, predictor=pred)) == z).all()
    w = np.full((3, 3), 32768, dtype=np.uint16)
    w[0, 0] = 0
    assert (decode_jpeg(encode_jpeg_lossless(w, predictor=1)) == w).all()


def test_point_transform_is_the_only_lossy_knob():
    g = _RNG.randint(0, 256, size=(8, 8)).astype(np.uint8)
    got = decode_jpeg(encode_jpeg_lossless(g, predictor=7, point_transform=2))
    assert (got == ((g.astype(np.int64) >> 2) << 2)).all()


@pytest.mark.parametrize("shape", [(1, 1), (1, 7), (6, 1), (2, 2, 3)])
def test_degenerate_shapes(shape):
    im = _RNG.randint(0, 256, size=shape).astype(np.uint8)
    assert (decode_jpeg(encode_jpeg_lossless(im, predictor=5)) == im).all()


def test_validation():
    g = _RNG.randint(0, 256, size=(4, 4)).astype(np.uint8)
    with pytest.raises(ValueError, match="predictor"):
        encode_jpeg_lossless(g, predictor=0)
    with pytest.raises(ValueError, match="point transform"):
        encode_jpeg_lossless(g, point_transform=8)
    with pytest.raises(ValueError):
        encode_jpeg_lossless(g.astype(np.int32))
    with pytest.raises(ValueError):
        encode_jpeg_lossless(_RNG.randint(0, 65536, size=(2, 2, 3)).astype(np.uint16))


def test_quadrant_fixture_matches_analytic_oracle_shape():
    """The q_image_decode_jpeg_lossless exactness argument: identical
    pixels under every predictor, mean exactly (a+b+c+d)/4."""
    import hashlib

    vals = [ord(c) for c in hashlib.md5(b"some doc").hexdigest()[:4]]
    img = np.empty((16, 16), dtype=np.uint8)
    img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = vals
    for pred in range(1, 8):
        got = decode_jpeg(encode_jpeg_lossless(img, predictor=pred))
        assert (got == img).all()
        assert float(got.mean()) == sum(vals) / 4.0


@pytest.mark.parametrize("restart_rows", [1, 3, 16])
def test_lossless_restart_intervals_roundtrip(restart_rows):
    """Row-aligned DRI/RSTn in lossless scans (r11 boundary removal):
    bit-exact roundtrip, and each restart segment re-predicts from a
    fresh first line (pre-restart samples never feed the prediction)."""
    rng = np.random.default_rng(restart_rows)
    img = rng.integers(0, 256, size=(16, 7), dtype=np.uint8)
    payload = encode_jpeg_lossless(img, predictor=4, restart_rows=restart_rows)
    assert b"\xff\xdd" in payload  # DRI present
    assert np.array_equal(decode_jpeg(payload), img)


def test_lossless_restart_rgb_and_16bit():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, size=(9, 5, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_lossless(rgb, predictor=7, restart_rows=2)), rgb
    )
    deep = rng.integers(0, 1 << 16, size=(8, 4), dtype=np.uint16)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_lossless(deep, predictor=1, restart_rows=4)), deep
    )


def test_lossless_restart_segment_independence():
    """Corrupting bytes in the LAST restart segment must not change the
    first segment's decode (the whole point of restart markers)."""
    img = np.arange(64, dtype=np.uint8).reshape(8, 8) * 3
    payload = bytearray(encode_jpeg_lossless(img, restart_rows=4))
    rst = payload.rindex(b"\xff\xd0")
    good_top = decode_jpeg(bytes(payload))[:4]
    for flip in range(rst + 2, min(rst + 6, len(payload) - 2)):
        p = bytearray(payload)
        p[flip] ^= 0x55
        try:
            out = decode_jpeg(bytes(p))
        except (ValueError, EOFError):
            continue  # typed failure is fine
        assert np.array_equal(out[:4], good_top)


def test_lossless_restart_dri_range_check():
    img = np.zeros((4, 40000), dtype=np.uint8)
    with pytest.raises(ValueError, match="DRI"):
        encode_jpeg_lossless(img, restart_rows=2)
