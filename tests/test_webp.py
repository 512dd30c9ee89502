"""operators/webp: the pure-Python lossless WebP (VP8L) codec (round 10,
VERDICT r9 next-round #3). Roundtrip coverage for every decoder path the
spec defines — prefix codes (simple + code-length-coded), LZ77 backrefs
(plain and close-neighborhood plane codes), color cache, meta prefix
groups, and all four transforms including palette pixel bundling — plus
structural invariants of the generated distance table and container."""

import numpy as np
import pytest

from yark_spark.operators.webp import (
    _PLANE,
    _lz77_read,
    _lz77_sym,
    decode_webp,
    encode_webp_vp8l,
)


def _expect_rgba(arr):
    a = np.asarray(arr)
    if a.ndim == 2:
        return np.stack([a, a, a, np.full_like(a, 255)], axis=-1)
    if a.shape[2] == 3:
        return np.concatenate([a, np.full(a.shape[:2] + (1,), 255, a.dtype)], axis=-1)
    return a


def _roundtrip(arr, **kw):
    out = decode_webp(encode_webp_vp8l(arr, **kw))
    exp = _expect_rgba(arr)
    assert out.shape == exp.shape
    assert (out == exp).all(), kw
    return out


RNG = np.random.default_rng(20260814)


def test_roundtrip_gray_rgb_rgba():
    _roundtrip(RNG.integers(0, 256, (16, 16), dtype=np.uint8))
    _roundtrip(RNG.integers(0, 256, (13, 17, 3), dtype=np.uint8))
    _roundtrip(RNG.integers(0, 256, (9, 9, 4), dtype=np.uint8))
    _roundtrip(np.zeros((1, 1, 4), dtype=np.uint8))  # 1x1 edge


def test_roundtrip_lz77_and_plane_codes():
    flat = np.full((20, 30, 3), 77, dtype=np.uint8)
    n_plain = len(encode_webp_vp8l(flat))
    n_plane = len(encode_webp_vp8l(flat, use_plane_codes=True))
    _roundtrip(flat)
    _roundtrip(flat, use_plane_codes=True)
    assert n_plane <= n_plain  # the 2-bit-smaller distance symbol
    # runs spanning row boundaries and capped at the 4096 LZ77 maximum
    big = np.full((70, 70, 3), 5, dtype=np.uint8)
    _roundtrip(big)


def test_roundtrip_no_lz77_pure_literals():
    _roundtrip(RNG.integers(0, 256, (8, 8, 3), dtype=np.uint8), use_lz77=False)


@pytest.mark.parametrize("mode", list(range(14)))
def test_roundtrip_all_predictor_modes(mode):
    img = RNG.integers(0, 256, (11, 13, 3), dtype=np.uint8)
    _roundtrip(img, predictor=mode)


def test_roundtrip_transforms():
    img = RNG.integers(0, 256, (12, 15, 3), dtype=np.uint8)
    _roundtrip(img, subtract_green=True)
    _roundtrip(img, color_transform=(23, -45 & 0xFF, 101))
    _roundtrip(img, subtract_green=True, predictor=11)  # ordering: last read, first inverted
    # palette: bundled widths at 2/4/16 entries, unbundled above 16
    two = np.array([[0, 255, 0, 255, 0], [255, 0, 255, 0, 255]], dtype=np.uint8)
    _roundtrip(two, palette=True)
    four = (RNG.integers(0, 4, (7, 9), dtype=np.uint8) * 80).astype(np.uint8)
    _roundtrip(four, palette=True)
    sixteen = (RNG.integers(0, 16, (6, 21), dtype=np.uint8) * 16).astype(np.uint8)
    _roundtrip(sixteen, palette=True)
    wide = RNG.integers(0, 256, (8, 8, 3), dtype=np.uint8)  # <= 64 colors
    _roundtrip(wide, palette=True)


def test_roundtrip_color_cache_and_meta_prefix():
    rep = (RNG.integers(0, 5, (20, 20, 3), dtype=np.uint8) * 50).astype(np.uint8)
    _roundtrip(rep, cache_bits=6)
    _roundtrip(rep, cache_bits=2)  # hash collisions force literal fallback
    img = RNG.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    _roundtrip(img, meta_bits=2)
    _roundtrip(rep, meta_bits=3, cache_bits=4)


def test_lossy_vp8_is_documented_boundary():
    import struct

    body = b"\x00" * 10
    chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    with pytest.raises(NotImplementedError):
        decode_webp(payload)


def test_container_and_signature_validation():
    with pytest.raises(ValueError):
        decode_webp(b"JUNKJUNKJUNKJUNK")
    p = bytearray(encode_webp_vp8l(np.zeros((2, 2), dtype=np.uint8)))
    p[20] ^= 0xFF  # corrupt inside the VP8L payload region
    # corruption must fail loudly, never return wrong pixels silently
    try:
        out = decode_webp(bytes(p))
    except (ValueError, NotImplementedError, IndexError):
        return
    assert not (out == _expect_rgba(np.zeros((2, 2), dtype=np.uint8))).all()


def test_plane_table_structure():
    """The generated close-neighborhood table: 120 unique offsets, only
    causal rows (dy >= 0; dy == 0 implies dx > 0), non-decreasing
    Euclidean distance, and the spec's documented head."""
    assert len(_PLANE) == len(set(_PLANE)) == 120
    d2 = [dx * dx + dy * dy for dx, dy in _PLANE]
    assert d2 == sorted(d2)
    for dx, dy in _PLANE:
        assert 0 <= dy <= 7 and -7 <= dx <= 8
        assert dy > 0 or dx > 0
    assert _PLANE[:8] == [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2)]


def test_lz77_prefix_value_roundtrip():
    class _FakeBR:
        def __init__(self, v):
            self.v = v

        def read(self, n):
            return self.v & ((1 << n) - 1)

    for v in list(range(1, 50)) + [777, 4096]:
        sym, eb, ev = _lz77_sym(v)
        assert 0 <= sym < 40
        assert _lz77_read(sym, _FakeBR(ev)) == v


def test_decoded_mean_matches_analytic_oracle_shape():
    """The q_image_decode_webp exactness argument in miniature: lossless
    codec => the quadrant-gray mean is exactly (3*mean(v) + 255) / 4."""
    vals = [97, 102, 55, 200]
    img = np.empty((16, 16), dtype=np.uint8)
    img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = vals
    out = decode_webp(encode_webp_vp8l(img, cache_bits=4, subtract_green=True))
    got = float(np.mean(out, dtype=np.float64))
    assert got == (3 * (sum(vals) / 4.0) + 255) / 4.0


def test_decoder_never_hangs_on_fuzzed_payloads():
    """Robustness: random bytes in a structurally valid RIFF/VP8L
    container must either raise a controlled error or decode to SOME
    array — never hang or crash the interpreter. Every decoder loop has
    a progress guarantee (pixel position, symbol count, bounded
    recursion), which this pins with 200 fuzz cases."""
    import struct

    rng = np.random.default_rng(99)
    for trial in range(200):
        body = bytes([0x2F]) + bytes(rng.integers(0, 256, rng.integers(4, 60)).tolist())
        chunk = b"VP8L" + struct.pack("<I", len(body)) + body
        if len(body) & 1:
            chunk += b"\x00"
        payload = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
        try:
            out = decode_webp(payload)
            assert out.ndim == 3  # decoded to something array-shaped
        except (ValueError, NotImplementedError, IndexError, KeyError, OverflowError):
            pass
