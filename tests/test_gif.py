"""GIF codec tests (round 11): hand-pinned LZW vectors, roundtrips
across the variable-width/table-full boundaries, interlace, GCE
transparency, sub-block splitting, and truncation fuzz."""

import numpy as np
import pytest

from yark_spark.operators.gif import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
    lzw_decode,
    lzw_encode,
)


# ---------------------------------------------------------------------------
# LZW core
# ---------------------------------------------------------------------------


def test_lzw_hand_pinned_vector():
    # indices [1,1,1,1] at mcs=2: clear=4 eoi=5; hand-derived code
    # sequence 4,1,6,1 at width 3 then EOI(5) at width 4 (the decoder's
    # table reaches 8 entries after the last data code). LSB-first
    # packing: bits 001 100 011 100 1010 -> bytes 0x8C 0x53.
    enc = lzw_encode(np.array([1, 1, 1, 1], dtype=np.uint8), 2)
    assert enc == bytes([0x8C, 0x53])
    assert lzw_decode(enc, 2, 4).tolist() == [1, 1, 1, 1]


def test_lzw_kwkwk_case():
    # the classic KwKwK stream: 'ababab...' forces code==next_code
    idx = np.array([0, 1, 0, 1, 0, 1, 0], dtype=np.uint8)
    assert lzw_decode(lzw_encode(idx, 2), 2, len(idx)).tolist() == idx.tolist()


@pytest.mark.parametrize("mcs", [2, 4, 8])
def test_lzw_roundtrip_random(mcs):
    rng = np.random.default_rng(mcs)
    idx = rng.integers(0, 1 << mcs, size=20_000, dtype=np.uint8)
    assert np.array_equal(lzw_decode(lzw_encode(idx, mcs), mcs, len(idx)), idx)


def test_lzw_table_full_clear_reset():
    # random 256-symbol data fills the 12-bit table fast; 60k symbols
    # guarantees at least one mid-stream CLEAR + re-grow cycle
    rng = np.random.default_rng(7)
    idx = rng.integers(0, 256, size=60_000, dtype=np.uint8)
    enc = lzw_encode(idx, 8)
    assert np.array_equal(lzw_decode(enc, 8, len(idx)), idx)


def test_lzw_rejects_out_of_range_code():
    # code 7 with next_code==6 is invalid at mcs=2
    # stream: clear(4), 7 -> bits 001 111 -> byte 0b00111100
    with pytest.raises(ValueError, match="out of range"):
        lzw_decode(bytes([0b00111100]), 2, 4)


def test_lzw_truncated_stream():
    with pytest.raises(ValueError, match="truncated"):
        lzw_decode(b"\x8c", 2, 4)


# ---------------------------------------------------------------------------
# Container roundtrips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("shape", [(1, 1), (5, 3), (16, 16), (33, 7)])
def test_gif_roundtrip_gray(shape, interlace):
    rng = np.random.default_rng(shape[0] * 100 + shape[1])
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_gif(encode_gif(img, interlace=interlace))
    assert out.shape == (*shape, 3)
    assert np.array_equal(out, np.repeat(img[:, :, None], 3, axis=2))


@pytest.mark.parametrize("n_colors", [2, 4, 17, 256])
def test_gif_roundtrip_rgb_palette_sizes(n_colors):
    rng = np.random.default_rng(n_colors)
    pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, size=(24, 31))
    img = pal[idx]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_gif_interlace_matches_sequential():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(37, 11, 3), dtype=np.uint8)
    img = (img // 64) * 64  # 4^3 = 64 possible colors, under the palette cap
    a = decode_gif(encode_gif(img, interlace=False))
    b = decode_gif(encode_gif(img, interlace=True))
    assert np.array_equal(a, b)


def test_gif_transparency_rgba():
    img = np.array([[0, 255], [128, 0]], dtype=np.uint8)
    payload = encode_gif(img, transparent=0)  # palette sorted: 0 first
    assert payload[:6] == b"GIF89a"
    out = decode_gif(payload)
    assert out.shape == (2, 2, 4)
    assert out[0, 0, 3] == 0 and out[0, 1, 3] == 255
    frames = decode_gif_frames(payload)
    assert frames[0]["transparent"] == 0


def test_gif_version_87a_without_gce():
    assert encode_gif(np.zeros((2, 2), dtype=np.uint8))[:6] == b"GIF87a"


def test_gif_subblock_splitting():
    # >255 bytes of LZW stream forces multiple data sub-blocks
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    payload = encode_gif(img)
    assert np.array_equal(decode_gif(payload)[:, :, 0], img)


def test_gif_skips_comment_and_application_extensions():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4) * 16
    payload = bytearray(encode_gif(img, force_89a=True))
    # splice a comment and an application extension before the image
    # descriptor (first 0x2C after header + GCT, sized from the packed byte)
    at = payload.index(0x2C, 13 + 3 * (2 << (payload[10] & 0x07)))
    ext = bytes([0x21, 0xFE, 5]) + b"hello" + b"\x00"
    ext += bytes([0x21, 0xFF, 11]) + b"NETSCAPE2.0" + bytes([3, 1, 0, 0, 0])
    payload[at:at] = ext
    assert np.array_equal(decode_gif(bytes(payload))[:, :, 0], img)


def test_gif_multiframe_returns_first():
    a = encode_gif(np.full((3, 3), 10, dtype=np.uint8))
    b = encode_gif(np.full((3, 3), 200, dtype=np.uint8))
    # concatenate frame blocks: a minus trailer, b from its image descriptor
    bi = b.index(0x2C, 13 + 3 * (2 << (b[10] & 0x07)))
    two = a[:-1] + b[bi:]
    frames = decode_gif_frames(two)
    assert len(frames) == 2
    assert decode_gif(two)[0, 0, 0] == 10


def test_gif_truncation_fuzz():
    payload = encode_gif(np.arange(64, dtype=np.uint8).reshape(8, 8) * 4)
    for cut in range(1, len(payload) - 1, 7):
        with pytest.raises(ValueError):
            decode_gif(payload[:cut])


def test_gif_corruption_fuzz_no_crash():
    rng = np.random.default_rng(5)
    base = bytearray(encode_gif(rng.integers(0, 256, size=(12, 12), dtype=np.uint8)))
    for trial in range(40):
        p = bytearray(base)
        for _ in range(3):
            p[rng.integers(6, len(p))] = rng.integers(0, 256)
        try:
            decode_gif(bytes(p))
        except ValueError:
            pass  # typed rejection is the contract; crashes are not


def test_gif_rejects_non_gif():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"\x89PNG\r\n\x1a\nxxxx")


def test_encode_rejects_too_many_colors():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="distinct colors"):
        encode_gif(img)


def test_lzw_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=255), min_size=1, max_size=800))
    def run(vals):
        idx = np.array(vals, dtype=np.uint8)
        assert np.array_equal(lzw_decode(lzw_encode(idx, 8), 8, len(idx)), idx)

    run()


# ---------------------------------------------------------------------------
# Round 12: disposal compositing + multi-frame encoder
# ---------------------------------------------------------------------------


def test_compose_disposal_methods_hand_checked():
    """Disposal 1 (keep), 3 (restore previous), 2 (restore background):
    four frames over a 4x4 screen with hand-computed canvases."""
    from yark_spark.operators.gif import compose_gif_frames, encode_gif_anim

    f0 = np.full((4, 4), 10, np.uint8)
    f1 = np.full((2, 2), 200, np.uint8)
    f2 = np.full((4, 4), 30, np.uint8)
    f3 = np.full((2, 2), 99, np.uint8)
    payload = encode_gif_anim(
        [f0, f1, f2, f3],
        rects=[(0, 0), (2, 2), (0, 0), (0, 0)],
        disposals=[1, 3, 2, 0],
        delays=[10, 20, 30, 40],
    )
    out = compose_gif_frames(payload)
    assert (out[0]["rgb"][:, :, 0] == 10).all()
    exp1 = np.full((4, 4), 10)
    exp1[2:, 2:] = 200
    assert (out[1]["rgb"][:, :, 0] == exp1).all()
    # f1's disposal 3 reverts its paint before f2 draws
    assert (out[2]["rgb"][:, :, 0] == 30).all()
    # f2's disposal 2 clears the full region to transparent
    exp3 = np.zeros((4, 4))
    exp3[:2, :2] = 99
    assert (out[3]["rgb"][:, :, 0] == exp3).all()
    assert (out[3]["alpha"][:2, :2] == 255).all()
    assert (out[3]["alpha"][2:, 2:] == 0).all()
    assert [o["delay_cs"] for o in out] == [10, 20, 30, 40]


def test_compose_transparency_preserves_underlying_pixels():
    """A transparent index in frame 2 must not overwrite frame 1's
    paint — the compositing rule players rely on."""
    from yark_spark.operators.gif import compose_gif_frames, encode_gif_anim

    f0 = np.full((2, 2), 7, np.uint8)
    # palette = union {7, 9, 50} sorted -> 9 is index 1 = the transparent
    # index; frame 0 never uses it, frame 1's 9-pixels punch through
    f1 = np.array([[9, 50], [50, 9]], np.uint8)
    payload = encode_gif_anim([f0, f1], disposals=[1, 1], transparent=1)
    out = compose_gif_frames(payload)
    assert (out[0]["rgb"][:, :, 0] == 7).all()
    assert (out[1]["rgb"][:, :, 0] == np.array([[7, 50], [50, 7]])).all()
    assert (out[1]["alpha"] == 255).all()


def test_compose_frame_outside_screen_rejected():
    import pytest

    from yark_spark.operators.gif import compose_gif_frames, encode_gif_anim

    payload = bytearray(
        encode_gif_anim([np.full((4, 4), 3, np.uint8)], screen=(4, 4))
    )
    # corrupt the image descriptor's left coordinate to 3 (3+4 > 4)
    pos = payload.index(0x2C, 13)
    payload[pos + 1] = 3
    with pytest.raises(ValueError, match="outside"):
        compose_gif_frames(bytes(payload))


def test_gce_disposal_and_delay_roundtrip():
    from yark_spark.operators.gif import decode_gif_frames, encode_gif_anim

    frames = [np.full((3, 3), v, np.uint8) for v in (1, 2, 3)]
    payload = encode_gif_anim(frames, disposals=[0, 2, 3], delays=[0, 500, 65535])
    got = decode_gif_frames(payload)
    assert [f["disposal"] for f in got] == [0, 2, 3]
    assert [f["delay_cs"] for f in got] == [0, 500, 65535]


def test_anim_single_frame_motion_zero(spark):
    """Single-frame GIFs flow through the video operator with motion 0."""
    from yark_spark.operators.gif import encode_gif_anim
    from yark_spark.operators.multimodal import gif_anim_video_features

    payload = encode_gif_anim([np.full((5, 4), 80, np.uint8)], delays=[25])
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    r = gif_anim_video_features(df).collect()[0]
    assert (r["n_frames"], r["width"], r["height"]) == (1, 4, 5)
    assert r["motion"] == 0.0 and r["luma_mean"] == 80.0
    assert r["duration_cs"] == 25
