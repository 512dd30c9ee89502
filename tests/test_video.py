"""Y4M container codec tests (round 11): header grammar, chroma
layouts, frame walks, roundtrips, truncation fuzz."""

import numpy as np
import pytest

from yark_spark.operators.video import decode_y4m, encode_y4m, y4m_header


def _frames(n=3, h=8, w=8, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, size=(h, w), dtype=np.uint8) for _ in range(n)]


@pytest.mark.parametrize("cs", ["420", "420jpeg", "422", "444", "mono"])
def test_roundtrip_colorspaces(cs):
    frames = _frames()
    v = decode_y4m(encode_y4m(frames, colorspace=cs))
    assert len(v["frames"]) == 3
    for orig, (y, cb, cr) in zip(frames, v["frames"]):
        assert np.array_equal(y, orig)
        if cs == "mono":
            assert cb is None and cr is None
        else:
            assert (cb == 128).all() and (cr == 128).all()


def test_chroma_plane_sizes():
    frames = _frames(1, 10, 6)
    for cs, shape in (("420", (5, 3)), ("422", (10, 3)), ("444", (10, 6))):
        v = decode_y4m(encode_y4m(frames, colorspace=cs))
        assert v["frames"][0][1].shape == shape


def test_explicit_chroma_roundtrip():
    rng = np.random.default_rng(1)
    y = rng.integers(0, 256, size=(4, 4), dtype=np.uint8)
    cb = rng.integers(0, 256, size=(2, 2), dtype=np.uint8)
    cr = rng.integers(0, 256, size=(2, 2), dtype=np.uint8)
    v = decode_y4m(encode_y4m([(y, cb, cr)], colorspace="420"))
    got = v["frames"][0]
    assert np.array_equal(got[1], cb) and np.array_equal(got[2], cr)


def test_header_fields_and_unknown_tags():
    payload = encode_y4m(_frames(1), fps=(30000, 1001))
    info = y4m_header(payload)
    assert (info["fps_num"], info["fps_den"]) == (30000, 1001)
    assert info["interlace"] == "p"
    # splice an X extension tag + aspect; parser must ignore them
    head, _, rest = bytes(payload).partition(b"\n")
    v = decode_y4m(head + b" XYSCSS=420JPEG A4:3" + b"\n" + rest)
    assert len(v["frames"]) == 1


def test_frame_params_tolerated():
    payload = encode_y4m(_frames(2), frame_params="Ip")
    assert len(decode_y4m(payload)["frames"]) == 2


def test_odd_dimensions_420_ceil():
    # 5x3 luma at 420: ceil halves -> 3x2 chroma
    frames = [np.arange(15, dtype=np.uint8).reshape(3, 5)]
    v = decode_y4m(encode_y4m(frames, colorspace="420"))
    assert v["frames"][0][1].shape == (2, 3)
    assert np.array_equal(v["frames"][0][0], frames[0])


def test_truncated_frame_raises():
    payload = encode_y4m(_frames(2))
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(payload[:-10])


def test_bad_frame_marker_raises():
    payload = bytearray(encode_y4m(_frames(1)))
    at = bytes(payload).index(b"FRAME")
    payload[at] = ord("G")
    with pytest.raises(ValueError, match="FRAME"):
        decode_y4m(bytes(payload))


def test_not_y4m_raises():
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        decode_y4m(b"RIFF....WEBP")


def test_missing_dims_raises():
    with pytest.raises(ValueError, match="W/H"):
        decode_y4m(b"YUV4MPEG2 F25:1\nFRAME\n")


def test_unsupported_colorspace_raises():
    with pytest.raises(NotImplementedError, match="C420p10"):
        y4m_header(b"YUV4MPEG2 W2 H2 C420p10\n")


def test_no_frames_raises():
    with pytest.raises(ValueError, match="no frames"):
        decode_y4m(b"YUV4MPEG2 W2 H2\n")


def test_encode_rejects_wrong_chroma_shape():
    y = np.zeros((4, 4), dtype=np.uint8)
    bad_cb = np.zeros((4, 4), dtype=np.uint8)  # full-res chroma under C420
    with pytest.raises(ValueError, match="chroma plane shape"):
        encode_y4m([(y, bad_cb, bad_cb)], colorspace="420")
