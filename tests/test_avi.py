"""AVI/MJPEG container tests (round 12): hand-checked RIFF layout,
header field parse (avih dims, strh scale/rate fps, MJPG handler),
idx1 offsets, odd-size chunk padding, q100 DC-exactness of constant
frames, corruption/truncation typed errors, the non-MJPEG boundary,
and roundtrip fuzz."""

import struct

import numpy as np
import pytest

from yark_spark.operators.avi import avi_scan, decode_avi_frames, encode_avi_mjpeg


def _frames(vals, shape=(16, 16)):
    return [np.full(shape, v, dtype=np.uint8) for v in vals]


# ---------------------------------------------------------------------------
# Wire layout
# ---------------------------------------------------------------------------


def test_riff_skeleton():
    blob = encode_avi_mjpeg(_frames([10, 20]), fps=(30, 1))
    assert blob[:4] == b"RIFF" and blob[8:12] == b"AVI "
    (size,) = struct.unpack_from("<I", blob, 4)
    assert 8 + size == len(blob)  # declared RIFF size spans the file


def test_header_fields_parse():
    info = avi_scan(encode_avi_mjpeg(_frames([1, 2, 3]), fps=(30000, 1001)))
    assert (info["width"], info["height"]) == (16, 16)
    assert (info["fps_num"], info["fps_den"]) == (30000, 1001)
    assert info["n_frames"] == 3
    assert info["handler"] == "MJPG"
    assert info["usec_per_frame"] == (1_000_000 * 1001) // 30000


def test_frames_are_independent_jpegs():
    info = avi_scan(encode_avi_mjpeg(_frames([7, 8])))
    for f in info["frames"]:
        assert f[:2] == b"\xff\xd8" and f[-2:] == b"\xff\xd9"


def test_odd_sized_chunks_padded():
    # craft frame sizes likely odd by varying content; the walker must
    # still find every frame (padding rule honored)
    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 256, size=(8, 8)).astype(np.uint8) for _ in range(5)]
    blob = encode_avi_mjpeg(frames, quality=90)
    assert avi_scan(blob)["n_frames"] == 5


def test_idx1_offsets_point_at_chunks():
    blob = encode_avi_mjpeg(_frames([10, 20, 30]))
    idx_pos = blob.rfind(b"idx1")
    (idx_size,) = struct.unpack_from("<I", blob, idx_pos + 4)
    movi_pos = blob.find(b"movi")
    n = idx_size // 16
    assert n == 3
    for i in range(n):
        ckid, flags, off, ln = struct.unpack_from(
            "<4sIII", blob, idx_pos + 8 + 16 * i
        )
        assert ckid == b"00dc" and flags == 0x10
        # offset is relative to the 'movi' fourcc
        chunk_at = movi_pos + off
        assert blob[chunk_at : chunk_at + 4] == b"00dc"
        (chunk_len,) = struct.unpack_from("<I", blob, chunk_at + 4)
        assert chunk_len == ln


# ---------------------------------------------------------------------------
# Decode exactness + boundary
# ---------------------------------------------------------------------------


def test_q100_constant_frames_decode_exactly():
    vals = [0, 37, 128, 255]
    dec = decode_avi_frames(encode_avi_mjpeg(_frames(vals), quality=100))
    for v, f in zip(vals, dec["frames"]):
        arr = f if f.ndim == 2 else f[:, :, 0]
        assert (arr == v).all()


def test_non_mjpeg_handler_is_typed_boundary():
    blob = bytearray(encode_avi_mjpeg(_frames([5])))
    pos = blob.find(b"vids") + 4
    blob[pos : pos + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="MJPEG"):
        decode_avi_frames(bytes(blob))
    assert avi_scan(bytes(blob))["handler"] == "H264"  # scan still lists


def test_bad_magic_rejected():
    blob = encode_avi_mjpeg(_frames([5]))
    with pytest.raises(ValueError, match="RIFF"):
        avi_scan(b"XXXX" + blob[4:])
    with pytest.raises(ValueError, match="AVI"):
        avi_scan(blob[:8] + b"WAVE" + blob[12:])


def test_truncation_rejected():
    blob = encode_avi_mjpeg(_frames([5, 6]))
    # cut inside the movi list: the declared RIFF size now overruns
    with pytest.raises(ValueError):
        avi_scan(blob[: len(blob) // 2])


def test_missing_headers_rejected():
    # a RIFF-AVI with only a movi list: no avih → typed error
    movi = b"LIST" + struct.pack("<I", 4) + b"movi"
    body = b"AVI " + movi
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="avih"):
        avi_scan(blob)


def test_frame_bomb_guard():
    blob = encode_avi_mjpeg(_frames([1, 2, 3]))
    with pytest.raises(ValueError, match="bomb"):
        avi_scan(blob, max_frames=2)


# ---------------------------------------------------------------------------
# Roundtrip
# ---------------------------------------------------------------------------


def test_rgb_frames_roundtrip_structurally():
    frames = [np.full((8, 8, 3), v, dtype=np.uint8) for v in (40, 90)]
    dec = decode_avi_frames(encode_avi_mjpeg(frames, quality=100))
    assert dec["n_frames"] == 2
    for v, f in zip((40, 90), dec["frames"]):
        assert abs(float(np.mean(f)) - v) < 1.0  # chroma subsampling tolerance


def test_single_frame_and_empty_rejected():
    assert decode_avi_frames(encode_avi_mjpeg(_frames([9])))["n_frames"] == 1
    with pytest.raises(ValueError, match="at least one"):
        encode_avi_mjpeg([])


def test_mismatched_frame_shapes_rejected():
    with pytest.raises(ValueError, match="shape"):
        encode_avi_mjpeg(
            [np.zeros((8, 8), np.uint8), np.zeros((16, 16), np.uint8)]
        )


def test_fuzz_frame_counts_and_sizes():
    rng = np.random.RandomState(7)
    for _ in range(5):
        n = rng.randint(1, 7)
        h, w = 8 * rng.randint(1, 3), 8 * rng.randint(1, 3)
        vals = rng.randint(0, 256, size=n)
        frames = [np.full((h, w), int(v), dtype=np.uint8) for v in vals]
        dec = decode_avi_frames(encode_avi_mjpeg(frames, quality=100))
        assert dec["n_frames"] == n and (dec["width"], dec["height"]) == (w, h)
        for v, f in zip(vals, dec["frames"]):
            arr = f if f.ndim == 2 else f[:, :, 0]
            assert (arr == v).all()
