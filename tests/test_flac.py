"""FLAC codec tests (round 12): lossless roundtrips across every
subframe type / channel assignment / bit depth the decoder supports, a
HAND-CONSTRUCTED spec frame (independent bit layout + bitwise CRCs, no
encoder involvement) pinning the decoder against RFC 9639 itself,
UTF-8 coded-number vectors, CRC/MD5 corruption detection, and
truncation fuzz. The encoder is the in-repo differential: FLAC is
lossless, so encode∘decode must be the identity on EVERY input — a
much stronger pin than any fixture family."""

import hashlib

import numpy as np
import pytest

from yark_spark.operators.flac import (
    _utf8_number_decode,
    _utf8_number_encode,
    _BitReader,
    decode_flac,
    decode_flac_raw,
    encode_flac,
)

RNG = np.random.default_rng(0xF1AC)


def _roundtrip(samples, **kw):
    enc = encode_flac(samples, **kw)
    rate, channels, bps, dec = decode_flac_raw(enc)
    want = np.asarray(samples, dtype=np.int64)
    if want.ndim == 1:
        want = want[:, None]
    assert dec.shape == want.shape
    assert np.array_equal(dec, want)
    return enc, rate, channels, bps


# ---------------------------------------------------------------------------
# Roundtrips — every encoder path hits its decoder twin
# ---------------------------------------------------------------------------


def test_roundtrip_random_int16():
    x = RNG.integers(-32768, 32768, size=10000, dtype=np.int64)
    enc, rate, ch, bps = _roundtrip(x, rate=16000)
    assert (rate, ch, bps) == (16000, 1, 16)


def test_roundtrip_smooth_signal_compresses():
    t = np.arange(20000)
    x = np.rint(
        10000 * np.sin(2 * np.pi * t / 500) + 50 * np.sin(2 * np.pi * t / 37)
    ).astype(np.int64)
    enc, *_ = _roundtrip(x)
    # LPC must actually predict: way below half the PCM size
    assert len(enc) < x.size  # < 0.5 × (2 bytes/sample)


def test_roundtrip_constant():
    enc, *_ = _roundtrip(np.full(5000, -123, dtype=np.int64))
    assert len(enc) < 128  # one CONSTANT subframe per frame


def test_roundtrip_no_lpc_fixed_orders():
    # ramps/quadratics make each fixed order the natural winner
    n = 4096
    t = np.arange(n, dtype=np.int64)
    for x in (t % 251, (t * t) % 509, (t * t * t) % 1021, t * 0 + 7):
        _roundtrip(x, use_lpc=False)


def test_roundtrip_wasted_bits():
    x = RNG.integers(-1000, 1000, size=6000, dtype=np.int64) << 4
    _roundtrip(x)


def test_roundtrip_nonstationary_multi_partition():
    x = np.concatenate(
        [
            RNG.integers(-8, 8, 4096),
            RNG.integers(-20000, 20000, 4096),
        ]
    ).astype(np.int64)
    _roundtrip(x)


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_roundtrip_stereo_modes(mode):
    t = np.arange(8192)
    left = np.rint(9000 * np.sin(2 * np.pi * t / 300)).astype(np.int64)
    right = left // 2 + RNG.integers(-20, 20, size=t.size)
    _roundtrip(np.stack([left, right], axis=1), rate=44100, stereo_mode=mode)


def test_roundtrip_stereo_extreme_side():
    # full-scale anti-correlated channels: side needs the bps+1 bit
    n = 4096
    left = np.where(np.arange(n) % 2 == 0, 32767, -32768).astype(np.int64)
    right = -left - 1
    for mode in ("left_side", "right_side", "mid_side"):
        _roundtrip(np.stack([left, right], axis=1), stereo_mode=mode)


@pytest.mark.parametrize("bps", [8, 12, 16, 20, 24, 32])
def test_roundtrip_bit_depths(bps):
    hi = 1 << (bps - 1)
    x = RNG.integers(-hi, hi, size=3000, dtype=np.int64)
    x[0], x[1] = -hi, hi - 1  # pin the extremes
    _, _, _, got_bps = _roundtrip(x, bps=bps)
    assert got_bps == bps


def test_roundtrip_multichannel_independent():
    x = RNG.integers(-2000, 2000, size=(5000, 4), dtype=np.int64)
    _roundtrip(x)


@pytest.mark.parametrize("n", [0, 1, 2, 17, 4095, 4096, 4097])
def test_roundtrip_sizes_and_frame_boundaries(n):
    x = RNG.integers(-300, 300, size=n, dtype=np.int64)
    _roundtrip(x)


def test_roundtrip_small_block_size_many_frames():
    x = RNG.integers(-5000, 5000, size=1000, dtype=np.int64)
    enc, *_ = _roundtrip(x, block_size=64)  # 16 frames, UTF-8 numbers > 1 byte? no
    # >127 frames forces multi-byte UTF-8 frame numbers
    y = RNG.integers(-50, 50, size=16 * 200, dtype=np.int64)
    _roundtrip(y, block_size=16)


def test_decode_flac_normalizes_to_int16():
    x = RNG.integers(-(1 << 23), 1 << 23, size=500, dtype=np.int64)
    enc = encode_flac(x, bps=24)
    rate, ch, s = decode_flac(enc)
    assert s.dtype == np.int16
    assert np.array_equal(s, (x >> 8).astype(np.int16))


# ---------------------------------------------------------------------------
# Hand-constructed stream — decoder pinned to the spec, not the encoder
# ---------------------------------------------------------------------------


def _bitwise_crc(data: bytes, poly: int, width: int) -> int:
    """Independent shift-register CRC (no tables — a different
    construction from the codec's table-driven one)."""
    crc = 0
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    for byte in data:
        for bit in range(7, -1, -1):
            inbit = (byte >> bit) & 1
            fb = ((crc & top) != 0) ^ inbit
            crc = ((crc << 1) & mask) ^ (poly if fb else 0)
    return crc


class _TestBits:
    """Minimal MSB-first writer local to the test."""

    def __init__(self):
        self.bits = []

    def put(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def bytes(self):
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def test_hand_constructed_stream_decodes():
    """A 16-sample mono 16-bit stream written bit-by-bit from the RFC
    field layout: STREAMINFO + one frame with a FIXED order-1 subframe,
    Rice method 0, partition order 1 (two partitions with different
    parameters). Nothing from the codec module is used to build it."""
    samples = [100, 101, 103, 106, 110, 115, 121, 128,
               136, 200, 80, 300, -40, 500, -200, 700]
    # STREAMINFO
    si = _TestBits()
    si.put(16, 16)        # min block
    si.put(16, 16)        # max block
    si.put(0, 24)
    si.put(0, 24)
    si.put(8000, 20)      # rate
    si.put(0, 3)          # channels-1
    si.put(15, 5)         # bps-1
    si.put(16, 36)        # total samples
    info = si.bytes() + hashlib.md5(
        np.array(samples, dtype="<i2").tobytes()
    ).digest()
    stream = bytearray(b"fLaC")
    stream.append(0x80)   # last metadata block, type 0
    stream += len(info).to_bytes(3, "big")
    stream += info

    # frame header: sync, fixed strategy, block size code 6 (8-bit at
    # end), rate code 4 (8 kHz), mono, size code 4 (16-bit), frame #0
    h = _TestBits()
    h.put(0b11111111111110, 14)
    h.put(0, 1)
    h.put(0, 1)
    h.put(6, 4)
    h.put(4, 4)
    h.put(0, 4)
    h.put(4, 3)
    h.put(0, 1)
    h.put(0, 8)           # UTF-8 frame number 0
    h.put(15, 8)          # block size - 1
    header = h.bytes()
    header += bytes([_bitwise_crc(header, 0x07, 8)])

    # subframe: FIXED order 1 → type 0b001001, no wasted bits
    sf = _TestBits()
    sf.put(0, 1)
    sf.put(0b001001, 6)
    sf.put(0, 1)
    sf.put(samples[0] & 0xFFFF, 16)   # warmup
    # residual = diff(samples); partition order 1: parts of 8-1=7 and 8
    res = [samples[i] - samples[i - 1] for i in range(1, 16)]
    sf.put(0, 2)          # method 0
    sf.put(1, 4)          # partition order 1
    for part, param in ((res[:7], 1), (res[7:], 6)):
        sf.put(param, 4)
        for v in part:
            zz = (v << 1) if v >= 0 else ((-v << 1) - 1)
            sf.put(0, zz >> param)   # unary quotient zeros
            sf.put(1, 1)
            sf.put(zz & ((1 << param) - 1), param)
    pad = (-len(sf.bits)) % 8
    sf.put(0, pad)
    frame = header + sf.bytes()
    frame += _bitwise_crc(frame, 0x8005, 16).to_bytes(2, "big")
    stream += frame

    rate, ch, bps, dec = decode_flac_raw(bytes(stream))
    assert (rate, ch, bps) == (8000, 1, 16)
    assert dec[:, 0].tolist() == samples


# ---------------------------------------------------------------------------
# UTF-8 coded numbers
# ---------------------------------------------------------------------------


def test_utf8_number_vectors():
    # classic UTF-8 boundaries + the 7-byte extension
    cases = {
        0: b"\x00",
        0x7F: b"\x7f",
        0x80: b"\xc2\x80",
        0x7FF: b"\xdf\xbf",
        0x800: b"\xe0\xa0\x80",
        0xFFFF: b"\xef\xbf\xbf",
        (1 << 36) - 1: b"\xfe\xbf\xbf\xbf\xbf\xbf\xbf",
    }
    for n, want in cases.items():
        got = _utf8_number_encode(n)
        assert got == want, (hex(n), got.hex(), want.hex())
        assert _utf8_number_decode(_BitReader(got)) == n


def test_utf8_number_roundtrip_sweep():
    for n in [1, 63, 64, 127, 128, 2**11, 2**16, 2**21 - 1, 2**26, 2**31, 2**35]:
        assert _utf8_number_decode(_BitReader(_utf8_number_encode(n))) == n
    with pytest.raises(ValueError):
        _utf8_number_encode(1 << 36)


# ---------------------------------------------------------------------------
# Corruption / truncation — typed errors for the decode quarantine
# ---------------------------------------------------------------------------


def test_bad_magic_raises():
    with pytest.raises(ValueError, match="magic"):
        decode_flac_raw(b"fLaX" + b"\x00" * 50)


def test_frame_corruption_detected():
    x = RNG.integers(-32768, 32768, size=4000, dtype=np.int64)
    enc = bytearray(encode_flac(x))
    enc[len(enc) // 2] ^= 0x40
    with pytest.raises(ValueError):
        decode_flac_raw(bytes(enc))


def test_header_crc8_detected():
    x = RNG.integers(-100, 100, size=100, dtype=np.int64)
    enc = bytearray(encode_flac(x))
    # frame starts right after 4 magic + 4 block header + 34 STREAMINFO
    enc[42 + 3] ^= 0x01  # inside the frame header, before the CRC-8
    with pytest.raises(ValueError):
        decode_flac_raw(bytes(enc))


def test_md5_mismatch_detected():
    x = RNG.integers(-100, 100, size=100, dtype=np.int64)
    enc = bytearray(encode_flac(x))
    enc[42 - 16] ^= 0xFF  # first MD5 byte inside STREAMINFO (no CRC there)
    with pytest.raises(ValueError, match="MD5"):
        decode_flac_raw(bytes(enc))


def test_truncation_fuzz():
    x = RNG.integers(-3000, 3000, size=600, dtype=np.int64)
    enc = encode_flac(x, block_size=128)
    for cut in range(4, len(enc) - 1, 37):
        with pytest.raises(ValueError):
            decode_flac_raw(enc[:cut])


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="bit depth"):
        encode_flac(np.array([40000]), bps=16)
    with pytest.raises(ValueError, match="stereo"):
        encode_flac(np.zeros((10, 3), dtype=np.int64), stereo_mode="mid_side")
    with pytest.raises(ValueError, match="block size"):
        encode_flac(np.zeros(10, dtype=np.int64), block_size=8)
    with pytest.raises(ValueError, match="channels"):
        encode_flac(np.zeros((10, 9), dtype=np.int64))


def test_streaminfo_total_enforced():
    x = RNG.integers(-100, 100, size=200, dtype=np.int64)
    enc = bytearray(encode_flac(x, block_size=64))
    # chop the last frame off: decoded total < STREAMINFO total
    rate, ch, bps, dec = decode_flac_raw(bytes(enc))
    assert dec.shape[0] == 200
    with pytest.raises(ValueError):
        decode_flac_raw(bytes(enc[: len(enc) - 40]))
