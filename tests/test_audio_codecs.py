"""G.711 (µ-law / A-law) + IMA ADPCM codec tests (round 11): published
spec values pinned, bijection / fixed-point properties over all 256
codes, constant-block exactness, SNR sanity on real waveforms, WAV
container roundtrips for all four fmt tags, truncation fuzz."""

import numpy as np
import pytest

from yark_spark.operators.audio_codecs import (
    alaw_decode,
    alaw_decode_table,
    alaw_encode,
    decode_wav,
    encode_wav,
    ima_adpcm_decode,
    ima_adpcm_encode,
    mulaw_decode,
    mulaw_decode_table,
    mulaw_encode,
)

# ---------------------------------------------------------------------------
# G.711 — table pins (ITU-T G.711 / CCITT reference values)
# ---------------------------------------------------------------------------


def test_mulaw_published_values():
    t = mulaw_decode_table()
    assert t[0x00] == -32124  # largest negative segment
    assert t[0x01] == -31100
    assert t[0x7F] == -0 and t[0x7F] == 0
    assert t[0x80] == 32124
    assert t[0xFF] == 0
    assert t[0xFE] == 8  # smallest positive step


def test_alaw_published_values():
    t = alaw_decode_table()
    assert t[0x55] == -8  # code 0x55 xors to 0 -> smallest negative
    assert t[0xD5] == 8
    assert t[0x2A] == -32256  # largest negative (0x2A ^ 0x55 = 0x7F)
    assert t[0xAA] == 32256
    assert t[0x55 ^ 0x01] == -24  # adjacent linear-segment step of 16


def test_g711_code_bijection():
    # encode(decode(code)) == code for every byte — the two laws are
    # exact inverses on their own quantization lattices (the ±0 pair
    # 0x7F/0xFF in µ-law both decode to 0; encode maps 0 to 0xFF)
    mu = mulaw_decode_table()
    codes = np.arange(256, dtype=np.uint8)
    enc = mulaw_encode(mu)
    ok = enc == codes
    assert ok.sum() == 255 and not ok[0x7F] and enc[0x7F] == 0xFF
    al = alaw_decode_table()
    assert np.array_equal(alaw_encode(al), codes)  # A-law has no ±0 pair


def test_g711_fixed_points():
    # decode(encode(v)) == v exactly when v is on the quantization lattice
    for table, enc, dec in (
        (mulaw_decode_table(), mulaw_encode, mulaw_decode),
        (alaw_decode_table(), alaw_encode, alaw_decode),
    ):
        vals = table[np.arange(256)]
        assert np.array_equal(dec(enc(vals)), vals)


def test_g711_quantization_error_bound():
    rng = np.random.default_rng(0)
    x = rng.integers(-32000, 32000, size=4096).astype(np.int16)
    for enc, dec, bound in ((mulaw_encode, mulaw_decode, 1024), (alaw_encode, alaw_decode, 1024)):
        err = np.abs(dec(enc(x)).astype(np.int32) - x)
        # error is bounded by half the largest segment step
        assert err.max() <= bound
        # and small signals quantize finely
        small = rng.integers(-100, 100, size=1024).astype(np.int16)
        errs = np.abs(dec(enc(small)).astype(np.int32) - small)
        assert errs.max() <= 16


def test_mulaw_monotone():
    # decode table restricted to positive codes is strictly decreasing
    # magnitude as code increases (0x80..0xFF: 32124 ... 0)
    t = mulaw_decode_table()
    pos = t[0x80:].astype(np.int32)
    assert (np.diff(pos) <= 0).all()


# ---------------------------------------------------------------------------
# IMA ADPCM
# ---------------------------------------------------------------------------


def test_adpcm_constant_blocks_exact():
    # constant signal roundtrips exactly: header predictor = first
    # sample, nibble 0 at step index 0 decodes to delta 0
    for v in (0, 48, 102, -77, 32000):
        x = np.full(130, v, dtype=np.int16)
        data = ima_adpcm_encode(x, block_align=36)
        out = ima_adpcm_decode(data, 36, len(x))
        assert np.array_equal(out, x)


def test_adpcm_block_structure():
    # 65 samples/block at block_align=36; header stores sample 0 verbatim
    x = np.arange(200, dtype=np.int16) * 37
    data = ima_adpcm_encode(x, block_align=36)
    assert len(data) == 4 * 36  # ceil(200/65) blocks
    import struct

    pred0, idx0, res0 = struct.unpack_from("<hBB", data, 0)
    assert pred0 == 0 and res0 == 0
    pred1, idx1, _ = struct.unpack_from("<hBB", data, 36)
    assert pred1 == x[65]  # each block header restarts at the true sample


def test_adpcm_snr_on_sine():
    t = np.arange(4000)
    x = (12000 * np.sin(2 * np.pi * t / 97)).astype(np.int16)
    out = ima_adpcm_decode(ima_adpcm_encode(x, 256), 256, len(x))
    err = out.astype(np.float64) - x
    snr = 10 * np.log10(np.mean(x.astype(np.float64) ** 2) / np.mean(err**2))
    assert snr > 20  # ADPCM on a smooth tone should be well over 20 dB


def test_adpcm_decoder_tracks_encoder_state():
    rng = np.random.default_rng(1)
    # a rough random walk stresses the step-size adaptation
    x = np.clip(np.cumsum(rng.integers(-2000, 2000, size=1000)), -32768, 32767).astype(
        np.int16
    )
    out = ima_adpcm_decode(ima_adpcm_encode(x, 64), 64, len(x))
    # not lossless, but the decoder must stay locked to the encoder:
    # error bounded by the largest step
    assert np.abs(out.astype(np.int32) - x).max() <= 32767 // 4


def test_adpcm_truncated_raises():
    x = np.zeros(130, dtype=np.int16)
    data = ima_adpcm_encode(x, 36)
    with pytest.raises(ValueError):
        ima_adpcm_decode(data[:20], 36, 130)


def test_adpcm_bad_index_raises():
    data = bytearray(ima_adpcm_encode(np.zeros(65, dtype=np.int16), 36))
    data[2] = 200  # step index out of range
    with pytest.raises(ValueError, match="step index"):
        ima_adpcm_decode(bytes(data), 36, 65)


# ---------------------------------------------------------------------------
# WAV container
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("codec", ["pcm16", "mulaw", "alaw", "ima_adpcm"])
def test_wav_container_roundtrip(codec):
    if codec == "pcm16":
        x = np.arange(-500, 500, dtype=np.int16) * 13
        expect = x
    elif codec == "ima_adpcm":
        x = np.repeat(np.array([100, -200, 300], dtype=np.int16), 65)
        expect = x  # constant blocks at block_align 36 are exact
    else:
        table = mulaw_decode_table() if codec == "mulaw" else alaw_decode_table()
        x = table[np.arange(256)]
        expect = x  # lattice values are fixed points
    payload = encode_wav(x, rate=8000, codec=codec, block_align=36)
    rate, channels, out = decode_wav(payload)
    assert (rate, channels) == (8000, 1)
    assert np.array_equal(out, expect)


def test_wav_fact_chunk_trims_padding():
    # 100 samples at block_align 36 → 2 blocks of 65 → padded to 130;
    # the fact chunk must trim decode back to 100
    x = np.full(100, 1234, dtype=np.int16)
    rate, _, out = decode_wav(encode_wav(x, codec="ima_adpcm", block_align=36))
    assert len(out) == 100 and (out == 1234).all()


def test_wav_pcm16_matches_legacy_codec():
    from yark_spark.operators.multimodal import _make_wav_codec

    legacy_enc, legacy_dec = _make_wav_codec()
    x = (np.arange(256, dtype=np.int16) - 128) * 7
    new = decode_wav(legacy_enc(x, rate=8000))
    old = legacy_dec(encode_wav(x, rate=8000, codec="pcm16"))
    assert np.array_equal(new[2], x) and np.array_equal(old[2], x)


def test_wav_unknown_fmt_raises():
    payload = bytearray(encode_wav(np.zeros(8, dtype=np.int16)))
    payload[20] = 0x55  # fmt tag -> MPEG-ish
    with pytest.raises(NotImplementedError, match="audio library"):
        decode_wav(bytes(payload))


def test_wav_not_riff_raises():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)


# ---------------------------------------------------------------------------
# Spectral path (decode → rfft) — codec-independence of the dominant bin
# ---------------------------------------------------------------------------


def test_dominant_bin_survives_lossy_codecs():
    # a 12000-amplitude integer-bin tone keeps its argmax bin through
    # G.711 (~38 dB SNR) and IMA ADPCM — the q_audio_dominant_freq
    # contract holds even for compressed payloads
    n = 256
    t = np.arange(n)
    for k in (1, 7, 60, 120):
        x = np.rint(12000 * np.sin(2 * np.pi * k * t / n)).astype(np.int16)
        for codec in ("pcm16", "mulaw", "alaw"):
            _, _, out = decode_wav(encode_wav(x, codec=codec))
            spec = np.abs(np.fft.rfft(out.astype(np.float64)))
            assert int(np.argmax(spec[1:])) + 1 == k, codec


def test_spectrum_flat_for_dc():
    # constant signal: all non-DC bins ~0; argmax may be anywhere but
    # magnitude must be ~0 (guards the rfft plumbing)
    x = np.full(256, 5000, dtype=np.int16)
    spec = np.abs(np.fft.rfft(x.astype(np.float64)))
    assert spec[1:].max() < 1e-6 * spec[0]


# ---------------------------------------------------------------------------
# Stereo IMA ADPCM (round 11 boundary removal)
# ---------------------------------------------------------------------------


def test_adpcm_stereo_constant_exact():
    # constant L/R channels roundtrip exactly, interleave preserved
    n_frames = 130
    x = np.empty(n_frames * 2, dtype=np.int16)
    x[0::2] = 1000   # L
    x[1::2] = -2000  # R
    data = ima_adpcm_encode(x, block_align=72, channels=2)
    out = ima_adpcm_decode(data, 72, len(x), channels=2)
    assert np.array_equal(out, x)


def test_adpcm_stereo_matches_per_channel_mono():
    # each channel's decoded stream must equal decoding that channel
    # alone with the same per-channel samples-per-block (block_align
    # 36 mono ~ 72 stereo: both 65 frames/block)
    rng = np.random.default_rng(9)
    n_frames = 200
    l = np.clip(np.cumsum(rng.integers(-900, 900, n_frames)), -32768, 32767)
    r = np.clip(np.cumsum(rng.integers(-900, 900, n_frames)), -32768, 32767)
    x = np.empty(n_frames * 2, dtype=np.int16)
    x[0::2], x[1::2] = l, r
    st = ima_adpcm_decode(ima_adpcm_encode(x, 72, channels=2), 72, len(x), channels=2)
    ml = ima_adpcm_decode(ima_adpcm_encode(l.astype(np.int16), 36), 36, n_frames)
    mr = ima_adpcm_decode(ima_adpcm_encode(r.astype(np.int16), 36), 36, n_frames)
    assert np.array_equal(st[0::2], ml)
    assert np.array_equal(st[1::2], mr)


def test_wav_stereo_adpcm_roundtrip():
    n_frames = 65
    x = np.empty(n_frames * 2, dtype=np.int16)
    x[0::2] = 48
    x[1::2] = 102
    rate, ch, out = decode_wav(
        encode_wav(x, rate=16000, codec="ima_adpcm", block_align=72, channels=2)
    )
    assert (rate, ch) == (16000, 2)
    assert np.array_equal(out, x)


def test_adpcm_stereo_bad_block_align_raises():
    with pytest.raises(ValueError, match="block_align"):
        ima_adpcm_encode(np.zeros(20, dtype=np.int16), 36, channels=2)


def test_adpcm_differential_property():
    """Decode must agree bit-for-bit with an INDEPENDENT scalar
    reference decoder written differently (table walk inline). A plain
    error bound is the wrong property: a full-range jump from step 7
    lags the step adaptation by design (error ~65k for a few samples,
    exactly like any conformant IMA implementation)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    steps = [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
        37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
        544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
        1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
        4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
        12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
        29794, 32767,
    ]
    adjust = [-1, -1, -1, -1, 2, 4, 6, 8]

    def ref_decode(data, block_align, n):
        import struct

        out = []
        pos = 0
        while len(out) < n:
            pred, idx, _ = struct.unpack_from("<hBB", data, pos)
            out.append(pred)
            # blocks are always full; zero-padding of the final block is
            # decoded too and sliced off by the return truncation
            for byte in data[pos + 4 : pos + block_align]:
                for nib in (byte & 0xF, byte >> 4):
                    s = steps[idx]
                    d = (s >> 3) + (s if nib & 4 else 0)
                    d += (s >> 1) if nib & 2 else 0
                    d += (s >> 2) if nib & 1 else 0
                    pred = pred - d if nib & 8 else pred + d
                    pred = max(-32768, min(32767, pred))
                    idx = max(0, min(88, idx + adjust[nib & 7]))
                    out.append(pred)
            pos += block_align
        return out[:n]

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=300))
    def run(vals):
        x = np.array(vals, dtype=np.int16)
        data = ima_adpcm_encode(x, 64)
        mine = ima_adpcm_decode(data, 64, len(x))
        theirs = ref_decode(data, 64, len(x))
        assert mine.tolist() == theirs

    run()


# ---------------------------------------------------------------------------
# round-11 review fixes
# ---------------------------------------------------------------------------


def test_wav_stereo_pcm16_and_g711_channels_honored():
    # review fix: channels was silently ignored for non-ADPCM codecs
    x = np.array([100, -200] * 50, dtype=np.int16)  # L R interleaved
    for codec in ("pcm16", "mulaw", "alaw"):
        rate, ch, out = decode_wav(encode_wav(x, codec=codec, channels=2))
        assert ch == 2 and len(out) == len(x), codec
    with pytest.raises(ValueError, match="divisible"):
        encode_wav(np.zeros(5, dtype=np.int16), channels=2)


def test_wav_truncated_fmt_typed_error():
    import struct

    body = b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00"
    body += b"data" + struct.pack("<I", 0)
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(payload)


# ---------------------------------------------------------------------------
# Round 12: PCM sample depths (8 / 24 / 32-bit int + IEEE float32)
# ---------------------------------------------------------------------------


def test_pcm_depth_roundtrips():
    from yark_spark.operators.audio_codecs import decode_wav, encode_wav

    x = np.array([-32768, -12345, -1, 0, 1, 257, 32767, 25600], dtype=np.int64)
    for codec in ("pcm16", "pcm24", "pcm32", "float32"):
        _r, _c, got = decode_wav(encode_wav(x, codec=codec))
        assert (got == x.astype(np.int16)).all(), codec
    # 8-bit keeps only the top byte (spec: unsigned with a 128 bias)
    _r, _c, got = decode_wav(encode_wav(x, codec="pcm8"))
    assert (got == ((x >> 8) << 8).astype(np.int16)).all()


def test_pcm24_sign_extension_and_alignment():
    from yark_spark.operators.audio_codecs import decode_wav, encode_wav

    x = np.array([-1, -256, 255, -32768], dtype=np.int64)
    _r, _c, got = decode_wav(encode_wav(x, codec="pcm24"))
    assert (got == x.astype(np.int16)).all()
    # truncated 24-bit data is rejected, not misparsed
    import pytest

    bad = bytearray(encode_wav(np.array([0, 0], dtype=np.int64), codec="pcm24"))
    idx = bytes(bad).index(b"data") + 4
    import struct

    struct.pack_into("<I", bad, idx, 5)  # data size not a multiple of 3
    bad = bad[: idx + 4 + 5]
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))


def test_float32_extremes_clip():
    import struct

    from yark_spark.operators.audio_codecs import decode_wav

    # hand-built float32 WAV with out-of-range samples: must clip
    samples = struct.pack("<4f", 2.0, -2.0, 0.999969482421875, -1.0)
    fmt = struct.pack("<HHIIHHH", 3, 1, 8000, 32000, 4, 32, 0)
    body = (
        b"WAVE"
        + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"data", len(samples)) + samples
    )
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + body
    _r, _c, got = decode_wav(wav)
    assert list(got) == [32767, -32768, 32767, -32768]
