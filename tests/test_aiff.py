"""AIFF container tests (round 12): 80-bit extended-float vectors
(hand-derived from the IEEE 754 layout), the big-endian chunk walk,
signed 8-bit semantics vs WAV's unsigned (the classic cross-container
bug), depth normalization parity with decode_wav, typed errors, the
AIFC boundary, and roundtrip fuzz."""

import struct

import numpy as np
import pytest

from yark_spark.operators.aiff import (
    decode_aiff,
    encode_aiff,
    pack_extended,
    unpack_extended,
)

# ---------------------------------------------------------------------------
# 80-bit extended float
# ---------------------------------------------------------------------------


def test_extended_hand_vectors():
    # 1.0: exponent 16383, mantissa = integer bit only
    assert pack_extended(1) == struct.pack(">HQ", 16383, 1 << 63)
    # 44100 = 0xAC44, 16 bits → exponent 16383+15, mantissa 44100 << 48
    assert pack_extended(44100) == struct.pack(">HQ", 16398, 44100 << 48)
    # the canonical 44.1 kHz wire bytes seen in real files
    assert pack_extended(44100) == bytes.fromhex("400EAC44000000000000")
    assert pack_extended(8000) == bytes.fromhex("400BFA00000000000000")


@pytest.mark.parametrize("rate", [1, 8000, 11025, 22050, 44100, 48000, 96000, 192000])
def test_extended_roundtrip(rate):
    assert unpack_extended(pack_extended(rate)) == float(rate)


def test_extended_zero_and_errors():
    assert unpack_extended(b"\x00" * 10) == 0.0
    with pytest.raises(ValueError, match="10 bytes"):
        unpack_extended(b"\x00" * 9)
    with pytest.raises(ValueError, match="non-finite"):
        unpack_extended(struct.pack(">HQ", 0x7FFF, 0))
    with pytest.raises(ValueError, match="positive"):
        pack_extended(0)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------


def test_roundtrip_pcm16():
    samples = list(range(-128, 128))
    rate, ch, out = decode_aiff(encode_aiff(samples, rate=44100))
    assert (rate, ch) == (44100, 1)
    assert np.array_equal(out, np.array(samples, dtype=np.int16))


def test_big_endian_on_the_wire():
    blob = encode_aiff([0x0102], rate=8000)
    assert b"\x01\x02" in blob  # int16 0x0102 stored big-endian
    assert blob[:4] == b"FORM" and blob[8:12] == b"AIFF"


def test_signed_8bit_semantics():
    # -32768 → 8-bit -128 (0x80); +32512 → +127 — SIGNED, no WAV bias
    blob = encode_aiff([-32768, 32512, 0], sample_size=8)
    rate, ch, out = decode_aiff(blob)
    assert list(out) == [-32768, 32512, 0]
    # the raw sample bytes are two's complement
    pos = blob.find(b"SSND") + 16
    assert blob[pos : pos + 3] == bytes([0x80, 0x7F, 0x00])


def test_depth_normalization_matches_wav_family():
    # hand-build 24- and 32-bit SSND data; both keep the top 16 bits
    comm = struct.pack(">HIH", 1, 2, 24) + pack_extended(8000)
    data = b"\x12\x34\x56" + b"\xff\xfe\x00"  # +0x123456, -0x000200
    ssnd = struct.pack(">II", 0, 0) + data
    blob = (
        b"FORM"
        + struct.pack(">I", 4 + 8 + len(comm) + 8 + len(ssnd))
        + b"AIFF"
        + b"COMM"
        + struct.pack(">I", len(comm))
        + comm
        + b"SSND"
        + struct.pack(">I", len(ssnd))
        + ssnd
    )
    _, _, out = decode_aiff(blob)
    assert list(out) == [0x1234, -2]


def test_ssnd_offset_honored():
    samples = [100, -100]
    blob = encode_aiff(samples)
    # rebuild with a 4-byte SSND offset
    pos = blob.find(b"SSND")
    (sz,) = struct.unpack(">I", blob[pos + 4 : pos + 8])
    body = blob[pos + 8 : pos + 8 + sz]
    new_body = struct.pack(">II", 4, 0) + b"\xde\xad\xbe\xef" + body[8:]
    new = (
        blob[:pos]
        + b"SSND"
        + struct.pack(">I", len(new_body))
        + new_body
        + blob[pos + 8 + sz :]
    )
    # fix the FORM size
    new = new[:4] + struct.pack(">I", len(new) - 8) + new[8:]
    _, _, out = decode_aiff(new)
    assert list(out) == samples


def test_errors():
    blob = encode_aiff([1, 2, 3])
    with pytest.raises(ValueError, match="FORM"):
        decode_aiff(b"RIFF" + blob[4:])
    with pytest.raises(ValueError, match="not an AIFF"):
        decode_aiff(blob[:8] + b"WAVE" + blob[12:])
    # round 15: re-typing a plain-PCM form as AIFC decodes fine (the
    # short COMM has no compression fields → NONE); the typed AIFC
    # boundary moved to genuinely unsupported codecs (see the
    # differential tests below)
    _rt, _ch, vals = decode_aiff(blob[:8] + b"AIFC" + blob[12:])
    assert list(vals) == [1, 2, 3]
    with pytest.raises(ValueError):
        decode_aiff(blob[: len(blob) - 2])  # truncated chunk
    with pytest.raises(ValueError, match="bomb"):
        decode_aiff(blob, max_samples=2)
    with pytest.raises(ValueError, match="range"):
        encode_aiff([40000])
    with pytest.raises(ValueError, match="channels"):
        encode_aiff([1, 2, 3], channels=2)


def test_stereo_roundtrip():
    inter = [1, -1, 2, -2, 3, -3]  # L R interleaved
    rate, ch, out = decode_aiff(encode_aiff(inter, channels=2))
    assert ch == 2 and list(out) == inter


def test_feature_dispatch_agrees_with_wav():
    """The same samples through AIFF and WAV must produce identical
    decode tuples — the two containers disagree on every byte order
    and the 8-bit convention, so agreement is a real check."""
    from yark_spark.operators.audio_codecs import decode_wav, encode_wav

    samples = [ord(c) for c in "0123456789abcdef" * 2] * 8
    ra, ca, sa = decode_aiff(encode_aiff(samples, rate=8000))
    rw, cw, sw = decode_wav(encode_wav(samples, rate=8000, codec="pcm16"))
    assert (ra, ca) == (rw, cw)
    assert np.array_equal(sa, sw)


def test_roundtrip_fuzz():
    rng = np.random.RandomState(31)
    for _ in range(30):
        n = int(rng.randint(1, 300))
        ch = int(rng.choice([1, 2]))
        n -= n % ch
        if n == 0:
            n = ch
        samples = rng.randint(-32768, 32768, size=n).astype(np.int64)
        rate = int(rng.choice([8000, 22050, 44100]))
        r, c, out = decode_aiff(encode_aiff(samples, rate=rate, channels=ch))
        assert (r, c) == (rate, ch)
        assert np.array_equal(out, samples.astype(np.int16))


# ---------------------------------------------------------------------------
# Round 15: AIFF-C — the compressed-variant boundary closes for the
# types a real oracle exists for (Python's aifc module wraps the same
# audioop G.711 the in-repo tables were pinned against): ulaw / alaw /
# sowt (byte-swapped PCM) / NONE. G722 and ima4 stay typed.
# ---------------------------------------------------------------------------


def _aifc_write(samples, comptype):
    import aifc
    import array
    import io
    import warnings

    class _KeepOpen(io.BytesIO):
        def close(self):
            self.flush()

    warnings.filterwarnings("ignore", category=DeprecationWarning)
    buf = _KeepOpen()
    w = aifc.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(8000)
    w.setcomptype(comptype, b"x")
    if comptype in (b"NONE", b"sowt"):
        a = array.array("h", samples)
        a.byteswap()  # aifc's PCM convention is big-endian input
        w.writeframes(a.tobytes())
    else:
        w.writeframes(array.array("h", samples).tobytes())  # audioop: native
    w.close()
    return buf.getvalue()


def _aifc_read(blob, comptype):
    import aifc
    import array
    import io

    r = aifc.open(io.BytesIO(blob), "rb")
    assert r.getcomptype() == comptype
    frames = r.readframes(r.getnframes())
    a = array.array("h", frames)
    if comptype in (b"NONE", b"sowt"):
        a.byteswap()
    return list(a)


@pytest.mark.parametrize("comptype", [b"ulaw", b"alaw", b"sowt", b"NONE"])
def test_aifc_differential_both_directions(comptype):
    import random

    from yark_spark.operators.aiff import decode_aiff, encode_aiff

    rng = random.Random(7)
    samples = [rng.randrange(-32768, 32768) for _ in range(501)]
    # real aifc writes → we decode sample-exact
    blob = _aifc_write(samples, comptype)
    rate, ch, dec = decode_aiff(blob)
    assert (rate, ch) == (8000, 1)
    assert list(dec) == _aifc_read(blob, comptype)
    # we write AIFC → real aifc decodes sample-exact (and agrees with
    # our own decode of the same bytes)
    ours = encode_aiff(samples, rate=8000, channels=1, comptype=comptype)
    ref = _aifc_read(ours, comptype)
    _rt, _ch, dec2 = decode_aiff(ours)
    assert list(dec2) == ref
    if comptype in (b"NONE", b"sowt"):
        assert ref == samples  # lossless paths are exact


def test_aifc_unknown_codec_stays_typed():
    from yark_spark.operators.aiff import decode_aiff, encode_aiff

    blob = _aifc_write([0, 1, 2, 3], b"G722")
    with pytest.raises(NotImplementedError, match="G722"):
        decode_aiff(blob)
    with pytest.raises(NotImplementedError, match="ima4"):
        encode_aiff([0], comptype=b"ima4")
