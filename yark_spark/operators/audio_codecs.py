"""Compressed-audio codecs from scratch (round 11): G.711 µ-law /
A-law and IMA ADPCM, plus a WAV container codec that speaks all four
common ``fmt`` tags (1 = PCM16, 6 = A-law, 7 = µ-law, 0x11 = IMA
ADPCM).

Until this round "compressed audio" was a documented
``NotImplementedError`` boundary in ``operators/multimodal`` — true for
entropy-coded psychoacoustic codecs (MP3/AAC need an audio library),
but the three telephony/RIFF codecs above are fixed table/bit
arithmetic from public specs (ITU-T G.711; IMA ADPCM as used by the
``WAVE_FORMAT_IMA_ADPCM`` block layout) and decode exactly like the
image codecs beside them: pure numpy, shipped to executors **by value**
(cloudpickle), typed ``ValueError`` on malformed payloads.

Reference parity note: the reference archiver stores media bytes
opaquely (/root/reference/cmds/archive.py:88-91); decoding them is
mandate-side training-pipeline surface, same as operators/jpeg etc.

Oracle recipes the query layer builds on:

* **G.711 is a 256-entry bijection** between code bytes and quantized
  PCM values. Samples drawn FROM the decode table are fixed points
  (encode∘decode = identity on codes, decode∘encode = identity on
  table values), so a fixture whose samples are table values decodes
  bit-exactly and a SQL oracle can embed the spec table as literal
  VALUES — no audio code in the oracle.
* **IMA ADPCM reproduces constant blocks exactly**: the block header
  stores the first sample verbatim (predictor) and nibble 0 at step
  index 0 decodes to a zero delta (step 7 >> 3 == 0) while keeping the
  index clamped at 0 — so a constant block roundtrips losslessly and
  per-block statistics are analytic.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "mulaw_encode",
    "mulaw_decode",
    "mulaw_decode_table",
    "alaw_encode",
    "alaw_decode",
    "alaw_decode_table",
    "ima_adpcm_encode",
    "ima_adpcm_decode",
    "encode_wav",
    "decode_wav",
]

_MULAW_BIAS = 0x84
_MULAW_CLIP = 32635


# ---------------------------------------------------------------------------
# G.711 µ-law
# ---------------------------------------------------------------------------


def mulaw_decode_table() -> np.ndarray:
    """The 256-entry µ-law code → linear PCM16 table (ITU-T G.711):
    complement the code, then mantissa/exponent expansion around the
    0x84 bias. ``table[0x00] == -32124``, ``table[0xFF] == 0``."""
    codes = np.arange(256, dtype=np.int32)
    x = ~codes & 0xFF
    sign = x & 0x80
    exponent = (x >> 4) & 0x07
    mantissa = x & 0x0F
    mag = (((mantissa << 3) + _MULAW_BIAS) << exponent) - _MULAW_BIAS
    return np.where(sign != 0, -mag, mag).astype(np.int16)


def mulaw_decode(codes) -> np.ndarray:
    return mulaw_decode_table()[np.asarray(codes, dtype=np.uint8)]


def mulaw_encode(samples) -> np.ndarray:
    """Linear PCM16 → µ-law code bytes (vectorized G.711 compressor:
    bias, segment = position of the top magnitude bit, 4-bit mantissa,
    ones-complement). Exact inverse of the decode table on its values."""
    x = np.asarray(samples, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), _MULAW_CLIP) + _MULAW_BIAS
    # mag in [0x84, 0x7FFF+0x84]: exponent = top-bit position - 7
    exponent = np.floor(np.log2(mag)).astype(np.int32) - 7
    mantissa = (mag >> (exponent + 3)) & 0x0F
    return (~(sign | (exponent << 4) | mantissa) & 0xFF).astype(np.uint8)


# ---------------------------------------------------------------------------
# G.711 A-law
# ---------------------------------------------------------------------------


def alaw_decode_table() -> np.ndarray:
    """The 256-entry A-law code → linear PCM16 table (ITU-T G.711):
    XOR 0x55, then segment expansion; segment 0 is linear with a +8
    half-step. Sign bit SET means positive (``table[0xD5] == +8``,
    ``table[0x55] == -8``)."""
    codes = np.arange(256, dtype=np.int32)
    y = codes ^ 0x55
    exponent = (y >> 4) & 0x07
    mantissa = y & 0x0F
    mag = np.where(
        exponent == 0,
        (mantissa << 4) + 8,
        ((mantissa << 4) + 0x108) << np.maximum(exponent - 1, 0),
    )
    return np.where(y & 0x80, mag, -mag).astype(np.int16)


def alaw_decode(codes) -> np.ndarray:
    return alaw_decode_table()[np.asarray(codes, dtype=np.uint8)]


def alaw_encode(samples) -> np.ndarray:
    """Linear PCM16 → A-law code bytes (vectorized): segment from the
    top magnitude bit, 4-bit mantissa, sign bit 1 = positive, XOR 0x55.
    Exact inverse of the decode table on its values."""
    x = np.asarray(samples, dtype=np.int32)
    sign = np.where(x >= 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32767)
    big = mag >= 256
    exponent = np.where(big, np.floor(np.log2(np.maximum(mag, 1))).astype(np.int32) - 7, 0)
    mantissa = np.where(big, (mag >> (exponent + 3)) & 0x0F, mag >> 4)
    return (((sign | (exponent << 4) | mantissa) ^ 0x55) & 0xFF).astype(np.uint8)


# ---------------------------------------------------------------------------
# IMA ADPCM (WAVE_FORMAT_IMA_ADPCM 0x11, mono block layout)
# ---------------------------------------------------------------------------

_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
        449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
        1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
        3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
        9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350,
        22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)
_IMA_INDEX_ADJUST = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_decode_nibble(pred: int, index: int, nibble: int) -> tuple[int, int]:
    step = int(_IMA_STEPS[index])
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + int(_IMA_INDEX_ADJUST[nibble & 7])))
    return pred, index


def _ima_encode_sample(pred: int, index: int, sample: int) -> tuple[int, int, int]:
    """Greedy IMA quantizer: build the nibble bit-by-bit against the
    current step (the standard encoder), then advance state with the
    DECODED delta so encoder and decoder predictors stay identical."""
    step = int(_IMA_STEPS[index])
    delta = sample - pred
    nibble = 8 if delta < 0 else 0
    if delta < 0:
        delta = -delta
    if delta >= step:
        nibble |= 4
        delta -= step
    if delta >= step >> 1:
        nibble |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        nibble |= 1
    pred, index = _ima_decode_nibble(pred, index, nibble)
    return nibble, pred, index


def _ima_samples_per_block(block_align: int, channels: int) -> int:
    """Frames per block (per channel): header sample + 8 nibbles per
    4-byte channel group."""
    return ((block_align - 4 * channels) // (4 * channels)) * 8 + 1


def ima_adpcm_encode(samples, block_align: int = 256, channels: int = 1) -> bytes:
    """IMA ADPCM block stream (mono or stereo; stereo samples
    interleaved L R L R …). Each block: per-channel
    ``[predictor int16le][step_index u8][reserved u8]`` headers, then
    4-byte nibble groups ALTERNATING per channel (8 samples per group —
    the WAVE_FORMAT_IMA_ADPCM interleave). Header predictors ARE the
    first frame; the final block zero-pads. Step indices carry across
    blocks per channel (stored per-header, so blocks decode
    independently)."""
    if channels not in (1, 2):
        raise ValueError("1 or 2 channels")
    if block_align < 8 * channels or block_align % (4 * channels):
        raise ValueError("block_align must be a multiple of 4*channels, >= 8*channels")
    x = np.asarray(samples, dtype=np.int64)
    if x.size == 0 or x.size % channels:
        raise ValueError("sample count empty or not divisible by channels")
    chans = [x[c::channels] for c in range(channels)]
    spb = _ima_samples_per_block(block_align, channels)
    out = bytearray()
    index = [0] * channels
    n_frames = len(chans[0])
    for start in range(0, n_frames, spb):
        preds = []
        for c in range(channels):
            pred = int(chans[c][start])
            out += struct.pack("<hBB", pred, index[c], 0)
            preds.append(pred)
        # per-channel nibble streams for this block (spb-1 data samples)
        nibs: list[list[int]] = []
        for c in range(channels):
            block = chans[c][start + 1 : start + spb]
            pred = preds[c]
            lst = []
            for s in block:
                nib, pred, index[c] = _ima_encode_sample(pred, index[c], int(s))
                lst.append(nib)
            lst += [0] * ((spb - 1) - len(lst))
            nibs.append(lst)
        # emit alternating 8-nibble (4-byte) groups per channel
        for g in range(0, spb - 1, 8):
            for c in range(channels):
                grp = nibs[c][g : g + 8]
                for lo, hi in zip(grp[0::2], grp[1::2]):
                    out.append(lo | (hi << 4))
    return bytes(out)


def ima_adpcm_decode(
    data: bytes, block_align: int, n_samples: int, channels: int = 1
) -> np.ndarray:
    """Decode an IMA ADPCM block stream to ``n_samples`` TOTAL int16
    samples (stereo interleaved L R L R …)."""
    if channels not in (1, 2):
        raise ValueError("1 or 2 channels")
    if block_align < 8 * channels:
        raise ValueError("bad block_align")
    spb = _ima_samples_per_block(block_align, channels)
    out = np.empty(n_samples, dtype=np.int16)
    n_frames_out = 0
    total_frames = -(-n_samples // channels)
    pos = 0
    while n_frames_out < total_frames:
        if pos + 4 * channels > len(data):
            raise ValueError("truncated ADPCM stream")
        preds, idxs = [], []
        for c in range(channels):
            pred, index, _res = struct.unpack_from("<hBB", data, pos + 4 * c)
            if index > 88:
                raise ValueError(f"ADPCM step index {index} out of range")
            preds.append(pred)
            idxs.append(index)
        pos += 4 * channels
        body = data[pos : pos + block_align - 4 * channels]
        if len(body) < block_align - 4 * channels and (
            n_frames_out + spb < total_frames
            or len(body) % (4 * channels)
        ):
            raise ValueError("truncated ADPCM block")
        pos += len(body)
        # rebuild per-channel frame streams for this block
        frames = [[preds[c]] for c in range(channels)]
        for g in range(0, len(body), 4 * channels):
            for c in range(channels):
                for byte in body[g + 4 * c : g + 4 * c + 4]:
                    for nib in (byte & 0x0F, byte >> 4):
                        preds[c], idxs[c] = _ima_decode_nibble(
                            preds[c], idxs[c], nib
                        )
                        frames[c].append(preds[c])
        take = min(spb, total_frames - n_frames_out, len(frames[0]))
        for f in range(take):
            for c in range(channels):
                k = (n_frames_out + f) * channels + c
                if k < n_samples:
                    out[k] = frames[c][f]
        n_frames_out += take
        if take < spb and n_frames_out < total_frames:
            raise ValueError("truncated ADPCM stream")
    return out


# ---------------------------------------------------------------------------
# WAV container over all four fmt tags
# ---------------------------------------------------------------------------

_FMT_PCM16, _FMT_FLOAT32, _FMT_ALAW, _FMT_MULAW, _FMT_IMA = 1, 3, 6, 7, 0x11


def encode_wav(
    samples,
    rate: int = 8000,
    codec: str = "pcm16",
    block_align: int = 256,
    channels: int = 1,
) -> bytes:
    """Canonical RIFF/WAVE for ``codec`` in pcm16 / mulaw / alaw /
    ima_adpcm; multi-channel samples are interleaved (L R L R …) and
    ``channels`` is honored in the fmt chunk for every codec. Compressed
    forms write the spec ``fmt `` extensions (cbSize, samples-per-block
    for ADPCM) and a ``fact`` chunk with the frame count."""
    x = np.asarray(samples, dtype=np.int64)
    n = len(x)
    if channels < 1 or n % channels:
        raise ValueError("sample count not divisible by channels")
    if codec == "pcm16":
        data = x.astype("<i2").tobytes()
        fmt = struct.pack(
            "<HHIIHH", _FMT_PCM16, channels, rate,
            rate * 2 * channels, 2 * channels, 16,
        )
        fact = b""
    elif codec in ("pcm8", "pcm24", "pcm32"):
        # int16 input widened/narrowed losslessly around the int16 core
        # (round 12): 8-bit drops the low byte (bias 128), 24/32-bit
        # left-shift so decode's top-16 normalization is exact
        if codec == "pcm8":
            data = (((x >> 8) + 128) & 0xFF).astype(np.uint8).tobytes()
            width = 1
        elif codec == "pcm24":
            v = (x.astype(np.int64) << 8).astype(np.int32)
            b = np.empty((len(x), 3), dtype=np.uint8)
            b[:, 0] = v & 0xFF
            b[:, 1] = (v >> 8) & 0xFF
            b[:, 2] = (v >> 16) & 0xFF
            data = b.tobytes()
            width = 3
        else:
            data = (x.astype(np.int64) << 16).astype("<i4").tobytes()
            width = 4
        fmt = struct.pack(
            "<HHIIHH", _FMT_PCM16, channels, rate,
            rate * width * channels, width * channels, 8 * width,
        )
        fact = b""
    elif codec == "float32":
        data = (x.astype(np.float64) / 32768.0).astype("<f4").tobytes()
        fmt = struct.pack(
            "<HHIIHHH", _FMT_FLOAT32, channels, rate,
            rate * 4 * channels, 4 * channels, 32, 0,
        )
        fact = struct.pack("<4sII", b"fact", 4, n // channels)
    elif codec == "mulaw":
        data = mulaw_encode(x).tobytes()
        fmt = struct.pack(
            "<HHIIHHH", _FMT_MULAW, channels, rate,
            rate * channels, channels, 8, 0,
        )
        fact = struct.pack("<4sII", b"fact", 4, n // channels)
    elif codec == "alaw":
        data = alaw_encode(x).tobytes()
        fmt = struct.pack(
            "<HHIIHHH", _FMT_ALAW, channels, rate,
            rate * channels, channels, 8, 0,
        )
        fact = struct.pack("<4sII", b"fact", 4, n // channels)
    elif codec == "ima_adpcm":
        data = ima_adpcm_encode(x, block_align, channels=channels)
        spb = _ima_samples_per_block(block_align, channels)
        byte_rate = (rate * block_align + spb - 1) // spb
        fmt = struct.pack(
            "<HHIIHHHH",
            _FMT_IMA,
            channels,
            rate,
            byte_rate,
            block_align,
            4 * channels,
            2,
            spb,
        )
        fact = struct.pack("<4sII", b"fact", 4, n // channels)
    else:
        raise ValueError(f"unknown codec {codec!r}")
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + fact
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE → ``(rate, channels, int16 samples)`` for fmt tags
    1 / 6 / 7 / 0x11 (mono for ADPCM). Generic chunk walk with
    word-alignment; psychoacoustic codecs (MP3/AAC et al.) remain
    ``NotImplementedError`` — those genuinely need an audio library."""
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data, fact_n = 12, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        sz = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        body = b[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        elif cid == b"fact" and len(body) >= 4:
            fact_n = struct.unpack("<I", body[:4])[0]
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError(f"fmt chunk truncated to {len(fmt)} bytes")
    tag, channels, rate, _br, block_align, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag == _FMT_PCM16:
        # all integer PCM widths normalize to int16 (round 12 — the
        # "needs an audio library" depth boundary closed): 8-bit is
        # UNSIGNED with a 128 bias per the WAV spec; 24/32-bit shift
        # down, keeping the top 16 bits
        if bits == 16:
            return rate, channels, np.frombuffer(data, dtype="<i2")
        if bits == 8:
            u = np.frombuffer(data, dtype=np.uint8).astype(np.int32)
            return rate, channels, ((u - 128) << 8).astype(np.int16)
        if bits == 24:
            if len(data) % 3:
                raise ValueError("24-bit PCM data not a multiple of 3 bytes")
            raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
            v = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
            v = (v ^ 0x800000) - 0x800000  # sign-extend 24 -> 32
            return rate, channels, (v >> 8).astype(np.int16)
        if bits == 32:
            v = np.frombuffer(data, dtype="<i4")
            return rate, channels, (v >> 16).astype(np.int16)
        raise NotImplementedError(f"{bits}-bit integer PCM")
    if tag == _FMT_FLOAT32:
        if bits != 32:
            raise NotImplementedError(f"{bits}-bit IEEE-float PCM")
        f = np.frombuffer(data, dtype="<f4").astype(np.float64)
        v = np.clip(np.rint(f * 32768.0), -32768, 32767)
        return rate, channels, v.astype(np.int16)
    if tag in (_FMT_MULAW, _FMT_ALAW):
        if bits != 8:
            raise ValueError(f"G.711 with {bits}-bit samples")
        codes = np.frombuffer(data, dtype=np.uint8)
        if fact_n is not None:
            codes = codes[: fact_n * channels]
        table = mulaw_decode_table() if tag == _FMT_MULAW else alaw_decode_table()
        return rate, channels, table[codes]
    if tag == _FMT_IMA:
        if channels not in (1, 2):
            raise NotImplementedError(f"{channels}-channel IMA ADPCM")
        spb = _ima_samples_per_block(block_align, channels)
        n_blocks = (len(data) + block_align - 1) // block_align
        frames = fact_n if fact_n is not None else n_blocks * spb
        return (
            rate,
            channels,
            ima_adpcm_decode(data, block_align, frames * channels, channels),
        )
    raise NotImplementedError(
        f"WAV fmt tag 0x{tag:x}: PCM16, G.711 (A-law/µ-law) and mono IMA "
        "ADPCM decode here; psychoacoustic codecs need an audio library"
    )
