"""AIFF audio container from scratch (round 12): the Apple/EA IFF-85
layout — ``FORM('AIFF' COMM SSND)`` with even-aligned chunks — and the
80-bit IEEE 754 extended-precision sample-rate field (1 sign bit,
15-bit exponent biased 16383, 64-bit mantissa with an EXPLICIT
integer bit), both directions, nothing imported.

AIFF is the big-endian twin of RIFF/WAVE: professional-audio archives,
Mac-lineage sample libraries and broadcast submissions ship it, so an
audio ingest that only speaks WAV drops real corpora on the floor.
Every field that is little-endian in WAV is big-endian here, 8-bit
samples are SIGNED (WAV's are unsigned with a 128 bias) and the sample
rate is an extended float instead of a uint32 — three classic
cross-container bug farms, which is exactly why the agreement key runs
the SAME PCM stream through both containers against one SQL truth.

``decode_aiff`` returns the ``(rate, channels, int16 samples)`` tuple
of ``audio_codecs.decode_wav`` and applies the same int16
normalization (8-bit << 8 — no bias, signed per spec; 24/32-bit keep
the top 16 bits), so the whole feature stack (peak/RMS/spectrum)
consumes either container unchanged. AIFC compressed variants are a
typed ``NotImplementedError`` boundary; decode raises ``ValueError``
on malformed input (bad FORM/AIFF magic, missing COMM/SSND,
truncation, non-integral frame counts, bomb).

Oracle recipe: lossless PCM, so the analytic WAV truth pins the
container unchanged (q_audio_container_agreement gains the 'aiff'
source). Extended-float vectors + roundtrip fuzz live in
tests/test_aiff.py.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "pack_extended",
    "unpack_extended",
    "encode_aiff",
    "decode_aiff",
]


def pack_extended(value: int) -> bytes:
    """Pack a positive integer (sample rates are) as 80-bit IEEE 754
    extended precision, big-endian."""
    if value <= 0:
        raise ValueError("aiff: extended pack expects a positive value")
    nbits = value.bit_length()
    exponent = 16383 + nbits - 1
    mantissa = value << (64 - nbits)  # explicit integer bit at bit 63
    return struct.pack(">HQ", exponent, mantissa)


def unpack_extended(b: bytes) -> float:
    """Unpack an 80-bit extended float (finite, non-negative cases —
    sample rates; denormals decode too, the explicit integer bit makes
    them uniform)."""
    if len(b) != 10:
        raise ValueError("aiff: extended field must be 10 bytes")
    se, mantissa = struct.unpack(">HQ", b)
    sign = -1.0 if se & 0x8000 else 1.0
    exponent = se & 0x7FFF
    if exponent == 0 and mantissa == 0:
        return 0.0
    if exponent == 0x7FFF:
        raise ValueError("aiff: non-finite sample rate")
    return sign * mantissa * 2.0 ** (exponent - 16383 - 63)


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack(">I", len(payload)) + payload + pad


def _pstring(s: bytes) -> bytes:
    """IFF pascal string: length byte + bytes, padded to EVEN total."""
    out = bytes([len(s)]) + s
    return out + (b"\x00" if len(out) & 1 else b"")


def encode_aiff(
    samples,
    rate: int = 8000,
    channels: int = 1,
    sample_size: int = 16,
    comptype: "bytes | None" = None,
) -> bytes:
    """Encode int16-range samples (interleaved if multi-channel) as
    AIFF. ``sample_size`` ∈ {8, 16}: 8-bit stores the top byte (SIGNED,
    per spec — no WAV-style 128 bias); 16-bit stores big-endian
    verbatim. ``comptype`` (round 15) writes an AIFF-C form instead:
    ``b"NONE"`` / ``b"sowt"`` (byte-swapped PCM) / ``b"ulaw"`` /
    ``b"alaw"`` (G.711 through the in-repo codecs) — with the FVER
    chunk and the COMM compression fields Python's aifc reads back
    sample-exactly."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.size % channels:
        raise ValueError("aiff: sample count not a multiple of channels")
    if arr.size and (arr.max() > 32767 or arr.min() < -32768):
        raise ValueError("aiff: samples exceed int16 range")
    n_frames = arr.size // channels
    if comptype is not None:
        names = {b"NONE": b"not compressed", b"sowt": b"",
                 b"ulaw": b"", b"alaw": b""}
        if comptype not in names:
            raise NotImplementedError(f"aiff: AIFC comptype {comptype!r}")
        if comptype == b"NONE":
            body = arr.astype(">i2").tobytes()
        elif comptype == b"sowt":
            body = arr.astype("<i2").tobytes()
        else:
            from yark_spark.operators.audio_codecs import (
                alaw_encode,
                mulaw_encode,
            )

            enc = mulaw_encode if comptype == b"ulaw" else alaw_encode
            body = enc(arr.astype(np.int16)).astype(np.uint8).tobytes()
        comm = (
            struct.pack(">HIH", channels, n_frames, 16)
            + pack_extended(rate)
            + comptype
            + _pstring(names[comptype])
        )
        fver = struct.pack(">I", 0xA2805140)  # AIFCVersion1
        ssnd = struct.pack(">II", 0, 0) + body
        payload = (
            b"AIFC"
            + _chunk(b"FVER", fver)
            + _chunk(b"COMM", comm)
            + _chunk(b"SSND", ssnd)
        )
        return b"FORM" + struct.pack(">I", len(payload)) + payload
    if sample_size == 16:
        body = arr.astype(">i2").tobytes()
    elif sample_size == 8:
        body = (arr >> 8).astype(np.int8).tobytes()
    else:
        raise ValueError("aiff: encoder writes 8- or 16-bit PCM")
    comm = struct.pack(">HIH", channels, n_frames, sample_size) + pack_extended(rate)
    ssnd = struct.pack(">II", 0, 0) + body  # offset, blockSize
    payload = b"AIFF" + _chunk(b"COMM", comm) + _chunk(b"SSND", ssnd)
    return b"FORM" + struct.pack(">I", len(payload)) + payload


def decode_aiff(
    payload: bytes, max_samples: int = 64_000_000
) -> tuple[int, int, np.ndarray]:
    """AIFF → ``(rate, channels, int16 samples)`` — the decode_wav
    tuple, same int16 normalization, so the audio feature stack
    consumes both containers unchanged."""
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"FORM":
        raise ValueError("aiff: bad FORM magic")
    (form_size,) = struct.unpack(">I", b[4:8])
    form_type = b[8:12]
    if form_type not in (b"AIFF", b"AIFC"):
        raise ValueError("aiff: not an AIFF form")
    is_aifc = form_type == b"AIFC"
    end = min(len(b), 8 + form_size)
    pos = 12
    comm = ssnd = None
    while pos + 8 <= end:
        cid = b[pos : pos + 4]
        (sz,) = struct.unpack(">I", b[pos + 4 : pos + 8])
        if pos + 8 + sz > end:
            raise ValueError("aiff: truncated chunk")
        body = b[pos + 8 : pos + 8 + sz]
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
        pos += 8 + sz + (sz & 1)
    if comm is None or ssnd is None:
        raise ValueError("aiff: missing COMM/SSND chunk")
    if len(comm) < 18:
        raise ValueError("aiff: short COMM chunk")
    channels, n_frames, sample_size = struct.unpack(">HIH", comm[:8])
    rate_f = unpack_extended(comm[8:18])
    rate = int(round(rate_f))
    if channels == 0:
        raise ValueError("aiff: zero channels")
    if n_frames * channels > max_samples:
        raise ValueError("aiff: sample count exceeds bomb guard")
    if len(ssnd) < 8:
        raise ValueError("aiff: short SSND chunk")
    offset, _block = struct.unpack(">II", ssnd[:8])
    data = ssnd[8 + offset :]
    n = n_frames * channels
    if is_aifc:
        # AIFF-C (round 15): COMM carries compressionType (4CC) + a
        # pstring name after the 18 PCM bytes. NONE = big-endian PCM
        # (falls through), sowt = byte-swapped 16-bit PCM (the Mac
        # convention), ulaw/ALAW etc = G.711 through the in-repo
        # codecs — decoded sample-exact against Python's aifc module
        # in tests/test_aiff.py. Other codecs (G722, ima4) stay typed.
        comp = comm[18:22] if len(comm) >= 22 else b"NONE"
        if comp in (b"ulaw", b"ULAW", b"alaw", b"ALAW"):
            from yark_spark.operators.audio_codecs import (
                alaw_decode,
                mulaw_decode,
            )

            if len(data) < n:
                raise ValueError("aiff: SSND data shorter than COMM frame count")
            codes = np.frombuffer(data[:n], dtype=np.uint8)
            dec = mulaw_decode if comp in (b"ulaw", b"ULAW") else alaw_decode
            return rate, channels, dec(codes).astype(np.int16)
        if comp == b"sowt":
            if sample_size != 16:
                raise NotImplementedError("aiff: sowt is 16-bit only")
            if len(data) < 2 * n:
                raise ValueError("aiff: SSND data shorter than COMM frame count")
            samples = np.frombuffer(data[: 2 * n], dtype="<i2").astype(np.int16)
            return rate, channels, samples
        if comp not in (b"NONE",):
            raise NotImplementedError(
                f"aiff: AIFC compression {comp!r} not supported"
            )
    if sample_size == 16:
        if len(data) < 2 * n:
            raise ValueError("aiff: SSND data shorter than COMM frame count")
        samples = np.frombuffer(data[: 2 * n], dtype=">i2").astype(np.int16)
    elif sample_size == 8:
        if len(data) < n:
            raise ValueError("aiff: SSND data shorter than COMM frame count")
        # AIFF 8-bit is SIGNED (WAV's is unsigned+bias) — same <<8
        # normalization to the int16 core as decode_wav's depth family
        s = np.frombuffer(data[:n], dtype=np.int8).astype(np.int32)
        samples = (s << 8).astype(np.int16)
    elif sample_size == 24:
        if len(data) < 3 * n:
            raise ValueError("aiff: SSND data shorter than COMM frame count")
        raw = (
            np.frombuffer(data[: 3 * n], dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        )
        v = (raw[:, 0] << 16) | (raw[:, 1] << 8) | raw[:, 2]  # big-endian
        v = (v ^ 0x800000) - 0x800000
        samples = (v >> 8).astype(np.int16)
    elif sample_size == 32:
        if len(data) < 4 * n:
            raise ValueError("aiff: SSND data shorter than COMM frame count")
        v = np.frombuffer(data[: 4 * n], dtype=">i4")
        samples = (v >> 16).astype(np.int16)
    else:
        raise NotImplementedError(f"aiff: {sample_size}-bit PCM")
    return rate, channels, samples
