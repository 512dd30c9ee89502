"""AVI (RIFF) container codec from scratch (round 12): the classic
Microsoft RIFF-AVI layout — ``RIFF('AVI ' LIST('hdrl' avih
LIST('strl' strh strf)) LIST('movi' 00dc...) idx1)`` with word-aligned
chunks — carrying Motion-JPEG video streams, both directions, nothing
imported. Frame decode reuses the in-repo baseline JPEG codec
(``operators/jpeg``), so MJPEG-in-AVI exercises a REAL entropy-coded
video path end to end: container grammar → per-frame JPEG → pixels.

MJPEG/AVI is what webcams, surveillance archives and legacy capture
pipelines ship — the format a crawled-video corpus actually contains
alongside modern MP4 (inter-frame DCT codecs remain the documented
boundary; MJPEG is intra-only so every frame is independently
decodable, which also makes it the one entropy-coded video wire a
from-scratch stack can cover honestly). Joins Y4M (verbatim planes)
and animated GIF (palette+LZW) in the video-container family.

Structures (public Win32/OpenDML layout): avih = MainAVIHeader (14
DWORDs — µs/frame, total frames, stream count, dimensions), strh =
AVIStreamHeader ('vids'/'MJPG', scale/rate = fps), strf =
BITMAPINFOHEADER (biCompression 'MJPG'), movi data chunks '00dc'
(compressed video) with odd sizes padded, optional idx1 index whose
offsets are relative to the 'movi' fourcc.

Decode raises typed ``ValueError`` on malformed input (bad RIFF/AVI
magic, truncated chunks, missing headers, stream-type mismatch, frame
bomb) so the quarantine path keeps corrupt rows as rows.

Oracle recipe: constant-gray frames encoded at JPEG quality 100
decode EXACTLY (DC-only blocks, unit quantizer), so the per-frame
luma means — and therefore the temporal motion statistic — are
analytic, and one no-video-code SQL truth can pin Y4M, animated GIF
and AVI/MJPEG simultaneously (q_video_tri_container_agreement).
Container wire vectors + roundtrip fuzz live in tests/test_avi.py.
"""

from __future__ import annotations

import struct

import numpy as np

from yark_spark.operators.jpeg import decode_jpeg, encode_jpeg

__all__ = ["encode_avi_mjpeg", "avi_scan", "decode_avi_frames"]


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    frames: list[np.ndarray],
    fps: tuple[int, int] = (25, 1),
    quality: int = 100,
    with_index: bool = True,
) -> bytes:
    """Encode grayscale or RGB uint8 frames as an MJPEG AVI file. All
    frames must share one shape; each becomes an independent baseline
    JPEG at ``quality`` (100 → DC-exact for constant blocks)."""
    if not frames:
        raise ValueError("avi: need at least one frame")
    h, w = frames[0].shape[:2]
    blobs = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("avi: all frames must share one shape")
        blobs.append(encode_jpeg(np.asarray(f, dtype=np.uint8), quality=quality))

    rate_num, rate_den = fps
    usec = (1_000_000 * rate_den) // rate_num
    max_bytes = max(len(b) for b in blobs)

    avih = struct.pack(
        "<14I",
        usec,  # dwMicroSecPerFrame
        max_bytes * rate_num // max(rate_den, 1),  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        len(blobs),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            rate_den,  # dwScale
            rate_num,  # dwRate
            0,  # dwStart
            len(blobs),  # dwLength (frames)
            max_bytes,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize (0 = varying)
            0, 0, w, h,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        w,
        h,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        w * h * 3,  # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = bytearray()
    index = bytearray()
    for b in blobs:
        # idx1 offsets are relative to the 'movi' fourcc position
        offset = 4 + len(movi_payload)
        movi_payload += _chunk(b"00dc", b)
        index += b"00dc" + struct.pack("<III", 0x10, offset, len(b))
    movi = _list(b"movi", bytes(movi_payload))
    body = b"AVI " + hdrl + movi
    if with_index:
        body += _chunk(b"idx1", bytes(index))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(buf: memoryview, pos: int, end: int):
    """Yield (fourcc, payload_view) over a chunk sequence, honoring the
    word-alignment padding rule."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError("avi: truncated chunk header")
        fourcc = bytes(buf[pos : pos + 4])
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        if pos + size > end:
            raise ValueError("avi: truncated chunk payload")
        yield fourcc, buf[pos : pos + size]
        pos += size + (size % 2)


def avi_scan(payload: bytes, max_frames: int = 100_000) -> dict:
    """Parse an AVI file: returns {width, height, fps_num, fps_den,
    n_frames, handler, frames: [jpeg_bytes, ...]} without decoding the
    frames (listing-speed — at object-store scale this is the pass
    that only reads container grammar)."""
    buf = memoryview(payload)
    if len(buf) < 12 or bytes(buf[:4]) != b"RIFF":
        raise ValueError("avi: bad RIFF magic")
    (riff_size,) = struct.unpack_from("<I", buf, 4)
    if bytes(buf[8:12]) != b"AVI ":
        raise ValueError("avi: not an AVI RIFF form")
    end = min(len(buf), 8 + riff_size)

    info: dict = {"frames": [], "handler": None}
    saw_avih = saw_vids = False
    for fourcc, body in _walk_chunks(buf, 12, end):
        if fourcc == b"LIST":
            list_type = bytes(body[:4])
            if list_type == b"hdrl":
                for f2, b2 in _walk_chunks(body, 4, len(body)):
                    if f2 == b"avih":
                        if len(b2) < 56:
                            raise ValueError("avi: short avih")
                        vals = struct.unpack_from("<14I", b2, 0)
                        info["usec_per_frame"] = vals[0]
                        info["width"] = vals[8]
                        info["height"] = vals[9]
                        saw_avih = True
                    elif f2 == b"LIST" and bytes(b2[:4]) == b"strl":
                        for f3, b3 in _walk_chunks(b2, 4, len(b2)):
                            if f3 == b"strh":
                                if len(b3) < 48:
                                    raise ValueError("avi: short strh")
                                fcc_type = bytes(b3[:4])
                                if fcc_type != b"vids":
                                    continue  # audio/text streams skipped
                                info["handler"] = bytes(b3[4:8]).decode(
                                    "ascii", "replace"
                                )
                                scale, rate = struct.unpack_from("<II", b3, 20)
                                info["fps_num"] = rate
                                info["fps_den"] = scale or 1
                                saw_vids = True
            elif list_type == b"movi":
                for f2, b2 in _walk_chunks(body, 4, len(body)):
                    # ##dc = compressed video, ##db = uncompressed
                    if f2[2:4] in (b"dc", b"db"):
                        if len(info["frames"]) >= max_frames:
                            raise ValueError("avi: frame count exceeds bomb guard")
                        info["frames"].append(bytes(b2))
    if not saw_avih:
        raise ValueError("avi: missing avih header")
    if not saw_vids:
        raise ValueError("avi: no video stream")
    info["n_frames"] = len(info["frames"])
    return info


def decode_avi_frames(payload: bytes, max_frames: int = 10_000) -> dict:
    """Parse AND decode an MJPEG AVI: like ``avi_scan`` but frames are
    decoded pixel arrays (the in-repo baseline JPEG decoder). Rejects
    non-MJPEG handlers — inter-frame DCT codecs are the documented
    boundary."""
    info = avi_scan(payload, max_frames=max_frames)
    if info["handler"] not in ("MJPG", "mjpg"):
        raise NotImplementedError(
            f"avi: handler {info['handler']!r} not supported from scratch; "
            "MJPEG only (inter-frame codecs need a DCT video library)"
        )
    info["frames"] = [decode_jpeg(b) for b in info["frames"]]
    return info
