"""Real-library codec differentials (round 13): pyarrow bundles
libzstd, snappy, zlib and lz4 — the independent implementations the
round-12 suite believed absent from the container. Every in-repo wire
codec with a pyarrow twin is fuzz-differentialed BOTH directions:

    library compress  → our decompress   (their wire, our reader)
    our compress      → library decompress (our wire, their reader)

This lane found a real round-12 bug on first contact: the zstd
predefined match-length distribution was mis-transcribed (the -1
low-probability region started at symbol 42 instead of 46), shifting
the FSE spread by four skip positions — invisible to our own
encoder/decoder pair (self-consistent) and to the hand vectors
(which never landed on a displaced state), but fatal on real
libzstd frames (operators/zstd.py `_ML_DEFAULT`, fixed this round).
"""

import os
import random

import pytest

pa = pytest.importorskip("pyarrow")

from yark_spark.operators.containers import gzip_compress, gzip_decompress  # noqa: E402
from yark_spark.operators.lz4 import (  # noqa: E402
    lz4_frame_compress,
    lz4_frame_decompress,
)
from yark_spark.operators.snappy import (  # noqa: E402
    snappy_compress,
    snappy_decompress,
)
from yark_spark.operators.zstd import zstd_compress, zstd_frames  # noqa: E402


def _gen(n, kind, rng):
    if kind == 0:
        return bytes(rng.randrange(256) for _ in range(n))
    if kind == 1:
        return bytes(rng.randrange(4) for _ in range(n))
    if kind == 2:
        return (b"the quick brown fox jumps over the lazy dog. " * (n // 45 + 1))[:n]
    if kind == 3:
        return b"\x00" * n
    words = [b"alpha", b"beta", b"gamma-long-token", b"d"]
    out = bytearray()
    while len(out) < n:
        out += rng.choice(words) + b" "
    return bytes(out[:n])


def _zstd_dec(payload):
    return b"".join(zstd_frames(payload, max_output=1 << 26))


def _zstd_enc(data):
    return zstd_compress(data, method="compressed")


_PAIRS = [
    ("zstd", _zstd_dec, _zstd_enc),
    ("snappy", snappy_decompress, snappy_compress),
    ("lz4", lz4_frame_decompress, lz4_frame_compress),
    ("gzip", gzip_decompress, gzip_compress),
]


@pytest.mark.parametrize("name,ours_dec,ours_enc", _PAIRS)
def test_library_wire_decodes_with_ours(name, ours_dec, ours_enc):
    rng = random.Random(hash(name) & 0xFFFF)
    lib = pa.Codec(name)
    for trial in range(60):
        n = rng.randrange(0, 20000)
        data = _gen(n, trial % 5, rng)
        assert ours_dec(lib.compress(data, asbytes=True)) == data, (name, trial)


@pytest.mark.parametrize("name,ours_dec,ours_enc", _PAIRS)
def test_our_wire_decodes_with_library(name, ours_dec, ours_enc):
    rng = random.Random(~hash(name) & 0xFFFF)
    lib = pa.Codec(name)
    for trial in range(60):
        n = rng.randrange(0, 20000)
        data = _gen(n, trial % 5, rng)
        out = lib.decompress(ours_enc(data), decompressed_size=n, asbytes=True)
        assert out == data, (name, trial)


def test_zstd_all_library_levels():
    # higher levels reach deeper format features (RLE literals, larger
    # offsets, FSE-compressed tables, repeat modes)
    rng = random.Random(99)
    for lvl in (1, 3, 6, 9, 12, 15, 19, 22):
        for kind in range(5):
            data = _gen(12000, kind, rng)
            frame = pa.Codec("zstd", compression_level=lvl).compress(
                data, asbytes=True
            )
            assert _zstd_dec(frame) == data, (lvl, kind)


def test_zstd_ml_default_regression():
    # the exact libzstd frame that exposed the round-12 _ML_DEFAULT
    # transcription bug (a parquet boolean data page: one sequence,
    # predefined tables, ml state 19 -> code 41 -> length 84)
    frame = bytes.fromhex(
        "28b52ffd205f8d00005803000000f80a01499224090100e1e490"
    )
    out = _zstd_dec(frame)
    assert len(out) == 95
    assert out[:7] == bytes.fromhex("03000000f80a01")
    assert out[7:10] * 28 == out[7:91]  # the period-3 match run
    assert out[-1] == 0x09


# ---------------------------------------------------------------------------
# Round 14: stdlib liblzma / libbz2 ARE in the container (Python's lzma
# and bz2 modules) — round 13 believed otherwise and fuzzed xz/bzip2
# against spec vectors only. Both from-scratch codecs now carry the
# permanent real-library lanes in BOTH directions (the test class that
# caught the round-12 zstd _ML_DEFAULT mis-transcription).
# ---------------------------------------------------------------------------


def _mixed_cases(seed=42, n=25, cap=20000):
    rng = random.Random(seed)
    cases = [b"", b"a", b"hello world " * 200, bytes(range(256)) * 8]
    for _ in range(n):
        ln = rng.randrange(0, cap)
        alpha = rng.choice([b"ab", bytes(range(256)), b" the cat sat on the mat "])
        cases.append(bytes(rng.choice(alpha) for _ in range(ln)))
    return cases


def test_xz_real_liblzma_decodes_our_frames():
    import lzma

    from yark_spark.operators.xz import xz_compress

    for t in _mixed_cases():
        assert lzma.decompress(xz_compress(t), format=lzma.FORMAT_XZ) == t


@pytest.mark.parametrize("preset", [0, 6, 9])
def test_xz_our_decoder_on_real_liblzma_frames(preset):
    import lzma

    from yark_spark.operators.xz import xz_decompress

    p = preset | (lzma.PRESET_EXTREME if preset == 9 else 0)
    for t in _mixed_cases(n=12):
        assert xz_decompress(lzma.compress(t, format=lzma.FORMAT_XZ, preset=p)) == t


def test_bzip2_real_libbz2_decodes_our_frames():
    import bz2 as _bz2

    from yark_spark.operators.bzip2 import bz2_compress

    for t in _mixed_cases(seed=7):
        assert _bz2.decompress(bz2_compress(t)) == t


@pytest.mark.parametrize("level", [1, 9])
def test_bzip2_our_decoder_on_real_libbz2_frames(level):
    import bz2 as _bz2

    from yark_spark.operators.bzip2 import bz2_decompress

    for t in _mixed_cases(seed=7, n=12):
        assert bz2_decompress(_bz2.compress(t, level)) == t


@pytest.mark.parametrize("dist", [1, 2, 4, 16, 256])
def test_xz_delta_filter_chains_from_real_liblzma(dist):
    """Round 14: [DELTA, LZMA2] chains written by real liblzma decode
    byte-exactly (the delta predictor real archives wrap around audio/
    raster payloads); BCJ branch rewriters stay the typed boundary."""
    import lzma

    from yark_spark.operators.xz import xz_decompress

    rng = random.Random(dist)
    for n in (0, 1, 100, 5000):
        t = bytes(rng.randrange(256) for _ in range(n))
        enc = lzma.compress(
            t,
            format=lzma.FORMAT_XZ,
            filters=[{"id": lzma.FILTER_DELTA, "dist": dist},
                     {"id": lzma.FILTER_LZMA2, "preset": 6}],
        )
        assert xz_decompress(enc) == t


def test_xz_bcj_filter_stays_typed():
    # x86/PowerPC/IA64/ARM/ARM-Thumb/SPARC DECODE since round 14 s3;
    # ARM64/RISC-V (no liblzma oracle in this container build) stay
    # typed — exercised via a hand-built header since this liblzma
    # cannot write them either
    import lzma

    from yark_spark.operators.xz import xz_decompress

    for fid in (lzma.FILTER_X86, lzma.FILTER_IA64):
        enc = lzma.compress(
            b"\x00" * 100,
            format=lzma.FORMAT_XZ,
            filters=[{"id": fid}, {"id": lzma.FILTER_LZMA2}],
        )
        assert xz_decompress(enc) == b"\x00" * 100


def test_x86_bcj_filter_byte_exact_vs_liblzma():
    """Round 14 s3: the x86 BCJ rewriter pinned BYTE-EXACT against
    real liblzma both directions — the encoded stream is recovered by
    stripping liblzma's own LZMA2 layer with the in-repo decoder, so
    our filter must reproduce the real filter's output bit-for-bit
    (prev_mask partial-match state machine included), and full
    [X86, LZMA2] .xz files decode end to end."""
    import lzma
    import random

    from yark_spark.operators.xz import (
        _bcj_x86,
        _lzma2_decode_consumed,
        xz_decompress,
    )

    def real_encoded(data):
        comp = lzma.compress(
            data, format=lzma.FORMAT_XZ,
            filters=[{"id": lzma.FILTER_X86},
                     {"id": lzma.FILTER_LZMA2, "preset": 0}],
        )
        hdr_size = (comp[12] + 1) * 4
        _, enc = _lzma2_decode_consumed(comp[12 + hdr_size :], 1 << 26)
        return enc

    rng = random.Random(7)
    for _ in range(40):
        n = rng.randrange(10, 3000)
        data = bytearray(rng.getrandbits(8) for _ in range(n))
        for _k in range(n // 10):
            p = rng.randrange(0, max(1, n - 5))
            data[p] = rng.choice([0xE8, 0xE9])
            if rng.random() < 0.7 and p + 4 < n:
                data[p + 4] = rng.choice([0, 0xFF])
        data = bytes(data)
        enc_real = real_encoded(data)
        assert _bcj_x86(data, encoding=True) == enc_real
        assert _bcj_x86(enc_real, encoding=False) == data
        comp = lzma.compress(
            data, format=lzma.FORMAT_XZ,
            filters=[{"id": lzma.FILTER_X86},
                     {"id": lzma.FILTER_LZMA2, "preset": 6}],
        )
        assert xz_decompress(comp) == data


@pytest.mark.parametrize(
    "name, fid, fn_name, salts",
    [
        ("ppc", "FILTER_POWERPC", "_bcj_ppc", [0x48, 0x49, 0x4B]),
        ("arm", "FILTER_ARM", "_bcj_arm", [0xEB]),
        ("armthumb", "FILTER_ARMTHUMB", "_bcj_armthumb", [0xF0, 0xF8]),
        ("sparc", "FILTER_SPARC", "_bcj_sparc", [0x40, 0x7F]),
        ("ia64", "FILTER_IA64", "_bcj_ia64", [0x16, 0x17, 0x12]),
    ],
)
def test_simple_bcj_filters_byte_exact_vs_liblzma(name, fid, fn_name, salts):
    """Round 14 s3: the per-word BCJ rewriters pinned byte-exact
    against real liblzma both directions + full .xz decode."""
    import lzma
    import random

    from yark_spark.operators import xz as _xz

    fn = getattr(_xz, fn_name)
    filt = getattr(lzma, fid)

    def real_encoded(data):
        comp = lzma.compress(
            data, format=lzma.FORMAT_XZ,
            filters=[{"id": filt}, {"id": lzma.FILTER_LZMA2, "preset": 0}],
        )
        hdr = (comp[12] + 1) * 4
        _, enc = _xz._lzma2_decode_consumed(comp[12 + hdr :], 1 << 26)
        return enc

    rng = random.Random(11)
    for _ in range(20):
        n = rng.randrange(16, 4000) & ~3
        data = bytearray(rng.getrandbits(8) for _ in range(n))
        for _k in range(n // 8):
            data[rng.randrange(0, n)] = rng.choice(salts)
        data = bytes(data)
        er = real_encoded(data)
        assert fn(data, True) == er
        assert fn(er, False) == data
        comp = lzma.compress(
            data, format=lzma.FORMAT_XZ,
            filters=[{"id": filt}, {"id": lzma.FILTER_LZMA2, "preset": 6}],
        )
        assert _xz.xz_decompress(comp) == data


def test_bcj_start_offset_alignment_enforced():
    """Round 15 (ADVICE): a BCJ start offset that is not a multiple of
    the filter's instruction alignment is an options error in liblzma
    (simple_coder_init) — no conforming encoder can have produced such
    a stream, so our decoder must refuse it rather than silently
    rewrite garbage. Aligned offsets written by real liblzma still
    decode; the unaligned case is hand-patched (liblzma itself cannot
    write one) with the header CRC recomputed so ONLY the alignment
    check can be the rejection."""
    import lzma
    import struct
    from binascii import crc32

    from yark_spark.operators.xz import xz_decompress

    data = b"\x00" * 64
    for filt, align in (
        (lzma.FILTER_POWERPC, 4),
        (lzma.FILTER_ARM, 4),
        (lzma.FILTER_ARMTHUMB, 2),
        (lzma.FILTER_SPARC, 4),
        (lzma.FILTER_IA64, 16),
    ):
        enc = lzma.compress(
            data, format=lzma.FORMAT_XZ,
            filters=[{"id": filt, "start_offset": align * 4},
                     {"id": lzma.FILTER_LZMA2, "preset": 0}],
        )
        assert xz_decompress(enc) == data  # aligned: decodes
        hdr_size = (enc[12] + 1) * 4
        hdr = bytearray(enc[12 : 12 + hdr_size])
        # header: size byte, flags, fid varint(1), plen varint(1)=4,
        # then the 4-byte LE start-offset props
        assert hdr[2] == filt and hdr[3] == 4
        hdr[4:8] = struct.pack("<I", align * 4 + 1)
        hdr[-4:] = struct.pack("<I", crc32(bytes(hdr[:-4])))
        bad = enc[:12] + bytes(hdr) + enc[12 + hdr_size :]
        with pytest.raises(ValueError, match="not aligned"):
            xz_decompress(bad)


def _liblzma_ctypes():
    """Real liblzma via ctypes — CPython 3.11 predates FILTER_ARM64's
    id in the _lzma module's allowlist, but the C library (5.4.1 here)
    carries the filter; driving lzma_stream_buffer_encode directly is
    the probe-oracle pattern (decode goes back through stdlib lzma,
    whose gate applies to encode ids only)."""
    import ctypes
    import ctypes.util

    lib = ctypes.CDLL(ctypes.util.find_library("lzma") or "liblzma.so.5")

    class lzma_filter(ctypes.Structure):
        _fields_ = [("id", ctypes.c_uint64), ("options", ctypes.c_void_p)]

    class lzma_options_lzma(ctypes.Structure):
        _fields_ = (
            [("dict_size", ctypes.c_uint32),
             ("preset_dict", ctypes.c_void_p),
             ("preset_dict_size", ctypes.c_uint32),
             ("lc", ctypes.c_uint32), ("lp", ctypes.c_uint32),
             ("pb", ctypes.c_uint32), ("mode", ctypes.c_int),
             ("nice_len", ctypes.c_uint32), ("mf", ctypes.c_int),
             ("depth", ctypes.c_uint32), ("ext_flags", ctypes.c_uint32)]
            + [(f"ri{i}", ctypes.c_uint32) for i in range(7)]
            + [(f"re{i}", ctypes.c_int) for i in range(4)]
            + [("rp1", ctypes.c_void_p), ("rp2", ctypes.c_void_p)]
        )

    def compress_arm64(data: bytes, preset: int = 0) -> bytes:
        opt = lzma_options_lzma()
        if lib.lzma_lzma_preset(ctypes.byref(opt), preset):
            raise RuntimeError("lzma_lzma_preset failed")
        filters = (lzma_filter * 3)()
        filters[0].id = 0x0A  # LZMA_FILTER_ARM64
        filters[1].id = 0x21  # LZMA_FILTER_LZMA2
        filters[1].options = ctypes.cast(ctypes.byref(opt), ctypes.c_void_p)
        filters[2].id = 2**64 - 1  # LZMA_VLI_UNKNOWN terminator
        cap = len(data) * 2 + 4096
        out = (ctypes.c_uint8 * cap)()
        pos = ctypes.c_size_t(0)
        ret = lib.lzma_stream_buffer_encode(
            filters, ctypes.c_int(4), None, data,
            ctypes.c_size_t(len(data)), out, ctypes.byref(pos),
            ctypes.c_size_t(cap),
        )
        if ret:
            raise RuntimeError(f"lzma_stream_buffer_encode ret {ret}")
        return bytes(out[: pos.value])

    # probe: does this liblzma actually carry ARM64?
    try:
        compress_arm64(b"\x00" * 16)
    except RuntimeError:
        return None
    return compress_arm64


def test_arm64_bcj_filter_byte_exact_vs_liblzma():
    """Round 15: the ARM64 BCJ rewriter (BL imm26 + ADRP split-page
    immediates within the ±512 MiB gate) pinned BYTE-EXACT against
    real liblzma both directions — the encoded stream recovered by
    stripping liblzma's own LZMA2 layer with the in-repo decoder —
    plus full [ARM64, LZMA2] .xz decode and a stdlib-lzma
    cross-check of the same frames."""
    import lzma
    import random

    from yark_spark.operators import xz as _xz

    compress_arm64 = _liblzma_ctypes()
    if compress_arm64 is None:
        pytest.skip("liblzma without ARM64 filter")

    def real_encoded(data):
        comp = compress_arm64(data, preset=0)
        hdr = (comp[12] + 1) * 4
        _, enc = _xz._lzma2_decode_consumed(comp[12 + hdr :], 1 << 26)
        return enc

    rng = random.Random(5)
    for _ in range(40):
        n = rng.randrange(16, 3000) & ~3
        data = bytearray(rng.getrandbits(8) for _ in range(n))
        # salt BL (top byte 0x94-0x97) and ADRP (0x90/B0/D0/F0) shapes
        for _k in range(n // 8):
            p = rng.randrange(0, n // 4) * 4
            data[p + 3] = rng.choice(
                [0x94, 0x95, 0x96, 0x97, 0x90, 0xB0, 0xD0, 0xF0]
            )
        data = bytes(data)
        er = real_encoded(data)
        assert _xz._bcj_arm64(data, True) == er
        assert _xz._bcj_arm64(er, False) == data
        comp = compress_arm64(data, preset=6)
        assert _xz.xz_decompress(comp) == data
        assert lzma.decompress(comp) == data  # stdlib agrees on the frame
