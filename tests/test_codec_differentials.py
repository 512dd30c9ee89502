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
