"""Round 14: roaring bitmaps (portable 32-bit + Delta's 64-bit
RoaringBitmapArray) and Z85 — wire grammar pinned by hand-derived
vectors, roundtrips fuzzed across container shapes."""

from __future__ import annotations

import random
import struct

import pytest

from yark_spark.operators.roaring import (
    roaring32_deserialize,
    roaring32_serialize,
    roaring64_array_deserialize,
    roaring64_array_serialize,
    z85_decode,
    z85_encode,
)


@pytest.mark.parametrize(
    "values",
    [
        set(),
        {0},
        {65535},
        {65536},
        {0xFFFFFFFF},
        set(range(100)),  # run container wins
        set(range(0, 65536, 2)),  # dense alternating → bitmap
        {5, 7, 9, 2000, 40000},  # sparse array
    ],
    ids=["empty", "zero", "lowmax", "key1", "u32max", "run", "bitmap", "array"],
)
def test_roaring32_roundtrip_shapes(values):
    blob = roaring32_serialize(values)
    got, pos = roaring32_deserialize(blob)
    assert got == values
    assert pos == len(blob)


def test_roaring32_fuzz_roundtrip():
    rng = random.Random(42)
    for trial in range(20):
        n = rng.choice([1, 10, 500, 3000, 6000, 9000])
        vals = set(rng.sample(range(1 << 20), n))
        blob = roaring32_serialize(vals)
        got, _ = roaring32_deserialize(blob)
        assert got == vals, trial


def test_roaring32_wire_grammar():
    # pure runs → run cookie 12347 with run-flag bitset
    blob = roaring32_serialize({1, 2, 3})
    assert struct.unpack_from("<I", blob)[0] & 0xFFFF == 12347
    # sparse non-run values → no-run cookie 12346 + count word
    blob = roaring32_serialize({0, 9, 100, 5000})
    cookie = struct.unpack_from("<I", blob)[0]
    assert cookie == 12346
    assert struct.unpack_from("<I", blob, 4)[0] == 1  # one container
    # array container body: sorted 2-byte LE values after headers+offsets
    assert blob[-8:] == struct.pack("<4H", 0, 9, 100, 5000)


def test_roaring32_typed_errors():
    with pytest.raises(ValueError, match="cookie"):
        roaring32_deserialize(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="truncated"):
        roaring32_deserialize(roaring32_serialize({1, 2, 3})[:-2])
    with pytest.raises(ValueError, match="range"):
        roaring32_serialize({1 << 32})


def test_roaring64_buckets():
    vals = {1, 2, 100000, (1 << 32) + 5, (3 << 32) + 77}
    blob = roaring64_array_serialize(vals)
    assert roaring64_array_deserialize(blob) == vals
    # magic pinned
    assert struct.unpack_from("<i", blob)[0] == 1681511377
    with pytest.raises(ValueError, match="magic"):
        roaring64_array_deserialize(b"\x00\x00\x00\x00" + blob[4:])
    with pytest.raises(ValueError, match="trailing"):
        roaring64_array_deserialize(blob + b"\x00")


def test_z85_zeromq_vector():
    # the canonical ZeroMQ spec test vector
    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert z85_encode(raw) == "HelloWorld"
    assert z85_decode("HelloWorld") == raw
    with pytest.raises(ValueError, match="multiple of 4"):
        z85_encode(b"abc")
    with pytest.raises(ValueError, match="multiple of 5"):
        z85_decode("abcd")
    with pytest.raises(ValueError, match="invalid character"):
        z85_decode('abcd"')


def test_z85_roundtrip_fuzz():
    rng = random.Random(7)
    for _ in range(50):
        raw = bytes(rng.randrange(256) for _ in range(4 * rng.randrange(1, 40)))
        assert z85_decode(z85_encode(raw)) == raw
