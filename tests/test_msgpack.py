"""MessagePack codec tests (round 12): the spec's own wire examples,
smallest-form encoder discipline across every integer/string/bin
boundary, all sized container forms, ext passthrough, float32-exact
promotion, stream decode, typed errors (reserved 0xc1, truncation,
trailing bytes, bombs), and roundtrip fuzz."""

import random
import struct

import pytest

from yark_spark.operators.msgpack import (
    msgpack_decode,
    msgpack_encode,
    msgpack_stream_decode,
)


def test_spec_wire_examples():
    # the msgpack.org front-page example
    assert (
        msgpack_encode({"compact": True, "schema": 0})
        == b"\x82\xa7compact\xc3\xa6schema\x00"
    )
    assert msgpack_encode(None) == b"\xc0"
    assert msgpack_encode(False) == b"\xc2"
    assert msgpack_encode(True) == b"\xc3"
    assert msgpack_encode([1, 2, 3]) == b"\x93\x01\x02\x03"


@pytest.mark.parametrize(
    "n,wire",
    [
        (0, b"\x00"),
        (127, b"\x7f"),
        (128, b"\xcc\x80"),
        (255, b"\xcc\xff"),
        (256, b"\xcd\x01\x00"),
        (65535, b"\xcd\xff\xff"),
        (65536, b"\xce\x00\x01\x00\x00"),
        (2**32 - 1, b"\xce\xff\xff\xff\xff"),
        (2**32, b"\xcf\x00\x00\x00\x01\x00\x00\x00\x00"),
        (-1, b"\xff"),
        (-32, b"\xe0"),
        (-33, b"\xd0\xdf"),
        (-128, b"\xd0\x80"),
        (-129, b"\xd1\xff\x7f"),
        (-32768, b"\xd1\x80\x00"),
        (-32769, b"\xd2\xff\xff\x7f\xff"),
        (-(2**31), b"\xd2\x80\x00\x00\x00"),
        (-(2**31) - 1, b"\xd3\xff\xff\xff\xff\x7f\xff\xff\xff"),
    ],
)
def test_integer_smallest_form_boundaries(n, wire):
    assert msgpack_encode(n) == wire
    assert msgpack_decode(wire) == n


def test_integer_range_enforced():
    assert msgpack_decode(msgpack_encode(2**64 - 1)) == 2**64 - 1
    with pytest.raises(ValueError, match="range"):
        msgpack_encode(2**64)
    with pytest.raises(ValueError, match="range"):
        msgpack_encode(-(2**63) - 1)


def test_string_form_boundaries():
    assert msgpack_encode("") == b"\xa0"
    assert msgpack_encode("a" * 31) == b"\xbf" + b"a" * 31
    assert msgpack_encode("a" * 32)[:2] == b"\xd9\x20"
    assert msgpack_encode("a" * 256)[:3] == b"\xda\x01\x00"
    assert msgpack_encode("a" * 65536)[:5] == b"\xdb\x00\x01\x00\x00"
    s = "héllo 中文"
    assert msgpack_decode(msgpack_encode(s)) == s


def test_bin_and_container_form_boundaries():
    assert msgpack_encode(b"\x01")[:2] == b"\xc4\x01"
    assert msgpack_encode(bytes(256))[:3] == b"\xc5\x01\x00"
    assert msgpack_encode([0] * 16)[:3] == b"\xdc\x00\x10"
    assert msgpack_encode({i: i for i in range(16)})[:3] == b"\xde\x00\x10"
    big = list(range(70000))
    assert msgpack_decode(msgpack_encode(big)) == big


def test_float_exact_promotion():
    # 1.5 roundtrips in float32 → compact form; 0.1 needs float64
    assert msgpack_encode(1.5) == b"\xca" + struct.pack(">f", 1.5)
    assert msgpack_encode(0.1) == b"\xcb" + struct.pack(">d", 0.1)
    assert msgpack_decode(msgpack_encode(0.1)) == 0.1


def test_ext_passthrough():
    # fixext 4, type 7 (hand-built; encoder never emits ext)
    wire = b"\xd6\x07abcd"
    assert msgpack_decode(wire) == ("__ext__", 7, b"abcd")
    wire = b"\xc7\x03\x05xyz"  # ext8 len 3 type 5
    assert msgpack_decode(wire) == ("__ext__", 5, b"xyz")


def test_stream_decode():
    blob = b"".join(msgpack_encode({"id": i, "text": f"t{i}"}) for i in range(7))
    assert msgpack_stream_decode(blob) == [
        {"id": i, "text": f"t{i}"} for i in range(7)
    ]
    assert msgpack_stream_decode(b"") == []


def test_errors():
    with pytest.raises(ValueError, match="reserved"):
        msgpack_decode(b"\xc1")
    with pytest.raises(ValueError, match="truncated"):
        msgpack_decode(b"\x91")  # fixarray of 1 with no element
    with pytest.raises(ValueError, match="truncated"):
        msgpack_decode(b"\xd9\x05ab")
    with pytest.raises(ValueError, match="trailing"):
        msgpack_decode(b"\x01\x02")
    with pytest.raises(ValueError, match="bomb"):
        msgpack_decode(b"\xdd\xff\xff\xff\xff", max_elems=1000)
    with pytest.raises(ValueError, match="unhashable"):
        msgpack_decode(b"\x81\x90\x00")  # array as map key
    with pytest.raises(ValueError, match="deep"):
        msgpack_decode(b"\x91" * 100 + b"\x00")


def test_roundtrip_fuzz():
    rng = random.Random(21)

    def gen(depth=0):
        kinds = ["int", "str", "float", "none", "bool", "bytes"]
        if depth < 3:
            kinds += ["list", "map"]
        k = rng.choice(kinds)
        if k == "int":
            return rng.randrange(-(2**63), 2**64)
        if k == "str":
            return "".join(rng.choice("abé中\n") for _ in range(rng.randrange(40)))
        if k == "float":
            return rng.choice([1.5, -0.25, 0.1, 3.14159, 1e300, -0.0])
        if k == "none":
            return None
        if k == "bool":
            return rng.choice([True, False])
        if k == "bytes":
            return bytes(rng.randrange(256) for _ in range(rng.randrange(20)))
        if k == "list":
            return [gen(depth + 1) for _ in range(rng.randrange(6))]
        return {f"k{i}": gen(depth + 1) for i in range(rng.randrange(6))}

    for _ in range(300):
        obj = gen()
        assert msgpack_decode(msgpack_encode(obj)) == obj


def test_ext_reencode_passthrough():
    """Review finding: decoded ext tuples must re-encode to their
    original wire form (fixext/ext8), not degrade to arrays — a
    repack pipeline over foreign shards must preserve ext types."""
    for wire in [b"\xd4\x07abcd"[:3], b"\xd6\x07abcd", b"\xc7\x03\x05xyz"]:
        obj = msgpack_decode(wire)
        assert msgpack_encode(obj) == wire, wire
    # 16-byte fixext and a 300-byte ext8->ext16 boundary case
    obj = ("__ext__", -1, bytes(16))
    assert msgpack_decode(msgpack_encode(obj)) == obj
    obj = ("__ext__", 3, bytes(300))
    assert msgpack_decode(msgpack_encode(obj)) == obj
