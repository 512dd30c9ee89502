"""Snappy block codec tests (round 12): hand-derived wire vectors
(built from the public format description's field layout, no encoder
involvement), all three copy tag forms, extended literal lengths,
overlapping-copy (RLE) semantics, corruption/truncation typed errors,
bomb guard, and roundtrip fuzz over adversarial data shapes."""

import random

import pytest

from yark_spark.operators.snappy import snappy_compress, snappy_decompress

# ---------------------------------------------------------------------------
# Hand-derived wire vectors
# ---------------------------------------------------------------------------


def test_empty():
    assert snappy_compress(b"") == b"\x00"
    assert snappy_decompress(b"\x00") == b""


def test_hand_vector_short_literal():
    # varint 3, tag (3-1)<<2 | 00 = 0x08, bytes
    assert snappy_decompress(bytes([3, 0x08]) + b"abc") == b"abc"


def test_hand_vector_extended_literal_length():
    # 100 bytes: len-1 = 99 >= 60 → tag 60<<2=0xF0, one length byte 99
    data = bytes(range(100))
    wire = bytes([100, 0xF0, 99]) + data
    assert snappy_decompress(wire) == data


def test_hand_vector_copy_1byte_offset():
    # "abcdabcd": literal "abcd", copy len 4 offset 4
    # tag: ((4>>8)<<5) | ((4-4)<<2) | 1 = 0x01, offset byte 4
    wire = bytes([8, 0x0C]) + b"abcd" + bytes([0x01, 0x04])
    assert snappy_decompress(wire) == b"abcdabcd"


def test_hand_vector_copy_2byte_offset():
    # same content with the 2-byte-offset form: tag ((4-1)<<2)|2 = 0x0E
    wire = bytes([8, 0x0C]) + b"abcd" + bytes([0x0E, 0x04, 0x00])
    assert snappy_decompress(wire) == b"abcdabcd"


def test_hand_vector_copy_4byte_offset():
    wire = bytes([8, 0x0C]) + b"abcd" + bytes([0x0F, 0x04, 0x00, 0x00, 0x00])
    assert snappy_decompress(wire) == b"abcdabcd"


def test_hand_vector_overlapping_copy_is_rle():
    # literal "x", copy offset 1 len 9 → "x"*10 (byte-serial semantics)
    wire = bytes([10, 0x00]) + b"x" + bytes([((9 - 1) << 2) | 2, 0x01, 0x00])
    assert snappy_decompress(wire) == b"x" * 10


# ---------------------------------------------------------------------------
# Errors
# ---------------------------------------------------------------------------


def test_offset_zero_rejected():
    wire = bytes([2, 0x00]) + b"x" + bytes([0x02, 0x00, 0x00])
    with pytest.raises(ValueError, match="offset"):
        snappy_decompress(wire)


def test_offset_beyond_window_rejected():
    wire = bytes([2, 0x00]) + b"x" + bytes([0x02, 0x05, 0x00])
    with pytest.raises(ValueError, match="offset"):
        snappy_decompress(wire)


def test_declared_size_mismatch_rejected():
    with pytest.raises(ValueError, match="mismatch"):
        snappy_decompress(bytes([5, 0x08]) + b"abc")  # declares 5, yields 3
    with pytest.raises(ValueError, match="exceeds declared"):
        snappy_decompress(bytes([1, 0x08]) + b"abc")  # declares 1, yields 3


def test_truncation_rejected():
    good = snappy_compress(b"hello world, hello world, hello world")
    for cut in (0, 1, len(good) // 2, len(good) - 1):
        with pytest.raises(ValueError):
            snappy_decompress(good[:cut])


def test_bomb_guard():
    data = b"a" * 10000
    wire = snappy_compress(data)
    with pytest.raises(ValueError, match="bomb"):
        snappy_decompress(wire, max_output=9999)
    assert snappy_decompress(wire, max_output=10000) == data


# ---------------------------------------------------------------------------
# Roundtrip
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"a",
        b"a" * 100,
        b"abcabcabcabc" * 10,
        bytes(range(256)) * 5,
        b"x" * 70000,  # forces >64-byte copy chunking
        b"the quick brown fox jumps over the lazy dog " * 50,
    ],
)
def test_roundtrip_shapes(data):
    assert snappy_decompress(snappy_compress(data)) == data


def test_roundtrip_compresses_repetitive_data():
    data = b"abcabc" * 1000
    wire = snappy_compress(data)
    assert snappy_decompress(wire) == data
    assert len(wire) < len(data) // 10


def test_roundtrip_fuzz():
    rng = random.Random(99)
    for _ in range(300):
        n = rng.randrange(0, 3000)
        alpha = rng.choice([1, 2, 8, 64, 256])
        data = bytes(rng.randrange(alpha) for _ in range(n))
        assert snappy_decompress(snappy_compress(data)) == data


def test_large_offset_copy_roundtrip():
    # a match whose offset exceeds 65535 exercises the 4-byte form
    filler = bytes(random.Random(5).randrange(256) for _ in range(70000))
    data = b"NEEDLE--" + filler + b"NEEDLE--"
    assert snappy_decompress(snappy_compress(data)) == data


def _reference_compress(raw: bytes) -> bytes:
    """The straightforward per-byte greedy matcher — the spec the
    vectorized ``snappy_compress`` must reproduce byte-for-byte (its
    segment-wise key precompute and 32-byte-stride match extension are
    implementation speedups only, round 17)."""
    from yark_spark.operators.snappy import _emit_copy, _emit_literal, _write_varint

    n = len(raw)
    out = bytearray(_write_varint(n))
    if n == 0:
        return bytes(out)
    table = {}
    lit_start = 0
    i = 0
    while i + 4 <= n:
        key = int.from_bytes(raw[i : i + 4], "little")
        cand = table.get(key)
        table[key] = i
        if cand is not None and raw[cand : cand + 4] == raw[i : i + 4]:
            length = 4
            while i + length < n and raw[cand + length] == raw[i + length]:
                length += 1
            _emit_literal(out, raw, lit_start, i)
            _emit_copy(out, i - cand, length)
            i += length
            lit_start = i
        else:
            i += 1
    _emit_literal(out, raw, lit_start, n)
    return bytes(out)


def test_vectorized_encoder_matches_reference_bytes():
    rng = random.Random(1712)
    seg = 1 << 18
    payloads = [
        b"", b"a", b"abc", b"abcd", b"abcd" * 3,
        b"ababababab" * 10,                      # overlapping copies
        bytes(range(256)) * 64,                   # long exact repeats
        b"\x00" * 70_000,                         # RLE + extended lengths
        rng.randbytes(300_000),                   # incompressible
        rng.randbytes(seg + 17),                  # crosses a key segment boundary
        b"\x00" * (2 * seg + 5),                  # match jumps whole segments
        (b"k,text\n" + b"".join(b"%d,text-%d\n" % (i, i) for i in range(20000))),
    ]
    for p in payloads:
        got = snappy_compress(p)
        assert got == _reference_compress(p), len(p)
        assert snappy_decompress(got) == p
