"""TFRecord/tf.Example codec tests (round 12): CRC-32C pinned to the
RFC 7143 (iSCSI) vectors, the TensorFlow CRC mask law, hand-derived
protobuf wire vectors (built byte-by-byte from the public encoding
spec, no encoder involvement), packed vs unpacked repeated scalars,
unknown-field skipping, framing roundtrip/corruption/truncation typed
errors, and roundtrip fuzz."""

import random
import struct

import pytest

from yark_spark.operators.tfrecord import (
    crc32c,
    decode_example,
    encode_example,
    masked_crc32c,
    tfrecord_build,
    tfrecord_records,
)

# ---------------------------------------------------------------------------
# CRC-32C — RFC 7143 §A.4 test vectors
# ---------------------------------------------------------------------------


def test_crc32c_rfc7143_vectors():
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA
    assert crc32c(bytes([0xFF] * 32)) == 0x62A8AB43
    assert crc32c(bytes(range(32))) == 0x46DD794E
    assert crc32c(bytes(reversed(range(32)))) == 0x113FDB5C


def test_crc32c_incremental_equals_whole():
    data = bytes(range(256)) * 3 + b"tail7"
    for cut in (0, 1, 7, 8, 9, 100, len(data)):
        assert crc32c(data[cut:], crc32c(data[:cut])) == crc32c(data)


def test_crc32c_slice_by_8_equals_bytewise():
    # lengths straddling the 8-byte stride, random data
    rng = random.Random(7)
    for n in range(0, 40):
        data = bytes(rng.randrange(256) for _ in range(n))
        # bytewise reference from the generator polynomial
        c = 0xFFFFFFFF
        for b in data:
            c ^= b
            for _ in range(8):
                c = (c >> 1) ^ (0x82F63B78 if c & 1 else 0)
        assert crc32c(data) == (~c) & 0xFFFFFFFF


def test_masked_crc_law():
    # mask(c) = rotr15(c) + delta; verify against an independent lambda
    for data in (b"", b"a", b"123456789", bytes(100)):
        c = crc32c(data)
        expect = (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF
        assert masked_crc32c(data) == expect


# ---------------------------------------------------------------------------
# Framing
# ---------------------------------------------------------------------------


def test_framing_roundtrip():
    recs = [b"", b"x", b"hello" * 1000, bytes(range(256))]
    assert tfrecord_records(tfrecord_build(recs)) == recs


def test_framing_empty_stream():
    assert tfrecord_records(b"") == []


def test_framing_known_layout():
    # one empty record: 8-byte length 0, its masked CRC, no data, data CRC
    blob = tfrecord_build([b""])
    assert len(blob) == 16
    assert blob[:8] == struct.pack("<Q", 0)
    assert struct.unpack_from("<I", blob, 8)[0] == masked_crc32c(struct.pack("<Q", 0))
    assert struct.unpack_from("<I", blob, 12)[0] == masked_crc32c(b"")


@pytest.mark.parametrize("flip_at", [0, 8, 12, 16])
def test_framing_corruption_detected(flip_at):
    blob = bytearray(tfrecord_build([b"payload bytes here"]))
    blob[flip_at] ^= 0x01
    with pytest.raises(ValueError):
        tfrecord_records(bytes(blob))


def test_framing_truncation_detected():
    blob = tfrecord_build([b"payload bytes here"])
    for cut in (4, 11, 15, len(blob) - 1):
        with pytest.raises(ValueError, match="truncated"):
            tfrecord_records(blob[:cut])


def test_framing_bomb_guard():
    blob = tfrecord_build([b"x" * 1000])
    with pytest.raises(ValueError, match="bomb"):
        tfrecord_records(blob, max_output=999)
    assert tfrecord_records(blob, max_output=1000) == [b"x" * 1000]


# ---------------------------------------------------------------------------
# Protobuf wire — hand-derived vectors (public encoding spec)
# ---------------------------------------------------------------------------


def test_example_hand_built_wire_decodes():
    # Example { features { feature { key: "id" value { int64_list { value: 150 } } } } }
    # built BY HAND from the spec: varint 150 = 0x96 0x01
    int64_list = bytes([0x08, 0x96, 0x01])  # field 1 varint (unpacked)
    feature = bytes([0x1A, len(int64_list)]) + int64_list  # field 3 LEN
    entry = bytes([0x0A, 2]) + b"id" + bytes([0x12, len(feature)]) + feature
    features = bytes([0x0A, len(entry)]) + entry
    example = bytes([0x0A, len(features)]) + features
    assert decode_example(example) == {"id": ("int64", [150])}


def test_example_roundtrip_all_kinds():
    ex = {
        "text": ("bytes", [b"hello", b"", b"\x00\xff" * 10]),
        "ids": ("int64", [0, 1, -1, 2**62, -(2**63), 2**63 - 1]),
        "emb": ("float", [0.0, 1.5, -2.25, 65504.0]),
    }
    assert decode_example(encode_example(ex)) == ex


def test_example_negative_int64_is_ten_byte_varint():
    blob = encode_example({"n": ("int64", [-1])})
    # -1 as two's-complement 64-bit = 10-byte varint of 0xFFFF...FF
    assert bytes([0xFF] * 9 + [0x01]) in blob
    assert decode_example(blob) == {"n": ("int64", [-1])}


def test_example_accepts_unpacked_scalars():
    # unpacked int64 list: one varint field per value (spec: parsers
    # must accept both forms)
    vals = bytes([0x08, 0x05, 0x08, 0x07])  # 5, 7 unpacked
    feature = bytes([0x1A, len(vals)]) + vals
    entry = bytes([0x0A, 1]) + b"v" + bytes([0x12, len(feature)]) + feature
    features = bytes([0x0A, len(entry)]) + entry
    example = bytes([0x0A, len(features)]) + features
    assert decode_example(example) == {"v": ("int64", [5, 7])}
    # unpacked float: fixed32 fields
    fvals = struct.pack("<BfBf", 0x0D, 1.5, 0x0D, -2.0)
    feature = bytes([0x12, len(fvals)]) + fvals
    entry = bytes([0x0A, 1]) + b"f" + bytes([0x12, len(feature)]) + feature
    features = bytes([0x0A, len(entry)]) + entry
    example = bytes([0x0A, len(features)]) + features
    assert decode_example(example) == {"f": ("float", [1.5, -2.0])}


def test_example_skips_unknown_fields():
    # append an unknown field 9 (varint) inside the Example message —
    # a future tf.Example extension must not break the reader
    base = encode_example({"id": ("int64", [3])})
    extended = base + bytes([0x48, 0x2A])  # field 9, varint 42
    assert decode_example(extended) == {"id": ("int64", [3])}


def test_example_malformed_raises():
    with pytest.raises(ValueError):
        decode_example(bytes([0x0A, 0xFF]))  # declared length > buffer
    with pytest.raises(ValueError):
        decode_example(bytes([0x80]))  # truncated varint tag


def test_framing_fuzz_roundtrip():
    rng = random.Random(42)
    for _ in range(50):
        recs = [
            bytes(rng.randrange(256) for _ in range(rng.randrange(200)))
            for _ in range(rng.randrange(8))
        ]
        assert tfrecord_records(tfrecord_build(recs)) == recs


def test_example_fuzz_roundtrip():
    rng = random.Random(43)
    for _ in range(50):
        ex = {}
        for i in range(rng.randrange(1, 5)):
            kind = rng.choice(["bytes", "int64", "float"])
            if kind == "bytes":
                vals = [
                    bytes(rng.randrange(256) for _ in range(rng.randrange(30)))
                    for _ in range(rng.randrange(1, 4))
                ]
            elif kind == "int64":
                vals = [
                    rng.randrange(-(2**63), 2**63) for _ in range(rng.randrange(1, 6))
                ]
            else:
                # floats that survive float32 roundtrip exactly
                vals = [
                    struct.unpack("<f", struct.pack("<f", rng.uniform(-1e3, 1e3)))[0]
                    for _ in range(rng.randrange(1, 6))
                ]
            ex[f"k{i}"] = (kind, vals)
        assert decode_example(encode_example(ex)) == ex
