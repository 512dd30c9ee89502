"""LZ4 codec tests (round 12): XXH32 pinned to published vectors,
hand-derived block wire vectors (built from the spec's field layout,
no encoder involvement), roundtrip fuzz over adversarial data shapes,
overlapping-copy (RLE) semantics, frame option matrix, stored-block
fallback for incompressible data, corruption/truncation typed errors,
and the decompress_auto magic dispatch."""

import os
import random
import struct

import pytest

from yark_spark.operators.containers import decompress_auto
from yark_spark.operators.lz4 import (
    lz4_block_compress,
    lz4_block_decompress,
    lz4_frame_compress,
    lz4_frame_decompress,
    xxh32,
)

# ---------------------------------------------------------------------------
# XXH32 — published vectors (xxHash README / python-xxhash docs)
# ---------------------------------------------------------------------------


def test_xxh32_published_vectors():
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"", seed=1) == 0x0B2CB792
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"abc") == 0x32D153FF
    assert xxh32(b"Nobody inspects the spammish repetition") == 0xE2293B2F


def test_xxh32_covers_all_tail_paths():
    # 0..19 bytes sweeps the <16 seed path, the 4-byte lanes and the
    # byte tail; equal prefixes must still diverge on the length mix-in
    data = bytes(range(20))
    seen = {xxh32(data[:n]) for n in range(20)}
    assert len(seen) == 20


# ---------------------------------------------------------------------------
# Block format — hand-derived wire vectors
# ---------------------------------------------------------------------------


def test_block_hand_vector_literals_only():
    # token 0x50: 5 literals, no match (final sequence)
    assert lz4_block_decompress(b"\x50hello") == b"hello"


def test_block_hand_vector_match():
    # "abcd" literals + match(offset=4, len=4+4) + final 5 literals:
    # abcd abcdabcd WXYZ!  — token1 = lit 4, matchlen code 4
    blk = b"\x44abcd\x04\x00" + b"\x50WXYZ!"
    assert lz4_block_decompress(blk) == b"abcdabcdabcdWXYZ!"


def test_block_hand_vector_rle_overlap():
    # 1 literal 'A' + match(offset=1, len=19) = 'A' * 20 RLE, then the
    # mandatory 5-byte literal tail; matchlen 19 = 15(token) + 0-ext? no:
    # token m=15 then ext byte 0 → 15+0+4 = 19
    blk = b"\x1fA\x01\x00\x00" + b"\x50tail!"
    assert lz4_block_decompress(blk) == b"A" * 20 + b"tail!"


def test_block_hand_vector_long_literal_extension():
    lit = bytes(range(256)) * 2  # 512 literals: 15 + 255 + 242
    blk = b"\xf0" + b"\xff" + b"\xf2" + lit
    assert lz4_block_decompress(blk) == lit


def test_block_offset_zero_rejected():
    with pytest.raises(ValueError, match="offset 0"):
        lz4_block_decompress(b"\x44abcd\x00\x00" + b"\x50WXYZ!")


def test_block_offset_beyond_window_rejected():
    with pytest.raises(ValueError, match="window"):
        lz4_block_decompress(b"\x44abcd\x05\x00" + b"\x50WXYZ!")


def test_block_bomb_guard():
    # nested RLE expansion capped by max_output
    blk = b"\x1fA\x01\x00\xff\xff\xff\x00" + b"\x50tail!"
    with pytest.raises(ValueError, match="bomb"):
        lz4_block_decompress(blk, max_output=100)


# ---------------------------------------------------------------------------
# Block roundtrips
# ---------------------------------------------------------------------------


def test_block_roundtrip_fuzz():
    rng = random.Random(42)
    for trial in range(200):
        n = rng.randrange(0, 4000)
        style = trial % 4
        if style == 0:
            data = os.urandom(n)
        elif style == 1:
            data = (b"the quick brown fox jumps " * (n // 16 + 1))[:n]
        elif style == 2:
            data = bytes(rng.choices(b"ab", k=n))
        else:
            data = b"\x00" * n
        assert lz4_block_decompress(lz4_block_compress(data)) == data, trial


def test_block_roundtrip_empty_and_tiny():
    for data in (b"", b"x", b"abcd", b"abcdabcdabcd"):
        assert lz4_block_decompress(lz4_block_compress(data)) == data


def test_block_end_rules_honored():
    """Spec: last 5 bytes are literals; no match starts in the final 12.
    Check structurally: the final sequence of the compressed stream must
    carry >= 5 literals (unless the input is shorter)."""
    data = b"abcdabcdabcdabcdabcdabcd"  # highly matchable right to the end
    comp = lz4_block_compress(data)
    assert lz4_block_decompress(comp) == data
    # decode the final sequence by walking tokens
    i, last_lit = 0, None
    while i < len(comp):
        token = comp[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                lit += comp[i]
                i += 1
                if comp[i - 1] != 255:
                    break
        i += lit
        last_lit = lit
        if i == len(comp):
            break
        i += 2  # offset
        m = token & 0xF
        if m == 15:
            while True:
                i += 1
                if comp[i - 1] != 255:
                    break
    assert last_lit >= 5


# ---------------------------------------------------------------------------
# Frame format
# ---------------------------------------------------------------------------

BIG = b"".join(b"line %d content abcabcabc\n" % i for i in range(8000))


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"block_checksum": True},
        {"content_checksum": False},
        {"store_content_size": False},
        {"block_size_id": 5},
        {"block_size_id": 7, "block_checksum": True},
    ],
)
def test_frame_roundtrip_options(kw):
    f = lz4_frame_compress(BIG, **kw)
    assert lz4_frame_decompress(f) == BIG


def test_frame_multi_block():
    f = lz4_frame_compress(BIG, block_size_id=4)
    assert len(BIG) > 64 << 10  # really crosses block boundaries
    assert lz4_frame_decompress(f) == BIG


def test_frame_incompressible_stored_raw():
    data = os.urandom(70 << 10)  # > one 64 KB block, incompressible
    f = lz4_frame_compress(data)
    assert lz4_frame_decompress(f) == data
    # stored blocks carry the high bit in the size word
    word = struct.unpack_from("<I", f, 4 + 2 + 8 + 1)[0]
    assert word & 0x80000000


def test_frame_empty():
    assert lz4_frame_decompress(lz4_frame_compress(b"")) == b""


def test_frame_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        lz4_frame_decompress(b"\x00\x11\x22\x33" + b"\x00" * 10)


def test_frame_header_checksum_detected():
    f = bytearray(lz4_frame_compress(BIG))
    f[5] ^= 0x08  # toggle a descriptor flag; HC byte now mismatches
    with pytest.raises(ValueError):
        lz4_frame_decompress(bytes(f))


def test_frame_content_checksum_detected():
    f = bytearray(lz4_frame_compress(b"A" * 1000, content_checksum=True))
    # flip one bit inside the (single) compressed block body
    f[-10] ^= 0x01
    with pytest.raises(ValueError):
        lz4_frame_decompress(bytes(f))


def test_frame_block_checksum_detected():
    f = bytearray(
        lz4_frame_compress(BIG[:1000], block_checksum=True, content_checksum=False)
    )
    f[30] ^= 0x01
    with pytest.raises(ValueError):
        lz4_frame_decompress(bytes(f))


def test_frame_declared_size_mismatch_detected():
    f = bytearray(lz4_frame_compress(b"hello world, hello world", content_checksum=False))
    f[6] ^= 0x01  # declared content size (little-endian u64 at offset 6)
    with pytest.raises(ValueError):
        lz4_frame_decompress(bytes(f))


def test_frame_truncation_fuzz():
    f = lz4_frame_compress(BIG[:5000])
    for cut in range(4, len(f) - 1, 97):
        with pytest.raises(ValueError):
            lz4_frame_decompress(f[:cut])


def test_frame_declared_size_bomb_guard():
    f = lz4_frame_compress(b"x" * 1000)
    with pytest.raises(ValueError, match="bomb"):
        lz4_frame_decompress(f, max_output=10)


# ---------------------------------------------------------------------------
# decompress_auto dispatch
# ---------------------------------------------------------------------------


def test_decompress_auto_speaks_lz4():
    raw = b"mixed-codec corpus line\n" * 40
    assert decompress_auto(lz4_frame_compress(raw)) == raw


def test_decompress_auto_plain_passthrough_unchanged():
    assert decompress_auto(b"just text, no magic") == b"just text, no magic"
