"""operators/png: the from-scratch PNG codec (round 11, VERDICT r10
next-round #1) — DEFLATE inflate pinned against stdlib zlib (an
independent implementation producing stored/fixed/dynamic blocks),
roundtrips across the color-type x depth x filter matrix, checksum and
container validation, and fuzz (no hangs, typed errors only).

Sparkless: the kernels are plain numpy; the Spark-side plumbing is
covered by q_image_decode_png's driver/parity rows and the multimodal
integration test at the bottom (which routes through decode_image)."""

import random
import struct
import zlib

import numpy as np
import pytest

from yark_spark.operators import png as P


# ---------------------------------------------------------------------------
# checksums + DEFLATE, differential vs stdlib zlib
# ---------------------------------------------------------------------------


def test_checksums_match_stdlib():
    rnd = random.Random(0)
    for n in (0, 1, 17, 5551, 5552, 5553, 20000):
        data = bytes(rnd.randrange(256) for _ in range(n))
        assert P.crc32(data) == zlib.crc32(data)
        assert P.adler32(data) == zlib.adler32(data)


@pytest.mark.parametrize("level", [0, 1, 6, 9])
def test_inflate_differential_vs_stdlib(level):
    """stdlib zlib emits stored (level 0), fixed, and dynamic-Huffman
    blocks with real LZ77 matches — streams this repo's encoder cannot
    produce, so the decoder's dynamic path is pinned independently."""
    rnd = random.Random(level)
    cases = [
        b"",
        b"x",
        bytes(rnd.randrange(256) for _ in range(20000)),  # incompressible
        b"abcabcabc" * 4000,  # long matches, all distances small
        bytes(rnd.randrange(4) for _ in range(40000)),  # skewed alphabet
        (b"A" * 300 + b"B") * 150,  # max-length (258) matches
    ]
    for payload in cases:
        assert P.zlib_decompress(zlib.compress(payload, level)) == payload


def test_inflate_large_distance_matches():
    """Distances beyond 24577 base (the top generated table rows)."""
    rnd = random.Random(9)
    block = bytes(rnd.randrange(256) for _ in range(30000))
    payload = block + b"\x00" * 100 + block  # forces ~30k-distance matches
    assert P.zlib_decompress(zlib.compress(payload, 9)) == payload


def test_generated_tables_match_rfc1951():
    """Spot-check the generated length/distance tables against the
    RFC's corner entries."""
    assert P._LEN_TABLE[0] == (3, 0)  # symbol 257
    assert P._LEN_TABLE[8] == (11, 1)  # symbol 265
    assert P._LEN_TABLE[27] == (227, 5)  # symbol 284
    assert P._LEN_TABLE[28] == (258, 0)  # symbol 285
    assert P._DIST_TABLE[0] == (1, 0)
    assert P._DIST_TABLE[4] == (5, 1)
    assert P._DIST_TABLE[29] == (24577, 13)


def test_own_deflate_accepted_by_stdlib():
    rnd = random.Random(3)
    data = bytes(rnd.randrange(256) for _ in range(70000))  # > one stored block
    for method in ("stored", "fixed"):
        z = P.zlib_compress(data, method)
        assert zlib.decompress(z) == data
        assert P.zlib_decompress(z) == data


def test_zlib_container_validation():
    good = P.zlib_compress(b"hello world", "fixed")
    with pytest.raises(ValueError, match="Adler"):
        P.zlib_decompress(good[:-1] + bytes([good[-1] ^ 1]))
    with pytest.raises(ValueError, match="check bits"):
        P.zlib_decompress(bytes([good[0], good[1] ^ 1]) + good[2:])
    with pytest.raises(ValueError, match="deflate"):
        P.zlib_decompress(b"\x77\x01" + good[2:])
    # an FDICT stream without its dictionary is a typed error (round 11:
    # FDICT itself is now supported — see test_fdict_preset_dictionary)
    cmf = 0x78
    flg_fdict = 0x20
    flg_fdict += (31 - (cmf * 256 + flg_fdict) % 31) % 31
    with pytest.raises(ValueError, match="preset dictionary"):
        P.zlib_decompress(bytes([cmf, flg_fdict]) + b"\x00" * 4 + good[2:])


def test_stored_block_len_nlen_guard():
    raw = P._deflate_stored(b"abcdef")
    bad = bytearray(raw)
    bad[2] ^= 0xFF  # corrupt NLEN
    with pytest.raises(ValueError, match="LEN/NLEN"):
        P.inflate(bytes(bad))


def test_max_output_bomb_guard():
    z = zlib.compress(b"\x00" * 1_000_000, 9)  # ~1 kB -> 1 MB
    with pytest.raises(ValueError, match="max_output"):
        P.inflate(z[2:-4], max_output=10_000)


# ---------------------------------------------------------------------------
# PNG roundtrips: color types x filters x deflate methods
# ---------------------------------------------------------------------------

_RNG = np.random.RandomState(7)


@pytest.mark.parametrize("shape", [(16, 16), (16, 16, 2), (16, 16, 3), (16, 16, 4), (5, 7, 3), (1, 1), (3, 1, 4)])
@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4, "mixed"])
def test_roundtrip_8bit(shape, ft):
    img = _RNG.randint(0, 256, size=shape).astype(np.uint8)
    for method in ("stored", "fixed"):
        b = P.encode_png(img, filter_type=ft, deflate=method, idat_chunk=37)
        got = P.decode_png(b)
        assert got.shape == img.shape and (got == img).all()


@pytest.mark.parametrize("shape", [(8, 8), (9, 11, 3), (4, 4, 4)])
def test_roundtrip_16bit(shape):
    img = _RNG.randint(0, 65536, size=shape).astype(np.uint16)
    got = P.decode_png(P.encode_png(img, filter_type="mixed"))
    assert got.dtype == np.uint16 and (got == img).all()


def test_roundtrip_palette_and_trns():
    idx = _RNG.randint(0, 5, size=(10, 10)).astype(np.uint8)
    pal = _RNG.randint(0, 256, size=(5, 3)).astype(np.uint8)
    got = P.decode_png(P.encode_png(idx, palette=pal, filter_type="mixed"))
    assert (got == pal[idx]).all()
    got_a = P.decode_png(
        P.encode_png(idx, palette=pal, trns=bytes([0, 50, 100]), filter_type=1)
    )
    assert got_a.shape == (10, 10, 4)
    exp_alpha = np.array([0, 50, 100, 255, 255], dtype=np.uint8)[idx]
    assert (got_a[:, :, 3] == exp_alpha).all()
    assert (got_a[:, :, :3] == pal[idx]).all()


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_gray_decode(depth):
    """Hand-packed sub-byte grayscale (the encoder emits 8/16-bit only):
    samples MSB-first within each byte, rows padded to byte boundary."""
    w, h = 11, 5  # non-multiple of samples-per-byte: exercises padding
    maxv = (1 << depth) - 1
    img = _RNG.randint(0, maxv + 1, size=(h, w)).astype(np.uint8)
    stride = (w * depth + 7) // 8
    rows = bytearray()
    for y in range(h):
        rows.append(0)  # filter None
        acc, nbits, rowb = 0, 0, bytearray()
        for x in range(w):
            acc = (acc << depth) | int(img[y, x])
            nbits += depth
            if nbits == 8:
                rowb.append(acc)
                acc, nbits = 0, 0
        if nbits:
            rowb.append(acc << (8 - nbits))
        assert len(rowb) == stride
        rows += rowb
    z = P.zlib_compress(bytes(rows), "fixed")
    png = bytearray(b"\x89PNG\r\n\x1a\n")
    png += P._chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0))
    png += P._chunk(b"IDAT", z)
    png += P._chunk(b"IEND", b"")
    got = P.decode_png(bytes(png))
    assert (got == img).all()


def test_paeth_predictor_spec_cases():
    # ties break left, then above (ISO 15948 §9.4)
    assert P._paeth(1, 1, 1) == 1
    assert P._paeth(5, 5, 0) == 5  # p=10: pa=5, pb=5, pc=10 -> left on tie
    assert P._paeth(50, 52, 50) == 52  # p=52: pb=0 -> above
    assert P._paeth(10, 20, 15) == 15  # p=15: pc=0 -> upper-left
    assert P._paeth(100, 50, 10) == 100  # p=140: pa=40, pb=90, pc=130


def test_multi_idat_and_ancillary_chunks():
    img = _RNG.randint(0, 256, size=(12, 12, 3)).astype(np.uint8)
    b = bytearray(P.encode_png(img, idat_chunk=16))
    # splice an ancillary tEXt chunk after IHDR — must be skipped
    ihdr_end = 8 + 12 + 13
    text = P._chunk(b"tEXt", b"Comment\x00hi")
    spliced = bytes(b[:ihdr_end]) + text + bytes(b[ihdr_end:])
    assert (P.decode_png(spliced) == img).all()


# ---------------------------------------------------------------------------
# validation + boundaries + fuzz
# ---------------------------------------------------------------------------


def test_chunk_crc_detects_corruption():
    img = _RNG.randint(0, 256, size=(8, 8)).astype(np.uint8)
    b = bytearray(P.encode_png(img))
    b[40] ^= 0x01  # inside IDAT payload region
    with pytest.raises(ValueError, match="CRC|Adler|deflate"):
        P.decode_png(bytes(b))


@pytest.mark.parametrize(
    "shape", [(16, 16, 3), (7, 5), (1, 1), (2, 2, 4), (3, 9), (8, 8, 2), (13, 17, 3), (4, 1), (1, 9, 4)]
)
def test_adam7_interlaced_roundtrip(shape):
    """Adam7 decode + encode (round 11): seven independently filtered
    pass sub-images scattered onto the 8x8 grid; odd/small shapes
    exercise EMPTY passes (pw or ph == 0) and ragged pass strides."""
    img = _RNG.randint(0, 256, size=shape).astype(np.uint8)
    for ft in (0, 4, "mixed"):
        b = P.encode_png(img, filter_type=ft, interlace=True, idat_chunk=41)
        got = P.decode_png(b)
        assert got.shape == img.shape and (got == img).all(), (shape, ft)


def test_adam7_16bit_and_palette():
    img16 = _RNG.randint(0, 65536, size=(11, 6, 3)).astype(np.uint16)
    assert (P.decode_png(P.encode_png(img16, interlace=True)) == img16).all()
    idx = _RNG.randint(0, 7, size=(9, 13)).astype(np.uint8)
    pal = _RNG.randint(0, 256, size=(7, 3)).astype(np.uint8)
    assert (P.decode_png(P.encode_png(idx, palette=pal, interlace=True)) == pal[idx]).all()


def test_adam7_pass_grid_matches_spec():
    """The canonical 8x8 Adam7 stencil, rendered from the pass table."""
    grid = np.zeros((8, 8), dtype=int)
    for i, (x0, y0, dx, dy) in enumerate(P._ADAM7, start=1):
        assert (grid[y0::dy, x0::dx] == 0).all()  # passes never overlap
        grid[y0::dy, x0::dx] = i
    expect = [
        [1, 6, 4, 6, 2, 6, 4, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [5, 6, 5, 6, 5, 6, 5, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [3, 6, 4, 6, 3, 6, 4, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [5, 6, 5, 6, 5, 6, 5, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
    ]
    assert grid.tolist() == expect
    # a truncated interlaced stream is a typed error, not a crash
    img = _RNG.randint(0, 256, size=(8, 8)).astype(np.uint8)
    b = P.encode_png(img, interlace=True)
    with pytest.raises((ValueError, NotImplementedError)):
        P.decode_png(b[:60])


def test_signature_and_structure_validation():
    with pytest.raises(ValueError, match="signature"):
        P.decode_png(b"NOTAPNG" + b"\x00" * 64)
    img = _RNG.randint(0, 256, size=(4, 4)).astype(np.uint8)
    b = P.encode_png(img)
    with pytest.raises(ValueError):
        P.decode_png(b[:30])  # truncated mid-chunk


def test_decoder_never_hangs_on_fuzzed_payloads():
    """Random mutations of a valid PNG and pure-random buffers must
    terminate with a typed error or a successful decode — never hang or
    raise something untyped (the quarantine contract)."""
    img = _RNG.randint(0, 256, size=(8, 8, 3)).astype(np.uint8)
    base = bytearray(P.encode_png(img, filter_type="mixed"))
    rnd = random.Random(11)
    for _ in range(300):
        mut = bytearray(base)
        for _ in range(rnd.randrange(1, 6)):
            mut[rnd.randrange(len(mut))] = rnd.randrange(256)
        try:
            P.decode_png(bytes(mut))
        except (ValueError, NotImplementedError, IndexError, struct.error):
            pass
    for _ in range(100):
        blob = bytes(rnd.randrange(256) for _ in range(rnd.randrange(0, 200)))
        try:
            P.decode_png(b"\x89PNG\r\n\x1a\n" + blob)
        except (ValueError, NotImplementedError, IndexError, struct.error):
            pass


def test_decode_image_routes_png():
    """multimodal.decode_image dispatches PNG payloads to the codec."""
    from yark_spark.operators.multimodal import decode_image

    img = _RNG.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    got = decode_image(P.encode_png(img, filter_type="mixed", deflate="fixed"))
    assert (got == img).all()


def test_quadrant_fixture_mean_matches_analytic_oracle_shape():
    """The q_image_decode_png exactness argument in miniature: the
    encoder is lossless, so the decoded mean of the quadrant-gray RGB
    fixture equals (a+b+c+d)/4 exactly."""
    import hashlib

    text = "the quick brown fox"
    vals = [ord(c) for c in hashlib.md5(text.encode()).hexdigest()[:4]]
    img = np.empty((16, 16), dtype=np.uint8)
    img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = vals
    rgb = np.repeat(img[:, :, None], 3, axis=2)
    b = P.encode_png(rgb, filter_type="mixed", deflate="fixed", idat_chunk=64)
    got = P.decode_png(b)
    assert got.shape == (16, 16, 3)
    assert float(got.mean()) == sum(vals) / 4.0


# ---------------------------------------------------------------------------
# dynamic-Huffman + LZ77 ENCODER (round 11 — the boundary closed)
# ---------------------------------------------------------------------------


def test_dynamic_deflate_accepted_by_stdlib_and_own_inflate():
    rnd = random.Random(21)
    cases = [
        b"", b"x", b"abc",
        b"abcabcabcabc" * 1000,                              # long matches
        bytes(rnd.randrange(256) for _ in range(30000)),     # incompressible
        bytes(rnd.randrange(4) for _ in range(30000)),       # skewed alphabet
        (b"A" * 300 + b"B") * 100,                           # 258-length runs
        b"\x00" * 50000,                                     # one giant run
    ]
    for payload in cases:
        z = P.zlib_compress(payload, "dynamic")
        assert zlib.decompress(z) == payload, len(payload)
        assert P.zlib_decompress(z) == payload, len(payload)


def test_dynamic_deflate_actually_compresses():
    src = open(__file__, "rb").read()
    z_dyn = P.zlib_compress(src, "dynamic")
    z_fix = P.zlib_compress(src, "fixed")
    z_std = zlib.compress(src, 6)
    assert zlib.decompress(z_dyn) == src
    assert len(z_dyn) < len(z_fix) / 2          # LZ77 + dynamic codes bite
    assert len(z_dyn) < len(z_std) * 1.15       # within 15% of stdlib -6


def test_package_merge_respects_limit_and_kraft():
    rnd = random.Random(4)
    for maxlen in (7, 15):
        for trial in range(20):
            # 7-bit is the code-length code (19-symbol alphabet); 15-bit
            # is lit/dist (up to 286)
            n = rnd.randrange(2, 19) if maxlen == 7 else rnd.randrange(2, 280)
            freqs = [rnd.choice([0, 1, 1, 5, 100, 10000]) for _ in range(n)]
            if sum(1 for f in freqs if f) < 2:
                freqs[0] = freqs[1] = 1
            lens = P._limited_code_lengths(freqs, maxlen)
            used = [(s, l) for s, l in enumerate(lens) if l]
            assert all(1 <= l <= maxlen for _, l in used)
            assert all(lens[s] == 0 for s, f in enumerate(freqs) if f == 0)
            # Kraft equality for a complete prefix code
            assert sum(2 ** (maxlen - l) for _, l in used) <= 2**maxlen
            # the code must be decodable by the canonical constructor
            P._Huff(lens)


def test_rle_lengths_reconstructs():
    rnd = random.Random(8)
    for _ in range(50):
        lens = []
        while len(lens) < rnd.randrange(1, 320):
            v = rnd.choice([0, 0, 0, 3, 7, 12])
            lens += [v] * rnd.randrange(1, 160)
        out = []
        for sym, eb, ev in P._rle_lengths(lens):
            if sym < 16:
                out.append(sym)
            elif sym == 16:
                out += [out[-1]] * (3 + ev)
            elif sym == 17:
                out += [0] * (3 + ev)
            else:
                out += [0] * (11 + ev)
        assert out == lens


def _reference_lz77_tokens(raw: bytes, max_chain: int = 128, start: int = 0):
    """The straightforward per-byte greedy hash-chain matcher — the
    spec the vectorized ``_lz77_tokens`` must reproduce token-for-token
    (its segment-wise key precompute, best-len candidate filter and
    32-byte-stride match extension are implementation speedups only,
    round 18)."""
    n = len(raw)
    head = {}
    for k in range(max(0, min(start, n - 2))):
        kk = raw[k] | (raw[k + 1] << 8) | (raw[k + 2] << 16)
        head.setdefault(kk, []).append(k)
    i = start
    while i < n:
        best_len = 0
        best_dist = 0
        if i + 3 <= n:
            key = raw[i] | (raw[i + 1] << 8) | (raw[i + 2] << 16)
            chain = head.get(key)
            if chain:
                limit = min(258, n - i)
                for j in reversed(chain[-max_chain:]):
                    if i - j > 32768:
                        break
                    length = 0
                    while length < limit and raw[j + length] == raw[i + length]:
                        length += 1
                    if length > best_len:
                        best_len = length
                        best_dist = i - j
                        if length == limit:
                            break
        if best_len >= 3:
            yield (best_len, best_dist)
            end = min(i + best_len, n - 2)
            for k in range(i, end):
                kk = raw[k] | (raw[k + 1] << 8) | (raw[k + 2] << 16)
                head.setdefault(kk, []).append(k)
            i += best_len
        else:
            if i + 3 <= n:
                head.setdefault(key, []).append(i)
            yield raw[i]
            i += 1


def test_vectorized_matcher_matches_reference_tokens():
    rng = random.Random(1811)
    seg = 1 << 18
    payloads = [
        (b"", 0), (b"a", 0), (b"ab", 0), (b"abc", 0), (b"abcabc", 0),
        (b"ababababab" * 10, 0),                  # overlapping copies
        (bytes(range(256)) * 8, 0),               # long exact repeats
        (b"\x00" * 70_000, 0),                    # one giant run
        (rng.randbytes(120_000), 0),              # incompressible
        (rng.randbytes(seg + 17), 0),             # crosses a key segment
        (b"\x00" * (seg + 300), 0),               # match covers segments
        (b"k,text\n" + b"".join(b"%d,text-%d\n" % (i, i) for i in range(8000)), 0),
        # pre-seeded window (the zstd dictionary path): tokens start
        # mid-buffer, matches may reach back into the window
        (b"the quick brown fox " * 30 + b"the quick brown fox jumps", 600),
        (rng.randbytes(512) + b"needle" * 40, 512),
    ]
    for p, start in payloads:
        for mc in (8, 64, 128):
            got = list(P._lz77_tokens(p, max_chain=mc, start=start))
            want = list(_reference_lz77_tokens(p, max_chain=mc, start=start))
            assert got == want, (len(p), start, mc)


def test_lz77_tokens_reconstruct():
    rnd = random.Random(12)
    for _ in range(20):
        raw = bytes(rnd.choice(b"abcd") for _ in range(rnd.randrange(0, 3000)))
        out = bytearray()
        for t in P._lz77_tokens(raw):
            if isinstance(t, tuple):
                length, dist = t
                assert 3 <= length <= 258 and 1 <= dist <= 32768
                start = len(out) - dist
                assert start >= 0
                for i in range(length):
                    out.append(out[start + i])
            else:
                out.append(t)
        assert bytes(out) == raw


@pytest.mark.parametrize("shape", [(16, 16, 3), (64, 64), (33, 17, 4)])
@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_dynamic_deflate(shape, interlace):
    img = _RNG.randint(0, 256, size=shape).astype(np.uint8)
    b = P.encode_png(img, deflate="dynamic", interlace=interlace, idat_chunk=99)
    assert (P.decode_png(b) == img).all()


def test_fdict_preset_dictionary_differential():
    """FDICT (round 11): streams produced by stdlib compressobj(zdict=)
    decode with the dictionary, and fail typed without it / with the
    wrong one. PNG itself forbids FDICT; this is the bare-zlib mode."""
    rnd = random.Random(2)
    d = b"the quick brown fox jumps over the lazy dog " * 20
    payloads = [
        b"the quick brown fox is back",
        d[:500] + b"xyz",
        bytes(rnd.randrange(256) for _ in range(5000)),
    ]
    for payload in payloads:
        co = zlib.compressobj(6, zlib.DEFLATED, 15, 8, zlib.Z_DEFAULT_STRATEGY, d)
        z = co.compress(payload) + co.flush()
        assert z[1] & 0x20  # FDICT bit set
        assert P.zlib_decompress(z, dictionary=d) == payload
        with pytest.raises(ValueError, match="preset dictionary"):
            P.zlib_decompress(z)
        with pytest.raises(ValueError, match="DICTID"):
            P.zlib_decompress(z, dictionary=b"wrong")


def test_inflate_window_seed_excluded_from_output():
    seedful = P.inflate(P._deflate_stored(b"abc"), window=b"0123456789")
    assert seedful == b"abc"  # the seed never leaks into the output
