"""Multimodal binary-column plumbing tests (SURVEY.md §2.8 E4): real
Spark-side schema/batching, real pure-numpy decode for uncompressed
PGM/PPM/BMP, deterministically stubbed decode for compressed formats."""

import pytest
from pyspark.sql import functions as F

from yark_spark.operators.multimodal import (
    decode_image,
    extract_features,
    fake_image_features,
    with_binary_payload,
)


def test_decode_unsupported_is_explicitly_stubbed():
    """Lossy VP8 stays a documented NotImplementedError boundary; a
    truncated/garbage JPEG or PNG now routes to the real codec (r8 /
    r11), which raises a PARSE error rather than decoding silently."""
    with pytest.raises(ValueError):  # PNG magic but truncated garbage (r11)
        decode_image(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFFxxxxWEBPVP8 ....")
    with pytest.raises((ValueError, EOFError, NotImplementedError)):
        decode_image(b"\xff\xd8\xffJPEG....")


def test_fake_features_deterministic():
    a = fake_image_features(b"payload")
    b = fake_image_features(b"payload")
    c = fake_image_features(b"other")
    assert a == b
    assert a != c
    assert 64 <= a[0] < 256 and 64 <= a[1] < 256 and a[2] in ("RGB", "L")


def test_binary_payload_roundtrip(spark):
    df = spark.createDataFrame([(1, "héllo wörld")], "doc_id long, text string")
    out = with_binary_payload(df).collect()[0]
    assert bytes(out["payload"]).decode("utf-8") == "héllo wörld"


def test_extract_features_schema_and_batching(spark, sf_dir):
    from yark_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    feats = extract_features(with_binary_payload(docs))
    rows = feats.collect()
    assert len(rows) == 50
    assert set(feats.columns) == {"doc_id", "n_bytes", "sha1_8", "fake_width", "fake_height", "fake_mode"}
    # n_bytes must equal the utf-8 byte length of the text, proving the
    # payload flowed through Arrow batches intact
    joined = feats.join(docs, "doc_id").filter(
        F.col("n_bytes") != F.length(F.encode(F.col("text"), "utf-8"))
    )
    assert joined.count() == 0


def test_extract_features_distributed_partitions(spark, sf_dir):
    """mapInPandas must work per-partition (no driver collect): force many
    partitions and confirm identical results."""
    from yark_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    one = extract_features(with_binary_payload(docs).coalesce(1))
    many = extract_features(with_binary_payload(docs).repartition(8))
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))


def _bmp(width, height, pixels_bgr_rows, bpp=24, compression=0):
    """Hand-build an uncompressed BMP: pixels_bgr_rows is a list of rows,
    TOP first, each a list of (b, g, r[, a]) tuples; written bottom-up."""
    import struct

    nch = bpp // 8
    stride = ((bpp * width + 31) // 32) * 4
    raw = b""
    for row in reversed(pixels_bgr_rows):
        rb = b"".join(bytes(px[:nch]) for px in row)
        raw += rb + b"\x00" * (stride - len(rb))
    header = b"BM" + struct.pack("<IHHI", 54 + len(raw), 0, 0, 54)
    header += struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bpp, compression, len(raw), 0, 0, 0, 0
    )
    return header + raw


def test_decode_bmp_24bpp_bottom_up():
    img = _bmp(2, 2, [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (1, 2, 3)]])
    arr = decode_image(img)
    assert arr.shape == (2, 2, 3)
    # BGR in file -> RGB out; top row first
    assert arr[0, 0].tolist() == [0, 0, 255]
    assert arr[0, 1].tolist() == [0, 255, 0]
    assert arr[1, 0].tolist() == [255, 0, 0]
    assert arr[1, 1].tolist() == [3, 2, 1]


def test_decode_bmp_32bpp_drops_alpha():
    img = _bmp(1, 1, [[(10, 20, 30, 99)]], bpp=32)
    arr = decode_image(img)
    assert arr.shape == (1, 1, 3)
    assert arr[0, 0].tolist() == [30, 20, 10]


def test_decode_bmp_top_down_negative_height():
    import struct

    img = bytearray(_bmp(2, 1, [[(1, 2, 3), (4, 5, 6)]]))
    struct.pack_into("<i", img, 22, -1)  # top-down variant
    arr = decode_image(bytes(img))
    assert arr[0, 0].tolist() == [3, 2, 1]


def test_decode_bmp_rle_rejected():
    img = _bmp(2, 2, [[(0, 0, 0)] * 2] * 2, compression=1)
    with pytest.raises(NotImplementedError):
        decode_image(img)


def test_decode_pgm_with_comment():
    arr = decode_image(b"P5\n# a comment\n3 2\n255\n" + bytes([1, 2, 3, 4, 5, 6]))
    assert arr.shape == (2, 3)
    assert arr.tolist() == [[1, 2, 3], [4, 5, 6]]


def test_decode_ppm_rgb():
    arr = decode_image(b"P6 2 1 255\n" + bytes([9, 8, 7, 1, 2, 3]))
    assert arr.shape == (1, 2, 3)
    assert arr[0, 0].tolist() == [9, 8, 7]  # netpbm is RGB already


def test_decode_image_features_distributed(spark):
    """decode_image_features runs the real decoder inside mapInPandas:
    mixed PGM + BMP payloads, stats verified against the hand-built
    pixels. Map-only plan (no exchange)."""
    from yark_spark.operators.multimodal import decode_image_features
    from yark_spark.plans.explain import count_exchanges

    pgm = b"P5 4 2 255\n" + bytes(range(8))        # mean 3.5
    bmp = _bmp(1, 2, [[(6, 6, 6)], [(0, 0, 0)]])   # mean 3.0
    df = spark.createDataFrame(
        [(1, bytearray(pgm)), (2, bytearray(bmp))], "doc_id long, payload binary"
    ).repartition(2)
    out = decode_image_features(df)
    assert count_exchanges(out) == 0
    rows = {r.doc_id: r for r in out.collect()}
    assert (rows[1].width, rows[1].height, rows[1].channels) == (4, 2, 1)
    assert rows[1].mean_pixel == 3.5
    assert (rows[2].width, rows[2].height, rows[2].channels) == (1, 2, 3)
    assert rows[2].mean_pixel == 3.0


def test_wav_codec_roundtrip_and_chunk_walk():
    """round 7: encode→decode roundtrips samples exactly; the decoder is a
    generic chunk WALK — payloads with an extra (odd-sized) chunk before
    'data' still decode; non-PCM formats raise NotImplementedError."""
    import struct

    import numpy as np
    import pytest

    from yark_spark.operators.multimodal import _make_wav_codec

    encode, decode = _make_wav_codec()
    samples = [0, 1, -1, 32767, -32768, 100]
    rate, ch, got = decode(encode(samples, rate=16000))
    assert (rate, ch) == (16000, 1)
    assert got.tolist() == samples

    # splice an odd-sized LIST chunk between fmt and data (word-aligned pad)
    b = encode(samples, rate=8000)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = b[:fmt_end] + extra + b[fmt_end:]
    rate2, _, got2 = decode(spliced)
    assert rate2 == 8000 and got2.tolist() == samples

    # IEEE-float WAV (fmt=3) must be rejected, not mis-read
    float_fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)
    bad = b[: 12] + float_fmt + b[12 + 24 :]
    with pytest.raises((NotImplementedError, ValueError)):
        decode(bad)

    with pytest.raises(ValueError):
        decode(b"\x00" * 20)


def test_wav_codec_roundtrip_property():
    """round 7: encode→decode is the identity on arbitrary int16 sample
    vectors and sample rates (hypothesis fuzz, no Spark needed)."""
    from hypothesis import given, strategies as st

    from yark_spark.operators.multimodal import _make_wav_codec

    encode, decode = _make_wav_codec()

    @given(
        st.lists(st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=300),
        st.sampled_from([8000, 16000, 22050, 44100]),
    )
    def check(samples, rate):
        r, ch, got = decode(encode(samples, rate=rate))
        assert (r, ch) == (rate, 1)
        assert got.tolist() == samples

    check()


# --- round 8: pure-numpy baseline JPEG codec (operators/jpeg) -------------


def test_jpeg_roundtrip_fidelity_smooth_images():
    """Lossy roundtrip on smooth gray and RGB content stays close (the
    codec's quality knob works): MAE < 2 at q90, < 0.2 at q100."""
    import numpy as np

    from yark_spark.operators.jpeg import decode_jpeg, encode_jpeg

    y, x = np.mgrid[0:48, 0:64]
    gray = np.clip(100 + 60 * np.sin(x / 9.0) + 40 * np.cos(y / 7.0) + x * 0.5, 0, 255).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(gray, quality=90))
    assert d.shape == gray.shape
    assert float(np.abs(d.astype(float) - gray).mean()) < 2.0
    assert float(np.abs(decode_jpeg(encode_jpeg(gray, quality=100)).astype(float) - gray).mean()) < 0.2

    rgb = np.stack([gray, np.roll(gray, 5, 1), 255 - gray], axis=-1)
    d3 = decode_jpeg(encode_jpeg(rgb, quality=90))
    assert d3.shape == rgb.shape
    assert float(np.abs(d3.astype(float) - rgb.astype(float)).mean()) < 2.0


def test_jpeg_odd_sizes_and_extreme_quality():
    import numpy as np

    from yark_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(3)
    for shape in [(1, 1), (8, 8), (9, 7), (7, 9, 3), (1, 40)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for q in (5, 50, 100):
            d = decode_jpeg(encode_jpeg(img, quality=q))
            assert d.shape == img.shape


def test_jpeg_block_constant_gray_q100_is_exact():
    """The q_image_decode_jpeg oracle contract: per-8x8-block-constant
    grayscale at quality 100 roundtrips BIT-EXACTLY (DC-only blocks,
    unit quant) — the lossy codec becomes hash-matchable."""
    import numpy as np

    from yark_spark.operators.jpeg import decode_jpeg, encode_jpeg

    img = np.empty((16, 16), dtype=np.uint8)
    img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = 48, 102, 97, 57
    assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=100)), img)


def test_jpeg_decodes_420_subsampled_stream_with_file_tables():
    """The decoder handles sampling factors beyond what our encoder
    emits: a hand-built 4:2:0 stream (Y h=v=2, one MCU, flat 170 gray,
    tables declared in DHT) must decode to a uniform RGB image."""
    import struct

    import numpy as np

    from yark_spark.operators import jpeg as J

    bw = J._BitWriter()
    dc = J._canonical_codes(J._ENC_DC_BITS, J._ENC_DC_VALS)
    ac = J._canonical_codes(J._ENC_AC_BITS, J._ENC_AC_VALS)

    def put_block(dc_diff):
        size, bits = J._magnitude(dc_diff)
        length, code = dc[size]
        bw.write(code, length)
        if size:
            bw.write(bits, size)
        length, code = ac[0x00]  # EOB: DC-only block
        bw.write(code, length)

    put_block(336)  # first Y block: (170-128)*8
    for _ in range(3):
        put_block(0)  # remaining Y blocks: diff 0
    put_block(0)  # Cb
    put_block(0)  # Cr
    entropy = bw.flush()

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    q = np.ones(64, dtype=np.uint8).tobytes()
    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDB, b"\x00" + q)
    out += seg(
        0xFFC0,
        struct.pack(">BHHB", 8, 16, 16, 3)
        + bytes([1, 0x22, 0])  # Y: h=v=2
        + bytes([2, 0x11, 0])
        + bytes([3, 0x11, 0]),
    )
    out += seg(0xFFC4, bytes([0x00]) + bytes(J._ENC_DC_BITS) + bytes(J._ENC_DC_VALS))
    out += seg(0xFFC4, bytes([0x10]) + bytes(J._ENC_AC_BITS) + bytes(J._ENC_AC_VALS))
    out += seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00]) + b"\x00\x3f\x00")
    out += entropy + b"\xff\xd9"

    rgb = J.decode_jpeg(bytes(out))
    assert rgb.shape == (16, 16, 3)
    assert np.all(rgb == 170)


def test_jpeg_progressive_decodes_bit_equal_to_baseline():
    """Round 9 (VERDICT r8 next-round #2): progressive JPEG (SOF2 —
    spectral selection, successive approximation, DC/AC refinement, EOB
    runs) decodes. The constructed-exact oracle: the progressive encoder
    shares its quantized coefficients with the baseline encoder, so both
    decodes must be BIT-equal — any refinement-path bug shows up as a
    pixel diff."""
    import numpy as np

    from yark_spark.operators import jpeg as J

    rng = np.random.default_rng(7)
    images = [
        rng.integers(0, 256, (41, 67), dtype=np.uint8),  # gray, non-8-mult
        rng.integers(0, 256, (48, 48, 3), dtype=np.uint8),  # color, noisy
        np.fromfunction(
            lambda y, x, c: (x * 3 + y * 2 + c * 40) % 256, (33, 50, 3)
        ).astype(np.uint8),  # smooth gradients (long zero runs, EOB-heavy)
        np.full((16, 24), 170, np.uint8),  # flat (all-EOB AC scans)
    ]
    for img in images:
        for q in (50, 85, 95):
            base = J.decode_jpeg(J.encode_jpeg(img, quality=q))
            prog = J.decode_jpeg(J.encode_jpeg_progressive(img, quality=q))
            assert np.array_equal(base, prog), (img.shape, q)


def test_jpeg_restart_intervals_roundtrip():
    """DRI/RSTn markers (baseline AND progressive): restart streams must
    decode identically to their unrestarted twins — predictors and EOB
    runs reset at every marker, entropy stream re-aligned."""
    import numpy as np

    from yark_spark.operators import jpeg as J

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    plain = J.decode_jpeg(J.encode_jpeg(img, quality=80))
    for ri in (1, 3, 7):
        with_rst = J.decode_jpeg(J.encode_jpeg(img, quality=80, restart_interval=ri))
        assert np.array_equal(plain, with_rst), ri
        prog_rst = J.decode_jpeg(
            J.encode_jpeg_progressive(img, quality=80, restart_interval=ri)
        )
        assert np.array_equal(plain, prog_rst), ri


def test_jpeg_arithmetic_coding_raises_documented_boundary():
    """Arithmetic-coded frames (SOF9/10) remain the documented codec
    boundary now that progressive (SOF2) decodes."""
    import struct

    import pytest

    from yark_spark.operators.jpeg import decode_jpeg

    payload = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    data = (
        b"\xff\xd8"
        + struct.pack(">HH", 0xFFC9, len(payload) + 2)
        + payload
        + b"\xff\xd9"
    )
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(data)


def test_image_dims_parses_all_container_headers():
    """Header-peek parser against hand-built containers, including the
    two WebP variants the fixture builder doesn't emit (VP8 lossy frame
    tag, VP8L packed 14-bit dims)."""
    import struct

    import numpy as np

    from yark_spark.operators.jpeg import encode_jpeg
    from yark_spark.operators.multimodal import image_dims

    png = (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", 640, 360) + b"\x08\x02\x00\x00\x00" + b"\x00" * 4
    )
    assert image_dims(png) == ("png", 640, 360)

    vp8x = (
        b"VP8X" + struct.pack("<I", 10) + b"\x00\x00\x00\x00"
        + (479).to_bytes(3, "little") + (269).to_bytes(3, "little")
    )
    webp_x = b"RIFF" + struct.pack("<I", 4 + len(vp8x)) + b"WEBP" + vp8x
    assert image_dims(webp_x) == ("webp", 480, 270)

    # VP8 lossy: dims are uint16 LE at frame offset 6 (container offset 26)
    vp8 = b"VP8 " + struct.pack("<I", 10) + b"\x00" * 6 + struct.pack("<HH", 320, 240)
    webp_l = b"RIFF" + struct.pack("<I", 4 + len(vp8)) + b"WEBP" + vp8
    assert image_dims(webp_l) == ("webp", 320, 240)

    # VP8L: signature byte 0x2F then 14+14 bit (dims-1) little-endian packed
    bits = (100 - 1) | ((80 - 1) << 14)
    vp8l = b"VP8L" + struct.pack("<I", 5) + b"\x2f" + bits.to_bytes(4, "little")
    webp_ll = b"RIFF" + struct.pack("<I", 4 + len(vp8l)) + b"WEBP" + vp8l
    assert image_dims(webp_ll) == ("webp", 100, 80)

    jp = encode_jpeg(np.zeros((41, 67), dtype=np.uint8), quality=50)
    assert image_dims(jp) == ("jpeg", 67, 41)

    assert image_dims(b"P5\n# c\n33 22\n255\n" + b"\x00" * (33 * 22)) == ("pnm", 33, 22)

    from yark_spark.operators.gif import encode_gif

    gp = encode_gif(np.zeros((22, 44), dtype=np.uint8))
    assert image_dims(gp) == ("gif", 44, 22)

    import pytest

    with pytest.raises(NotImplementedError):
        image_dims(b"TIFF......")


def test_decode_pnm_16bit():
    """16-bit netpbm (round 10): two big-endian bytes per sample per the
    spec; the former NotImplementedError boundary, now decoded."""
    import numpy as np

    from yark_spark.operators.multimodal import decode_image

    arr = np.array([[0, 300], [65535, 1234]], dtype=np.uint16)
    payload = b"P5\n2 2\n65535\n" + arr.astype(">u2").tobytes()
    got = decode_image(payload)
    assert got.dtype == np.uint16
    assert (got == arr).all()

    rgb = np.arange(12, dtype=np.uint16).reshape(2, 2, 3) * 5000
    payload = b"P6\n2 2\n65535\n" + rgb.astype(">u2").tobytes()
    assert (decode_image(payload) == rgb).all()


def _rle8_bmp(indexed, flipped=True):
    """Minimal BI_RLE8 encoder for the test: encoded + absolute runs,
    EOL after each row, EOF at the end."""
    import struct

    h, w = indexed.shape
    rle = bytearray()
    rows = indexed[::-1] if flipped else indexed  # file order is bottom-up
    for r, row in enumerate(rows):
        x = 0
        while x < w:
            run = 1
            while x + run < w and row[x + run] == row[x] and run < 255:
                run += 1
            if run >= 2:
                rle += bytes([run, int(row[x])])
                x += run
            else:
                # absolute mode needs >= 3 literals; pad short tails with
                # 1-pixel encoded runs
                j = x
                while j < w and (j - x) < 255:
                    nxt_same = j + 1 < w and row[j + 1] == row[j]
                    if nxt_same and j - x >= 3:
                        break
                    j += 1
                n = j - x
                if n >= 3:
                    rle += bytes([0, n]) + bytes(int(v) for v in row[x:j])
                    if n & 1:
                        rle += b"\x00"
                else:
                    for v in row[x:j]:
                        rle += bytes([1, int(v)])
                x = j
        rle += b"\x00\x00"  # end of line
    rle += b"\x00\x01"  # end of bitmap
    data_off = 14 + 40 + 256 * 4
    palette = b"".join(bytes([i, i, i, 0]) for i in range(256))
    header = (
        b"BM"
        + struct.pack("<IHHI", data_off + len(rle), 0, 0, data_off)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h if flipped else -h, 1, 8, 1, len(rle), 0, 0, 256, 0
        )
    )
    return header + palette + bytes(rle)


def test_decode_bmp_rle8():
    """BI_RLE8 BMP (round 10): encoded runs, absolute runs, EOL/EOF
    escapes, bottom-up and top-down row order — the former
    NotImplementedError boundary, now decoded to the index plane."""
    import numpy as np

    from yark_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(3)
    img = np.repeat(rng.integers(0, 256, (7, 5), dtype=np.uint8), 3, axis=1)[:, :13]
    for flipped in (True, False):
        got = decode_image(_rle8_bmp(img, flipped=flipped))
        assert got.shape == img.shape
        assert (got == img).all(), flipped
    # literal-heavy content exercises absolute mode
    lit = rng.integers(0, 256, (4, 9), dtype=np.uint8)
    assert (decode_image(_rle8_bmp(lit)) == lit).all()


def test_decode_pixel_histogram_exact(spark):
    """decode_pixel_histogram (round 11): integer-exact per-value counts
    over the PNG quadrant fixture — 192 samples per distinct quadrant
    value (64 pixels x 3 channels), buckets merged on collisions."""
    import hashlib

    from pyspark.sql import functions as F

    from yark_spark.operators.multimodal import (
        decode_pixel_histogram,
        with_png_payload,
    )

    docs = spark.createDataFrame(
        [(1, "alpha doc"), (2, "beta doc")], "doc_id long, text string"
    )
    rows = decode_pixel_histogram(with_png_payload(docs)).collect()
    got = {(r["doc_id"], r["pixel_value"]): r["n"] for r in rows}
    for did, text in [(1, "alpha doc"), (2, "beta doc")]:
        vals = [ord(c) for c in hashlib.md5(text.encode()).hexdigest()[:4]]
        expect = {}
        for v in vals:
            expect[v] = expect.get(v, 0) + 192
        for v, n in expect.items():
            assert got[(did, v)] == n, (did, v)
    assert sum(n for (d, _), n in got.items() if d == 1) == 16 * 16 * 3


def test_decode_bmp_rle4():
    """BI_RLE4 (round 11): runs alternate the value byte's two nibbles;
    absolute mode packs nibbles word-aligned; EOL/EOB/delta escapes."""
    import struct

    # 6x2, bottom-up. Bottom row: run of 5 with 0xAB -> A B A B A, then
    # literal run 1 of 0xC0 -> C. Top row: absolute 6 nibbles 123456.
    data = bytes(
        [5, 0xAB, 1, 0xC0, 0, 0,                 # row 0 + EOL
         0, 6, 0x12, 0x34, 0x56, 0x00,           # absolute 6 (3 bytes + pad)
         0, 1]                                   # EOB
    )
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    hdr += struct.pack("<IiiHHIIiiII", 40, 6, 2, 1, 4, 2, len(data), 0, 0, 0, 0)
    arr = decode_image(hdr + data)
    assert arr.shape == (2, 6)
    assert arr[1].tolist() == [0xA, 0xB, 0xA, 0xB, 0xA, 0xC]  # bottom-up
    assert arr[0].tolist() == [1, 2, 3, 4, 5, 6]


def test_decode_bmp_bitfields_565_and_8888():
    import struct

    import numpy as np

    # 16-bpp 565: one pixel with R=31, G=0, B=16 -> (255, 0, 131)
    px = (31 << 11) | (0 << 5) | 16
    data = struct.pack("<HH", px, 0)  # stride pads to 4 bytes
    hdr = b"BM" + struct.pack("<IHHI", 70 + len(data), 0, 0, 70)
    hdr += struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 16, 3, len(data), 0, 0, 0, 0)
    hdr += struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    hdr += b"\x00" * 4  # pad to the 70-byte data offset
    arr = decode_image(hdr + data)
    assert arr.shape == (1, 1, 3)
    assert arr[0, 0].tolist() == [255, 0, 16 * 255 // 31]

    # 32-bpp 8888 (alpha mask ignored -> RGB out)
    data = struct.pack("<I", (0x11 << 16) | (0x22 << 8) | 0x33)
    hdr = b"BM" + struct.pack("<IHHI", 70 + len(data), 0, 0, 70)
    hdr += struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 32, 3, len(data), 0, 0, 0, 0)
    hdr += struct.pack("<III", 0x00FF0000, 0x0000FF00, 0x000000FF)
    hdr += b"\x00" * 4
    arr = decode_image(hdr + data)
    assert arr[0, 0].tolist() == [0x11, 0x22, 0x33]


def test_jpeg_16bit_quant_tables_decode():
    """A DQT rewritten to Pq=1 (16-bit entries, same values) must decode
    to identical pixels — the r11 boundary removal (T.81 B.2.4.1)."""
    import struct

    import numpy as np

    from yark_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(24, 17), dtype=np.uint8)
    payload = encode_jpeg(img, quality=90)

    def widen_dqt(p: bytes) -> bytes:
        out = bytearray()
        pos = 0
        while pos < len(p):
            if p[pos] == 0xFF and pos + 1 < len(p) and p[pos + 1] == 0xDB:
                (seglen,) = struct.unpack_from(">H", p, pos + 2)
                seg = p[pos + 4 : pos + 2 + seglen]
                body = bytearray()
                sp = 0
                while sp < len(seg):
                    tq = seg[sp] & 0x0F
                    body.append(0x10 | tq)  # Pq=1
                    for v in seg[sp + 1 : sp + 65]:
                        body += struct.pack(">H", v)
                    sp += 65
                out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
                pos += 2 + seglen
            else:
                out.append(p[pos])
                pos += 1
        return bytes(out)

    a = decode_jpeg(payload)
    b = decode_jpeg(widen_dqt(payload))
    assert np.array_equal(a, b)


def test_decode_bmp_core_header():
    """BITMAPCOREHEADER (12-byte OS/2 header, uint16 dims) decodes and
    header-peeks — the r11 boundary removal."""
    import struct

    import numpy as np

    from yark_spark.operators.multimodal import image_dims

    # 2x2 24bpp, bottom-up, rows padded to 4 bytes (stride 8)
    rows = [bytes([1, 2, 3, 4, 5, 6]) + b"\x00\x00",   # bottom row (BGR)
            bytes([7, 8, 9, 10, 11, 12]) + b"\x00\x00"]  # top row
    raw = rows[0] + rows[1]
    hdr = b"BM" + struct.pack("<IHHI", 26 + len(raw), 0, 0, 26)
    hdr += struct.pack("<IHHHH", 12, 2, 2, 1, 24)
    payload = hdr + raw
    arr = decode_image(payload)
    assert arr.shape == (2, 2, 3)
    assert arr[0, 0].tolist() == [9, 8, 7]    # top-left, BGR->RGB
    assert arr[1, 1].tolist() == [6, 5, 4]
    assert image_dims(payload) == ("bmp", 2, 2)


def test_decode_bmp_unknown_header_size_raises():
    import struct

    base = _bmp(1, 1, [[(0, 0, 0)]])
    p = bytearray(base)
    struct.pack_into("<I", p, 14, 16)  # neither 12 nor >=40
    with pytest.raises(ValueError, match="header size"):
        decode_image(bytes(p))


def test_jpeg_12bit_extended_sequential_decode():
    """Hand-built SOF1 12-bit gray frame (r11 boundary removal): one
    8x8 block, DC=1000 with q00=8 -> orthonormal IDCT constant 1000,
    level shift 2048 -> every pixel exactly 3048 as uint16."""
    import struct

    import numpy as np

    from yark_spark.operators.jpeg import decode_jpeg

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    qt = bytes([0]) + bytes([8] + [1] * 63)  # Pq=0, q00=8 (zigzag first)
    sof = struct.pack(">BHHB", 12, 8, 8, 1) + bytes([1, 0x11, 0])
    dc_dht = bytes([0x00]) + bytes([0, 0, 0, 0, 16] + [0] * 11) + bytes(range(16))
    ac_dht = bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    # DC: symbol 10 (5 bits: 01010) + 1000 (10 bits) + AC EOB (1 bit '0')
    entropy = bytes([0b01010111, 0b11010000])
    payload = (
        b"\xff\xd8"
        + seg(0xFFDB, qt)
        + seg(0xFFC1, sof)
        + seg(0xFFC4, dc_dht)
        + seg(0xFFC4, ac_dht)
        + seg(0xFFDA, sos)
        + entropy
        + b"\xff\xd9"
    )
    out = decode_jpeg(payload)
    assert out.dtype == np.uint16 and out.shape == (8, 8)
    assert (out == 3048).all()


def test_jpeg_12bit_baseline_sof0_rejected():
    """12-bit in SOF0 is malformed (baseline is 8-bit by definition)."""
    import struct

    from yark_spark.operators.jpeg import decode_jpeg

    sof = struct.pack(">BHHB", 12, 8, 8, 1) + bytes([1, 0x11, 0])
    payload = (
        b"\xff\xd8" + struct.pack(">HH", 0xFFC0, len(sof) + 2) + sof + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(payload)


# ---------------------------------------------------------------------------
# Round 12: ADVICE fixes — quarantine catch list + lenient listing keys
# ---------------------------------------------------------------------------


def test_quarantine_catches_truncated_headers(spark):
    """Payloads truncated mid-header raise struct.error / IndexError
    inside the header parsers (not ValueError) — the quarantine must
    catch those too, or one corrupt crawled byte-string kills the task
    (round-12 ADVICE)."""
    from yark_spark.operators.multimodal import decode_image_features_quarantine

    payloads = [
        (1, b"BM" + b"\x00" * 14),          # truncated BMP header
        (2, b"\xff\xd8\xff\xe0\x00"),       # truncated JPEG segment length
        (3, b"RIFF\x04\x00\x00\x00WAVE"),   # WAV with no fmt chunk
        (4, b"GIF89a\x10\x00"),             # truncated GIF descriptor
        (5, b"\x89PNG\r\n\x1a\n\x00\x00"),  # truncated PNG chunk header
    ]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    rows = {r["doc_id"]: r for r in decode_image_features_quarantine(df).collect()}
    assert len(rows) == 5
    for did, r in rows.items():
        assert r["error"] is not None, f"doc {did} should be quarantined"
        assert r["width"] is None and r["mean_pixel"] is None


def test_tar_listing_non_numeric_member_null_doc_id(spark):
    """A member whose name doesn't start with digits (a real-world tar
    README, a PAX leftover) yields a null doc_id instead of failing the
    whole shard listing (round-12 ADVICE)."""
    import io
    import tarfile

    from yark_spark.operators.multimodal import tar_member_listing

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in [("README.txt", b"hello"), ("00042.txt", b"doc body")]:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    df = spark.createDataFrame([(0, bytearray(buf.getvalue()))], "shard_id long, payload binary")
    rows = sorted(tar_member_listing(df).collect(), key=lambda r: r["name"])
    assert [r["name"] for r in rows] == ["00042.txt", "README.txt"]
    assert rows[0]["doc_id"] == 42
    assert rows[1]["doc_id"] is None
    assert rows[1]["size_bytes"] == 5


def test_warc_listing_warcinfo_null_doc_id(spark):
    """Real Common Crawl segments open with a warcinfo record that has
    no WARC-Target-URI — the listing must emit it with a null doc_id,
    not crash on int('') (round-12 ADVICE)."""
    from yark_spark.operators.multimodal import warc_record_listing, with_warc_shards

    docs = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(4)], "doc_id long, text string"
    )
    out = warc_record_listing(with_warc_shards(docs, http_head=True)).collect()
    info = [r for r in out if r["warc_type"] == "warcinfo"]
    resp = [r for r in out if r["warc_type"] == "response"]
    assert len(info) == 1 and info[0]["doc_id"] is None
    assert sorted(r["doc_id"] for r in resp) == [0, 1, 2, 3]


def test_wet_extractors_tolerate_non_numeric_uris(spark):
    """Both WET extractors emit null doc_id for response records whose
    URI tail is not the numeric fixture key (real CC URIs end in e.g.
    index.html) instead of failing the shard (round-12 self-review)."""
    from yark_spark.operators.containers import warc_build
    from yark_spark.operators.multimodal import warc_wet_extract, warc_wet_html_extract

    records = [
        {
            "type": "response",
            "uri": "https://example.com/page/index.html",
            "record_id": "urn:uuid:1",
            "block": b"HTTP/1.1 200 OK\r\n\r\n<p>real page</p>",
        },
        {
            "type": "response",
            "uri": "https://example.com/doc/7",
            "record_id": "urn:uuid:2",
            "block": b"HTTP/1.1 200 OK\r\n\r\n<p>doc body</p>",
        },
    ]
    payload = warc_build(records, per_record_gzip=True)
    df = spark.createDataFrame([(0, bytearray(payload))], "shard_id long, payload binary")
    for fn in (warc_wet_extract, warc_wet_html_extract):
        rows = sorted(fn(df).collect(), key=lambda r: (r["doc_id"] is None, r["doc_id"]))
        assert len(rows) == 2
        assert rows[0]["doc_id"] == 7 and rows[1]["doc_id"] is None
