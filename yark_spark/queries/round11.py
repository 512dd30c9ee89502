"""Round-11 operator batch (VERDICT r10 next-round list): PNG pixel
decode gains a constructed-exact oracle key (item #1) over the
from-scratch DEFLATE + filter codec in ``operators/png`` — the last
common thumbnail format whose pixels the engine could not decode.

Reference parity note: the reference archiver stores whatever thumbnail
bytes YouTube serves into its BLOB column opaquely
(/root/reference/cmds/archive.py:88-91); PNG sits beside the JPEG and
WebP payloads the engine already decodes (operators/jpeg,
operators/webp).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yark_spark.io import load_table
from yark_spark.registry import query

# ---------------------------------------------------------------------------
# PNG pixel decode — DEFLATE inflate + the five filters, analytically exact
# ---------------------------------------------------------------------------

_PNG_ORACLE = (
    "WITH v AS (SELECT doc_id, "
    "ascii(substr(md5(text), 1, 1)) AS a, ascii(substr(md5(text), 2, 1)) AS b, "
    "ascii(substr(md5(text), 3, 1)) AS c, ascii(substr(md5(text), 4, 1)) AS d "
    "FROM documents WHERE doc_id < 100) "
    "SELECT doc_id, CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height, "
    "CAST(3 AS INTEGER) AS channels, "
    "round((a + b + c + d) / 4.0, 6) AS mean_pixel FROM v"
)


@query("q_image_decode_png", oracle=_PNG_ORACLE)
def q_image_decode_png(spark, sf_dir):
    """E4 PNG pixel decode (round 11, VERDICT r10 next-round #1): REAL
    DEFLATE inflate (dynamic-Huffman + LZ77 entropy decode over
    multi-IDAT zlib streams, CRC-32 + Adler-32 verified) and the full five-filter
    reconstruction (operators/png) of payloads built by the in-repo PNG
    encoder with the all-five filter rotation, hash-matched against an
    ANALYTIC oracle: the codec is lossless, so the decoded mean of the
    16x16 quadrant-gray RGB fixture (all three channels equal) is
    exactly (a+b+c+d)/4 of the doc's first four md5-hex ascii codes — a
    value DuckDB computes without any image code. Both deflate
    directions are pinned by stdlib-zlib differentials and the full
    color-type/depth/filter matrix — Adam7 interlace included — by
    roundtrip + fuzz tests in tests/test_png.py (reference stores
    thumbnail bytes opaquely: cmds/archive.py:88-91).
    Map-only mapInPandas end to end — the payload bytes never shuffle.
    """
    from yark_spark.operators.multimodal import decode_image_features, with_png_payload

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return decode_image_features(with_png_payload(docs))


# ---------------------------------------------------------------------------
# Exact pixel-value histogram — decode checked value-by-value, not by mean
# ---------------------------------------------------------------------------

_PIXEL_HIST_ORACLE = (
    "WITH v AS (SELECT doc_id, "
    "ascii(substr(md5(text), 1, 1)) AS a, ascii(substr(md5(text), 2, 1)) AS b, "
    "ascii(substr(md5(text), 3, 1)) AS c, ascii(substr(md5(text), 4, 1)) AS d "
    "FROM documents WHERE doc_id < 100), "
    "u AS (SELECT doc_id, a AS pv FROM v UNION ALL SELECT doc_id, b FROM v "
    "UNION ALL SELECT doc_id, c FROM v UNION ALL SELECT doc_id, d FROM v) "
    "SELECT doc_id, CAST(pv AS INTEGER) AS pixel_value, "
    "CAST(count(*) * 192 AS BIGINT) AS n FROM u GROUP BY doc_id, pv"
)


@query("q_image_pixel_hist", oracle=_PIXEL_HIST_ORACLE)
def q_image_pixel_hist(spark, sf_dir):
    """E84 exact pixel-value histogram (round 11): decode the PNG
    quadrant fixture and count every sample value — INTEGER-exact, so
    the DuckDB oracle checks the decode stack value-by-value instead of
    through a float mean: each 8x8 quadrant contributes 64 pixels x 3
    RGB channels = 192 samples of its md5-derived gray value, and equal
    quadrant values merge buckets (count(*) x 192 in the oracle). Any
    single wrong byte out of inflate/unfilter shifts a bucket and fails
    the hash. Pipeline use: exposure profiling / dead-image detection
    before a model pass. Map-only mapInPandas; histograms aggregate
    worker-side (<=256 rows/image) so bytes never shuffle."""
    from yark_spark.operators.multimodal import decode_pixel_histogram, with_png_payload

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return decode_pixel_histogram(with_png_payload(docs))


# ---------------------------------------------------------------------------
# Codec agreement — three independent codecs, one analytic truth
# ---------------------------------------------------------------------------

_AGREE_ORACLE = (
    "WITH v AS (SELECT doc_id, "
    "ascii(substr(md5(text), 1, 1)) AS a, ascii(substr(md5(text), 2, 1)) AS b, "
    "ascii(substr(md5(text), 3, 1)) AS c, ascii(substr(md5(text), 4, 1)) AS d "
    "FROM documents WHERE doc_id < 50) "
    "SELECT doc_id, 'jpeg' AS fmt, CAST(1 AS INTEGER) AS channels, "
    "round((a + b + c + d) / 4.0, 6) AS mean_pixel FROM v "
    "UNION ALL SELECT doc_id, 'png', CAST(3 AS INTEGER), "
    "round((a + b + c + d) / 4.0, 6) FROM v "
    "UNION ALL SELECT doc_id, 'webp', CAST(4 AS INTEGER), "
    "round((3 * (a + b + c + d) / 4.0 + 255) / 4.0, 6) FROM v "
    "UNION ALL SELECT doc_id, 'gif', CAST(3 AS INTEGER), "
    "round((a + b + c + d) / 4.0, 6) FROM v"
)


@query("q_image_codec_agreement", oracle=_AGREE_ORACLE)
def q_image_codec_agreement(spark, sf_dir):
    """Cross-codec differential as a query (round 11): the SAME
    quadrant-gray fixture runs through all four from-scratch codecs —
    baseline JPEG at q100 (DC-only constant blocks, bit-exact),
    lossless WebP VP8L, PNG, and GIF (real LZW) — and every row must
    match the ONE analytic truth: mean (a+b+c+d)/4 for the gray/RGB
    forms, alpha folded in for WebP's RGBA. Four independent entropy
    coders and transform stacks agreeing with a no-image-code SQL
    oracle is the strongest end-to-end pin the decode surface has. One
    map-only union; 50 docs per codec bound the work."""
    from yark_spark.operators.multimodal import (
        decode_image_features,
        with_gif_payload,
        with_jpeg_payload,
        with_png_payload,
        with_webp_payload,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    out = None
    for fmt, payload in (
        ("jpeg", with_jpeg_payload(docs)),
        ("png", with_png_payload(docs)),
        ("webp", with_webp_payload(docs, use_lz77=True, cache_bits=4, subtract_green=True)),
        ("gif", with_gif_payload(docs)),
    ):
        part = decode_image_features(payload).select(
            "doc_id", F.lit(fmt).alias("fmt"), "channels", "mean_pixel"
        )
        out = part if out is None else out.unionByName(part)
    return out


# ---------------------------------------------------------------------------
# Lossless JPEG (SOF3) — all seven H.1 predictors under one oracle
# ---------------------------------------------------------------------------

_JPEG_LL_ORACLE = (
    "WITH v AS (SELECT doc_id, "
    "ascii(substr(md5(text), 1, 1)) AS a, ascii(substr(md5(text), 2, 1)) AS b, "
    "ascii(substr(md5(text), 3, 1)) AS c, ascii(substr(md5(text), 4, 1)) AS d "
    "FROM documents WHERE doc_id < 100) "
    "SELECT doc_id, CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height, "
    "CAST(1 AS INTEGER) AS channels, "
    "round((a + b + c + d) / 4.0, 6) AS mean_pixel FROM v"
)


@query("q_image_decode_jpeg_lossless", oracle=_JPEG_LL_ORACLE)
def q_image_decode_jpeg_lossless(spark, sf_dir):
    """E4 lossless JPEG (round 11): T.81 Annex H predictive coding —
    SOF3 frames, no DCT/quantization, differences Huffman-coded modulo
    2^16 (operators/jpeg.encode_jpeg_lossless / _decode_lossless). The
    fixture varies the H.1 predictor per doc (doc_id % 7 + 1), and the
    codec is exactly lossless under every predictor, so ONE analytic
    oracle — the quadrant mean (a+b+c+d)/4 — pins all seven prediction
    formulas, the category/EXTEND machinery, and the SSSS=16 special
    case end to end (roundtrip matrix incl. 16-bit and the point
    transform in tests/test_jpeg_lossless.py). Map-only mapInPandas."""
    from yark_spark.operators.multimodal import decode_image_features, with_jpeg_payload

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return decode_image_features(with_jpeg_payload(docs, lossless=True))


# ---------------------------------------------------------------------------
# GIF pixel decode — real LZW, both interlace orders, analytically exact
# ---------------------------------------------------------------------------

_GIF_ORACLE = (
    "WITH v AS (SELECT doc_id, "
    "ascii(substr(md5(text), 1, 1)) AS a, ascii(substr(md5(text), 2, 1)) AS b, "
    "ascii(substr(md5(text), 3, 1)) AS c, ascii(substr(md5(text), 4, 1)) AS d "
    "FROM documents WHERE doc_id < 100) "
    "SELECT doc_id, CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height, "
    "CAST(3 AS INTEGER) AS channels, "
    "round((a + b + c + d) / 4.0, 6) AS mean_pixel FROM v"
)


@query("q_image_decode_gif", oracle=_GIF_ORACLE)
def q_image_decode_gif(spark, sf_dir):
    """E4 GIF pixel decode (round 11): from-scratch GIF87a/89a codec —
    REAL variable-width LZW (LSB-first packing, KwKwK case, 12-bit
    table with CLEAR resets), global color table, and the four-pass
    interlace (operators/gif) — the fourth real-world thumbnail
    container beside JPEG/WebP/PNG (reference stores thumbnail bytes
    opaquely: cmds/archive.py:88-91). The fixture's ≤4-color palette
    encodes losslessly, so the decoded mean of the 16x16 quadrant-gray
    image is exactly (a+b+c+d)/4 of the doc's first four md5-hex ascii
    codes; interlace on odd doc_ids pins both row orders under this one
    analytic oracle. LZW sync across the 2^n width boundaries is pinned
    by hand-derived vectors + roundtrip/fuzz tests in tests/test_gif.py.
    Map-only mapInPandas end to end — payload bytes never shuffle."""
    from yark_spark.operators.multimodal import decode_image_features, with_gif_payload

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return decode_image_features(with_gif_payload(docs))


@query("q_image_phash")  # rows-only: a DCT median threshold has no SQL twin
def q_image_phash(spark, sf_dir):
    """E93 perceptual image hash (round 11, rows-only — contract in
    tests/test_rows_only_contracts.py): DCT pHash signatures over the
    GIF payload column — the image-native near-dup key the dedup family
    lacked (text has MinHash/SimHash, embeddings have cosine; pixels
    had nothing). Governed by the invariance contracts in
    tests/test_phash.py: ≤6 bits Hamming drift under JPEG q50
    recompression, ≥16 bits between distinct images, brightness-shift
    and RGB/luma stability. At 100 TB dedup is a band-join on hash
    prefixes + Hamming verify — the SimHash plan applied to pixels;
    this key is the map-only signature pass that feeds it."""
    from yark_spark.operators.multimodal import image_phash_features, with_gif_payload

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return image_phash_features(with_gif_payload(docs))


_PHASH_AGREE_ORACLE = (
    "SELECT doc_id, CAST(TRUE AS BOOLEAN) AS codec_agree "
    "FROM documents WHERE doc_id < 200"
)


@query("q_image_phash_agreement", oracle=_PHASH_AGREE_ORACLE)
def q_image_phash_agreement(spark, sf_dir):
    """E93' pHash cross-codec agreement (round 11): the SAME quadrant
    image encoded as lossless GIF and as JPEG q90 must produce the SAME
    64-bit perceptual hash per doc — a deterministic end-to-end pin of
    two encoders, two decoders, the area resampler, the 32x32 DCT and
    the median threshold agreeing bit-for-bit (verified exhaustively
    over the fixture corpus: every cross-codec Hamming distance is 0 at
    q90 on block-constant images). This gives the rows-only
    q_image_phash an oracle-side anchor, like q_image_codec_agreement
    does for the decoders. Map-only; the join key is the doc id, two
    bounded signature columns."""
    from yark_spark.operators.multimodal import (
        image_phash_features,
        with_gif_payload,
        with_jpeg_payload,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    a = image_phash_features(with_gif_payload(docs)).withColumnRenamed("phash", "pa")
    b = image_phash_features(
        with_jpeg_payload(docs, quality=90)
    ).withColumnRenamed("phash", "pb")
    return a.join(b, "doc_id").select(
        "doc_id", (F.col("pa") == F.col("pb")).alias("codec_agree")
    )


# ---------------------------------------------------------------------------
# Decode quarantine — corrupt payloads become rows, not task failures
# ---------------------------------------------------------------------------

_QUARANTINE_ORACLE = (
    "WITH v AS (SELECT doc_id, "
    "ascii(substr(md5(text), 1, 1)) AS a, ascii(substr(md5(text), 2, 1)) AS b, "
    "ascii(substr(md5(text), 3, 1)) AS c, ascii(substr(md5(text), 4, 1)) AS d, "
    "doc_id % 7 = 0 AS bad FROM documents WHERE doc_id < 210) "
    "SELECT doc_id, "
    "CASE WHEN bad THEN NULL ELSE CAST(16 AS INTEGER) END AS width, "
    "CASE WHEN bad THEN NULL ELSE CAST(16 AS INTEGER) END AS height, "
    "CASE WHEN bad THEN NULL ELSE CAST(3 AS INTEGER) END AS channels, "
    "CASE WHEN bad THEN NULL ELSE round((a + b + c + d) / 4.0, 6) END AS mean_pixel, "
    "CASE WHEN bad THEN 'ValueError' ELSE NULL END AS error FROM v"
)


@query("q_image_decode_quarantine", oracle=_QUARANTINE_ORACLE)
def q_image_decode_quarantine(spark, sf_dir):
    """E92 decode quarantine (round 11): at 100 TB some payload bytes
    WILL be corrupt, and the default fail-fast extractor would kill the
    task — this key pins the production semantics instead. Every 7th
    GIF payload is truncated mid-stream; quarantined rows surface the
    exception class with null features, healthy rows decode normally,
    and the oracle checks BOTH populations in one hash (the same
    side-output-in-band shape as the JSON ingest quarantine). Only
    decoder errors are caught — a crash in the engine itself still
    fails loudly. Map-only mapInPandas."""
    from yark_spark.operators.multimodal import (
        decode_image_features_quarantine,
        with_gif_payload,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 210)
    return decode_image_features_quarantine(with_gif_payload(docs, corrupt_every=7))


# ---------------------------------------------------------------------------
# Compressed audio — G.711 (table-embedded oracle) + IMA ADPCM (analytic)
# ---------------------------------------------------------------------------


def _g711_tables() -> tuple[list[int], list[int]]:
    """Scalar ITU-T G.711 decode tables, written independently of the
    vectorized implementation in operators/audio_codecs (that module is
    NOT imported here): the oracle SQL embeds these 256 rows as literal
    VALUES, so DuckDB checks the codec against the spec formula with no
    audio code. Published-value pins for both live in
    tests/test_audio_codecs.py (e.g. µ-law 0x00 → -32124, A-law
    0xD5 → +8)."""
    mu, al = [], []
    for code in range(256):
        x = ~code & 0xFF
        mag = ((((x & 0x0F) << 3) + 0x84) << ((x >> 4) & 0x07)) - 0x84
        mu.append(-mag if x & 0x80 else mag)
        y = code ^ 0x55
        e, m = (y >> 4) & 0x07, y & 0x0F
        amag = (m << 4) + 8 if e == 0 else ((m << 4) + 0x108) << (e - 1)
        al.append(amag if y & 0x80 else -amag)
    return mu, al


_MU_TBL, _AL_TBL = _g711_tables()
_G711_VALUES = ", ".join(
    f"({c}, {_MU_TBL[c]}, {_AL_TBL[c]})" for c in range(256)
)

_G711_ORACLE = (
    f"WITH t(code, mu, al) AS (VALUES {_G711_VALUES}), "
    "h AS (SELECT doc_id, md5(text) AS m FROM documents WHERE doc_id < 150), "
    "s AS (SELECT doc_id, ascii(substr(m, g.i, 1)) AS c "
    "FROM h, unnest(generate_series(1, 32)) AS g(i)), "
    "j AS (SELECT doc_id, mu, al FROM s JOIN t ON t.code = s.c) "
    "SELECT doc_id, 'mulaw' AS law, CAST(256 AS INTEGER) AS n_samples, "
    "CAST(8000 AS INTEGER) AS sample_rate, round(256.0 / 8000, 6) AS duration_s, "
    "CAST(max(abs(mu)) AS INTEGER) AS peak, "
    "round(sqrt(avg(CAST(mu AS DOUBLE) * mu)), 6) AS rms FROM j GROUP BY doc_id "
    "UNION ALL SELECT doc_id, 'alaw', CAST(256 AS INTEGER), "
    "CAST(8000 AS INTEGER), round(256.0 / 8000, 6), "
    "CAST(max(abs(al)) AS INTEGER), "
    "round(sqrt(avg(CAST(al AS DOUBLE) * al)), 6) FROM j GROUP BY doc_id"
)


@query("q_audio_decode_g711", oracle=_G711_ORACLE)
def q_audio_decode_g711(spark, sf_dir):
    """E86 G.711 compressed-audio decode (round 11): µ-law AND A-law
    WAV payloads (fmt tags 7 / 6, fact-chunked) decoded by the
    from-scratch vectorized codec in operators/audio_codecs — the
    former 'compressed audio' NotImplementedError boundary, now real
    for the table codecs. Fixture samples sit ON the G.711 quantization
    lattice (decode-table values at the doc's md5 ascii codes), so the
    lossy codec reproduces them bit-exactly and the oracle checks
    peak/RMS against the spec table embedded as 256 literal VALUES
    rows — an independent scalar construction of the ITU formula, no
    audio code in SQL. Map-only mapInPandas both stages; payload bytes
    never shuffle."""
    from yark_spark.operators.multimodal import (
        decode_audio_features,
        with_compressed_wav_payload,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    out = None
    for law in ("mulaw", "alaw"):
        part = decode_audio_features(with_compressed_wav_payload(docs, law)).select(
            "doc_id",
            F.lit(law).alias("law"),
            "n_samples",
            "sample_rate",
            "duration_s",
            "peak",
            "rms",
        )
        out = part if out is None else out.unionByName(part)
    return out


_ADPCM_ORACLE = (
    "WITH v AS (SELECT doc_id, "
    "ascii(substr(md5(text), 1, 1)) AS a, ascii(substr(md5(text), 2, 1)) AS b, "
    "ascii(substr(md5(text), 3, 1)) AS c, ascii(substr(md5(text), 4, 1)) AS d "
    "FROM documents WHERE doc_id < 200) "
    "SELECT doc_id, CAST(260 AS INTEGER) AS n_samples, "
    "CAST(8000 AS INTEGER) AS sample_rate, "
    "round(260.0 / 8000, 6) AS duration_s, "
    "CAST(greatest(a, b, c, d) AS INTEGER) AS peak, "
    "round(sqrt((a * a + b * b + c * c + d * d) / 4.0), 6) AS rms FROM v"
)


@query("q_audio_decode_adpcm", oracle=_ADPCM_ORACLE)
def q_audio_decode_adpcm(spark, sf_dir):
    """E86' IMA ADPCM decode (round 11): mono WAVE_FORMAT_IMA_ADPCM
    blocks — header predictor + step index, 4-bit nibbles against the
    89-entry step table, fact-chunk sample trim — decoded by
    operators/audio_codecs. The fixture is four 65-sample blocks
    constant at the doc's md5 ascii codes: block headers store the
    first sample verbatim and zero deltas are exact at step index 0, so
    the lossy codec is exact here and peak/RMS reduce to
    greatest(a..d) / sqrt(mean of squares) — analytic in SQL. The
    adaptive (genuinely lossy) path is pinned by SNR + encoder/decoder
    state-lock tests in tests/test_audio_codecs.py. Map-only
    mapInPandas; bytes never shuffle."""
    from yark_spark.operators.multimodal import (
        decode_audio_features,
        with_compressed_wav_payload,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return decode_audio_features(with_compressed_wav_payload(docs, "ima_adpcm"))


# ---------------------------------------------------------------------------
# Video — Y4M container decode, per-frame luma + motion, analytic oracle
# ---------------------------------------------------------------------------

_Y4M_ORACLE = (
    "WITH v AS (SELECT doc_id, "
    "ascii(substr(md5(text), 1, 1)) AS a, ascii(substr(md5(text), 2, 1)) AS b, "
    "ascii(substr(md5(text), 3, 1)) AS c, ascii(substr(md5(text), 4, 1)) AS d "
    "FROM documents WHERE doc_id < 200) "
    "SELECT doc_id, CAST(4 AS INTEGER) AS n_frames, "
    "CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height, "
    "CAST(30 AS INTEGER) AS fps_num, CAST(1 AS INTEGER) AS fps_den, "
    "round((a + b + c + d) / 4.0, 6) AS luma_mean, "
    "round((abs(b - a) + abs(c - b) + abs(d - c)) / 3.0, 6) AS motion FROM v"
)


@query("q_video_decode_y4m", oracle=_Y4M_ORACLE)
def q_video_decode_y4m(spark, sf_dir):
    """E87 Y4M video decode (round 11): the video modality gets a REAL
    container — YUV4MPEG2, the standard uncompressed interchange format
    (operators/video: stream/frame header grammar, 420-variant/422/444/
    mono plane layouts) — replacing fake-feature stubs with actual luma
    planes; entropy-coded video (H.264/VP9/AV1) stays the documented
    boundary, exactly like psychoacoustic audio. The fixture's four
    constant frames per doc make brightness AND the frame-difference
    motion score analytic: luma_mean = (a+b+c+d)/4, motion =
    (|b-a|+|c-b|+|d-c|)/3 — a temporal statistic no image key
    exercises. Odd/even doc_ids alternate C444/C420 so both chroma
    layouts parse under one oracle. Map-only mapInPandas; frames never
    shuffle (at 100 TB the per-task unit is one video's frames, the
    right granularity for a frame-sampling pipeline)."""
    from yark_spark.operators.multimodal import decode_video_features, with_y4m_payload

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return decode_video_features(with_y4m_payload(docs))


# ---------------------------------------------------------------------------
# Audio spectrum — rfft dominant frequency, integer-bin analytic oracle
# ---------------------------------------------------------------------------

_SPECTRUM_ORACLE = (
    "WITH v AS (SELECT doc_id, ascii(substr(md5(text), 1, 1)) AS a "
    "FROM documents WHERE doc_id < 300) "
    "SELECT doc_id, CAST(256 AS INTEGER) AS n_samples, "
    "CAST(1 + a % 120 AS INTEGER) AS dominant_bin, "
    "round((1 + a % 120) * 8000 / 256.0, 6) AS dominant_hz FROM v"
)


@query("q_audio_dominant_freq", oracle=_SPECTRUM_ORACLE)
def q_audio_dominant_freq(spark, sf_dir):
    """E88 spectral audio analysis (round 11): the first
    frequency-domain op — PCM16 tone payloads decoded then run through
    a REAL rfft (numpy, vectorized C), dominant non-DC bin + frequency
    in Hz reported per doc. Fixture tones sit at integer FFT bins
    (k = 1 + md5-code % 120 of 128 rfft bins), so leakage is zero, the
    int16 quantization noise floor is ~5 orders of magnitude below the
    tone peak, and the argmax is analytically k — DuckDB checks the
    whole decode→FFT→argmax path with modular arithmetic, no FFT in
    SQL. dominant_hz = k*8000/256 is an exact multiple of 0.25 (power-
    of-two divide), float-identical across engines. Map-only
    mapInPandas; at 100 TB this is the spectrogram-feature first pass
    of a speech pipeline, one task per payload batch."""
    from yark_spark.operators.multimodal import (
        decode_audio_spectrum,
        with_tone_wav_payload,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return decode_audio_spectrum(with_tone_wav_payload(docs))


# ---------------------------------------------------------------------------
# DSIR importance filter — hashed n-gram domain selection, integer-exact
# ---------------------------------------------------------------------------

_TOKS = "string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')"

_DSIR_ORACLE = (
    f"WITH tok AS (SELECT doc_id, {_TOKS} AS ts FROM documents), "
    "bg AS (SELECT doc_id, ts[g.i] || ' ' || ts[g.i + 1] AS bg "
    "FROM tok, unnest(generate_series(1, len(ts) - 1)) AS g(i) "
    "WHERE len(ts) >= 2), "
    "bk AS (SELECT doc_id, (ascii(substr(md5(bg), 1, 1)) * 131 "
    "+ ascii(substr(md5(bg), 2, 1))) % 256 AS bucket FROM bg), "
    "dist AS (SELECT bucket, count(*) AS cr, "
    "count(*) FILTER (WHERE doc_id < 300) AS ct FROM bk GROUP BY bucket), "
    "tot AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM dist), "
    "lean AS (SELECT bucket, CASE WHEN (ct + 1) * (tr + 256) > "
    "(cr + 1) * (tt + 256) THEN 1 ELSE 0 END AS lean FROM dist, tot), "
    "per AS (SELECT doc_id, bucket, count(*) AS c FROM bk GROUP BY doc_id, bucket) "
    "SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams, "
    "CAST(sum(c * lean) AS BIGINT) AS n_target_leaning, "
    "CASE WHEN 2 * sum(c * lean) > sum(c) THEN 'keep' ELSE 'drop' END AS verdict "
    "FROM per JOIN lean USING (bucket) GROUP BY doc_id"
)


@query("q_dsir_importance", oracle=_DSIR_ORACLE)
def q_dsir_importance(spark, sf_dir):
    """E89 DSIR-style importance filter (round 11; Xie et al. 2023):
    hashed bigram features (md5-ascii bucket hash both engines share,
    256 buckets), add-one-smoothed target (doc_id < 300 stand-in) vs
    raw bucket distributions, per-doc verdict = does a majority of the
    doc's bigram mass fall in target-leaning buckets. The p > q test is
    cross-multiplied to pure integer arithmetic, so the whole pipeline
    — tokenize → hash → two distributions → per-doc score — is
    hash-exact against DuckDB. Plan shape (operators/lm.dsir_importance):
    ONE shuffle on (doc, bucket); distributions ≤ 256 rows aggregated
    from it and broadcast back; totals one broadcast row; document text
    never joins. Raising to DSIR's 10k buckets changes no edge. At
    100 TB this is the standard domain-selection gate before
    pretraining."""
    from yark_spark.operators.lm import dsir_importance

    docs = load_table(spark, sf_dir, "documents")
    return dsir_importance(docs, target_condition=F.col("doc_id") < 300)


# ---------------------------------------------------------------------------
# gzip text ingest — full compress→decompress path certified by md5
# ---------------------------------------------------------------------------

_GUNZIP_ORACLE = (
    "SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars, "
    "md5(text) AS digest FROM documents WHERE doc_id < 500"
)


@query("q_text_gunzip", oracle=_GUNZIP_ORACLE)
def q_text_gunzip(spark, sf_dir):
    """E90 gzip text ingest (round 11): documents round-trip through
    the from-scratch RFC 1952 gzip writer/reader (operators/containers)
    over the REAL dynamic-Huffman DEFLATE in operators/png — the wire
    format of crawled-web text (WARC/WET members are gzip). The decoded
    md5 digest must equal DuckDB's md5(text), certifying every byte of
    the LZ77 + Huffman round trip with a one-line oracle; CRC-32 and
    ISIZE are verified in-path, with a 64 MB bomb guard (stdlib
    differentials in tests/test_containers.py). Two map-only
    mapInPandas stages; text bytes never shuffle."""
    from yark_spark.operators.multimodal import gunzip_text_features, with_gzip_payload

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return gunzip_text_features(with_gzip_payload(docs))


# ---------------------------------------------------------------------------
# WebDataset tar shards — pack then list, sizes checked analytically
# ---------------------------------------------------------------------------

_WDS_ORACLE = (
    "WITH v AS (SELECT doc_id, doc_id // 16 AS shard_id, "
    "lpad(CAST(doc_id AS VARCHAR), 8, '0') AS k, "
    "octet_length(encode(text)) AS tsize FROM documents WHERE doc_id < 480) "
    "SELECT doc_id, CAST(shard_id AS BIGINT) AS shard_id, "
    "k || '.txt' AS name, CAST(tsize AS INTEGER) AS size_bytes FROM v "
    "UNION ALL SELECT doc_id, CAST(shard_id AS BIGINT), k || '.json', "
    "CAST(7 + length(CAST(doc_id AS VARCHAR)) AS INTEGER) FROM v"
)


@query("q_webdataset_scan", oracle=_WDS_ORACLE)
def q_webdataset_scan(spark, sf_dir):
    """E90' WebDataset shard round trip (round 11): documents pack into
    ustar tar shards ({key}.txt + {key}.json members, 16 docs/shard —
    the WebDataset convention for multimodal training data) via ONE
    applyInPandas per shard group, then a map-only listing pass parses
    the archives back (checksum-verified headers, prefix-field and
    typeflag handling, stdlib-tarfile interop tested). Member sizes are
    analytic — octet_length of the text and 7+digits for the JSON — so
    the oracle certifies the header grammar and both directions of the
    512-byte block layout with no tar code in SQL. The grouping shuffle
    IS the shard assignment: at 100 TB that's one range-partitioned
    write of sequential-read shards, the access pattern object-store
    training loaders want."""
    from yark_spark.operators.multimodal import tar_member_listing, with_tar_shards

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return tar_member_listing(with_tar_shards(docs))


# ---------------------------------------------------------------------------
# WARC shards — the Common Crawl wire format, multi-member gzip per shard
# ---------------------------------------------------------------------------

_WARC_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 16 AS BIGINT) AS shard_id, "
    "'response' AS warc_type, "
    "CAST(octet_length(encode(text)) AS INTEGER) AS content_length "
    "FROM documents WHERE doc_id < 480"
)


@query("q_warc_scan", oracle=_WARC_ORACLE)
def q_warc_scan(spark, sf_dir):
    """E90'' WARC shard round trip (round 11): documents pack into
    .warc.gz shards — ISO 28500 records, ONE GZIP MEMBER PER RECORD
    (the seekable Common Crawl convention; RFC 1952 multi-member
    walking with per-member CRC/ISIZE checks) — then a map-only listing
    pass inflates each shard and indexes (uri-key, type, content
    length). Every content_length must equal octet_length(text): the
    oracle certifies the record grammar AND the concatenated-gzip walk
    over the real dynamic-Huffman DEFLATE. Same scale shape as
    q_webdataset_scan: the grouping shuffle is the shard assignment;
    listing reads each shard sequentially — the CC-MAIN segment access
    pattern."""
    from yark_spark.operators.multimodal import warc_record_listing, with_warc_shards

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return warc_record_listing(with_warc_shards(docs))


_WET_ORACLE = (
    "SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars, "
    "md5(text) AS digest FROM documents WHERE doc_id < 480"
)


@query("q_warc_wet_extract", oracle=_WET_ORACLE)
def q_warc_wet_extract(spark, sf_dir):
    """E90''' WARC→WET text extraction (round 11): the Common Crawl
    conversion pass — .warc.gz shards whose response blocks carry a
    full HTTP message head (plus a warcinfo record per shard, skipped
    exactly like the real WET generator), inflated member-by-member,
    record grammar parsed, HTTP head stripped at the first CRLF CRLF,
    and the recovered text digest-matched against md5(text). One hash
    certifies the whole wire path a crawled corpus takes: per-record
    gzip members → ISO 28500 framing → HTTP framing → text. Map-only
    mapInPandas both stages."""
    from yark_spark.operators.multimodal import warc_wet_extract, with_warc_shards

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return warc_wet_extract(with_warc_shards(docs, http_head=True))


# ---------------------------------------------------------------------------
# Size-targeted shard binning — distributed prefix sum, integer-exact
# ---------------------------------------------------------------------------

_SHARD_BIN_ORACLE = (
    "WITH v AS (SELECT doc_id, octet_length(encode(text)) AS sz FROM documents) "
    "SELECT doc_id, CAST(sz AS INTEGER) AS doc_bytes, "
    "CAST((sum(sz) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - sz) "
    "// 4096 AS BIGINT) AS shard_id FROM v"
)


@query("q_shard_bin_packing", oracle=_SHARD_BIN_ORACLE)
def q_shard_bin_packing(spark, sf_dir):
    """E91 size-targeted shard assignment (round 11): the production
    counterpart of the fixed-count grouping in q_webdataset_scan /
    q_warc_scan — shards bounded by BYTES (4 KB target here), robust to
    document-length skew. shard = exclusive-prefix-bytes DIV target,
    computed with the two-phase distributed prefix sum
    (operators/packing.shard_assignment over partitioned_cumsum) — the
    corpus never passes through a single-task window, and the division
    is integral so the assignment hash-matches DuckDB's window-sum
    oracle exactly. Rows of a shard are contiguous in doc order: the
    downstream shard writer is one range-partitioned applyInPandas, the
    same shape the tar/WARC packers already use."""
    from yark_spark.operators.packing import shard_assignment

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.octet_length("text").cast("long").alias("doc_bytes")
    )
    out = shard_assignment(docs, ["doc_id"], "doc_bytes", 4096)
    return out.select(
        "doc_id", F.col("doc_bytes").cast("int").alias("doc_bytes"), "shard_id"
    )


_WDS_SIZED_ORACLE = (
    "WITH v AS (SELECT doc_id, octet_length(encode(text)) AS sz, "
    "lpad(CAST(doc_id AS VARCHAR), 8, '0') AS k FROM documents WHERE doc_id < 480), "
    "a AS (SELECT doc_id, k, sz, "
    "CAST((sum(sz) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - sz) "
    "// 8192 AS BIGINT) AS shard_id FROM v) "
    "SELECT doc_id, shard_id, k || '.txt' AS name, "
    "CAST(sz AS INTEGER) AS size_bytes FROM a "
    "UNION ALL SELECT doc_id, shard_id, k || '.json', "
    "CAST(7 + length(CAST(doc_id AS VARCHAR)) AS INTEGER) FROM a"
)


@query("q_webdataset_sized", oracle=_WDS_SIZED_ORACLE)
def q_webdataset_sized(spark, sf_dir):
    """E91' end-to-end sized shard export (round 11): the composition of
    E91 and E90' — documents bin into ~8 KB shards via the distributed
    prefix sum, each shard packs into a real ustar archive in one
    applyInPandas, and a map-only listing pass parses the archives
    back. The oracle reproduces BOTH layers analytically: the window-sum
    shard assignment AND the member names/sizes — so one hash checks
    the full export path a 100 TB corpus actually takes (size-balanced
    shard write → sequential-read training loader)."""
    from yark_spark.operators.multimodal import (
        tar_member_listing,
        with_tar_shards_sized,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return tar_member_listing(with_tar_shards_sized(docs, 8192))
