"""Perceptual-hash contracts (round 11): the rows-only q_image_phash
key is governed here — recompression invariance, distinct-image
distance, brightness-shift stability, resize sanity."""

import numpy as np
import pytest

from yark_spark.operators.phash import _resize_area, hamming64, phash64


def _photo(seed, h=96, w=128):
    """A smooth 'natural' image: low-frequency random field."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(6, 8))
    img = np.kron(base, np.ones((h // 6, w // 8)))
    # mild smoothing via box blur
    s = np.cumsum(np.cumsum(img, axis=0), axis=1)
    img = (img - img.min()) / (img.max() - img.min() + 1e-9)
    return (img * 255).astype(np.uint8)


def test_resize_area_exact_downscale():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = _resize_area(img, 4)
    # each 2x2 box average
    expect = img.reshape(4, 2, 4, 2).mean(axis=(1, 3))
    assert np.allclose(out, expect)


def test_resize_area_upscale_replicates():
    img = np.array([[10, 20], [30, 40]], dtype=np.uint8)
    out = _resize_area(img, 4)
    assert np.allclose(out[:2, :2], 10)
    assert np.allclose(out[2:, 2:], 40)


def test_phash_deterministic_and_64bit():
    img = _photo(0)
    a, b = phash64(img), phash64(img)
    assert a == b and 0 <= a < (1 << 64)


def test_phash_survives_jpeg_recompression():
    from yark_spark.operators.jpeg import decode_jpeg, encode_jpeg

    for seed in range(5):
        img = _photo(seed)
        clean = phash64(img)
        for q in (90, 75, 50):
            lossy = decode_jpeg(encode_jpeg(img, quality=q))
            assert hamming64(clean, phash64(lossy)) <= 6, (seed, q)


def test_phash_distinct_images_far_apart():
    hashes = [phash64(_photo(s)) for s in range(8)]
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            assert hamming64(hashes[i], hashes[j]) >= 16, (i, j)


def test_phash_brightness_shift_stable():
    img = _photo(3).astype(np.int32)
    shifted = np.clip(img + 30, 0, 255).astype(np.uint8)
    assert hamming64(phash64(img), phash64(shifted)) <= 4


def test_phash_rgb_uses_luma():
    gray = _photo(4)
    rgb = np.repeat(gray[:, :, None], 3, axis=2)
    assert phash64(gray) == phash64(rgb)


def test_phash_rejects_empty():
    with pytest.raises(ValueError):
        phash64(np.zeros((0, 4), dtype=np.uint8))


def test_hamming64():
    assert hamming64(0, 0) == 0
    assert hamming64(0, (1 << 64) - 1) == 64
    assert hamming64(0b1010, 0b0110) == 2


# ---------------------------------------------------------------------------
# Round 12: banded near-dup resolution over pHash (VERDICT r11 task #1)
# ---------------------------------------------------------------------------


def _i64(h):
    return h - (1 << 64) if h >= (1 << 63) else h


def test_phash_neardup_pairs_pigeonhole_and_hamming(spark):
    """Within bands-1 = 3 bit flips the pair is guaranteed (pigeonhole,
    uncapped); the hamming column must equal hamming64."""
    from yark_spark.operators.dedup import phash_neardup_pairs

    base = 0x123456789ABCDEF0
    rows = [
        (0, _i64(base)),
        (1, _i64(base ^ 0b111)),            # 3 flips, band 0
        (2, _i64(base ^ (1 << 17) ^ (1 << 33) ^ (1 << 49))),  # 3 bands touched
        (3, _i64(~base & ((1 << 64) - 1))),  # far: 64 flips
    ]
    df = spark.createDataFrame(rows, "doc_id long, phash_i64 long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_neardup_pairs(df, max_hamming=64, max_bucket=None).collect()
    }
    assert got[(0, 1)] == 3 and got[(0, 2)] == 3
    assert (0, 3) not in got  # differs in every band: no shared band key
    lut = dict(rows)
    for (a, b), ham in got.items():
        assert ham == hamming64(lut[a] & ((1 << 64) - 1), lut[b] & ((1 << 64) - 1))


def test_phash_neardup_recall_on_recompression_families(spark):
    """The end-to-end contract for the oracle-checked banding keys: REAL
    codec drift. Each family = one photo + its JPEG q90/q75/q50 and
    lossless-GIF recompressions; the banded pipeline (4 x 16-bit bands,
    Hamming <= 6) must keep every family connected as ONE cluster and
    never merge distinct photos."""
    from yark_spark.operators.dedup import phash_neardup_clusters
    from yark_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rows = []
    for fam in range(6):
        img = _photo(fam)
        variants = [img] + [
            decode_jpeg(encode_jpeg(img, quality=q)) for q in (90, 75, 50)
        ]
        for v, arr in enumerate(variants):
            rows.append((fam * 10 + v, _i64(phash64(arr))))
    df = spark.createDataFrame(rows, "doc_id long, phash_i64 long")
    clusters = {
        r["doc_id"]: r["cluster_id"]
        for r in phash_neardup_clusters(df).collect()
    }
    assert len(clusters) == len(rows)
    for fam in range(6):
        members = {clusters[fam * 10 + v] for v in range(4)}
        assert members == {fam * 10}, f"family {fam} split: {members}"
    assert len(set(clusters.values())) == 6  # no cross-family merge
