"""Round-14 operator batch (VERDICT r13 next-round list): the last
real-input extraction gaps and the lakehouse WRITE loop — PDF
font-encoding-aware text (ToUnicode CMaps, /Encoding Differences,
Identity-H CID fonts), ORC LIST/MAP columns, Iceberg partition-spec
transforms + v1 tables, Delta checkpoint writing + deletion vectors,
parquet page-index pruning across repeated (LIST) columns, and a
scoped-honest brotli content-coding.

Reference parity note: the reference archiver (SupBlizard/yark,
768 LoC) stores fetched payloads opaquely; these keys extend the
driver-mandated training-data-pipeline surface (SURVEY.md §2.8),
each with a DuckDB oracle re-deriving the semantics from the same
parquet tables.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yark_spark.io import load_table
from yark_spark.registry import query

_PDF_FONTS_ORACLE = (
    "SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS font_mode, "
    "CAST(length(text) AS INTEGER) AS n_chars, "
    "md5(text) AS digest FROM documents WHERE doc_id < 400"
)


@query("q_pdf_extract_fonts", oracle=_PDF_FONTS_ORACLE)
def q_pdf_extract_fonts(spark, sf_dir):
    """E142 PDF font-encoding-aware extraction (round 14, VERDICT r13
    item #1): documents written into real PDFs whose FONT arrangement
    cycles per doc_id % 4 — (0) the classic latin-1 Helvetica, (1) a
    subset-style scrambled font (show-string bytes = text XOR 0x80)
    recoverable ONLY through its embedded /ToUnicode CMap stream
    (codespacerange, bfchar pairs, bfrange in both the incrementing-
    destination and per-code ARRAY forms, Flate-compressed), (2) a
    simple font whose /Encoding dict remaps every glyph via
    /Differences over /BaseEncoding /WinAnsiEncoding (AGL names and
    algorithmic uniXXXX forms alternating, space riding the base
    table), (3) an /Identity-H Type0 CID font with 2-byte codes
    (= ord + 0x1234) mapped through a 2-byte-codespace ToUnicode CMap,
    literal-with-octal-escape and hex show strings alternating per
    line. Born-digital PDFs overwhelmingly embed subset fonts whose
    byte codes are font-internal, so the pre-round-14 latin-1 decode
    produced mojibake on 3 of these 4 arrangements — the oracle digest
    (md5 of the ORIGINAL text) passes only if every glyph-to-Unicode
    path is exact (operators/pdf.py). Map-only mapInPandas both
    stages."""
    from yark_spark.operators.multimodal import pdf_extract_features, with_pdf_payload

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    out = pdf_extract_features(with_pdf_payload(docs, fonts="cycle"))
    return out.withColumn("font_mode", (F.col("doc_id") % 4).cast("int"))


_ORC_VECTOR_ORACLE = (
    "SELECT vec_id, "
    "CAST(CASE WHEN vec_id % 25 = 13 THEN -1 "
    "WHEN vec_id % 25 = 18 THEN 0 "
    "ELSE len(embedding) END AS INTEGER) AS dim, "
    "CAST(CASE WHEN vec_id % 25 IN (13, 18) THEN 0 "
    "WHEN vec_id % 25 = 21 THEN "
    "list_aggregate(list_transform(embedding, "
    "x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)), 'sum') "
    "- CAST(floor(CAST(embedding[4] AS DOUBLE) * 1000000) AS BIGINT) "
    "ELSE list_aggregate(list_transform(embedding, "
    "x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)), 'sum') "
    "END AS BIGINT) AS csum, "
    "CAST(CASE WHEN vec_id % 25 = 13 THEN -1 ELSE label END AS INTEGER) "
    "AS label, "
    "CAST(CASE WHEN vec_id % 25 = 13 THEN -1 ELSE vec_id % 7 END AS INTEGER) "
    "AS mod7 FROM embeddings"
)


@query("q_orc_vector_scan", oracle=_ORC_VECTOR_ORACLE)
def q_orc_vector_scan(spark, sf_dir):
    """E143 ORC LIST/MAP columns (round 14, VERDICT r13 item #2): the
    embeddings corpus packed into ORC shards WRITTEN BY THE REAL
    LIBRARY (pyarrow's ORC_CPP, all five chunk codecs cycling) with a
    ``list<float>`` embedding column and a ``map<string,int64>``
    metadata column, then read back by the from-scratch reader's new
    repeated-column path: PRESENT + LENGTH (unsigned RLEv2) stream
    assembly on the container node, recursing through the anonymous
    child types (operators/orc.py _decode_node) — the ORC twin of the
    parquet repetition-level recipe (E130''). A deterministic null
    grammar (null row / EMPTY list / null element at [3], vec_id%25
    selected) makes every wire state land in a distinct oracle value:
    dim, integer-exact checksum Σ floor(x·10⁶) over non-null elements,
    and two values read back THROUGH the map. Real ORC warehouses
    carry array/map columns everywhere (embeddings included) — a
    reader without them stops at toy tables. Grouping shuffle = shard
    assignment; map-only listing."""
    from yark_spark.operators.multimodal import (
        orc_vector_listing,
        with_orc_vector_shards,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return orc_vector_listing(with_orc_vector_shards(emb))


_ICEBERG_TRANSFORM_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 64 AS BIGINT) AS table_id, "
    "CASE CAST(doc_id // 64 AS BIGINT) % 4 WHEN 0 THEN 'truncate[16]' "
    "WHEN 1 THEN 'day' WHEN 2 THEN 'hour' ELSE 'month' END AS transform, "
    "CAST(1 AS INTEGER) AS manifests_skipped, "
    "CAST(2 AS INTEGER) AS files_skipped, "
    "CAST(2 AS INTEGER) AS files_scanned, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 448 AND doc_id % 64 BETWEEN 32 AND 47"
)


@query("q_iceberg_transform_prune", oracle=_ICEBERG_TRANSFORM_ORACLE)
def q_iceberg_transform_prune(spark, sf_dir):
    """E144 Iceberg partition-spec transforms (round 14, VERDICT r13
    item #3): the two-level prune of E136'' re-run over tables whose
    metadata declares REAL ``partition-specs`` — the transform cycling
    truncate[16] / day / hour / month per table — probed in SOURCE-
    column terms (a mid-bucket timestamp, a mid-truncation long). The
    planner must apply the spec formula (spec Appendix B,
    operators/iceberg.iceberg_transform), decode field-summary bounds
    at the transform RESULT's serialized width (temporal results are
    4-byte ints, truncate keeps the 8-byte long), skip one manifest
    unopened and two files unread, and decode exactly two files — all
    four counters AND the surviving rows pinned per transform in the
    oracle. Real Iceberg tables are overwhelmingly day()/bucket()/
    truncate()-partitioned; identity-only pruning never fires on
    them. One applyInPandas per table, map-only resolve."""
    from yark_spark.operators.multimodal import iceberg_transform_scan_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 448)
    return iceberg_transform_scan_features(docs)


# --- murmur3_x86_32 twins for the bucket transform (E145) -----------------
# The Iceberg bucket[N] hash written twice from the spec: once as Spark
# COLUMN arithmetic (JVM-side, whole-stage codegen — no Python in the
# hot path) and once as DuckDB SQL CTE steps. 32-bit multiplies split
# 16/16 so no intermediate exceeds 2^48 (both engines run signed-64
# lanes). Constants: c1 cc9e2d51, c2 1b873593, fmix 85ebca6b/c2b2ae35.

_M32 = 4294967295


def _sql_mul32(x: str, k: int) -> str:
    return (
        f"(((({x}) & 65535) * {k} + (((({x}) >> 16) * {k} & 65535) << 16)) "
        f"& 4294967295)"
    )


def _sql_rotl(x: str, r: int) -> str:
    return f"(((({x}) << {r}) & 4294967295) | (({x}) >> {32 - r}))"


def _sql_mm32_round(h: str, k: str) -> str:
    k1 = _sql_mul32(k, 0xCC9E2D51)
    k2 = _sql_rotl(k1, 15)
    k3 = _sql_mul32(k2, 0x1B873593)
    h2 = _sql_rotl(f"xor({h}, {k3})", 13)
    return f"(({_sql_mul32(h2, 5)} + 3864292196) & 4294967295)"


def _mm32_cte(pred: str) -> str:
    """CTE chain computing hh = murmur3_x86_32(LE8(doc_id)) per row."""
    return (
        "WITH t0 AS (SELECT doc_id, text, doc_id & 4294967295 AS kk1, "
        f"(doc_id >> 32) & 4294967295 AS kk2 FROM documents WHERE {pred}), "
        f"t1 AS (SELECT *, {_sql_mm32_round('0', 'kk1')} AS h1 FROM t0), "
        f"t2 AS (SELECT *, {_sql_mm32_round('h1', 'kk2')} AS h2 FROM t1), "
        "t3 AS (SELECT *, xor(h2, 8) AS h3 FROM t2), "
        "t4 AS (SELECT *, xor(h3, h3 >> 16) AS h4 FROM t3), "
        f"t5 AS (SELECT *, {_sql_mul32('h4', 0x85EBCA6B)} AS h5 FROM t4), "
        "t6 AS (SELECT *, xor(h5, h5 >> 13) AS h6 FROM t5), "
        f"t7 AS (SELECT *, {_sql_mul32('h6', 0xC2B2AE35)} AS h7 FROM t6), "
        "t8 AS (SELECT *, xor(h7, h7 >> 16) AS hh FROM t7)"
    )


def _col_mul32(x, k: int):
    lo = x.bitwiseAND(F.lit(65535)) * F.lit(k)
    hi = (F.shiftrightunsigned(x, 16) * F.lit(k)).bitwiseAND(F.lit(65535))
    return (lo + F.shiftleft(hi, 16)).bitwiseAND(F.lit(_M32))


def _col_rotl(x, r: int):
    return F.shiftleft(x, r).bitwiseAND(F.lit(_M32)).bitwiseOR(
        F.shiftrightunsigned(x, 32 - r)
    )


def _col_mm32_round(h, k):
    k = _col_mul32(k, 0xCC9E2D51)
    k = _col_rotl(k, 15)
    k = _col_mul32(k, 0x1B873593)
    h = _col_rotl(h.bitwiseXOR(k), 13)
    return (_col_mul32(h, 5) + F.lit(0xE6546B64)).bitwiseAND(F.lit(_M32))


def with_murmur3_long(df, src: str, out: str):
    """murmur3_x86_32 of a non-negative long column's 8-byte little-
    endian form, as pure Column arithmetic staged through NAMED
    intermediate columns — each mul32/rotl references its operand
    several times, so an inline tree grows exponentially and stalls
    the optimizer; named steps keep every duplicate a leaf attribute
    (whole-stage codegen CSEs them). Pinned ≡ the from-scratch
    operators/iceberg.murmur3_x86_32 in tests."""
    c = F.col(src)
    def _round(h, k):
        # k and h are leaf attributes here, so the bounded duplication
        # inside mul32/rotl stays a few hundred nodes per stage
        k = _col_mul32(_col_rotl(_col_mul32(k, 0xCC9E2D51), 15), 0x1B873593)
        h = _col_rotl(h.bitwiseXOR(k), 13)
        return (_col_mul32(h, 5) + F.lit(0xE6546B64)).bitwiseAND(F.lit(_M32))

    df = df.withColumn("__k1", c.bitwiseAND(F.lit(_M32))).withColumn(
        "__k2", F.shiftrightunsigned(c, 32)
    )
    df = df.withColumn("__h1", _round(F.lit(0), F.col("__k1")))
    df = df.withColumn("__h2", _round(F.col("__h1"), F.col("__k2")))
    df = df.withColumn(
        "__f1",
        F.col("__h2")
        .bitwiseXOR(F.lit(8))
        .bitwiseXOR(F.shiftrightunsigned(F.col("__h2").bitwiseXOR(F.lit(8)), 16)),
    )
    df = df.withColumn("__f2", _col_mul32(F.col("__f1"), 0x85EBCA6B))
    df = df.withColumn(
        "__f3", F.col("__f2").bitwiseXOR(F.shiftrightunsigned(F.col("__f2"), 13))
    )
    df = df.withColumn("__f4", _col_mul32(F.col("__f3"), 0xC2B2AE35))
    df = df.withColumn(
        out, F.col("__f4").bitwiseXOR(F.shiftrightunsigned(F.col("__f4"), 16))
    )
    return df.drop(
        "__k1", "__k2", "__h1", "__h2", "__f1", "__f2", "__f3", "__f4"
    )


_ICE_DAY_US = 86_400_000_000
_ICE_HOUR_US = 3_600_000_000
_TS_STEP_US = 90_061_000_000  # 1d 1h 1m 1s per doc — every field moves

_ICEBERG_VALUES_ORACLE = (
    _mm32_cte("doc_id < 448")
    + " SELECT doc_id, "
    "CAST((hh & 2147483647) % 8 AS INTEGER) AS bucket8, "
    "CAST((hh & 2147483647) % 32 AS INTEGER) AS bucket32, "
    "CAST(doc_id - doc_id % 16 AS BIGINT) AS trunc16, "
    f"CAST(doc_id * {_TS_STEP_US} // {_ICE_DAY_US} AS BIGINT) AS day_part, "
    f"CAST(doc_id * {_TS_STEP_US} // {_ICE_HOUR_US} AS BIGINT) AS hour_part, "
    f"CAST(year(make_timestamp(doc_id * {_TS_STEP_US})) - 1970 AS INTEGER) "
    "AS year_part, "
    f"CAST((year(make_timestamp(doc_id * {_TS_STEP_US})) - 1970) * 12 "
    f"+ month(make_timestamp(doc_id * {_TS_STEP_US})) - 1 AS INTEGER) "
    "AS month_part FROM t8"
)


@query("q_iceberg_transform_values", oracle=_ICEBERG_VALUES_ORACLE)
def q_iceberg_transform_values(spark, sf_dir):
    """E145 Iceberg transform FORMULAS value-oracled (round 14): every
    spec-Appendix-B transform computed per doc over a derived
    timestamp lattice (doc_id × 1d1h1m1s so year/month/day/hour all
    move) — bucket[8]/bucket[32] via murmur3_x86_32 of the 8-byte
    little-endian long AS PURE COLUMN ARITHMETIC (32-bit multiplies
    split 16/16 to stay inside signed-64 lanes, whole-stage codegen,
    zero Python rows), truncate[16] as the floored multiple, and the
    temporal family. The oracle recomputes the SAME murmur3 rounds as
    a DuckDB CTE chain — two genuinely independent transcriptions of
    the spec constants that must agree hash-for-hash on every row
    (the q_simhash_oracle recipe applied to the bucket hash), plus
    calendar twins through each engine's own datetime kernel. The
    from-scratch planner twin (operators/iceberg.murmur3_x86_32) is
    pinned to both via spec Appendix-B vectors + equality tests in
    tests/test_iceberg_transforms.py."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 448)
    c = F.col("doc_id")
    staged = with_murmur3_long(
        docs.select(c.alias("doc_id"), (c * F.lit(_TS_STEP_US)).alias("ts")),
        "doc_id",
        "hh",
    )
    hh = F.col("hh")
    ts = F.col("ts")
    tstamp = F.timestamp_micros(ts)
    return staged.select(
        F.col("doc_id"),
        (hh.bitwiseAND(F.lit(0x7FFFFFFF)) % F.lit(8)).cast("int").alias("bucket8"),
        (hh.bitwiseAND(F.lit(0x7FFFFFFF)) % F.lit(32)).cast("int").alias("bucket32"),
        (F.col("doc_id") - F.col("doc_id") % F.lit(16)).cast("long").alias("trunc16"),
        F.floor(ts / F.lit(_ICE_DAY_US)).cast("long").alias("day_part"),
        F.floor(ts / F.lit(_ICE_HOUR_US)).cast("long").alias("hour_part"),
        (F.year(tstamp) - F.lit(1970)).cast("int").alias("year_part"),
        ((F.year(tstamp) - F.lit(1970)) * F.lit(12) + F.month(tstamp) - F.lit(1))
        .cast("int")
        .alias("month_part"),
    )


_DELTA_CKPT_WRITE_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 32 AS BIGINT) AS table_id, "
    "CAST(CASE WHEN doc_id % 32 < 24 THEN 1 ELSE 2 END AS INTEGER) "
    "AS version_added, "
    "CAST(1 AS INTEGER) AS ckpt_version, "
    "CAST(2 AS INTEGER) AS commits_deleted, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480 AND doc_id % 32 NOT BETWEEN 8 AND 15"
)


@query("q_delta_checkpoint_write", oracle=_DELTA_CKPT_WRITE_ORACLE)
def q_delta_checkpoint_write(spark, sf_dir):
    """E146 Delta checkpoint WRITING (round 14, VERDICT r13 item #4):
    the q_delta_snapshot pure-JSON tables are checkpointed at version
    1 by delta_checkpoint_table — the state parquet written through
    the from-scratch writer's new nested-struct support (protocol /
    metaData / add / remove struct columns, the exact layout the E135'
    READER consumes), _last_checkpoint emitted, and commits 0–1
    DELETED from the archive so the digest only passes if replay
    genuinely seeds from our own checkpoint bytes. Commit 2 stays and
    replays on top: its remove must still drop docs 8–15 and its add
    attribute docs 24–31 at version 2, while checkpoint-seeded files
    carry version 1. Without checkpoint writing a Delta-shaped log
    grows unboundedly — this is the write half of the lakehouse loop,
    real writers run it every 10 commits. Map-only mapInPandas."""
    from yark_spark.operators.multimodal import (
        delta_checkpoint_write_features,
        with_delta_table_payload,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return delta_checkpoint_write_features(with_delta_table_payload(docs))


_DELTA_DV_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 32 AS BIGINT) AS table_id, "
    "CASE WHEN doc_id % 32 < 16 THEN 'inline' ELSE 'ondisk' END AS dv_kind, "
    "CAST(1 AS INTEGER) AS version_added, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480 AND "
    "((doc_id % 32 < 16 AND doc_id % 4 <> 1) "
    "OR (doc_id % 32 >= 16 AND doc_id % 4 <> 3))"
)


@query("q_delta_deletion_vectors", oracle=_DELTA_DV_ORACLE)
def q_delta_deletion_vectors(spark, sf_dir):
    """E147 Delta deletion vectors (round 14, VERDICT r13 item #4b):
    protocol-v3 tables (minReaderVersion 3, readerFeatures
    ["deletionVectors"]) whose commit 1 re-adds each data file with a
    DV — one INLINE (the bitmap Z85-encoded inside the descriptor),
    one ON-DISK (1-byte format version, 4-byte big-endian length
    framing, CRC32 cross-checked) — both Delta RoaringBitmapArrays
    over portable 32-bit roaring containers (operators/roaring,
    array/run/bitmap container grammar). Dead positions (doc%4==1 in
    the inline file, ==3 in the on-disk file) must vanish during
    materialize; a reader that ignores DVs returns phantom rows and
    fails the digest, one that mis-hashes the bitmap trips the
    cardinality/CRC integrity checks. Row-level deletes without
    rewrites are how real lakehouse tables absorb GDPR/dedup deletes
    at 100 TB — the delete is O(bitmap), not O(file rewrite). One
    applyInPandas per table, map-only resolve."""
    from yark_spark.operators.multimodal import delta_dv_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return delta_dv_features(docs)


_WARC_HTTP_BR_ORACLE = (
    "SELECT doc_id, "
    "CASE doc_id % 8 WHEN 0 THEN 'identity' WHEN 1 THEN 'chunked' "
    "WHEN 2 THEN 'gzip' WHEN 3 THEN 'chunked+gzip' "
    "WHEN 4 THEN 'deflate' WHEN 5 THEN 'zstd' "
    "WHEN 6 THEN 'br' ELSE 'chunked+br' END AS wire, "
    "CAST(200 AS INTEGER) AS status, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480"
)


@query("q_warc_http_brotli", oracle=_WARC_HTTP_BR_ORACLE)
def q_warc_http_brotli(spark, sf_dir):
    """E148 HTTP brotli content-coding (round 14, VERDICT r13 item
    #6): the q_warc_http_decode wire widened to an 8-way framing cycle
    adding ``br`` and chunked-over-``br`` — bodies compressed by the
    FROM-SCRATCH RFC 7932 encoder (operators/brotli: greedy LZ77 over
    the stream window, canonical package-merge prefix codes through
    the complex serialization, implicit-distance command cells) and
    recovered by the from-scratch decoder (full meta-block grammar,
    both prefix-code header forms, block switching, context maps,
    the distance short-code ring). Both directions are pinned against
    GENUINE C brotli in tests/test_brotli.py — real brotli decodes our
    wire byte-exactly, and (since session 3 extracted the static
    dictionary + context tables from the container's real brotli —
    q_warc_http_brotli_real) real streams at EVERY quality decode
    byte-exactly here. CDN-served crawl captures lean on br heavily;
    a WET pass without it quarantines a growing slice of the web.
    Grouping shuffle = shard assignment; map-only decode."""
    from yark_spark.operators.multimodal import (
        warc_http_decode_features,
        with_warc_shards,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return warc_http_decode_features(with_warc_shards(docs, http_wire="cycle_br"))


_ORC_VECTOR_WRITE_ORACLE = (
    "SELECT vec_id, "
    "CAST(CASE WHEN vec_id % 25 = 13 THEN -1 "
    "WHEN vec_id % 25 = 18 THEN 0 "
    "ELSE len(embedding) END AS INTEGER) AS dim, "
    "CAST(CASE WHEN vec_id % 25 IN (13, 18) THEN 0 "
    "WHEN vec_id % 25 = 21 THEN "
    "list_aggregate(list_transform(embedding, "
    "x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)), 'sum') "
    "- CAST(floor(CAST(embedding[4] AS DOUBLE) * 1000000) AS BIGINT) "
    "ELSE list_aggregate(list_transform(embedding, "
    "x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)), 'sum') "
    "END AS BIGINT) AS csum, "
    "CAST(CASE WHEN vec_id % 25 = 13 THEN -1 ELSE label END AS INTEGER) "
    "AS label FROM embeddings"
)


@query("q_orc_vector_write_roundtrip", oracle=_ORC_VECTOR_WRITE_ORACLE)
def q_orc_vector_write_roundtrip(spark, sf_dir):
    """E143' ORC LIST columns BOTH directions (round 14, second pass):
    the from-scratch WRITER gains repeated columns — ``LIST<FLOAT>``
    with PRESENT + LENGTH streams on the list node, the element
    subtree flattened beneath pre-order column ids, per-node
    encodings/statistics — and the embeddings corpus roundtrips
    through write → _decode_node with the E143 null grammar (null row
    / empty list / null element). REAL ORC_CPP reads the same files
    value-for-value (tests/test_orc.py), so the wire is genuine ORC,
    not a private dialect. Closing the write half matters at 100 TB
    because pipelines don't just READ warehouses — curated embedding
    shards have to land back in them. Map-only mapInPandas."""
    from yark_spark.operators.multimodal import orc_vector_write_roundtrip

    emb = load_table(spark, sf_dir, "embeddings")
    return orc_vector_write_roundtrip(emb)


_ORC_LEGACY_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 16 AS BIGINT) AS shard_id, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480"
)


@query("q_orc_legacy_scan", oracle=_ORC_LEGACY_ORACLE)
def q_orc_legacy_scan(spark, sf_dir):
    """E150 ORC RLE v1 legacy wire (round 14): the q_orc_scan shards
    re-written by REAL ORC_CPP at ``file_version='0.11'`` — the Hive
    ≤0.11 layout whose integer/length/dictionary-index streams are
    RLE VERSION 1 (delta-run/literal varints, a completely different
    grammar from RLEv2's four sub-encodings) — and decoded by the
    from-scratch reader's new _rlev1 path, dispatched per column
    ENCODING generation (DIRECT/DICTIONARY vs the _V2 pair).
    Long-lived Hadoop corpora are full of files written before Hive
    0.12 (2013); a reader without the v1 grammar quarantines exactly
    the oldest — often most-irreplaceable — slice of a warehouse.
    Codec still cycles all five chunk framings per shard. Grouping
    shuffle = shard assignment; map-only listing."""
    from yark_spark.operators.multimodal import orc_scan_listing, with_orc_shards

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return orc_scan_listing(with_orc_shards(docs, file_version="0.11"))


_PARQUET_MODERN_ORACLE = (
    "SELECT doc_id, "
    "CAST(floor(doc_id / 7.0 * 1000000) AS BIGINT) AS score_floor, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480"
)


@query("q_parquet_write_modern", oracle=_PARQUET_MODERN_ORACLE)
def q_parquet_write_modern(spark, sf_dir):
    """E151 parquet MODERN writer wire (round 14): the from-scratch
    writer emits what post-2.x real writers emit — DataPageV2 pages
    (rep/def levels uncompressed OUTSIDE the compressed value region,
    num_nulls/num_rows in the header) cycling against v1 per batch,
    DELTA_BINARY_PACKED ids (zigzag headers, 128-value blocks of four
    32-value miniblocks, per-miniblock bit widths, LE packing),
    DELTA_LENGTH_BYTE_ARRAY text (one delta run of lengths + raw
    bytes), and BYTE_STREAM_SPLIT doubles — read back by the
    from-scratch reader under the digest; pyarrow AND DuckDB read the
    same files value-for-value in tests/test_parquet_write.py. A
    writer stuck on PLAIN/dictionary interoperates but wastes the
    encodings that make 100 TB columns small; this closes the
    write-side parity with the reader's E130 family. Map-only
    mapInPandas."""
    from yark_spark.operators.multimodal import parquet_write_modern_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return parquet_write_modern_features(docs)


_LATEX_ORACLE = (
    "SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars, "
    "md5(text) AS digest FROM documents WHERE doc_id < 400"
)


@query("q_latex_extract", oracle=_LATEX_ORACLE)
def q_latex_extract(spark, sf_dir):
    """E152 LaTeX text extraction (round 14): documents written into
    full .tex sources — preamble the extractor must skip, a
    section/subsection/subsubsection family, styling wraps
    (textbf/emph/textit/texttt) cycling per paragraph, trailing
    comment noise, inline/display/environment MATH noise that must
    vanish, itemize blocks, one raw verbatim block, and every TeX
    special (& % $ _ # { } ~ ^ backslash) escaped on the way in —
    then recovered byte-exactly by the detex-class extractor
    (operators/latex: body isolation, escape-aware comment stripping,
    math-mode dropping, command unwrapping, escape resolution).
    Academic corpora (peS2o, RedPajama-arXiv, proof-pile) ARE .tex
    sources; without this pass the highest-quality technical text in
    a crawl arrives as macro soup. Map-only mapInPandas both
    stages."""
    from yark_spark.operators.multimodal import (
        latex_extract_features,
        with_latex_payload,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    return latex_extract_features(with_latex_payload(docs))
