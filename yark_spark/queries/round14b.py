"""Round-14 session-3 operator batch: the brotli COMPLETION campaign
(the RFC 7932 static dictionary and UTF8/SIGNED context tables turned
out to be extractable from the container's real C brotli — see
scripts/extract_brotli_dict.py / extract_brotli_context.py — so the
two round-14 "spec data with no in-container source" boundaries are
CLOSED) plus the parquet page-codec matrix (BROTLI / LZ4_RAW / legacy
Hadoop LZ4 both directions).

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

_PARQUET_CODEC_ORACLE = (
    "SELECT doc_id, "
    "CASE CAST(doc_id // 16 AS BIGINT) % 5 WHEN 0 THEN 'BROTLI' "
    "WHEN 1 THEN 'LZ4_RAW' WHEN 2 THEN 'ZSTD' WHEN 3 THEN 'GZIP' "
    "ELSE 'SNAPPY' END AS codec, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480"
)


@query("q_parquet_codec_scan", oracle=_PARQUET_CODEC_ORACLE)
def q_parquet_codec_scan(spark, sf_dir):
    """E154 parquet page-codec matrix (round 14, session 3): shards
    written by REAL parquet-cpp with page compression cycling
    BROTLI / LZ4 (LZ4_RAW wire ids) / ZSTD / GZIP / SNAPPY, decoded by
    the from-scratch reader (operators/parquet_data) through the
    in-repo codecs — including the round-14 additions: the RFC 7932
    decoder with its EXTRACTED static dictionary + context tables
    (real parquet-cpp BROTLI pages reference both), raw lz4 blocks,
    and legacy Hadoop LZ4 framing with arrow's raw fallback. The codec
    label is read from the footer we parsed, so a hash match proves
    each declared codec was really dispatched and really reversed.
    The reverse lanes (our writer's seven codecs read by pyarrow and
    DuckDB) are pinned in tests/test_parquet_codec_matrix.py. At
    100 TB, codec coverage is table-stakes: a lake's files arrive with
    whatever codec the writing engine preferred. Map-only decode;
    grouping shuffle = shard assignment."""
    from yark_spark.operators.multimodal import (
        parquet_codec_listing,
        with_parquet_codec_shards,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return parquet_codec_listing(with_parquet_codec_shards(docs))


_ORC_ROWINDEX_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 160 AS BIGINT) AS table_id, "
    "CAST(9 AS INTEGER) AS row_groups_skipped, "
    "CAST(1 AS INTEGER) AS row_groups_scanned, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480 AND doc_id % 160 BETWEEN 64 AND 79"
)


@query("q_orc_rowindex_prune", oracle=_ORC_ROWINDEX_ORACLE)
def q_orc_rowindex_prune(spark, sf_dir):
    """E156 ORC row-group pruning (round 14, session 3): the
    within-stripe skip grain — each 160-doc table becomes a REAL
    ORC_CPP file (rowIndexStride 16 → 10 row groups, chunk codec
    cycling), and operators/orc.orc_scan_rowgroups plans group
    survival off the ROW_INDEX streams (one RowIndexEntry per stride:
    per-group ColumnStatistics + seek positions), then decodes ONLY
    the surviving group by SEEKING: compressed chunks before the
    recorded offset never inflate, values before the recorded run
    skip never materialize (position semantics — PRESENT/DATA/LENGTH
    record order, byte-RLE + bit skips for booleans, run skips for
    RLE — derived empirically from ORC_CPP wire and pinned in
    tests/test_orc_rowindex.py). The range probe decodes exactly 1 of
    10 groups; both counters ride in every row so the oracle pins the
    PLAN. Completes the skip-contract family: parquet row groups /
    pages / blooms, ORC stripes / row groups / blooms, Iceberg +
    Delta file sets. One applyInPandas per table; map-only."""
    from yark_spark.operators.multimodal import orc_rowindex_prune_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return orc_rowindex_prune_features(docs)


_ARROW_IPC_ORACLE = (
    "SELECT doc_id, "
    "CASE CAST(doc_id // 16 AS BIGINT) % 5 "
    "WHEN 3 THEN 'stream' WHEN 4 THEN 'stream' ELSE 'file' END AS wire, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480"
)


@query("q_arrow_ipc_scan", oracle=_ARROW_IPC_ORACLE)
def q_arrow_ipc_scan(spark, sf_dir):
    """E158 Arrow IPC (Feather V2) reader from scratch (round 14,
    session 3): shards written by REAL pyarrow cycling layout × codec
    (file/none, file/lz4, file/zstd, stream/none, stream/zstd, several
    record batches each) and decoded by operators/arrow_ipc — a
    minimal FLATBUFFER reader (vtables, tables, vectors, unions) under
    the Arrow columnar layout (validity bitmaps, offset buffers,
    per-buffer LZ4-frame/zstd decompression through the in-repo
    codecs), both the footer'd FILE layout and the message STREAM.
    The wire label derives from the magic we parsed. Arrow IPC is the
    interchange wire of ML data pipelines — flight streams, feather
    spills, engine handoff; a 100 TB curation stack that cannot read
    it re-serializes everything it touches. Full type-matrix
    differential vs pyarrow in tests/test_arrow_ipc.py. Map-only
    decode; grouping shuffle = shard assignment."""
    from yark_spark.operators.multimodal import (
        arrow_ipc_listing,
        with_arrow_ipc_shards,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return arrow_ipc_listing(with_arrow_ipc_shards(docs))


@query("q_arrow_ipc_write_roundtrip", oracle=_ARROW_IPC_ORACLE)
def q_arrow_ipc_write_roundtrip(spark, sf_dir):
    """E158'' Arrow IPC WRITER from scratch (round 14, session 3
    second pass): the read path's other half — hand-built flatbuffer
    vtables (a grow-downward builder with the official position
    conventions), Schema/RecordBatch/Footer tables, validity bitmaps,
    offset buffers, 8-byte-aligned bodies, per-buffer lz4-frame/zstd
    compression, BOTH the footer'd file layout and the message
    stream. The certificate is the strongest available: REAL pyarrow
    decodes our wire inside the fixture, and the oracle hash pins the
    values — 'writes what others read' on the interchange format, the
    same discipline as the parquet (E133) and ORC (E134') writers.
    Map-only; grouping shuffle = shard assignment."""
    from yark_spark.operators.multimodal import (
        arrow_ipc_write_roundtrip_features,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return arrow_ipc_write_roundtrip_features(docs)


_ARROW_VECTOR_ORACLE = (
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


@query("q_arrow_ipc_vector_scan", oracle=_ARROW_VECTOR_ORACLE)
def q_arrow_ipc_vector_scan(spark, sf_dir):
    """E158' Arrow IPC list columns (round 14, session 3): the
    embeddings corpus through pyarrow ``list<float32>`` IPC files with
    zstd buffer compression and the deterministic null grammar the
    ORC/parquet vector keys use (null row / EMPTY list / null element
    at [3], vec_id%25-selected) — every wire state lands in a distinct
    oracle value via dim + integer-exact Σ floor(x·10⁶). The list path
    is the one embeddings ride between engines: offsets buffer +
    child validity, assembled by the from-scratch reader. Map-only."""
    from yark_spark.operators.multimodal import arrow_ipc_vector_listing

    emb = load_table(spark, sf_dir, "embeddings")
    return arrow_ipc_vector_listing(emb)


_ZIP_METHODS_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 16 AS BIGINT) AS shard_id, "
    "CASE doc_id % 5 WHEN 0 THEN 'stored' WHEN 1 THEN 'deflate' "
    "WHEN 2 THEN 'bzip2' WHEN 3 THEN 'lzma' ELSE 'zstd' END AS method, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480"
)


@query("q_zip_methods_scan", oracle=_ZIP_METHODS_ORACLE)
def q_zip_methods_scan(spark, sf_dir):
    """E159 extended ZIP member methods (round 14, session 3): the
    q_zip_scan wire widened to a 5-way method cycle adding BZIP2
    (APPNOTE 12), LZMA (APPNOTE 14 — version header + raw LZMA1
    stream through the from-scratch range coder) and zstd (PKWARE 93)
    through the in-repo codecs. stdlib zipfile (real libbz2/liblzma)
    reads our bzip2/lzma members and we read its, both pinned in
    tests/test_zip_methods.py; the raw-LZMA1 entry points are
    liblzma-differentialed both directions. The method label derives
    from the parsed central directory, so the oracle hash proves each
    method was really present and really reversed. Kaggle/benchmark
    ZIP drops use these methods in the wild. Map-only decode;
    grouping shuffle = shard assignment."""
    from yark_spark.operators.multimodal import with_zip_shards, zip_listing

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return zip_listing(with_zip_shards(docs, method_cycle="full"))


_ICEBERG_WRITE_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 64 AS BIGINT) AS table_id, "
    "CAST(3 AS INTEGER) AS n_snapshots, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 448 "
    "AND doc_id % 64 NOT BETWEEN 16 AND 23 AND doc_id % 64 != 40"
)


@query("q_iceberg_write_roundtrip", oracle=_ICEBERG_WRITE_ORACLE)
def q_iceberg_write_roundtrip(spark, sf_dir):
    """E157 Iceberg table WRITING (round 14, session 3): the commit
    loop the lakehouse pair was missing — Delta gained checkpoint
    writing in session 2; operators/iceberg now has create/commit:
    each 64-doc table is built through THREE commits (two appends of
    two E133-parquet files each, then a delete commit with a
    positional delete killing p1 rows 0-7 and an equality delete
    naming doc base+40), every manifest written by the from-scratch
    Avro OCF writer with NULL entry sequence numbers (the reader's v2
    inheritance path runs on every resolve), prior manifests REUSED
    verbatim across manifest lists, single current metadata JSON with
    the full lineage. Resolution back through iceberg_snapshot_rows
    must apply pos deletes at seq >= and eq deletes at seq > — the
    oracle pins exactly which docs vanish. Commit arithmetic (lineage,
    manifest reuse, time travel per snapshot, metadata-log, v1
    refusal) is pinned in tests/test_iceberg_write.py. At 100 TB this
    is how tables MUTATE: O(1) metadata commits over immutable files.
    One applyInPandas per table; map-only."""
    from yark_spark.operators.multimodal import iceberg_write_roundtrip_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 448)
    return iceberg_write_roundtrip_features(docs)


_WARC_HTTP_BR_REAL_ORACLE = (
    "SELECT doc_id, "
    "CASE doc_id % 9 WHEN 0 THEN 'identity' WHEN 1 THEN 'chunked' "
    "WHEN 2 THEN 'gzip' WHEN 3 THEN 'chunked+gzip' "
    "WHEN 4 THEN 'deflate' WHEN 5 THEN 'zstd' "
    "WHEN 6 THEN 'br' WHEN 7 THEN 'chunked+br' ELSE 'br' END AS wire, "
    "CAST(200 AS INTEGER) AS status, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480"
)


@query("q_warc_http_brotli_real", oracle=_WARC_HTTP_BR_REAL_ORACLE)
def q_warc_http_brotli_real(spark, sf_dir):
    """E155 brotli decode COMPLETION on third-party wire (round 14,
    session 3): q_warc_http_brotli's cycle widened to % 9 — the ninth
    wire compresses the body with GENUINE C brotli at quality 11,
    whose streams lean on the RFC 7932 static dictionary and UTF8
    context modeling. Round 14 session 2 held those back as typed
    boundaries ("literal spec data with no in-container source"); the
    premise was false — pyarrow.Codec('brotli') IS real brotli, and
    one-command probe streams make it RETURN the dictionary
    (122,784 bytes, 121 transforms) and the context tables (both
    factorizations verified on all 65,536 (p1,p2) pairs). With the
    extracted tables wired in, every real brotli stream q0–q11
    decodes byte-exactly (tests/test_brotli_static_dict.py), and this
    key pins the full path — WARC record → HTTP head → chunked
    de-framing → real-brotli body → text digest — against the DuckDB
    oracle. Map-only decode; grouping shuffle = shard assignment."""
    from yark_spark.operators.multimodal import (
        warc_http_decode_features,
        with_warc_shards,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return warc_http_decode_features(
        with_warc_shards(docs, http_wire="cycle_br_real")
    )
