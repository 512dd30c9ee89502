"""Round-13 operator batch (VERDICT r12 next-round list): the
extraction family's real-world-input gaps — PDF 1.5 cross-reference
STREAMS + /ObjStm object streams cycled against the classic table
under one digest, a Unigram-LM (SentencePiece-class) tokenizer
completing the BPE/WordPiece trio, jusText-class HTML main-content
extraction, Avro schema RESOLUTION (reader vs writer schemas),
dictionary-compressed zstd shards, and the MP3 Layer III decode
stretch.

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

_PDF_XREFSTREAM_ORACLE = (
    "SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars, "
    "md5(text) AS digest FROM documents WHERE doc_id < 400"
)


@query("q_pdf_extract_xrefstream", oracle=_PDF_XREFSTREAM_ORACLE)
def q_pdf_extract_xrefstream(spark, sf_dir):
    """E123 PDF 1.5 xref-stream + object-stream extraction (round 13,
    VERDICT r12 item #1): documents written into real PDFs whose
    cross-reference layout CYCLES per doc — even doc_id the classic
    1994 xref table, odd doc_id the post-2005 PDF 1.5 layout: catalog/
    page-tree/font dicts packed into a FlateDecode'd /ObjStm object
    stream (N + /First header pairs) located by TYPE-2 entries in two
    chained cross-reference STREAMS (/W [1 3 2] field widths,
    multi-subsection /Index, /Prev, the second PNG-Up predicted via
    /DecodeParms /Predictor 12) — and recovered byte-exactly through
    startxref → xref-stream decode → ObjStm inflation → page-tree walk
    → content-stream text operators. ONE oracle digest therefore pins
    BOTH cross-reference grammars and the predictor/objstm plumbing
    (operators/pdf.py). Nearly every PDF written since Acrobat 6 uses
    this layout, so the documents vertical was triage-only without it.
    Map-only mapInPandas both stages."""
    from yark_spark.operators.multimodal import pdf_extract_features, with_pdf_payload

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    return pdf_extract_features(with_pdf_payload(docs, layout="cycle"))


_PDF_FILTER_ORACLE = (
    "SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars, "
    "md5(text) AS digest FROM documents WHERE doc_id < 400"
)


@query("q_pdf_filter_cycle", oracle=_PDF_FILTER_ORACLE)
def q_pdf_filter_cycle(spark, sf_dir):
    """E128 PDF stream-filter family (round 13): the q_pdf_extract
    wire with each page's content stream rotated through the FULL
    ISO 32000-1 §7.4 filter set — none / FlateDecode / LZWDecode
    (TIFF-shared MSB wire, /EarlyChange 1 default) / RunLengthDecode
    (PackBits + required EOD) / ASCIIHexDecode / the two-stage
    [/ASCII85Decode /FlateDecode] chain (decode-order array per
    §7.4.1) / LZWDecode with /DecodeParms << /EarlyChange 0 >> (the
    spec-exact width variant). Real-world PDFs lean on exactly these
    (LZW in pre-2000 writers, the ASCII armors in mail/PostScript
    derived docs, RunLength in scanners), so FlateDecode-only
    extraction quarantined them. ONE oracle digest over the recovered
    text pins every filter decoder and the chain plumbing at once.
    Map-only mapInPandas both stages."""
    from yark_spark.operators.multimodal import pdf_extract_features, with_pdf_payload

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    return pdf_extract_features(with_pdf_payload(docs, filters="cycle"))


_JSONL_ZST_DICT_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 16 AS BIGINT) AS shard_id, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480"
)


@query("q_jsonl_zst_dict_scan", oracle=_JSONL_ZST_DICT_ORACLE)
def q_jsonl_zst_dict_scan(spark, sf_dir):
    """E124 dictionary-compressed .jsonl.zst shards (round 13, VERDICT
    r12 item #5): the q_jsonl_zst_scan wire with a structured zstd
    DICTIONARY (RFC 8878 §5) in play end-to-end — the in-repo trainer
    derives a content-prefix dictionary (frequent shared 16-grams +
    the records' majority byte-prefix at the window edge) from
    template records, the encoder writes frames that CARRY its
    Dictionary_ID and copy from its content (sequences with offsets
    reaching below output position 0), and the listing decodes with
    the dict parsed once per task. Small-record shards are exactly
    where real pipelines deploy dictionaries (per-record/per-shard
    zstd without one wastes the first KB re-learning the skeleton);
    the ~1 KB dict ships in the task closure — at 100 TB it would
    broadcast. A frame decoded WITHOUT the dictionary is a typed
    error, so the digest match proves the dictionary path actually
    ran. Grouping shuffle = shard assignment; map-only listing."""
    from yark_spark.operators.multimodal import (
        corpus_jsonl_dictionary,
        jsonl_zst_listing,
        with_jsonl_zst_shards,
    )

    d = corpus_jsonl_dictionary()
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return jsonl_zst_listing(
        with_jsonl_zst_shards(docs, dictionary=d), dictionary=d
    )


_AVRO_EVOLVE_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 16 AS BIGINT) AS shard_id, "
    "CAST(1 + (doc_id // 16) % 2 AS INTEGER) AS writer_version, "
    "CASE WHEN (doc_id // 16) % 2 = 0 THEN 'und' "
    "WHEN doc_id % 2 = 0 THEN 'en' ELSE 'de' END AS lang, "
    "CASE WHEN (doc_id // 16) % 2 = 0 THEN "
    "(CASE doc_id % 3 WHEN 0 THEN 'red' WHEN 1 THEN 'green' ELSE 'blue' END) "
    "ELSE "
    "(CASE doc_id % 3 WHEN 0 THEN 'green' WHEN 1 THEN 'blue' ELSE 'red' END) "
    "END AS cat, "
    "CAST(doc_id % 1000 AS DOUBLE) AS score, "
    "CAST(3 AS INTEGER) AS quality, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480"
)


@query("q_avro_evolve", oracle=_AVRO_EVOLVE_ORACLE)
def q_avro_evolve(spark, sf_dir):
    """E125 Avro schema resolution (round 13, VERDICT r12 item #4):
    shards whose WRITER schema cycles between two generations — v1
    (score int, 3-symbol enum, id/score/cat/text order) and v2 (text
    as a nullable union, a lang field, score widened to long, a
    RESHUFFLED 4-symbol enum, a writer-only rev field) — all read
    through ONE reader schema per Avro 1.11 "Schema Resolution":
    record fields matched BY NAME regardless of position, v1's
    missing lang taking the reader default 'und', score promoted
    int/long → double, enum symbols resolved by NAME across the
    reshuffled lists (positional decode would scramble v2's colors —
    the oracle's CASE pins the names), v2's union text read as plain
    string, rev skipped, and the reader-only quality field
    defaulting to 3. This is the live-pipeline reality (producers
    upgrade schemas before consumers; Kafka/Hive corpora span years
    of generations), and the reason Avro's self-describing header
    matters at 100 TB: every shard resolves independently, map-only.
    Codec still cycles null/deflate/snappy by shard."""
    from yark_spark.operators.multimodal import (
        avro_evolve_listing,
        with_avro_evolved_shards,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return avro_evolve_listing(with_avro_evolved_shards(docs))


_UNXZ_ORACLE = (
    "SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars, "
    "md5(text) AS digest FROM documents WHERE doc_id < 500"
)


@query("q_text_unxz", oracle=_UNXZ_ORACLE)
def q_text_unxz(spark, sf_dir):
    """E129 xz/LZMA text ingest (round 13): documents round-trip
    through the from-scratch LZMA codec (operators/xz) — the 11-bit
    adaptive binary range coder, the 12-state literal/match/rep
    machine with matched-byte literals, pos-slot + SpecPos + align
    distance trees, 4-deep repeat history, the LZMA2 chunk ladder
    (compressed + stored chunks, props/state/dict resets), and the
    full .xz container (header/block/index/footer CRCs, the Index
    cross-check, and a per-doc CYCLE of the four integrity checks
    incl. a from-scratch CRC64-ECMA). xz completes the shard-
    compression family (gzip/zstd/lz4/bzip2/xz) — scientific corpora
    and software-heritage dumps ship .jsonl.xz/.tar.xz. The decoded
    md5 digest must equal DuckDB's md5(text); no lzma library exists
    in the container, so tests/test_xz.py pins the CRC64 check-input
    vector, hand-built container grammars and 300-trial roundtrip
    fuzz instead of a differential (the zstd/E95 precedent). Two
    map-only mapInPandas stages; text bytes never shuffle."""
    from yark_spark.operators.multimodal import unxz_text_features, with_xz_payload

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return unxz_text_features(with_xz_payload(docs))


_JSONL_XZ_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 16 AS BIGINT) AS shard_id, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480"
)


@query("q_jsonl_xz_scan", oracle=_JSONL_XZ_ORACLE)
def q_jsonl_xz_scan(spark, sf_dir):
    """E129' .jsonl.xz shard ingest: the xz twin of q_jsonl_zst_scan —
    16-doc JSON-lines shards packed into one .xz stream each (check id
    cycling per shard), exploded back through the SAME listing operator
    (jsonl_zst_listing), whose decompress_auto magic dispatch now
    speaks gzip, zstd, LZ4, bzip2 AND xz from one entry point — a
    mixed corpus directory scans in one map-only pass. Digest-matched
    per doc through pack → compress → dispatch → JSON parse; the
    grouping shuffle IS the shard assignment."""
    from yark_spark.operators.multimodal import (
        jsonl_zst_listing,
        with_jsonl_xz_shards,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return jsonl_zst_listing(with_jsonl_xz_shards(docs))


_PARQUET_RAW_ORACLE = (
    "SELECT doc_id, lang, n_chars, md5(text) AS digest FROM documents"
)


@query("q_parquet_raw_scan", oracle=_PARQUET_RAW_ORACLE)
def q_parquet_raw_scan(spark, sf_dir):
    """E130 parquet DATA-page read from scratch (round 13): the E118
    footer audit extended to the values — raw documents.parquet bytes
    through operators/parquet_data (Thrift page headers, in-repo
    SNAPPY/GZIP/ZSTD page codecs, RLE/bit-packed hybrid definition
    levels, PLAIN + RLE_DICTIONARY values incl. pyarrow's mid-chunk
    dictionary fallback, DataPage v1 AND v2 layouts), emitting
    (doc_id, lang, n_chars, md5(text)) per row. The oracle is
    DuckDB's INDEPENDENT C++ reader over the SAME file: two unrelated
    implementations of the full read path must agree on every row —
    the strongest differential shape in the repo, now covering data,
    not just metadata. Parquet is THE 100 TB substrate; the unit of
    work at scale is (file, row group) with ranged footer+chunk
    fetches, map-only here, bytes never shuffle."""
    from yark_spark.operators.multimodal import parquet_documents_scan

    files = spark.read.format("binaryFile").load(f"{sf_dir}/documents.parquet")
    return parquet_documents_scan(files)


_WARC_CDX_ORACLE = (
    "SELECT doc_id, 'com,example)/doc/' || CAST(doc_id AS VARCHAR) AS urlkey, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480"
)


@query("q_warc_cdx_seek", oracle=_WARC_CDX_ORACLE)
def q_warc_cdx_seek(spark, sf_dir):
    """E131 WARC CDX index + random access (round 13): the Common
    Crawl cluster.idx convention — per-record-gzip .warc.gz shards
    (full CC record shape: warcinfo prologue + HTTP heads) indexed by
    walking gzip MEMBER BOUNDARIES (headers + deflate + trailer, no
    magic scans) into (SURT urlkey, offset, length) entries, then
    PROVEN by the only test that matters: each record re-read through
    a range slice at its recorded offset, one-member inflate, HTTP
    strip, text digest against DuckDB. Offsets are compression-
    dependent bytes no SQL can re-derive, so the certificate is the
    seek path itself — a wrong offset cannot inflate to the right
    digest. This is the 100 TB access pattern for crawl archives:
    CDX lookup → ranged GET → one-member inflate; nobody re-reads a
    multi-GB WARC for one document. Grouping shuffle = shard
    assignment; map-only listing."""
    from yark_spark.operators.multimodal import warc_cdx_seek_extract, with_warc_shards

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return warc_cdx_seek_extract(with_warc_shards(docs, http_head=True))


_PARQUET_WRITE_ORACLE = (
    "SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars, "
    "md5(text) AS digest FROM documents WHERE doc_id < 500"
)


@query("q_parquet_write_roundtrip", oracle=_PARQUET_WRITE_ORACLE)
def q_parquet_write_roundtrip(spark, sf_dir):
    """E133 parquet writer from scratch (round 13): E130's reader got
    its other half — documents serialized into REAL parquet files by
    operators/parquet_write (hand-built Thrift-compact FileMetaData +
    page headers, dictionary/PLAIN value pages, RLE/bit-packed
    definition levels with the exact-8s alignment discipline, UTF8
    annotation, multi row groups, page codec CYCLING snappy/zstd/
    gzip/uncompressed per batch through the in-repo encoders) and
    read back by operators/parquet_data, digest-matched against
    DuckDB. Cross-library proof lives in tests/test_parquet_write.py:
    DuckDB and pyarrow both read our files value-for-value and
    DuckDB's parquet_metadata() agrees with the footer we serialized.
    The repo now reads what others write AND writes what others read
    on THE 100 TB substrate. Map-only mapInPandas; one file per task,
    footer last — the shard-materialization kernel."""
    from yark_spark.operators.multimodal import parquet_write_roundtrip_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return parquet_write_roundtrip_features(docs)


_ORC_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 16 AS BIGINT) AS shard_id, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480"
)


@query("q_orc_scan", oracle=_ORC_ORACLE)
def q_orc_scan(spark, sf_dir):
    """E134 ORC reader from scratch (round 13): the OTHER columnar
    substrate — shards written by the REAL library (pyarrow's
    ORC_CPP, compression cycling uncompressed/zlib/snappy/zstd/lz4
    per shard) and decoded by operators/orc: postscript + footer +
    stripe-footer protobuf (via the in-repo tfrecord wire codec),
    ORC's 3-byte chunk framing over the in-repo codecs, PRESENT
    boolean RLE, the FULL RLEv2 integer family (short repeat,
    direct, patched base, delta — FixedBitSizes widths, MSB-first
    packing, zigzag), and DICTIONARY_V2/DIRECT_V2 strings. Reading
    genuine third-party wire is the strongest ingest claim: nothing
    in the decode path ever saw these bytes before. Hive/Trino
    warehouses and long-lived Hadoop corpora ship ORC at 100 TB;
    the (file, stripe) unit here is the warehouse-scan task shape.
    Grouping shuffle = shard assignment; map-only listing."""
    from yark_spark.operators.multimodal import orc_scan_listing, with_orc_shards

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return orc_scan_listing(with_orc_shards(docs))


_DELTA_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 32 AS BIGINT) AS table_id, "
    "CAST(CASE WHEN doc_id % 32 < 8 THEN 0 "
    "WHEN doc_id % 32 < 16 THEN -1 "  # removed: filtered below
    "WHEN doc_id % 32 < 24 THEN 1 ELSE 2 END AS INTEGER) AS version_added, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480 AND doc_id % 32 NOT BETWEEN 8 AND 15"
)


@query("q_delta_snapshot", oracle=_DELTA_ORACLE)
def q_delta_snapshot(spark, sf_dir):
    """E135 lakehouse transaction-log snapshot (round 13): every 32
    docs become a Delta-protocol table — four parquet files written
    by the from-scratch writer (E133) inside a tar archive with a
    three-commit JSON log (v0: protocol+metaData+add p0,p1; v1: add
    p2; v2: remove p1 + add p3) — and operators/deltalog replays the
    log per delta.io PROTOCOL.md: gapless version order, last action
    per path wins, size cross-check before decode, minReaderVersion
    gate, then the live files stream through the from-scratch
    parquet reader (E130). The oracle pins the SEMANTICS: docs 8–15
    of every table must VANISH (their file was removed in v2) and
    every surviving row must carry the version of the commit that
    added its file. This is how a 100 TB lakehouse table is a table —
    object stores have no rename-into-place, so the log IS the
    state, and snapshot resolution is the first thing every engine
    does before any scan. Grouping shuffle = table assignment;
    map-only replay."""
    from yark_spark.operators.multimodal import (
        delta_snapshot_features,
        with_delta_table_payload,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return delta_snapshot_features(with_delta_table_payload(docs))


@query("q_orc_write_roundtrip", oracle=_PARQUET_WRITE_ORACLE)
def q_orc_write_roundtrip(spark, sf_dir):
    """E134' ORC writer from scratch (round 13): the E133 recipe on
    the other substrate — documents serialized into real ORC files by
    operators/orc.orc_write (hand-built protobuf postscript/footer/
    stripe-footer via the tfrecord wire encoder, RLEv2 short-repeat +
    DIRECT integer runs, DIRECT_V2 strings, boolean-RLE presents,
    ZLIB chunk framing, multi-stripe) and read back by the E134
    reader, digest-matched against DuckDB. tests/test_orc.py pins the
    cross-library half: the REAL ORC_CPP reads our files
    value-for-value. Both columnar substrates now go both directions.
    Map-only mapInPandas."""
    from yark_spark.operators.multimodal import orc_write_roundtrip_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return orc_write_roundtrip_features(docs)


_PARQUET_VECTOR_ORACLE = (
    "SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim, "
    "CAST(list_aggregate(list_transform(embedding, "
    "x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)), 'sum') "
    "AS BIGINT) AS csum FROM embeddings"
)


@query("q_parquet_vector_scan", oracle=_PARQUET_VECTOR_ORACLE)
def q_parquet_vector_scan(spark, sf_dir):
    """E130' parquet LIST columns (round 13, second pass): the E130
    reader extended past flat columns to the standard 3-level LIST
    shape via REPETITION-LEVEL record assembly (rep 0 starts a row;
    def distinguishes null row / empty list / null element / value) —
    read directly off the raw embeddings.parquet bytes and checked
    against DuckDB with an integer-exact per-vector checksum
    (Σ floor(x·10⁶) — float32 values decode bit-identically on both
    sides, and the floor-sum is order-free in integers). Embedding
    corpora ARE this shape at 100 TB; a page reader that stops at
    flat columns cannot open an ANN corpus. Map-only mapInPandas."""
    from yark_spark.operators.multimodal import parquet_vectors_scan

    files = spark.read.format("binaryFile").load(f"{sf_dir}/embeddings.parquet")
    return parquet_vectors_scan(files)


_TAR_XZ_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 16 AS BIGINT) AS shard_id, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480"
)


@query("q_tar_xz_scan", oracle=_TAR_XZ_ORACLE)
def q_tar_xz_scan(spark, sf_dir):
    """E129'' .tar.xz shard ingest (round 13): WebDataset-style tar
    shards wrapped in the from-scratch xz container — the software-
    distribution and Software-Heritage wire (source tarballs ship as
    .tar.xz) — recovered through decompress_auto's magic dispatch +
    the ustar walk, with each member's text digest-matched. Two
    from-scratch layers certified under one SQL hash; the grouping
    shuffle IS the shard assignment; map-only listing."""
    from yark_spark.operators.multimodal import (
        tar_text_digest_listing,
        with_tar_shards,
        xz_compress_payload,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return tar_text_digest_listing(xz_compress_payload(with_tar_shards(docs)))


def _mp3_deep_oracle() -> str:
    """Re-derive the ENTIRE Layer III structural stream in SQL: the
    fixture's side-info fields, scalefactors and reservoir pointers
    are pure arithmetic over the doc's first four md5 codes, so the
    oracle rebuilds granule-by-granule (and band-by-band) sums that
    the Spark side must recover from the actual bitstream — side-info
    bit layout, slen lookup, short-vs-long scalefactor shapes and
    main_data_begin reassembly all pinned by four integers per doc."""
    from yark_spark.operators.mp3 import SLEN

    slen1_case = " ".join(f"WHEN {k} THEN {v[0]}" for k, v in enumerate(SLEN))
    slen2_case = " ".join(f"WHEN {k} THEN {v[1]}" for k, v in enumerate(SLEN))
    return (
        "WITH codes AS (SELECT doc_id, "
        "ascii(substr(md5(text), 1, 1)) AS a, ascii(substr(md5(text), 2, 1)) AS b, "
        "ascii(substr(md5(text), 3, 1)) AS c, ascii(substr(md5(text), 4, 1)) AS d, "
        "6 + ascii(substr(md5(text), 1, 1)) % 6 AS nf "
        "FROM documents WHERE doc_id < 300), "
        "ig AS (SELECT doc_id, a, b, c, d, nf, gi.i AS i, gg.g AS g "
        "FROM codes, unnest(generate_series(0, nf - 1)) AS gi(i), "
        "(VALUES (0), (1)) gg(g)), "
        "gr AS (SELECT *, (c + i + g) % 16 AS sc, "
        "CASE WHEN (i + g) % 5 = 0 THEN 1 ELSE 0 END AS short FROM ig), "
        f"sl AS (SELECT *, CASE sc {slen1_case} END AS slen1, "
        f"CASE sc {slen2_case} END AS slen2 FROM gr), "
        "sf AS (SELECT doc_id, sum((d + i + g + j.j) % "
        "(1 << (CASE WHEN (CASE WHEN short = 1 THEN j.j < 18 "
        "ELSE j.j < 11 END) THEN slen1 ELSE slen2 END))) AS sum_sf "
        "FROM sl, unnest(generate_series(0, 35)) AS j(j) "
        "WHERE j.j < CASE WHEN short = 1 THEN 36 ELSE 21 END "
        "GROUP BY doc_id), "
        "agg AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_granules, "
        "CAST(sum(short) AS INTEGER) AS n_short, "
        "sum((b + 7 * i + 3 * g) % 256) AS sum_gg, "
        "sum(CASE WHEN i >= 1 AND g = 0 THEN (a + 7 * i) % 120 ELSE 0 END) "
        "AS sum_mdb FROM sl GROUP BY doc_id) "
        "SELECT agg.doc_id, n_granules, n_short, "
        "CAST(sum_gg AS BIGINT) AS sum_gg, CAST(sf.sum_sf AS BIGINT) AS sum_sf, "
        "CAST(sum_mdb AS BIGINT) AS sum_mdb "
        "FROM agg JOIN sf ON agg.doc_id = sf.doc_id"
    )


@query("q_mp3_sideinfo", oracle=_mp3_deep_oracle())
def q_mp3_sideinfo(spark, sf_dir):
    """E132 MP3 Layer III structural decode (round 13, VERDICT r12
    item #7 as a documented partial): beyond the E121 header triage —
    full SIDE-INFO parse (both block shapes: normal long and
    window-switched short with subblock gains), the BIT RESERVOIR
    (main_data_begin back-pointers into earlier frames' areas,
    ancillary stuffing between — the mechanism that makes MP3 frames
    non-self-contained and naive frame slicing wrong), and
    SCALEFACTOR extraction (slen1/slen2 table, long 11+10 vs short
    18+18 layouts), with part2_3_length verified to the bit. Fixture
    granules carry big_values = 0 (spec-valid silence), because the
    spectral Huffman stage is the HONEST boundary: ISO 11172-3 Table
    B.7 is literal spec data with no in-container source to
    transcribe from — a typed NotImplementedError, not a guess. The
    oracle re-derives every field arithmetically from four md5 codes
    per doc. Map-only mapInPandas both stages."""
    from yark_spark.operators.multimodal import (
        mp3_deep_features,
        with_mp3_deep_payload,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return mp3_deep_features(with_mp3_deep_payload(docs))


def _main_content_oracle() -> str:
    """DuckDB re-derivation of the WHOLE jusText pass over the main
    blocks: words renumbered after empty-token filtering, grouped into
    12-word blocks, per-block stopword counts against the fixture
    language's list, the integer-threshold context-free classes, the
    short-block context pass as a lag window (a short tail is good iff
    the previous main block is good — its next non-short neighbor is
    always the link-dense sidebar), and md5 of the newline-joined
    retained text."""
    from yark_spark.operators.multimodal import MAIN_CONTENT_STOPWORDS

    stop = ", ".join(f"'{w}'" for w in sorted(MAIN_CONTENT_STOPWORDS))
    return (
        "WITH docs AS (SELECT doc_id, string_split(text, ' ') AS arr "
        "FROM documents WHERE doc_id < 400), "
        "raw_words AS (SELECT doc_id, g.i AS i, list_extract(arr, g.i) AS w "
        "FROM docs, unnest(generate_series(1, len(arr))) AS g(i) "
        "WHERE list_extract(arr, g.i) != ''), "
        "words AS (SELECT doc_id, w, "
        "row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS w_no "
        "FROM raw_words), "
        "blocks AS (SELECT doc_id, w_no // 12 AS b_no, "
        "CAST(count(*) AS INTEGER) AS n_words, "
        f"count(*) FILTER (WHERE w IN ({stop})) AS n_stop, "
        "string_agg(w, ' ' ORDER BY w_no) AS btext "
        "FROM words GROUP BY doc_id, w_no // 12), "
        "cls AS (SELECT *, CASE WHEN n_words < 5 THEN 'short' "
        "WHEN n_stop * 4 >= n_words THEN 'good' ELSE 'bad' END AS c "
        "FROM blocks), "
        "ctx AS (SELECT *, CASE WHEN c <> 'short' THEN c "
        "WHEN lag(c) OVER (PARTITION BY doc_id ORDER BY b_no) = 'good' "
        "THEN 'good' ELSE 'bad' END AS f FROM cls) "
        "SELECT doc_id, CAST(count(*) AS INTEGER) AS n_blocks_kept, "
        "CAST(sum(n_words) AS INTEGER) AS n_words_kept, "
        "md5(string_agg(btext, chr(10) ORDER BY b_no)) AS digest "
        "FROM ctx WHERE f = 'good' GROUP BY doc_id"
    )


@query("q_html_main_content", oracle=_main_content_oracle())
def q_html_main_content(spark, sf_dir):
    """E126 HTML main-content extraction (round 13, VERDICT r12 item
    #3): jusText-class boilerplate removal (operators/html.html_blocks
    + classify_blocks) — pages built around each document's words as
    12-word paragraphs WITH constructed boilerplate (link-dense
    nav/sidebar/footer, short heading, stopword-free cookie banner);
    the operator segments blocks at block-level tags, tracks anchored
    characters, and classifies by link density >= 1/3 -> bad, < 5
    words -> short (resolved by nearest non-short neighbors), and
    stopword density >= 1/4 against the fixture language's stopword
    list -> good, all INTEGER cross-multiplied. The oracle re-derives
    the ENTIRE classification in SQL over the documents table — block
    grouping, stopword counts, thresholds, the lag-window context
    pass — so the digest match proves real discrimination: blocks
    genuinely split good/bad per doc, boilerplate never leaks, and
    docs whose every block is boilerplate vanish from BOTH sides.
    This is the pass between WET extraction and curation at 100 TB
    (trafilatura/jusText-class); map-only mapInPandas both stages."""
    from yark_spark.operators.multimodal import (
        main_content_features,
        with_main_content_payload,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    return main_content_features(with_main_content_payload(docs))


def _unigram_oracle() -> str:
    """DuckDB re-derivation of Viterbi unigram encoding by BRUTE
    FORCE: a recursive CTE enumerates EVERY segmentation of every
    distinct word (carrying integer pico-cost and the token string),
    one window picks the same (cost, toks) argmin the Spark DP
    computes, unreachable words collapse to [UNK], and the per-doc
    md5 of the ordered token stream pins every piece boundary.
    Enumeration is bounded by the tiny corpus vocabulary and short
    words (compositions of len<=8 into parts<=4); the Spark side runs
    true Viterbi, so the hash match proves the DP against exhaustive
    search."""
    from yark_spark.operators.unigram import UNIGRAM_PIECES

    values = ", ".join(f"('{p}', {c})" for p, c in UNIGRAM_PIECES)
    return (
        "WITH RECURSIVE "
        f"pieces(piece, cost) AS (VALUES {values}), "
        "docs AS (SELECT doc_id, lower(text) AS t FROM documents), "
        "wl AS (SELECT doc_id, string_split_regex(t, '[^a-z0-9]+') AS arr "
        "FROM docs), "
        "words AS (SELECT doc_id, g.i AS word_no, list_extract(arr, g.i) AS word "
        "FROM wl, unnest(generate_series(1, len(arr))) AS g(i) "
        "WHERE list_extract(arr, g.i) != ''), "
        "dw AS (SELECT DISTINCT word FROM words), "
        "paths(word, p, cost, toks) AS ("
        "SELECT word, 1, CAST(0 AS BIGINT), CAST('' AS VARCHAR) FROM dw "
        "UNION ALL "
        "SELECT w.word, w.p + length(pc.piece), w.cost + pc.cost, "
        "CASE WHEN w.toks = '' THEN pc.piece "
        "ELSE w.toks || ' ' || pc.piece END "
        "FROM paths w JOIN pieces pc "
        "ON substr(w.word, w.p, length(pc.piece)) = pc.piece "
        "WHERE w.p <= length(w.word)), "
        "done AS (SELECT word, cost, toks FROM paths "
        "WHERE p = length(word) + 1), "
        "best AS (SELECT word, toks FROM ("
        "SELECT word, toks, row_number() OVER "
        "(PARTITION BY word ORDER BY cost, toks) AS rn FROM done) WHERE rn = 1), "
        "word_tokens AS ("
        "SELECT d.word, coalesce(b.toks, '[UNK]') AS toks, "
        "CAST(len(string_split(coalesce(b.toks, '[UNK]'), ' ')) AS INTEGER) "
        "AS n_toks FROM dw d LEFT JOIN best b USING (word)), "
        "doc_tokens AS (SELECT ws.doc_id, ws.word_no, wt.toks, wt.n_toks "
        "FROM words ws JOIN word_tokens wt ON wt.word = ws.word) "
        "SELECT doc_id, CAST(count(*) AS INTEGER) AS n_words, "
        "CAST(sum(n_toks) AS INTEGER) AS n_tokens, "
        "CAST(count(*) FILTER (WHERE toks = '[UNK]') AS INTEGER) AS n_unk, "
        "md5(string_agg(toks, ' ' ORDER BY word_no)) AS digest "
        "FROM doc_tokens GROUP BY doc_id"
    )


@query("q_unigram_encode", oracle=_unigram_oracle())
def q_unigram_encode(spark, sf_dir):
    """E127 Unigram-LM tokenization (round 13, VERDICT r12 item #2):
    the SentencePiece algorithm (Kudo 2018) completing the tokenizer
    trio beside BPE (E48/E76', merge-driven) and WordPiece (E107,
    greedy munch) — a TRAINED piece table (sequential EM over the
    corpus's embedded word-frequency profile: substring seed,
    forward-backward expected counts, renormalize, prune to
    singles + top multis) with integer pico-costs, and VITERBI
    encoding as suffix DP under (cost, token-string) ordering, ties
    breaking to the lexicographically smallest stream on both sides.
    The oracle re-derives every word's segmentation by EXHAUSTIVE
    recursive-CTE enumeration + one argmin window, so the digest
    match proves the DP against brute force. The distributed EM twin
    (one partial-agg shuffle per sweep, piece table in the closure —
    broadcast at 100 TB) is pinned against the sequential trainer in
    tests/test_unigram.py. Map-only mapInPandas with a per-batch
    distinct-word memo; token streams never shuffle. UNBOUNDED over
    the corpus — carries a 20x/50x lane like WordPiece."""
    from yark_spark.operators.unigram import unigram_features

    docs = load_table(spark, sf_dir, "documents")
    return unigram_features(docs)


_ICEBERG_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 32 AS BIGINT) AS table_id, "
    "CAST(CASE WHEN doc_id % 32 < 24 THEN 1 ELSE 2 END AS BIGINT) AS seq_added, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480 "
    "AND doc_id % 32 NOT IN (4, 5, 8, 9, 10, 11)"
)


@query("q_iceberg_snapshot", oracle=_ICEBERG_ORACLE)
def q_iceberg_snapshot(spark, sf_dir):
    """E136 Iceberg-v2 snapshot resolution (round 13, session 3): the
    SECOND lakehouse protocol beside Delta's JSON log (E135) — every
    32 docs become a v2 metadata TREE (table metadata JSON → avro
    manifest list → avro manifests → parquet data/delete files, every
    byte in-repo wire) and operators/iceberg resolves the current
    snapshot per the public spec: sequence-number INHERITANCE through
    a manifest REUSED verbatim by snapshot 2, a positional delete
    file (pos 0-3 of p1 → docs 8-11 vanish, delete.seq >= data.seq),
    and an equality delete naming docs {4, 5, 24} of which 24 sits in
    the SAME-sequence data file p3 and therefore SURVIVES (the spec's
    strict inequality) — the oracle pins all three rules at once.
    Iceberg is why 100 TB scans plan in O(manifests), not
    O(files-listed); delete application is the broadcast semi-join
    shape. Grouping shuffle = table assignment; map-only resolve."""
    from yark_spark.operators.multimodal import (
        iceberg_snapshot_features,
        with_iceberg_table_payload,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return iceberg_snapshot_features(with_iceberg_table_payload(docs))


_ICEBERG_TT_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 32 AS BIGINT) AS table_id, "
    "CAST(1 AS BIGINT) AS seq_added, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480 AND doc_id % 32 < 24"
)


@query("q_iceberg_time_travel", oracle=_ICEBERG_TT_ORACLE)
def q_iceberg_time_travel(spark, sf_dir):
    """E136' Iceberg time travel (round 13, session 3): the same
    metadata trees resolved AS OF snapshot 1 — the tree's whole point
    is that old snapshots stay readable because manifests and data
    files are immutable; only the pointer moves. Snapshot 1 predates
    p3 and BOTH delete files, so docs 0-23 of every table come back
    alive (including 4, 5 and 8-11 that the current snapshot has
    deleted) and everything carries sequence 1. Reading yesterday's
    corpus while today's compaction runs is exactly this query at
    100 TB. Same fixture, same map-only resolve."""
    from yark_spark.operators.multimodal import (
        iceberg_snapshot_features,
        with_iceberg_table_payload,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return iceberg_snapshot_features(
        with_iceberg_table_payload(docs), snapshot_id=1
    )


_WARC_HTTP_ORACLE = (
    "SELECT doc_id, "
    "CASE doc_id % 6 WHEN 0 THEN 'identity' WHEN 1 THEN 'chunked' "
    "WHEN 2 THEN 'gzip' WHEN 3 THEN 'chunked+gzip' "
    "WHEN 4 THEN 'deflate' ELSE 'zstd' END AS wire, "
    "CAST(200 AS INTEGER) AS status, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480"
)


@query("q_warc_http_decode", oracle=_WARC_HTTP_ORACLE)
def q_warc_http_decode(spark, sf_dir):
    """E137 WARC HTTP message decode (round 13, session 3): what a
    crawler's WARC response block actually HOLDS is the RFC 7230 wire
    message — and real CC-MAIN bodies arrive chunked and
    content-coded, so the E98' strip-to-CRLFCRLF WET pass would hand
    most of the web's chunk framing and gzip bytes onward as 'text'.
    Each record here carries a full HTTP/1.1 message whose framing
    cycles with the doc key: identity / chunked (with a chunk
    extension and a trailer field) / gzip / chunked OVER gzip (the
    RFC's decode order: transfer-coding first, then content-codings
    right-to-left) / deflate (zlib-sniffed, raw-deflate tolerated) /
    zstd (RFC 8878 content-coding) — all through in-repo codecs. The
    Spark side labels each row from the PARSED headers, so the hash
    match proves every framing was present and reversed, record by
    record. brotli rides its own key since round 14
    (q_warc_http_brotli). Grouping shuffle = shard
    assignment; map-only decode."""
    from yark_spark.operators.multimodal import (
        warc_http_decode_features,
        with_warc_shards,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return warc_http_decode_features(with_warc_shards(docs, http_wire="cycle"))


_PARQUET_PRUNE_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 64 AS BIGINT) AS shard_id, "
    "CAST(6 AS INTEGER) AS groups_skipped, "
    "CAST(2 AS INTEGER) AS groups_scanned, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 448 AND doc_id % 64 BETWEEN 24 AND 39"
)


@query("q_parquet_prune_scan", oracle=_PARQUET_PRUNE_ORACLE)
def q_parquet_prune_scan(spark, sf_dir):
    """E138 parquet scan skipping (round 13, session 3): the E133
    writer now emits per-chunk Statistics (min_value/max_value +
    null_count, with the column_orders footer field — WITHOUT which
    spec readers must ignore the pair; pyarrow and DuckDB both read
    ours, pinned in tests) and split-block bloom filters (the
    parquet-format SBBF: xxHash64, 256-bit blocks, the 8-salt word
    mask), and parquet_scan_filtered plans row-group survival off the
    footer BEFORE any page decode. Each 64-doc shard becomes 8 row
    groups; the range probe doc_id BETWEEN base+24 AND base+39 must
    decode exactly 2 of them, and the skip counters ride in the
    output so the ORACLE pins the plan (6 skipped / 2 scanned), not
    just the rows — a scan that reads pages a planner would never
    fetch is wrong even when its rows are right. Bloom point-probe
    skipping is pinned in tests/test_parquet_prune.py (deterministic
    but FP-by-design, so not SQL-derivable). This is row-group
    pruning at 100 TB with the engine holding both sides of the
    contract. One applyInPandas per shard; map-only."""
    from yark_spark.operators.multimodal import parquet_prune_scan_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 448)
    return parquet_prune_scan_features(docs)


_SIMHASH60_ORACLE = (
    "WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), "
    "'[ \\t\\n\\x0B\\f\\r]+')) AS tok FROM documents), "
    "h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h "
    "FROM tok), "
    "votes AS (SELECT doc_id, b, "
    "sum(CASE WHEN (h >> CAST(b AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS v "
    "FROM h CROSS JOIN range(60) t(b) GROUP BY doc_id, b) "
    "SELECT doc_id, CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << "
    "CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash60 "
    "FROM votes GROUP BY doc_id"
)


@query("q_simhash_oracle", oracle=_SIMHASH60_ORACLE)
def q_simhash_oracle(spark, sf_dir):
    """E139 SimHash with a full value oracle (round 13, session 3):
    the bit-vote majority signature recomputed over PORTABLE token
    hashes — the first 15 md5 hex digits as a 60-bit integer both
    engines derive identically — so the one estimator-family key that
    was rows-only by design (q_simhash, xxhash64 votes) gets an
    exact-match twin: DuckDB re-derives every token vote, every bit
    majority, and the final 60-bit signature value-for-value.
    q_simhash keeps the fast JVM hash for production; this key proves
    the ALGORITHM. Map-only F.aggregate folds — no explode, no
    shuffle of tokens."""
    from yark_spark.operators.dedup import simhash_md5

    docs = load_table(spark, sf_dir, "documents")
    return simhash_md5(docs, "doc_id", "text")


def _kmv_oracle() -> str:
    parts = []
    for src, table, col in (
        ("orders.o_custkey", "orders", "o_custkey"),
        ("lineitem.l_partkey", "lineitem", "l_partkey"),
        ("events.user_id", "events", "user_id"),
    ):
        parts.append(
            f"SELECT '{src}' AS source, k_used, kth_hash, "
            "CASE WHEN k_used < 256 THEN k_used "
            "ELSE (255 * 281474976710656) // kth_hash END AS est_distinct, "
            "true_distinct FROM ("
            "SELECT count(*) AS k_used, max(h) AS kth_hash, any_value(td) AS true_distinct "
            "FROM (SELECT h, td FROM ("
            f"SELECT DISTINCT CAST('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 12) "
            f"AS BIGINT) AS h FROM {table}) "
            f"CROSS JOIN (SELECT count(DISTINCT {col}) AS td FROM {table}) "
            "ORDER BY h LIMIT 256))"
        )
    return " UNION ALL ".join(parts)


@query("q_kmv_distinct", oracle=_kmv_oracle())
def q_kmv_distinct(spark, sf_dir):
    """E140 KMV distinct sketch (round 13, session 3): the k-minimum-
    values estimator (Bar-Yossef et al. 2002) — hash every value into
    [0, 2^48), keep the k = 256 smallest DISTINCT hashes, and estimate
    cardinality as (k-1)·2^48 / h_(k) in EXACT integer arithmetic, so
    unlike q_approx_count_distinct (Spark's HLL++, rows-only by
    design) the whole sketch is value-pinned: DuckDB re-derives the
    hash set, the k-th order statistic, and the estimate bit-for-bit.
    true_distinct rides along so the artifact shows the estimator's
    error live (±~6% at k=256). At 100 TB the TopK is takeOrdered —
    per-partition k-mins then a k-sized merge on one reducer; the
    corpus never sorts globally. Three sources in one result."""
    from pyspark.sql import functions as SF

    outs = []
    for src, table, col in (
        ("orders.o_custkey", "orders", "o_custkey"),
        ("lineitem.l_partkey", "lineitem", "l_partkey"),
        ("events.user_id", "events", "user_id"),
    ):
        t = load_table(spark, sf_dir, table)
        h = SF.conv(
            SF.substring(SF.md5(SF.col(col).cast("string")), 1, 12), 16, 10
        ).cast("long")
        hashes = t.select(h.alias("h")).distinct()
        topk = hashes.orderBy("h").limit(256)
        td = t.agg(SF.countDistinct(col).alias("td"))
        agg = (
            topk.agg(
                SF.count("*").alias("k_used"),
                SF.max("h").alias("kth_hash"),
            )
            .crossJoin(SF.broadcast(td))
            .select(
                SF.lit(src).alias("source"),
                SF.col("k_used"),
                SF.col("kth_hash"),
                SF.when(SF.col("k_used") < 256, SF.col("k_used"))
                .otherwise(
                    SF.expr("255 * 281474976710656 DIV kth_hash")
                )
                .cast("long")
                .alias("est_distinct"),
                SF.col("td").cast("long").alias("true_distinct"),
            )
        )
        outs.append(agg)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


_PARQUET_PAGE_PRUNE_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 64 AS BIGINT) AS shard_id, "
    "CAST(6 AS INTEGER) AS pages_skipped, "
    "CAST(2 AS INTEGER) AS pages_scanned, "
    # round 14: the LIST column rides in the same pages — null row /
    # empty list / null element each land in a distinct vsum value
    "CAST(CASE WHEN doc_id % 17 = 3 THEN -1 "
    "WHEN doc_id % 17 = 11 THEN 0 "
    "ELSE CAST(floor((doc_id + 0.25) * 1000000) AS BIGINT) "
    "+ CAST(floor(doc_id * 2.0 * 1000000) AS BIGINT) "
    "+ (CASE WHEN doc_id % 5 = 0 THEN 0 "
    "ELSE CAST(floor(doc_id / 4.0 * 1000000) AS BIGINT) END) "
    "END AS BIGINT) AS vsum, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 448 AND doc_id % 64 BETWEEN 24 AND 39"
)


@query("q_parquet_page_prune", oracle=_PARQUET_PAGE_PRUNE_ORACLE)
def q_parquet_page_prune(spark, sf_dir):
    """E138' parquet PAGE-index pruning (round 13, session 3): the
    page-granular half of the scan-skip pair — fixtures written by
    PYARROW with write_page_index (genuine third-party ColumnIndex/
    OffsetIndex wire: per-page min/max, null_pages, PageLocation
    offsets + first_row_index), one 64-row row group of eight 8-row
    pages per shard, and parquet_page_scan_filtered must plan page
    survival off that index: 6 of 8 pages skipped, survivors fetched
    by PageLocation offset (the ranged-read unit), per-column page
    selection joined on first_row_index. Inside a 10M-row row group
    this is the only thing keeping a point probe O(pages-hit); the
    counters ride in the output so the oracle pins the PLAN. Our own
    writer emits the same index wire (write_page_index=True, pinned
    both directions in tests/test_parquet_prune.py). One
    applyInPandas per shard; map-only."""
    from yark_spark.operators.multimodal import parquet_page_prune_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 448)
    return parquet_page_prune_features(docs)


_DELTA_CKPT_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 32 AS BIGINT) AS table_id, "
    "CAST(CASE WHEN doc_id % 32 < 8 THEN 2 "
    "WHEN doc_id % 32 < 16 THEN 4 ELSE 3 END AS INTEGER) AS version_added, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480 AND doc_id % 32 NOT BETWEEN 16 AND 23"
)


@query("q_delta_checkpoint", oracle=_DELTA_CKPT_ORACLE)
def q_delta_checkpoint(spark, sf_dir):
    """E135' Delta parquet-checkpoint replay (round 13, session 3):
    the E135 JSON-log replay closes its documented boundary — every
    32 docs become a table whose PRE-CHECKPOINT HISTORY IS GONE
    (_last_checkpoint → 00000000000000000002.checkpoint.parquet,
    commits 0-2 deleted by log retention, one removed file's bytes
    vacuumed away), so state MUST seed from the checkpoint's
    nested-struct action rows (add.path/add.size/remove.path/
    metaData.id/protocol.minReaderVersion — PYARROW-written wire read
    through the from-scratch reader's new dotted-path struct
    support) and replay only commits 3-4 on top. The oracle pins the
    asymmetric survivor map: docs 0-7 carry the checkpoint version,
    24-31 commit 3, 8-15 commit 4, 16-23 vanish without their file
    ever being read. Every Delta table older than the 30-day
    retention window IS this shape at 100 TB. Grouping shuffle =
    table assignment; map-only replay."""
    from yark_spark.operators.multimodal import (
        delta_snapshot_features,
        with_delta_checkpoint_payload,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return delta_snapshot_features(with_delta_checkpoint_payload(docs))


_ORC_PRUNE_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 64 AS BIGINT) AS shard_id, "
    "CAST(6 AS INTEGER) AS stripes_skipped, "
    "CAST(2 AS INTEGER) AS stripes_scanned, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 448 AND doc_id % 64 BETWEEN 24 AND 39"
)


@query("q_orc_stripe_prune", oracle=_ORC_PRUNE_ORACLE)
def q_orc_stripe_prune(spark, sf_dir):
    """E141 ORC stripe pruning (round 13, session 3): the scan-skip
    pair's OTHER columnar substrate — the E134' writer now emits the
    Metadata section's StripeStatistics (per-stripe ColumnStatistics:
    sint64-zigzag IntegerStatistics bounds, StringStatistics bounds,
    hasNull; ORC_CPP still reads every file), and orc_scan_filtered
    plans stripe survival off them before touching any stream: 6 of
    8 stripes skipped for the range probe, counters in the output so
    the oracle pins the PLAN. Pruning over GENUINE ORC_CPP wire
    (pyarrow multi-stripe files, int and string predicates) is
    pinned in tests/test_orc.py. The stripe is the ORC scan task at
    100 TB — the engine now holds the skip contract on parquet row
    groups, parquet pages, parquet blooms, ORC stripes, and Iceberg/
    Delta file sets. One applyInPandas per shard; map-only."""
    from yark_spark.operators.multimodal import orc_stripe_prune_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 448)
    return orc_stripe_prune_features(docs)


_ICEBERG_PART_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 64 AS BIGINT) AS table_id, "
    "CAST(1 AS INTEGER) AS manifests_skipped, "
    "CAST(2 AS INTEGER) AS files_skipped, "
    "CAST(2 AS INTEGER) AS files_scanned, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 448 AND doc_id % 64 BETWEEN 32 AND 47"
)


@query("q_iceberg_partition_prune", oracle=_ICEBERG_PART_ORACLE)
def q_iceberg_partition_prune(spark, sf_dir):
    """E136'' Iceberg partition pruning (round 13, session 3): the
    TOP of the scan-skip hierarchy the engine now holds end-to-end
    (partition → manifest → file → row group / stripe → page →
    bloom). Every 64 docs become an identity-partitioned v2 table
    (part = (doc%64)//16) whose manifest-list rows carry FIELD
    SUMMARIES (lower/upper bounds in Iceberg's single-value LE
    serialization); the part=2 scan must leave one manifest
    UNOPENED on summary evidence alone, skip the sibling partition's
    files inside the other, and decode exactly two parquet files —
    1 manifest skipped / 2 files skipped / 2 scanned, pinned by the
    oracle with the surviving rows. This two-level prune is why a
    one-partition query on a 100 TB table plans in O(one manifest),
    not O(table). Grouping shuffle = table assignment; map-only."""
    from yark_spark.operators.multimodal import iceberg_partition_scan_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 448)
    return iceberg_partition_scan_features(docs)


_PARQUET_INT96_ORACLE = (
    "SELECT doc_id, "
    "CAST(1577836800000000 + doc_id * 3661 * 1000000 + doc_id * 7 AS BIGINT) "
    "AS ts_micros, "
    "CAST(doc_id * 137 - 5000 AS BIGINT) AS dec_unscaled, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 448"
)


@query("q_parquet_int96_scan", oracle=_PARQUET_INT96_ORACLE)
def q_parquet_int96_scan(spark, sf_dir):
    """E142 legacy parquet wire: INT96 timestamps + FLBA decimals
    (round 13, session 3): shards written by PYARROW with
    use_deprecated_int96_timestamps — the 12-byte (nanos-of-day,
    Julian-day) timestamps Spark and Hive emitted for years; any
    corpus older than ~2019 still carries them, and a reader that
    types them out quarantines the archive tier wholesale. The
    from-scratch reader decodes INT96 to EXACT epoch microseconds
    (2440588 = the Unix-epoch Julian day) and decimal128(18,2)
    FIXED_LEN_BYTE_ARRAY to the unscaled big-endian two's-complement
    integer; the oracle re-derives both arithmetically from the doc
    key, so the match is value-exact with no timestamp-library
    anywhere. One applyInPandas per shard; map-only."""
    from yark_spark.operators.multimodal import parquet_int96_scan_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 448)
    return parquet_int96_scan_features(docs)


_ORC_LOGICAL_ORACLE = (
    "SELECT doc_id, "
    "CAST(1577836800000000 + doc_id * 3661 * 1000000 + doc_id * 7 AS BIGINT) "
    "AS ts_micros, "
    "CAST(18262 + doc_id * 3 AS INTEGER) AS epoch_days, "
    "CAST(doc_id * 137 - 5000 AS BIGINT) AS dec_unscaled, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 448"
)


@query("q_orc_logical_scan", oracle=_ORC_LOGICAL_ORACLE)
def q_orc_logical_scan(spark, sf_dir):
    """E143 ORC warehouse logical types (round 13, session 3): the
    INT96 story on the other substrate — shards written by ORC_CPP
    carrying TIMESTAMP (seconds relative to 2015-01-01 plus the
    SECONDARY nanos stream with ORC's trailing-zero trick: low 3
    bits t > 0 mean multiply by 10^(t+1)), DATE (epoch days on the
    signed RLEv2 wire), DECIMAL (unbounded zigzag base-128 varints —
    NOT RLEv2 — with a per-value scale stream) and BINARY. Every
    Hive/Trino warehouse table uses these types; a reader without
    them quarantines the warehouse tier. Decoded to exact integers
    (epoch micros / days / unscaled) and re-derived arithmetically
    by the oracle from the doc key — value-exact with no timestamp
    library anywhere. One applyInPandas per shard; map-only."""
    from yark_spark.operators.multimodal import orc_logical_scan_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 448)
    return orc_logical_scan_features(docs)


_ORC_STRUCT_ORACLE = (
    "SELECT doc_id, "
    "CAST(CASE WHEN doc_id % 4 = 3 THEN -1 ELSE doc_id % 7 END AS INTEGER) "
    "AS quality, "
    "CASE WHEN doc_id % 4 = 3 THEN 'none' "
    "WHEN doc_id % 3 = 0 THEN 'en' WHEN doc_id % 3 = 1 THEN 'de' "
    "ELSE 'fr' END AS crawl_lang, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 448"
)


@query("q_orc_struct_scan", oracle=_ORC_STRUCT_ORACLE)
def q_orc_struct_scan(spark, sf_dir):
    """E143' ORC nested-struct metadata (round 13, session 3): the
    dotted-path recipe on the OTHER substrate — ORC nests by
    PRESENCE CHAINS (a child column holds one entry per present
    parent row, so each struct level narrows the encoded count and
    the reader weaves back out level by level), unlike parquet's
    definition levels; shards written by ORC_CPP carry the
    metadata-envelope shape every curated corpus uses (doc +
    meta.quality + meta.crawl.lang two levels down, a quarter of
    envelopes null) and the oracle pins null-struct vs null-leaf vs
    null-mid-level attribution per row. One applyInPandas per shard;
    map-only."""
    from yark_spark.operators.multimodal import orc_struct_scan_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 448)
    return orc_struct_scan_features(docs)
