"""Round-12 second batch: the training-data EXPORT wire formats the
round-12 ingest family still lacked — TFRecord/tf.Example (the
tf.data shard wire: C4, YT-8M), then Avro object-container files and
the snappy block codec (the Hadoop-lineage record wire), QOI images,
and MJPEG/AVI video — each a from-scratch codec certified by the
established digest-oracle recipe (md5 through the full wire must
equal DuckDB's md5 of the source column).

Reference parity note: the reference archiver exports nothing binary
(/root/reference/cmds/archive.py row-inserts into SQLite); these keys
extend the driver-mandated shard-wire surface (SURVEY.md §2.8
E90/E95 family) to the formats TF/JAX and Hadoop-lineage consumers
actually read.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yark_spark.io import load_table
from yark_spark.registry import query

_TFRECORD_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 16 AS BIGINT) AS shard_id, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480"
)


@query("q_tfrecord_scan", oracle=_TFRECORD_ORACLE)
def q_tfrecord_scan(spark, sf_dir):
    """E101 TFRecord/tf.Example shard round trip (round 12): documents
    pack into TFRecord shards — each doc one tf.Example protobuf
    ({"id": int64_list, "text": bytes_list}) through the from-scratch
    wire encoder, framed with masked CRC-32C (Castagnoli slice-by-8,
    RFC 7143 vectors pinned) — via ONE applyInPandas per shard group;
    odd shards additionally gzip through the in-repo DEFLATE (tf.data's
    compression_type dispatch, declared-not-sniffed). The map-only
    listing verifies EVERY masked CRC, decodes the protobuf, and
    digest-checks each document's text — framing + CRC-32C + protobuf
    certified by one SQL hash. This is the fourth shard wire beside
    tar-WebDataset (PyTorch), .jsonl.zst (HF) and WARC (crawl): the
    grouping shuffle IS the shard assignment; a streaming twin
    (tfrecord_listing_stream) watches a shard directory with
    batch-stream equivalence tested."""
    from yark_spark.operators.multimodal import tfrecord_listing, with_tfrecord_shards

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return tfrecord_listing(with_tfrecord_shards(docs))


_AVRO_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 16 AS BIGINT) AS shard_id, "
    "CASE (doc_id // 16) % 3 WHEN 0 THEN 'null' WHEN 1 THEN 'deflate' "
    "ELSE 'snappy' END AS codec, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480"
)


@query("q_avro_scan", oracle=_AVRO_ORACLE)
def q_avro_scan(spark, sf_dir):
    """E102 Avro object-container shard round trip (round 12):
    documents pack into ``.avro`` shards — the Hadoop-lineage record
    wire (Kafka archives, Hive tables, Sqoop exports) — through the
    from-scratch schema-driven binary encoder (zigzag-varint longs,
    length-prefixed strings, tagless records) and container framing
    (Obj1 magic, embedded writer schema, 16-byte sync markers), with
    the codec CYCLED null → deflate (in-repo RFC 1951) → snappy
    (from-scratch block codec + the spec's big-endian CRC-32 of the
    uncompressed block) by shard_id % 3. The map-only listing parses
    the self-describing header, dispatches the codec it DECLARES,
    verifies every sync marker and snappy CRC, decodes each record and
    digest-checks its text — container + three codecs + binary
    encoding certified by one SQL hash that also pins WHICH wire each
    shard took. The grouping shuffle IS the shard assignment."""
    from yark_spark.operators.multimodal import avro_listing, with_avro_shards

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return avro_listing(with_avro_shards(docs))


_QOI_ORACLE = (
    "WITH v AS (SELECT doc_id, "
    "ascii(substr(md5(text), 1, 1)) AS a, ascii(substr(md5(text), 2, 1)) AS b, "
    "ascii(substr(md5(text), 3, 1)) AS c, ascii(substr(md5(text), 4, 1)) AS d "
    "FROM documents WHERE doc_id < 200) "
    "SELECT doc_id, CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height, "
    "CAST(CASE WHEN doc_id % 2 = 1 THEN 4 ELSE 3 END AS INTEGER) AS channels, "
    "round(CASE WHEN doc_id % 2 = 1 "
    "THEN (3 * (a + b + c + d) / 4.0 + 255) / 4.0 "
    "ELSE (a + b + c + d) / 4.0 END, 6) AS mean_pixel FROM v"
)


@query("q_image_decode_qoi", oracle=_QOI_ORACLE)
def q_image_decode_qoi(spark, sf_dir):
    """E103 QOI pixel decode (round 12): the from-scratch six-op QOI
    codec (operators/qoi — RGB/RGBA literals, 64-entry hash index,
    2-bit DIFF, green-anchored LUMA, 62-cap RUN, wraparound
    arithmetic) decoding payloads built by the in-repo encoder,
    hash-matched against the ANALYTIC oracle of the lossless image
    family: the 16x16 quadrant mean is exactly (a+b+c+d)/4 of the
    doc's md5 codes for RGB (even doc_ids) and folds the opaque alpha
    plane in for RGBA (odd doc_ids) — one key pins both channel modes
    with no image code in the oracle. QOI is the entropy-coder-free
    lossless staging format (single linear pass, the LZ4 of images);
    spec wire vectors + roundtrip fuzz + PNG cross-codec pixel
    equality live in tests/test_qoi.py. Map-only mapInPandas."""
    from yark_spark.operators.multimodal import decode_image_features, with_qoi_payload

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return decode_image_features(with_qoi_payload(docs))


_AVI_ORACLE = (
    "WITH v AS (SELECT doc_id, "
    "ascii(substr(md5(text), 1, 1)) AS a, ascii(substr(md5(text), 2, 1)) AS b, "
    "ascii(substr(md5(text), 3, 1)) AS c, ascii(substr(md5(text), 4, 1)) AS d "
    "FROM documents WHERE doc_id < 150) "
    "SELECT doc_id, CAST(4 AS INTEGER) AS n_frames, "
    "CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height, "
    "CAST(25 AS INTEGER) AS fps_num, CAST(1 AS INTEGER) AS fps_den, "
    "round((a + b + c + d) / 4.0, 6) AS luma_mean, "
    "round((abs(b - a) + abs(c - b) + abs(d - c)) / 3.0, 6) AS motion FROM v"
)


@query("q_video_decode_avi", oracle=_AVI_ORACLE)
def q_video_decode_avi(spark, sf_dir):
    """E104 MJPEG-in-AVI decode (round 12): the from-scratch RIFF-AVI
    container parse (operators/avi — hdrl/strl/movi grammar, avih +
    'vids'/'MJPG' stream headers, word-aligned 00dc chunks, idx1) with
    per-frame decode through the in-repo baseline JPEG codec — a REAL
    entropy-coded video wire end to end. Constant-gray frames at
    quality 100 are DC-exact (unit quantizer), so the oracle is the
    video family's analytic truth: luma_mean = (a+b+c+d)/4 and motion
    = (|b-a|+|c-b|+|d-c|)/3 over the md5 frame codes, with the
    scale/rate fps (25/1) pinning the stream-header parse. Inter-frame
    DCT codecs remain the documented boundary (typed
    NotImplementedError on non-MJPG handlers). Map-only mapInPandas
    both stages."""
    from yark_spark.operators.multimodal import avi_video_features, with_avi_payload

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return avi_video_features(with_avi_payload(docs))


_TRI_AGREE_ORACLE = (
    "WITH v AS (SELECT doc_id, "
    "ascii(substr(md5(text), 1, 1)) AS a, ascii(substr(md5(text), 2, 1)) AS b, "
    "ascii(substr(md5(text), 3, 1)) AS c, ascii(substr(md5(text), 4, 1)) AS d "
    "FROM documents WHERE doc_id < 120) "
    "SELECT doc_id, s.source, CAST(4 AS INTEGER) AS n_frames, "
    "CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height, "
    "round((a + b + c + d) / 4.0, 6) AS luma_mean, "
    "round((abs(b - a) + abs(c - b) + abs(d - c)) / 3.0, 6) AS motion "
    "FROM v, (VALUES ('avi'), ('gif_anim'), ('y4m')) s(source)"
)


@query("q_video_tri_container_agreement", oracle=_TRI_AGREE_ORACLE)
def q_video_tri_container_agreement(spark, sf_dir):
    """E104' three-container temporal agreement (round 12): the same
    four-frame synthetic animation through Y4M (verbatim planes),
    animated GIF (palette + LZW + GCE + disposal compositing) and
    MJPEG-AVI (RIFF grammar + per-frame baseline JPEG entropy decode)
    must yield identical luma_mean and motion — THREE independent
    container-and-codec stacks, spanning raw, dictionary-coded and
    DCT-coded pixel wires, checked against ONE no-video-code SQL
    truth. Extends the E97' two-container recipe with the only
    entropy-coded member of the family."""
    from yark_spark.operators.multimodal import (
        avi_video_features,
        decode_video_features,
        gif_anim_video_features,
        with_avi_payload,
        with_gif_anim_payload,
        with_y4m_payload,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    common = ["doc_id", "source", "n_frames", "width", "height", "luma_mean", "motion"]
    a = avi_video_features(with_avi_payload(docs)).select(
        "doc_id", F.lit("avi").alias("source"), "n_frames", "width",
        "height", "luma_mean", "motion"
    )
    g = gif_anim_video_features(with_gif_anim_payload(docs, subrect=False)).select(
        "doc_id", F.lit("gif_anim").alias("source"), "n_frames", "width",
        "height", "luma_mean", "motion"
    )
    y = decode_video_features(with_y4m_payload(docs)).select(
        "doc_id", F.lit("y4m").alias("source"), "n_frames", "width",
        "height", "luma_mean", "motion"
    )
    return a.unionByName(g).unionByName(y).select(*common)


_MSGPACK_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 16 AS BIGINT) AS shard_id, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480"
)


@query("q_msgpack_scan", oracle=_MSGPACK_ORACLE)
def q_msgpack_scan(spark, sf_dir):
    """E105 MessagePack shard round trip (round 12): documents pack as
    concatenated top-level msgpack maps (the streaming convention)
    through the from-scratch codec — smallest-form integer/string
    families, spec-example-pinned wire — with odd shards wrapped in a
    zstd frame (.msgpack.zst, the MosaicML-lineage staging wire) and
    magic-sniffed back (a fixmap byte cannot collide with the zstd or
    gzip magics). The map-only listing walks each stream and
    digest-checks every text — the fourth record encoding in the
    shard-wire family beside JSON-lines, tf.Example protobuf and Avro
    binary. The grouping shuffle IS the shard assignment."""
    from yark_spark.operators.multimodal import msgpack_listing, with_msgpack_shards

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return msgpack_listing(with_msgpack_shards(docs))


def _wordpiece_oracle() -> str:
    """DuckDB re-derivation of greedy WordPiece: a non-recursive argmax
    join precomputes best(word, pos) = the LONGEST vocab piece matching
    there (maximum munch as max_by over substring equality), a
    recursive CTE follows pos -> pos + len(best) per DISTINCT word, a
    word succeeds iff the walk reaches len+1 (else all-or-nothing
    [UNK]), and the per-doc md5 of the ordered token stream pins every
    piece boundary and the ## presentation."""
    from yark_spark.operators.wordpiece import WORDPIECE_VOCAB

    values = ", ".join(f"('{p}')" for p in WORDPIECE_VOCAB)
    return (
        "WITH RECURSIVE "
        f"vocab(piece) AS (VALUES {values}), "
        "docs AS (SELECT doc_id, lower(text) AS t FROM documents), "
        "wl AS (SELECT doc_id, string_split_regex(t, '[^a-z0-9]+') AS arr "
        "FROM docs), "
        "words AS (SELECT doc_id, g.i AS word_no, list_extract(arr, g.i) AS word "
        "FROM wl, unnest(generate_series(1, len(arr))) AS g(i) "
        "WHERE list_extract(arr, g.i) != ''), "
        "dw AS (SELECT DISTINCT word FROM words), "
        "positions AS (SELECT word, g.p FROM dw, "
        "unnest(generate_series(1, length(word))) AS g(p)), "
        "best AS (SELECT p.word, p.p, max_by(v.piece, length(v.piece)) AS piece "
        "FROM positions p JOIN vocab v "
        "ON substr(p.word, p.p, length(v.piece)) = v.piece "
        "GROUP BY p.word, p.p), "
        "walk(word, p, piece_no, piece) AS ("
        "SELECT word, 1, 0, CAST(NULL AS VARCHAR) FROM dw "
        "UNION ALL "
        "SELECT w.word, w.p + length(b.piece), w.piece_no + 1, b.piece "
        "FROM walk w JOIN best b ON b.word = w.word AND b.p = w.p "
        "WHERE w.p <= length(w.word)), "
        "ok AS (SELECT word FROM walk WHERE p = length(word) + 1), "
        "word_tokens AS ("
        "SELECT w.word, w.piece_no, CASE WHEN w.piece_no = 1 THEN w.piece "
        "ELSE '##' || w.piece END AS token "
        "FROM walk w JOIN ok USING (word) WHERE w.piece IS NOT NULL "
        "UNION ALL "
        "SELECT d.word, 1, '[UNK]' FROM dw d "
        "WHERE d.word NOT IN (SELECT word FROM ok)), "
        "doc_tokens AS (SELECT ws.doc_id, ws.word_no, wt.piece_no, wt.token "
        "FROM words ws JOIN word_tokens wt ON wt.word = ws.word) "
        "SELECT doc_id, CAST(count(DISTINCT word_no) AS INTEGER) AS n_words, "
        "CAST(count(*) AS INTEGER) AS n_tokens, "
        "CAST(count(*) FILTER (WHERE token = '[UNK]') AS INTEGER) AS n_unk, "
        "md5(string_agg(token, ' ' ORDER BY word_no, piece_no)) AS digest "
        "FROM doc_tokens GROUP BY doc_id"
    )


@query("q_wordpiece_encode", oracle=_wordpiece_oracle())
def q_wordpiece_encode(spark, sf_dir):
    """E107 WordPiece tokenization (round 12): greedy
    longest-match-first subword encoding (operators/wordpiece) — the
    BERT-family tokenizer beside the BPE family (E48/E76') — with the
    all-or-nothing [UNK] rule genuinely exercised (the vocabulary
    omits 'q', so 'query' collapses to [UNK] after partial matches
    would have been emitted). The oracle re-derives MAXIMUM MUNCH in
    SQL: argmax-join best-piece table + recursive-CTE path following
    per distinct word + success-reachability check; the per-doc md5 of
    the ordered token stream means one hash pins every piece boundary,
    the ## presentation and the UNK collapse. Map-only mapInPandas
    with per-batch distinct-word memoization; token streams never
    shuffle. UNBOUNDED over the corpus — the one round-12 key whose
    cost scales with data, so it carries the 20x/50x lane
    (SCALE_r12b)."""
    from yark_spark.operators.wordpiece import wordpiece_features

    docs = load_table(spark, sf_dir, "documents")
    return wordpiece_features(docs)


_ZIP_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 16 AS BIGINT) AS shard_id, "
    "CASE WHEN doc_id % 2 = 0 THEN 'stored' ELSE 'deflate' END AS method, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480"
)


@query("q_zip_scan", oracle=_ZIP_ORACLE)
def q_zip_scan(spark, sf_dir):
    """E108 ZIP archive round trip (round 12): documents pack into
    ``.zip`` shards through the from-scratch PKWARE codec — local
    headers, central directory, EOCD backward scan, DOS timestamps,
    per-member CRC-32 — with the compression method CYCLED stored/
    deflate per member so one SQL hash pins both member wires and the
    mixed-method central-directory bookkeeping; two-way stdlib-zipfile
    differentials pin interop in tests/test_zip.py. ZIP is the long
    tail of public dataset distribution (Kaggle, benchmark mirrors,
    open-data portals) and the container family's RANDOM-ACCESS member
    (the central directory lists without streaming — zip_member_names
    reads no data). Encrypted/ZIP64/spanned archives are typed
    boundaries. The grouping shuffle IS the shard assignment."""
    from yark_spark.operators.multimodal import with_zip_shards, zip_listing

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return zip_listing(with_zip_shards(docs))


_EXIF_ORACLE = (
    "WITH v AS (SELECT doc_id, "
    "ascii(substr(md5(text), 1, 1)) AS a, ascii(substr(md5(text), 2, 1)) AS b, "
    "ascii(substr(md5(text), 3, 1)) AS c, ascii(substr(md5(text), 4, 1)) AS d "
    "FROM documents WHERE doc_id < 200) "
    "SELECT doc_id, CAST(1 + a % 8 AS INTEGER) AS orientation, "
    "CASE WHEN doc_id % 3 != 0 THEN CAST(b % 90 AS INTEGER) END AS lat_deg, "
    "CASE WHEN doc_id % 3 != 0 THEN CAST(d % 180 AS INTEGER) END AS lon_deg, "
    "(doc_id % 3 != 0) AS has_gps, FALSE AS gps_after_strip, "
    "round((a + b + c + d) / 4.0, 6) AS mean_pixel FROM v"
)


@query("q_image_exif_gps_redact", oracle=_EXIF_ORACLE)
def q_image_exif_gps_redact(spark, sf_dir):
    """E109 EXIF extraction + GPS-PII redaction (round 12): real APP1
    Exif blocks (from-scratch TIFF-IFD writer) inside the q100 quadrant
    JPEGs carry orientation and GPS degree/minute/second rationals; the
    operator parses the marker + IFD grammar, STRIPS the Exif segment
    (the exiftool -all= stance), re-parses to prove no GPS survives,
    and decodes the stripped image — so ONE oracle row certifies
    extraction correctness (orientation + whole-degree GPS), redaction
    completeness (gps_after_strip = FALSE) and pixel preservation (the
    analytic quadrant mean) together. This is the image-side twin of
    the text PII pass: crawled images leak photographers' locations
    through GPS IFDs, and a 100 TB curation pipeline strips them before
    release. doc_id % 3 == 0 fixtures carry Exif WITHOUT GPS so the
    null-extraction and no-op-redaction paths are pinned too. Map-only
    mapInPandas."""
    from yark_spark.operators.multimodal import (
        exif_gps_redaction_features,
        with_exif_jpeg_payload,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return exif_gps_redaction_features(with_exif_jpeg_payload(docs))


_SUBTITLE_ORACLE = (
    "WITH w AS (SELECT doc_id, len(string_split(text, ' ')) AS nw, "
    "md5(text) AS dg FROM documents WHERE doc_id < 200), "
    "c AS (SELECT doc_id, CAST((nw + 3) // 4 AS INTEGER) AS n_cues, dg FROM w) "
    "SELECT doc_id, s.source, n_cues, "
    "CAST((n_cues - 1) * 1700 + 1500 AS INTEGER) AS duration_ms, "
    "CAST(n_cues * 1500 AS INTEGER) AS speech_ms, dg AS digest "
    "FROM c, (VALUES ('srt'), ('vtt')) s(source)"
)


@query("q_subtitle_agreement", oracle=_SUBTITLE_ORACLE)
def q_subtitle_agreement(spark, sf_dir):
    """E110 subtitle parsing with SRT/VTT cross-format agreement
    (round 12): each document's words become caption cues (one per 4
    words, 1500 ms + 200 ms gaps) shipped BOTH as SubRip (comma
    milliseconds) and as WebVTT (period milliseconds, cue ids, a NOTE
    block and cue settings on the wire) — the two formats video
    platforms serve caption tracks in, i.e. the text channel of
    video training data. Both parsers must recover identical cue
    counts, timing sums and the md5 of the space-joined transcript,
    checked against ONE no-subtitle-code SQL truth (the digest equals
    md5(text) because cue packing preserves the word stream) — the
    agreement recipe on the caption modality. Grammar traps (comma vs
    period, hourless VTT timestamps, NOTE/STYLE blocks, BOM, CRLF)
    pinned in tests/test_subtitles.py. Map-only mapInPandas both
    stages."""
    from yark_spark.operators.multimodal import subtitle_features, with_subtitle_payload

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    s = subtitle_features(with_subtitle_payload(docs, fmt="srt"), source="srt")
    v = subtitle_features(with_subtitle_payload(docs, fmt="vtt"), source="vtt")
    return s.unionByName(v)


_MBOX_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 16 AS BIGINT) AS shard_id, "
    "CASE doc_id % 3 WHEN 0 THEN '7bit' WHEN 1 THEN 'quoted-printable' "
    "ELSE 'base64' END AS encoding, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480"
)


@query("q_mbox_scan", oracle=_MBOX_ORACLE)
def q_mbox_scan(spark, sf_dir):
    """E111 mbox email-archive round trip (round 12): documents become
    RFC 5322 messages — folded Subject headers (unfold on read), an
    X-Doc-Id header, the transfer encoding CYCLED 7bit /
    quoted-printable / base64 (both codecs from scratch, stdlib
    differentials in tests) — concatenated into mbox shards with
    mboxrd From-quoting (the in-band escape rule WARC's length-prefix
    avoids; the quoting trap is pinned in tests). The Enron-corpus /
    mailing-list wire: the map-only listing walks From separators,
    unquotes, unfolds, decodes per the declared
    Content-Transfer-Encoding and digest-checks every body — container
    + header grammar + three encodings under one SQL hash. The
    grouping shuffle IS the shard assignment."""
    from yark_spark.operators.multimodal import mbox_listing, with_mbox_shards

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return mbox_listing(with_mbox_shards(docs))


#: The fixture crawl policy: wildcard, anchor, tie-precedence and
#: empty-Disallow idioms all on the wire; the oracle re-derives each
#: rule as a LIKE pattern below.
ROBOTS_FIXTURE = """\
# fixture policy
User-agent: trainbot
Disallow: /t
Allow: /table/
Disallow: /*/key
Disallow: /small$
Allow:

User-agent: gptbot
Disallow: /

User-agent: *
Disallow: /private
"""

_ROBOTS_ORACLE = (
    "WITH u AS (SELECT doc_id, '/' || split_part(text, ' ', 1) || '/' || "
    "split_part(text, ' ', 2) AS url_path FROM documents WHERE doc_id < 400), "
    "rules(is_allow, rule, pat, anchored) AS (VALUES "
    "(FALSE, '/t', '/t%', FALSE), "
    "(TRUE, '/table/', '/table/%', FALSE), "
    "(FALSE, '/*/key', '/%/key%', FALSE), "
    "(FALSE, '/small$', '/small', TRUE)), "
    "m AS (SELECT u.doc_id, u.url_path, r.is_allow, r.rule, "
    "row_number() OVER (PARTITION BY u.doc_id "
    "ORDER BY length(r.rule) DESC, r.is_allow DESC) AS rn "
    "FROM u JOIN rules r ON (NOT r.anchored AND u.url_path LIKE r.pat) "
    "OR (r.anchored AND u.url_path = r.pat)) "
    "SELECT u.doc_id, u.url_path, "
    "COALESCE(m.is_allow, TRUE) AS allowed, m.rule AS matched_rule "
    "FROM u LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (doc_id)"
)


@query("q_robots_filter", oracle=_ROBOTS_ORACLE)
def q_robots_filter(spark, sf_dir):
    """E112 robots.txt crawl-policy filter (round 12): the RFC 9309
    engine (operators/robots — group selection over stacked
    user-agents, * fallback, wildcard '*' spanning octets, '$' end
    anchor, empty-Disallow allow-all idiom, longest-match precedence
    with Allow beating Disallow on ties) evaluated for 'trainbot'
    over per-document URL paths. The gatekeeper op of a crawl-derived
    corpus: dataset builders re-check robots at CURATION time when a
    domain's policy changed after the crawl. The oracle re-derives
    the whole algorithm in SQL — each rule a LIKE pattern, the
    precedence one window over (length, is_allow) — so verdict AND
    winning rule hash-match. Policy is broadcast-sized; map-only
    mapInPandas."""
    from yark_spark.operators.multimodal import robots_url_filter

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    return robots_url_filter(docs, ROBOTS_FIXTURE, agent="trainbot")


_IPYNB_ORACLE = (
    "WITH w AS (SELECT doc_id, len(string_split(text, ' ')) AS nw, "
    "md5(text) AS dg FROM documents WHERE doc_id < 300), "
    "c AS (SELECT doc_id, CAST((nw + 5) // 6 AS INTEGER) AS n_cells, dg FROM w) "
    "SELECT doc_id, n_cells, CAST(n_cells // 2 AS INTEGER) AS n_code, "
    "CAST((n_cells + 1) // 2 AS INTEGER) AS n_markdown, dg AS digest FROM c"
)


@query("q_ipynb_extract", oracle=_IPYNB_ORACLE)
def q_ipynb_extract(spark, sf_dir):
    """E113 Jupyter-notebook source extraction (round 12): documents
    become nbformat-4 notebooks — alternating markdown/code cells,
    BOTH legal source forms (list-of-lines and single-string) on the
    wire, noisy stream outputs + execution counts on every code cell —
    and the operator recovers SOURCE ONLY (the Stack/StarCoder
    curation stance: outputs bloat tokens and leak printed rows — an
    output cell is PII surface exactly like EXIF GPS). Cell counts are
    analytic in the word count and the recovered-text digest equals
    md5(text), so outputs surviving, cell-order bugs or source-form
    mishandling all break one hash. nbformat<4 worksheets = typed
    boundary. Map-only mapInPandas both stages."""
    from yark_spark.operators.multimodal import ipynb_source_features, with_ipynb_payload

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return ipynb_source_features(with_ipynb_payload(docs))


_MD_ORACLE = (
    "SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars, "
    "md5(text) AS digest FROM documents WHERE doc_id < 500"
)


@query("q_markdown_extract", oracle=_MD_ORACLE)
def q_markdown_extract(spark, sf_dir):
    """E114 markdown text extraction (round 12): each document wrapped
    in README-shaped markup — ATX headers with trailing-# closes,
    strong/emphasis/inline-code/links/image-alts, list markers,
    blockquotes, fenced code blocks whose CONTENTS survive (code is
    data in a code corpus; fences and info strings don't), HTML
    comments, autolinks and thematic breaks as droppable noise — then
    recovered BYTE-EXACTLY by the CommonMark-lite stripper
    (operators/markdown) and digest-matched against md5(text). The
    documentation half of every code corpus (The Stack's READMEs)
    beside the HTML extractor's crawled-web half; full CommonMark
    (reference links, tables, HTML blocks) is the documented
    boundary, and unknown constructs degrade to visible text instead
    of raising — a quality pass must not drop documents. Map-only
    mapInPandas both stages."""
    from yark_spark.operators.multimodal import (
        markdown_extract_features,
        with_markdown_payload,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return markdown_extract_features(with_markdown_payload(docs))


_DOCX_ORACLE = (
    "SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars, "
    "md5(text) AS digest FROM documents WHERE doc_id < 400"
)


@query("q_docx_extract", oracle=_DOCX_ORACLE)
def q_docx_extract(spark, sf_dir):
    """E115 DOCX text extraction (round 12): documents packed into real
    Office Open XML packages — the in-repo ZIP writer carrying
    [Content_Types].xml, _rels/.rels and word/document.xml, paragraphs
    split into runs with xml:space='preserve' and run-property
    elements that must NOT leak — then recovered byte-exactly by the
    composition: EOCD backward scan → central directory → DEFLATE
    inflate → WordprocessingML walk (only w:t content is text) →
    entity decode. Two from-scratch layers under one SQL hash — the
    E98' crawl-wire recipe applied to the office/FOIA corpus slice.
    Tables/headers/footnotes are the documented OOXML boundary.
    Map-only mapInPandas both stages."""
    from yark_spark.operators.multimodal import docx_extract_features, with_docx_payload

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    return docx_extract_features(with_docx_payload(docs))


_PDF_ORACLE = (
    "SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars, "
    "md5(text) AS digest FROM documents WHERE doc_id < 400"
)


@query("q_pdf_extract", oracle=_PDF_ORACLE)
def q_pdf_extract(spark, sf_dir):
    """E116 PDF text extraction (round 12): documents written into
    real multi-page classic-xref PDFs (operators/pdf — numbered
    objects, xref table + trailer, page tree, content streams
    Flate-compressed on odd pages with INDIRECT /Length objects, text
    rotated through Tj / kerned-TJ / ' show forms, full
    literal-string escape grammar) and recovered byte-exactly:
    startxref → xref chain (/Prev followed) → page-tree walk →
    FlateDecode through the in-repo zlib → text-operator walk. PDF is
    the largest "documents" vertical of web crawls and the wire of
    the academic-paper corpora (peS2o/S2ORC); the honest boundaries
    are typed — xref streams (1.5), encryption, non-FlateDecode
    filters, CID-font glyph mapping. One SQL hash certifies the
    object grammar, the xref plumbing, the inflate and the
    content-stream walk together. Map-only mapInPandas both
    stages."""
    from yark_spark.operators.multimodal import pdf_extract_features, with_pdf_payload

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    return pdf_extract_features(with_pdf_payload(docs))


_EPUB_ORACLE = (
    "SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars, "
    "md5(text) AS digest FROM documents WHERE doc_id < 400"
)


@query("q_epub_extract", oracle=_EPUB_ORACLE)
def q_epub_extract(spark, sf_dir):
    """E117 EPUB text extraction (round 12): documents split across
    multi-chapter OCF packages — the stored-first mimetype member
    (bytes 30..58 of every valid .epub spell
    mimetypeapplication/epub+zip), container.xml → OPF manifest +
    SPINE, chapter files deliberately written in REVERSED zip order so
    only spine-ordered readers recover the text — then extracted
    through three from-scratch layers (ZIP grammar → OPF XML → the
    HTML RAWTEXT state machine) and digest-matched against md5(text).
    Books are the long-context backbone of LLM mixes (Gutenberg/
    Books3-class corpora ship as EPUB); DRM surfaces as the ZIP
    layer's typed encryption boundary. Map-only mapInPandas both
    stages."""
    from yark_spark.operators.multimodal import epub_extract_features, with_epub_payload

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    return epub_extract_features(with_epub_payload(docs))


def _parquet_footer_oracle() -> str:
    from yark_spark.queries.fixtures import FIXTURES_DIR

    return (
        "SELECT row_group_id, row_group_num_rows, column_id, path_in_schema, "
        "type, num_values, compression, data_page_offset, "
        "total_compressed_size, total_uncompressed_size "
        f"FROM parquet_metadata('{FIXTURES_DIR}/footer.parquet')"
    )


@query("q_parquet_footer", oracle=_parquet_footer_oracle())
def q_parquet_footer(spark, sf_dir):
    """E118 parquet footer audit (round 12): the PAR1 trailer + Apache
    Thrift COMPACT protocol (delta field ids, bool-in-header,
    size-in-header lists, nested structs) + the parquet.thrift
    FileMetaData model, all from scratch (operators/parquet_meta),
    flattened to per-(row group, column chunk) rows over a committed
    multi-row-group ZSTD fixture file read via binaryFile. The oracle
    is DuckDB's INDEPENDENT C++ parquet reader (parquet_metadata()):
    two unrelated implementations of the footer grammar must agree on
    ids, paths, types, codecs, offsets, sizes and value counts — the
    strongest differential in the repo (the same check passes over all
    30 driver testdata files in tests/test_parquet_meta.py). This is
    the planning surface the layout/compaction/shard operators read;
    at object-store scale only footer bytes need fetching. Thrift is
    also the fourth schema-carrying record substrate beside protobuf
    (TFRecord), Avro binary and MessagePack."""
    from yark_spark.operators.multimodal import parquet_footer_listing
    from yark_spark.queries.fixtures import fixture_path

    files = spark.read.format("binaryFile").load(fixture_path("footer.parquet"))
    return parquet_footer_listing(files)


_FEED_ORACLE = (
    "SELECT doc_id, s.source, "
    "'document ' || CAST(doc_id AS VARCHAR) AS entry_title, "
    "'https://example.org/' || CAST(doc_id AS VARCHAR) AS link, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents, (VALUES ('atom'), ('rss')) s(source) "
    "WHERE doc_id < 320"
)


@query("q_feed_agreement", oracle=_FEED_ORACLE)
def q_feed_agreement(spark, sf_dir):
    """E119 RSS/Atom feed parsing with cross-format agreement (round
    12): 16 documents per feed shipped BOTH as RSS 2.0 (element links,
    RFC 822 dates, odd entries CDATA-wrapped / even entity-escaped —
    both escaping regimes on every wire) and as Atom 1.0 (attribute
    links, RFC 3339 dates, namespaced root). Both parsers must recover
    identical ids, titles, links and text digests against ONE
    no-feed-code SQL truth — the SRT/VTT agreement recipe applied to
    the crawl-DISCOVERY layer (feeds are how a crawler finds documents
    before any index does). The grouping shuffle IS the feed
    assignment; map-only listings."""
    from yark_spark.operators.multimodal import feed_listing, with_feed_payload

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 320)
    r = feed_listing(with_feed_payload(docs, fmt="rss"), source="rss")
    a = feed_listing(with_feed_payload(docs, fmt="atom"), source="atom")
    return r.unionByName(a)


_WIRE_AGREE_ORACLE = (
    "SELECT doc_id, s.source, CAST(length(text) AS INTEGER) AS n_chars, "
    "md5(text) AS digest FROM documents, "
    "(VALUES ('avro'), ('jsonl_zst'), ('mbox'), ('msgpack'), ('tfrecord'), "
    "('warc'), ('zip')) s(source) WHERE doc_id < 160"
)


@query("q_shard_wire_agreement", oracle=_WIRE_AGREE_ORACLE)
def q_shard_wire_agreement(spark, sf_dir):
    """E120 seven-wire shard agreement (round 12 capstone): the SAME
    documents packed and recovered through EVERY text shard wire the
    engine speaks — .jsonl.zst (FSE/huff0 entropy coding), TFRecord
    (CRC-32C framing + protobuf), Avro OCF (zigzag binary + cycled
    null/deflate/snappy codecs), MessagePack streams, ZIP archives
    (central directory + DEFLATE), mbox (MIME transfer encodings) and
    WARC (gzip members + ISO 28500 grammar) — all digest-matched
    against ONE no-container-code SQL truth. This is the codec-
    agreement recipe (E84''/E97'/E101'/E110/E119) applied at the
    CONTAINER level: one key proves seven independent from-scratch
    wire stacks round-trip the same bytes, so a corpus migrated
    between any two of them is provably lossless. Each path is the
    production operator pair; every branch is one grouping shuffle +
    one map-only listing."""
    from yark_spark.operators.multimodal import (
        avro_listing,
        jsonl_zst_listing,
        mbox_listing,
        msgpack_listing,
        tfrecord_listing,
        warc_wet_extract,
        with_avro_shards,
        with_jsonl_zst_shards,
        with_mbox_shards,
        with_msgpack_shards,
        with_tfrecord_shards,
        with_warc_shards,
        with_zip_shards,
        zip_listing,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 160)
    cols = ["doc_id", "source", "n_chars", "digest"]

    def _tag(df, name):
        return df.select("doc_id", F.lit(name).alias("source"), "n_chars", "digest")

    parts = [
        _tag(avro_listing(with_avro_shards(docs)), "avro"),
        _tag(jsonl_zst_listing(with_jsonl_zst_shards(docs)), "jsonl_zst"),
        _tag(mbox_listing(with_mbox_shards(docs)), "mbox"),
        _tag(msgpack_listing(with_msgpack_shards(docs)), "msgpack"),
        _tag(tfrecord_listing(with_tfrecord_shards(docs)), "tfrecord"),
        _tag(warc_wet_extract(with_warc_shards(docs, http_head=True)), "warc"),
        _tag(zip_listing(with_zip_shards(docs)), "zip"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(*cols)


_MP3_ORACLE = (
    "WITH v AS (SELECT doc_id, ascii(substr(md5(text), 1, 1)) AS a "
    "FROM documents WHERE doc_id < 300) "
    "SELECT doc_id, CAST(10 + a % 20 AS INTEGER) AS n_frames, "
    "CAST(CASE doc_id % 4 WHEN 0 THEN 64 WHEN 1 THEN 128 WHEN 2 THEN 192 "
    "ELSE 320 END AS INTEGER) AS bitrate_kbps, TRUE AS cbr, "
    "CAST(32000 AS INTEGER) AS sample_rate, "
    "CAST((10 + a % 20) * 36 AS INTEGER) AS duration_ms, "
    "'doc ' || CAST(doc_id AS VARCHAR) AS id3_title FROM v"
)


@query("q_mp3_scan", oracle=_MP3_ORACLE)
def q_mp3_scan(spark, sf_dir):
    """E121 MP3 frame-header scan (round 12): MPEG-1 Layer III header
    walk from scratch (operators/mp3 — 11-bit sync, the published
    bitrate/sample-rate tables, padding-aware 144·bitrate/rate frame
    sizing, ID3v2 syncsafe prefix skip, ID3v1 trailer parse) over
    fixture streams whose frame count, bitrate (cycled 64/128/192/320
    kbps), exact 36 ms/frame duration at 32 kHz and tag title are all
    analytic in the doc's md5 codes. The psychoacoustic DECODE stays
    the documented boundary — but triage (duration/bitrate/CBR/tags)
    never needed waveforms, and this is the avi_scan listing stance
    applied to the dominant crawled-audio format. Map-only mapInPandas
    both stages."""
    from yark_spark.operators.multimodal import mp3_scan_features, with_mp3_payload

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return mp3_scan_features(with_mp3_payload(docs))


_SITEMAP_ORACLE = (
    "SELECT doc_id, "
    "'https://example.org/doc/' || CAST(doc_id AS VARCHAR) || '?src=map&v=1' "
    "AS loc, "
    "'2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS lastmod, "
    "'0.' || CAST(doc_id % 10 AS VARCHAR) AS priority "
    "FROM documents WHERE doc_id < 400"
)


@query("q_sitemap_scan", oracle=_SITEMAP_ORACLE)
def q_sitemap_scan(spark, sf_dir):
    """E122 XML sitemap scan (round 12): <urlset> documents built and
    parsed from scratch (operators/feeds — loc with live entity
    escaping from the query string, lastmod W3C dates, priorities),
    completing the crawl-DISCOVERY trio: robots.txt says what MAY be
    crawled (E112), feeds say what CHANGED (E119), sitemaps enumerate
    what the site WANTS crawled. Two-level sitemapindex dispatch (the
    50k-URL cap layout) is parsed by sitemap_index_parse with a typed
    root-element dispatch error, pinned in tests/test_feeds.py. The
    grouping shuffle IS the sitemap assignment; map-only listing."""
    from yark_spark.operators.multimodal import sitemap_listing, with_sitemap_payload

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    return sitemap_listing(with_sitemap_payload(docs))
