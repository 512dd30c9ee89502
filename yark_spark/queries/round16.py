"""Round-16 operator batch: lakehouse protocol completion — Delta v2
checkpoints (manifest + sidecars, the form modern Databricks tables
arrive in) and Iceberg multi-column equality deletes (the Flink CDC
write shape), per VERDICT r15 next-round #3/#4.

Reference parity note: the reference archiver (SupBlizard/yark,
768 LoC) stores fetched payloads opaquely in SQLite; these keys extend
the driver-mandated training-data-pipeline surface (SURVEY.md §2.8),
each with a DuckDB oracle re-deriving the semantics from the same
parquet tables.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yark_spark.io import load_table
from yark_spark.registry import query

# survivors: doc_id%32 in [0,24) minus the DV'd row 5 on table_id%4==3
_DELTA_V2_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 32 AS BIGINT) AS table_id, "
    "CASE WHEN (doc_id // 32) % 2 = 0 THEN 'json' ELSE 'parquet' END "
    "AS manifest_fmt, "
    "CAST(1 + ((doc_id // 32) // 2) % 2 AS INTEGER) AS n_sidecars, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 512 AND doc_id % 32 < 24 "
    "AND NOT ((doc_id // 32) % 4 = 3 AND doc_id % 32 = 5)"
)


@query("q_delta_v2_checkpoint", oracle=_DELTA_V2_ORACLE)
def q_delta_v2_checkpoint(spark, sf_dir):
    """E185 Delta V2 checkpoints (round 16, VERDICT r15 #3): every 32
    docs become a two-commit table rewritten into v2-checkpoint form —
    UUID-named manifest (`<V>.checkpoint.<uuid>.{json|parquet}`,
    format cycling by table) carrying protocol/metaData/exactly-one
    checkpointMetadata/sidecar actions, add-file state in 1–2 parquet
    SIDECARS under `_delta_log/_sidecars/`, the JSON log DELETED — so
    resolution must go through `_replay_from_v2_checkpoint`
    (`operators/deltalog.py`): listing-based discovery, version
    cross-check against checkpointMetadata, sidecar add extraction
    through the same nested-struct parquet reader as classic
    checkpoints. Tables with table_id%4==3 carry a real deletion
    vector whose descriptor must survive the sidecar roundtrip.
    Unsupported sub-features (timestampNtz) stay typed rejects. One
    applyInPandas per table; map-only resolve."""
    from yark_spark.operators.multimodal import delta_v2_checkpoint_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 512)
    return delta_v2_checkpoint_features(docs)


_ICEBERG_EQ_MULTI_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 64 AS BIGINT) AS table_id, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 512 AND doc_id % 8 <> 1"
)


@query("q_iceberg_eq_multi", oracle=_ICEBERG_EQ_MULTI_ORACLE)
def q_iceberg_eq_multi(spark, sf_dir):
    """E186 Iceberg multi-column equality deletes (round 16, VERDICT
    r15 #4): 2-column equality delete files (equality_ids = doc_id +
    text) applied as a CONJUNCTIVE tuple match under the strict
    delete.seq > data.seq rule. The delete file also names every
    doc_id%8==2 key with a WRONG text value — those rows must
    survive, so a per-column (disjunctive) reading fails the oracle,
    and a reader that ignores multi-id deletes entirely returns the
    doc_id%8==1 rows and fails too. This is the Flink CDC upsert
    write shape. One applyInPandas per 64-doc table; map-only."""
    from yark_spark.operators.multimodal import iceberg_eq_multi_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 512)
    return iceberg_eq_multi_features(docs)


_DELTA_TS_NTZ_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 32 AS BIGINT) AS table_id, "
    "1500000000000000 + doc_id * 1234567 AS ts_ntz_micros, "
    "1600000000000000 + doc_id * 7654321 AS ts_utc_micros, "
    "TRUE AS ntz_is_naive, FALSE AS utc_is_naive, "
    "md5(text) AS digest FROM documents WHERE doc_id < 512"
)


@query("q_delta_timestamp_ntz", oracle=_DELTA_TS_NTZ_ORACLE)
def q_delta_timestamp_ntz(spark, sf_dir):
    """E187 Delta timestampNtz (round 16): tables whose protocol
    declares the timestampNtz readerFeature over PYARROW-written
    foreign wire carrying both timestamp flavors. The from-scratch
    footer parser reads the parquet LogicalType's isAdjustedToUTC bit
    (parquet_meta.timestamp_ntz_flag — Thrift union field 8) and the
    oracle pins it per column: the naive column True, the UTC-adjusted
    twin False, values as raw micros. With v2Checkpoint (E185) this
    retires both common modern readerFeatures from the typed-reject
    list; genuinely unsupported features (variantType) still reject.
    One applyInPandas per table; map-only resolve."""
    from yark_spark.operators.multimodal import delta_timestamp_ntz_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 512)
    return delta_timestamp_ntz_features(docs)


_ICEBERG_V3_DV_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 64 AS BIGINT) AS table_id, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 512 AND doc_id % 8 <> 5"
)


@query("q_iceberg_v3_dv", oracle=_ICEBERG_V3_DV_ORACLE)
def q_iceberg_v3_dv(spark, sf_dir):
    """E190 Iceberg v3 deletion vectors (round 16): per-table PUFFIN
    files (PFA1 container, JSON footer with offset/length blob index)
    carrying one deletion-vector-v1 blob per data file — 4-byte BE
    framing, D1D33964 magic, Delta-compatible RoaringBitmapArray
    payload, CRC-32C (Castagnoli) — referenced by content=1 manifest
    entries with referenced_data_file + content_offset/size
    (MANIFEST_SCHEMA_V3). The third row-level-delete wire beside
    Delta DVs and Iceberg v2 delete files; a reader that cannot issue
    the ranged read into the blob region, or applies a vector to the
    wrong file, fails the hash. One applyInPandas per 64-doc table;
    map-only resolve."""
    from yark_spark.operators.multimodal import iceberg_v3_dv_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 512)
    return iceberg_v3_dv_features(docs)


_DELTA_MULTIPART_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 32 AS BIGINT) AS table_id, "
    "CAST(2 + (doc_id // 32) % 2 AS INTEGER) AS n_parts, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 512 AND doc_id % 32 < 24"
)


@query("q_delta_multipart_checkpoint", oracle=_DELTA_MULTIPART_ORACLE)
def q_delta_multipart_checkpoint(spark, sf_dir):
    """E191 Delta multi-part checkpoints (round 16): checkpoint state
    split across `<V>.checkpoint.<part>.<of>.parquet` files declared
    by `_last_checkpoint` "parts": N (N cycling 2/3 per table, action
    rows round-robin across parts), JSON log deleted — the snapshot is
    correct ONLY if every part is unioned; a reader that misses a part
    loses whole files and fails the hash. This is the shape big
    tables' checkpoints arrive in. One applyInPandas per table;
    map-only resolve."""
    from yark_spark.operators.multimodal import (
        delta_multipart_checkpoint_features,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 512)
    return delta_multipart_checkpoint_features(docs)


_DELTA_CDF_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 32 AS BIGINT) AS table_id, "
    "CAST(CASE WHEN doc_id % 32 < 16 THEN 2 ELSE 1 END AS INTEGER) "
    "AS commit_version, "
    "CASE WHEN doc_id % 32 < 16 THEN 'delete' ELSE 'insert' END "
    "AS change_type, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 512"
)


@query("q_delta_change_feed", oracle=_DELTA_CDF_ORACLE)
def q_delta_change_feed(spark, sf_dir):
    """E192 Delta change data feed (round 16): four-commit tables read
    incrementally over (0, 3] — second half inserts@1, first half
    deletes@2, and the v3 OPTIMIZE rewrite (dataChange: false on both
    actions) emits NOTHING. A consumer that re-emits compacted rows,
    ignores the range's exclusive lower bound, or drops the delete
    events fails the hash. This is how downstream pipelines tail a
    100 TB Delta table in O(changes) instead of rescanning the
    snapshot. One applyInPandas per table; map-only."""
    from yark_spark.operators.multimodal import delta_change_feed_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 512)
    return delta_change_feed_features(docs)


_ICEBERG_INCR_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 64 AS BIGINT) AS table_id, "
    "CAST(CASE WHEN doc_id % 64 < 48 THEN 2 ELSE 3 END AS INTEGER) "
    "AS snap_ordinal, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 512 AND doc_id % 64 >= 32"
)


@query("q_iceberg_incremental", oracle=_ICEBERG_INCR_ORACLE)
def q_iceberg_incremental(spark, sf_dir):
    """E193 Iceberg incremental append scan (round 16, Delta CDF's
    twin): three-append tables read over (s1, s3] down the
    parent-snapshot chain — exactly the files snapshots 2 and 3
    added, tagged by adder, with reused manifests contributing
    nothing. A snapshot rescan re-emits the first 32 docs and fails
    the hash; a missed parent hop drops a file. This is how a
    downstream pipeline tails an Iceberg table in O(new files). One
    applyInPandas per 64-doc table; map-only."""
    from yark_spark.operators.multimodal import iceberg_incremental_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 512)
    return iceberg_incremental_features(docs)
