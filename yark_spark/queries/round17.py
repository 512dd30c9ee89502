"""Round-17 operator batch: file-level column-stats data skipping on
both lakehouse read paths (VERDICT r16 next-round #1) — the planner
layer every real table has: Delta ``add.stats`` JSON and Iceberg
``lower_bounds``/``upper_bounds``, pruning files BEFORE any parquet
footer read.

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

# survivors: doc_id%32 in [16,24) minus the DV'd row 20 on odd tables;
# counters constant by construction (2 skipped / 2 scanned per table)
_DELTA_STATS_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 32 AS BIGINT) AS table_id, "
    "CAST(2 AS INTEGER) AS files_skipped, "
    "CAST(2 AS INTEGER) AS files_scanned, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 512 "
    "AND doc_id % 32 >= 16 AND doc_id % 32 < 24 "
    "AND NOT ((doc_id // 32) % 2 = 1 AND doc_id % 32 = 20)"
)


@query("q_delta_stats_skip", oracle=_DELTA_STATS_ORACLE)
def q_delta_stats_skip(spark, sf_dir):
    """E194 Delta file-level stats skipping (round 17, VERDICT r16
    #1): 4-file tables whose add actions carry stats JSON (file 1
    deliberately stats-less, files 0/3 pyarrow-written); the doc_id
    range predicate must skip exactly the two provably-excluded files
    and scan the stats-less one (`operators/deltalog.py
    delta_stats_scan`). Odd tables attach a DV to the surviving file
    (stats ride the re-add), tables %4==2/3 rewrite into classic/v2
    checkpoints first (stats survive as the string column). A reader
    that opens everything, skips the stats-less file, or loses stats
    across a checkpoint fails the counters. One applyInPandas per
    table; map-only."""
    from yark_spark.operators.multimodal import delta_stats_skip_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 512)
    return delta_stats_skip_features(docs)


# survivors: doc_id%64 in [32,56) minus the equality-deleted 35/51
_ICEBERG_BOUNDS_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 64 AS BIGINT) AS table_id, "
    "CAST(2 AS INTEGER) AS files_skipped, "
    "CAST(2 AS INTEGER) AS files_scanned, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 512 "
    "AND doc_id % 64 >= 32 AND doc_id % 64 < 56 "
    "AND doc_id % 64 NOT IN (35, 51)"
)


@query("q_iceberg_bounds_prune", oracle=_ICEBERG_BOUNDS_ORACLE)
def q_iceberg_bounds_prune(spark, sf_dir):
    """E195 Iceberg file-level bounds pruning (round 17, VERDICT r16
    #1, the Delta stats twin): manifest entries carry lower/upper
    bounds + value/null counts (single-value serialization, field-id
    keyed k/v records; file 1 pyarrow-written); the range predicate
    must skip exactly files 0/1 and scan 2/3
    (`operators/iceberg.py iceberg_bounds_scan`), while the equality
    DELETE file is never bounds-pruned — its keys vanish from the
    survivors. A reader that ignores bounds, prunes the delete file,
    or mis-decodes the single-value wire fails counters or hash. One
    applyInPandas per 64-doc table; map-only."""
    from yark_spark.operators.multimodal import iceberg_bounds_prune_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 512)
    return iceberg_bounds_prune_features(docs)


_DELTA_CDF_ROWS_ORACLE = (
    "SELECT doc_id, table_id, commit_version, change_type, n_chars, digest "
    "FROM ("
    "SELECT doc_id, CAST(doc_id // 32 AS BIGINT) AS table_id, "
    "CAST(1 AS INTEGER) AS commit_version, 'insert' AS change_type, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 512 AND doc_id % 32 >= 16 "
    "UNION ALL "
    "SELECT doc_id, CAST(doc_id // 32 AS BIGINT), CAST(2 AS INTEGER), "
    "'update_preimage', CAST(length(text) AS INTEGER), md5(text) "
    "FROM documents WHERE doc_id < 512 AND doc_id % 32 < 4 "
    "UNION ALL "
    "SELECT doc_id, CAST(doc_id // 32 AS BIGINT), CAST(2 AS INTEGER), "
    "'update_postimage', CAST(length(text) + 3 AS INTEGER), "
    "md5(text || '-v2') "
    "FROM documents WHERE doc_id < 512 AND doc_id % 32 < 4 "
    "UNION ALL "
    "SELECT doc_id, CAST(doc_id // 32 AS BIGINT), CAST(3 AS INTEGER), "
    "'delete', CAST(length(text) AS INTEGER), md5(text) "
    "FROM documents WHERE doc_id < 512 "
    "AND doc_id % 32 >= 16 AND doc_id % 32 < 20"
    ")"
)


@query("q_delta_cdf_rows", oracle=_DELTA_CDF_ROWS_ORACLE)
def q_delta_cdf_rows(spark, sf_dir):
    """E196 Delta per-row change data feed (round 17, VERDICT r16 #2):
    four-commit tables where v2 is a MERGE-shaped UPDATE carrying a
    ``cdc`` action (`_change_data` parquet with ``_change_type``
    update_preimage/update_postimage rows) beside its rewrite actions,
    and v3 attaches a deletion vector. The feed over (0, 3] must emit
    inserts@1, EXACTLY the 8 cdc rows @2 (synthesis suppressed — a
    reader emitting both double-counts the update), and the DV diff
    as per-row deletes@3 (`operators/deltalog.py delta_change_feed`).
    Postimage digests pin that cdc file VALUES flow through. One
    applyInPandas per table; map-only."""
    from yark_spark.operators.multimodal import delta_cdf_rows_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 512)
    return delta_cdf_rows_features(docs)


_ICEBERG_CHANGELOG_ORACLE = (
    "SELECT doc_id, table_id, snap_ordinal, change_type, n_chars, digest "
    "FROM ("
    "SELECT doc_id, CAST(doc_id // 64 AS BIGINT) AS table_id, "
    "CAST(2 AS INTEGER) AS snap_ordinal, 'insert' AS change_type, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 512 AND doc_id % 64 >= 32 "
    "UNION ALL "
    "SELECT doc_id, CAST(doc_id // 64 AS BIGINT), CAST(3 AS INTEGER), "
    "'delete', CAST(length(text) AS INTEGER), md5(text) "
    "FROM documents WHERE doc_id < 512 "
    "AND doc_id % 64 >= 32 AND doc_id % 64 < 48 "
    "UNION ALL "
    "SELECT doc_id, CAST(doc_id // 64 AS BIGINT), CAST(4 AS INTEGER), "
    "'delete', CAST(length(text) AS INTEGER), md5(text) "
    "FROM documents WHERE doc_id < 512 AND doc_id % 16 = 5 "
    "AND (doc_id % 64 < 32 OR doc_id % 64 >= 48)"
    ")"
)


@query("q_iceberg_changelog", oracle=_ICEBERG_CHANGELOG_ORACLE)
def q_iceberg_changelog(spark, sf_dir):
    """E197 Iceberg changelog scan (round 17, VERDICT r16 #3): four-
    snapshot tables mixing appends, a file REMOVAL (manifest rewrite
    with DELETED entries + explicit sequence numbers), and an equality
    delete. The changelog over (s1, s4] emits inserts@2, the removed
    file's rows as deletes@3, and equality-hit LIVE rows as deletes@4
    — keys inside the already-removed file must not re-emit, and a
    reader that rescans snapshots or misses the parent hop fails the
    hash (`operators/iceberg.py iceberg_changelog`). One applyInPandas
    per 64-doc table; map-only."""
    from yark_spark.operators.multimodal import iceberg_changelog_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 512)
    return iceberg_changelog_features(docs)


# full tables only (doc_id < 480): the partial tail table at small SFs
# would change the per-table file count the counters pin
_DELTA_OPT_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 32 AS BIGINT) AS table_id, "
    "CAST(4 AS INTEGER) AS files_in, CAST(1 AS INTEGER) AS files_out, "
    "CAST(0 AS INTEGER) AS cdf_events, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480 "
    "AND NOT ((doc_id // 32) % 2 = 1 AND doc_id % 32 = 1)"
)


@query("q_delta_optimize", oracle=_DELTA_OPT_ORACLE)
def q_delta_optimize(spark, sf_dir):
    """E198 Delta OPTIMIZE (round 17, VERDICT r16 #4): 4-small-file
    tables (odd ones carrying a DV) compact into ONE file via a
    dataChange:false remove+add commit (`operators/deltalog.py
    delta_optimize`) — snapshot rows unchanged minus DV'd docs, DV
    purged physically, fresh stats written, and cdf_events=0 pins
    that the change feed skips the layout-only commit. One
    applyInPandas per table; map-only."""
    from yark_spark.operators.multimodal import delta_optimize_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return delta_optimize_features(docs)


_ICEBERG_OPT_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 64 AS BIGINT) AS table_id, "
    "CAST(4 AS INTEGER) AS files_in, CAST(1 AS INTEGER) AS files_out, "
    "CAST(0 AS INTEGER) AS changelog_events, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 448 AND doc_id % 16 <> 9"
)


@query("q_iceberg_optimize", oracle=_ICEBERG_OPT_ORACLE)
def q_iceberg_optimize(spark, sf_dir):
    """E199 Iceberg OPTIMIZE (round 17, VERDICT r16 #4): 4-file
    tables with an outstanding equality delete compact into ONE file
    under a replace snapshot (`operators/iceberg.py
    iceberg_optimize`) — deletes materialize into the merged file,
    inputs tombstone via manifest rewrite, fresh bounds ride the new
    entry, and changelog_events=0 pins that CDC consumers skip the
    compaction. One applyInPandas per 64-doc table; map-only."""
    from yark_spark.operators.multimodal import iceberg_optimize_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 448)
    return iceberg_optimize_features(docs)


_DELTA_TT_TS_ORACLE = (
    "SELECT doc_id, table_id, probe_ordinal, version_resolved, n_chars, "
    "digest FROM ("
    "SELECT doc_id, CAST(doc_id // 32 AS BIGINT) AS table_id, "
    "CAST(1 AS INTEGER) AS probe_ordinal, "
    "CAST(0 AS INTEGER) AS version_resolved, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 512 AND doc_id % 32 < 16 "
    "UNION ALL "
    "SELECT doc_id, CAST(doc_id // 32 AS BIGINT), CAST(2 AS INTEGER), "
    "CAST(1 AS INTEGER), CAST(length(text) AS INTEGER), md5(text) "
    "FROM documents WHERE doc_id < 512"
    ")"
)


@query("q_delta_time_travel_ts", oracle=_DELTA_TT_TS_ORACLE)
def q_delta_time_travel_ts(spark, sf_dir):
    """E200 Delta TIMESTAMP AS OF (round 17, VERDICT r16 #5):
    commitInfo timestamps 1000/2000/3000; probe 1500 resolves v0
    (latest at-or-before — NOT nearest, 2000 is closer), probe 2500
    resolves v1, and the rows come from the resolved replay
    (`operators/deltalog.py delta_version_at_timestamp`). One
    applyInPandas per table; map-only."""
    from yark_spark.operators.multimodal import delta_time_travel_ts_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 512)
    return delta_time_travel_ts_features(docs)


_ICEBERG_TT_TS_ORACLE = (
    "SELECT doc_id, table_id, probe_ordinal, snap_resolved, n_chars, "
    "digest FROM ("
    "SELECT doc_id, CAST(doc_id // 64 AS BIGINT) AS table_id, "
    "CAST(1 AS INTEGER) AS probe_ordinal, "
    "CAST(2 AS INTEGER) AS snap_resolved, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 512 AND doc_id % 64 < 48 "
    "UNION ALL "
    "SELECT doc_id, CAST(doc_id // 64 AS BIGINT), CAST(2 AS INTEGER), "
    "CAST(3 AS INTEGER), CAST(length(text) AS INTEGER), md5(text) "
    "FROM documents WHERE doc_id < 512"
    ")"
)


@query("q_iceberg_time_travel_ts", oracle=_ICEBERG_TT_TS_ORACLE)
def q_iceberg_time_travel_ts(spark, sf_dir):
    """E201 Iceberg as-of-timestamp (round 17, VERDICT r16 #5):
    three-append tables with timestamp-ms = sequence; probe ts=2
    resolves snapshot 2 (latest at-or-before on the current ancestry
    chain), probe ts=999 the head (`operators/iceberg.py
    iceberg_snapshot_at_timestamp`). One applyInPandas per 64-doc
    table; map-only."""
    from yark_spark.operators.multimodal import (
        iceberg_time_travel_ts_features,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 512)
    return iceberg_time_travel_ts_features(docs)


_ICEBERG_REFS_ORACLE = (
    "SELECT doc_id, table_id, ref, n_chars, digest FROM ("
    "SELECT doc_id, CAST(doc_id // 64 AS BIGINT) AS table_id, "
    "'main' AS ref, CAST(length(text) AS INTEGER) AS n_chars, "
    "md5(text) AS digest "
    "FROM documents WHERE doc_id < 512 AND doc_id % 64 < 48 "
    "UNION ALL "
    "SELECT doc_id, CAST(doc_id // 64 AS BIGINT), 'v1', "
    "CAST(length(text) AS INTEGER), md5(text) "
    "FROM documents WHERE doc_id < 512 AND doc_id % 64 < 32 "
    "UNION ALL "
    "SELECT doc_id, CAST(doc_id // 64 AS BIGINT), 'audit', "
    "CAST(length(text) AS INTEGER), md5(text) "
    "FROM documents WHERE doc_id < 512 "
    "AND (doc_id % 64 < 32 OR doc_id % 64 >= 48)"
    ")"
)


@query("q_iceberg_refs", oracle=_ICEBERG_REFS_ORACLE)
def q_iceberg_refs(spark, sf_dir):
    """E202 Iceberg snapshot refs (round 17, VERDICT r16 #9 stretch):
    a tag pinned at snapshot 1, a later main commit, and a branch
    forked from snapshot 1 with its own commit — the three refs read
    DIVERGENT row sets from one metadata file, and the branch commit
    must not move main's head (`operators/iceberg.py
    iceberg_create_ref` / `iceberg_resolve_ref` /
    `iceberg_commit(branch=...)`). One applyInPandas per 64-doc
    table; map-only."""
    from yark_spark.operators.multimodal import iceberg_refs_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 512)
    return iceberg_refs_features(docs)


_DELTA_WIDEN_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 32 AS BIGINT) AS table_id, "
    "CASE WHEN doc_id % 32 < 16 THEN 'narrow' ELSE 'wide' END AS file_kind, "
    "CAST((doc_id % 32) / 2.0 AS DOUBLE) AS score, "
    "CAST((10000 + doc_id % 32) * 86400000000 AS BIGINT) AS ts_micros "
    "FROM documents WHERE doc_id < 512"
)


@query("q_delta_type_widening", oracle=_DELTA_WIDEN_ORACLE)
def q_delta_type_widening(spark, sf_dir):
    """E203 Delta type widening (round 17): tables whose early files
    were written under narrow types (INT32/FLOAT/date-days) and whose
    schema later widened to long/double/timestampNtz under the
    typeWidening readerFeature — the snapshot read upcasts narrow
    values to the current schema (date-days to midnight micros, keyed
    off the file's own physical type so wide files never re-convert),
    and both halves agree with one doc_id-arithmetic oracle. A reader
    that rejects the feature, skips the conversion, or double-converts
    fails rows or hash. One applyInPandas per table; map-only."""
    from yark_spark.operators.multimodal import delta_type_widening_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 512)
    return delta_type_widening_features(docs)


_DELTA_PART_STATS_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 32 AS BIGINT) AS table_id, "
    "CAST(6 AS INTEGER) AS files_skipped, "
    "CAST(1 AS INTEGER) AS files_skipped_stats, "
    "CAST(1 AS INTEGER) AS files_scanned, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 480 "
    "AND doc_id % 32 >= 20 AND doc_id % 32 < 24"
)


@query("q_delta_part_stats", oracle=_DELTA_PART_STATS_ORACLE)
def q_delta_part_stats(spark, sf_dir):
    """E204 Delta partition+stats composed pruning (round 17): one
    scan prunes 6 of 8 files at the partition layer, 1 more at the
    stats layer, and opens exactly 1 — the two-level skip pipeline
    every real planner runs (`operators/deltalog.py
    delta_partition_scan(predicate=...)`). One applyInPandas per
    table; map-only."""
    from yark_spark.operators.multimodal import delta_part_stats_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 480)
    return delta_part_stats_features(docs)


_ICEBERG_PART_STATS_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 64 AS BIGINT) AS table_id, "
    "CAST(6 AS INTEGER) AS files_skipped, "
    "CAST(1 AS INTEGER) AS files_skipped_stats, "
    "CAST(1 AS INTEGER) AS files_scanned, "
    "CAST(length(text) AS INTEGER) AS n_chars, md5(text) AS digest "
    "FROM documents WHERE doc_id < 448 "
    "AND doc_id % 64 >= 24 AND doc_id % 64 < 32"
)


@query("q_iceberg_part_stats", oracle=_ICEBERG_PART_STATS_ORACLE)
def q_iceberg_part_stats(spark, sf_dir):
    """E205 Iceberg partition+stats composed pruning (round 17, the
    Delta twin): manifest entries carry the partition record AND
    bounds; one scan prunes 6 files at the partition struct, 1 at
    bounds, opens 1 (`operators/iceberg.py
    iceberg_partition_scan(predicate=...)`). One applyInPandas per
    64-doc table; map-only."""
    from yark_spark.operators.multimodal import iceberg_part_stats_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 448)
    return iceberg_part_stats_features(docs)


_ICEBERG_V1_WRITE_ORACLE = (
    "SELECT doc_id, table_id, view, n_chars, digest FROM ("
    "SELECT doc_id, CAST(doc_id // 64 AS BIGINT) AS table_id, "
    "'head' AS view, CAST(length(text) AS INTEGER) AS n_chars, "
    "md5(text) AS digest FROM documents WHERE doc_id < 512 "
    "UNION ALL "
    "SELECT doc_id, CAST(doc_id // 64 AS BIGINT), 'tt1', "
    "CAST(length(text) AS INTEGER), md5(text) "
    "FROM documents WHERE doc_id < 512 AND doc_id % 64 < 32 "
    "UNION ALL "
    "SELECT doc_id, CAST(doc_id // 64 AS BIGINT), 'incr', "
    "CAST(length(text) AS INTEGER), md5(text) "
    "FROM documents WHERE doc_id < 512 AND doc_id % 64 >= 32"
    ")"
)


@query("q_iceberg_v1_write", oracle=_ICEBERG_V1_WRITE_ORACLE)
def q_iceberg_v1_write(spark, sf_dir):
    """E206 Iceberg v1 table write (round 17): the commit API's
    format-version-1 path — sequence-number-free manifests and v1
    manifest lists with verbatim reuse — read back as head snapshot,
    time travel, and incremental scan against one oracle
    (`operators/iceberg.py _iceberg_commit_v1`). One applyInPandas
    per 64-doc table; map-only."""
    from yark_spark.operators.multimodal import iceberg_v1_write_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 512)
    return iceberg_v1_write_features(docs)


_DELTA_VARIANT_ORACLE = (
    "SELECT doc_id, CAST(doc_id // 32 AS BIGINT) AS table_id, "
    "doc_id AS v_id, "
    "CAST(doc_id % 3 + 1 AS INTEGER) AS v_ntags, "
    "'t' || CAST(doc_id % 3 AS VARCHAR) AS v_tag_last, "
    "doc_id % 2 = 0 AS v_even, "
    "-doc_id AS v_neg, "
    "CAST((doc_id % 32) / 2.0 AS DOUBLE) AS v_half, "
    "md5(text) AS v_text_digest "
    "FROM documents WHERE doc_id < 512"
)


@query("q_delta_variant", oracle=_DELTA_VARIANT_ORACLE)
def q_delta_variant(spark, sf_dir):
    """E207 Delta VARIANT columns (round 17): variant cells
    (VariantEncoding.md — sorted metadata dictionary, tagged value
    tree with objects/arrays/short+long strings/smallest-width ints/
    bool/null/double) written as a parquet {metadata, value} BINARY
    group under the variantType readerFeature, decoded through the
    snapshot read, nested projections pinned by one arithmetic oracle
    (`operators/variant.py`). One applyInPandas per table;
    map-only."""
    from yark_spark.operators.multimodal import delta_variant_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 512)
    return delta_variant_features(docs)
