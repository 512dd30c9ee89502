"""Data-layout maintenance for Parquet tables at scale: compaction and
sorted (clustered) writes.

A 100 TB pipeline accretes small files — every streaming micro-batch and
every incremental upsert writes its own fragment, and a table read through
thousands of tiny files pays per-file open/footer costs and defeats
row-group pruning. These operators are the maintenance pass:

- ``compact``: rewrite a table directory into ~``target_file_bytes`` files
  (size-estimated from the input), optionally partitioned by stable keys.
  Uses ``repartition(n)`` (round-robin) — no semantic ordering required.
- ``write_sorted``: cluster rows by sort keys at write time
  (``repartitionByRange`` + ``sortWithinPartitions``) so min/max row-group
  statistics become selective for range predicates on those keys — the
  poor-man's Z-order for the common 1-2 key case, using only built-in
  operators. Parquet scans over the result prune row groups on the sort
  key without any table format on top.

Neither op changes row content — both are verified idempotent-by-content
in tests/test_layout.py.
"""

from __future__ import annotations

import logging
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

#: default compaction target ≈ one HDFS/S3 block
DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024

#: past this input size a 1-file compaction funnels the whole table through
#: one write task — almost certainly a mis-sized target_file_bytes
SINGLE_FILE_WARN_BYTES = 1024 * 1024 * 1024


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def plan_compaction(
    src_path: str, target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES
) -> int:
    """Number of output files that lands each near ``target_file_bytes``
    (≥1). Driver-side directory stat only — no data read."""
    return max(1, round(_dir_bytes(src_path) / target_file_bytes))


def compact(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    partition_by: list[str] | None = None,
) -> int:
    """Rewrite ``src_path`` (parquet dir) into ``dest_path`` with files
    sized near ``target_file_bytes``; returns the file count used. With
    ``partition_by`` the count applies per partition directory (Spark
    splits the repartition across partition values).

    In-place compaction (``dest_path`` == ``src_path``) is staged-then-
    swapped: ``mode("overwrite")`` straight onto the source would DELETE it
    under the lazy scan at write time and destroy the table. The staged
    output lands in a sibling dir, the old table is moved aside, the stage
    renamed in, and the old table removed — the source survives any
    failure before the final swap, and a failed final rename rolls the
    original table back into place. The swap itself is two renames, not
    one atomic op: concurrent readers can observe a brief ENOENT window
    between them."""
    src_bytes = _dir_bytes(src_path)
    n = max(1, round(src_bytes / target_file_bytes))
    if n == 1 and src_bytes > SINGLE_FILE_WARN_BYTES:
        log.warning(
            "compact(%s): %d bytes into ONE file — the final write funnels "
            "through a single task; raise target_file_bytes or pass "
            "partition_by",
            src_path,
            src_bytes,
        )
    df = spark.read.parquet(src_path)
    real_src, real_dest = os.path.realpath(src_path), os.path.realpath(dest_path)
    out_path, stage = dest_path, None
    if real_src == real_dest:
        stage = real_dest + ".__compacting__"
        shutil.rmtree(stage, ignore_errors=True)
        out_path = stage
    writer = df.repartition(n).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(out_path)
    if stage is not None:
        backup = real_dest + ".__precompact__"
        shutil.rmtree(backup, ignore_errors=True)
        os.rename(real_src, backup)
        try:
            os.rename(stage, real_dest)
        except OSError:
            # Roll the original table back into place so a failed swap
            # never leaves the table path empty with data stranded in
            # the backup dir. NOTE: the swap is two renames, not atomic
            # — concurrent readers can see a brief ENOENT window between
            # them; callers needing atomicity must quiesce readers.
            os.rename(backup, real_dest)
            raise
        shutil.rmtree(backup)
    return n


def write_sorted(
    df: DataFrame,
    dest_path: str,
    sort_cols: list[str],
    num_files: int | None = None,
) -> None:
    """Write ``df`` clustered on ``sort_cols``: contiguous global ranges
    per file, rows sorted inside each file, so parquet min/max row-group
    stats prune range predicates on the leading sort column. One range
    shuffle; no global single-task sort."""
    n = num_files or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    (
        df.repartitionByRange(n, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(dest_path)
    )


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits_per_dim: int = 8,
    relative_error: float = 0.01,
):
    """Morton (Z-order) key Column for ``cols`` over ``df``'s value
    distribution: each column is quantile-bucketed into ``2**bits_per_dim``
    RANK-normalized buckets (equi-depth, so skewed distributions still
    spread across the curve — min/max scaling would collapse a heavy hub
    into one bucket), then the bucket indices' bits are interleaved.

    The quantile boundaries come from one ``approxQuantile`` pass per
    column (a driver-side list of 2^bits scalars — broadcast-class, the
    same inherent-scalar shape as IVF centroids); the bucket lookup and
    bit interleave are pure Column expressions (Bucketizer + shift/mask
    terms — JVM-side, codegen-able). Returns ``(keyed_df, key_col_name)``
    where ``keyed_df`` is ``df`` plus the key column."""
    from pyspark.ml.feature import Bucketizer

    n_buckets = 1 << bits_per_dim
    probs = [i / n_buckets for i in range(1, n_buckets)]
    out = df
    bucket_cols = []
    for c in cols:
        qs = df.approxQuantile(c, probs, relative_error)
        splits = [float("-inf")]
        for q in qs:
            if q > splits[-1]:
                splits.append(q)
        splits.append(float("inf"))
        bcol = f"__zb_{c}"
        out = Bucketizer(
            splits=splits, inputCol=c, outputCol=bcol, handleInvalid="keep"
        ).transform(out)
        out = out.withColumn(bcol, F.col(bcol).cast("long"))
        bucket_cols.append(bcol)
    # bit interleave: dim d contributes bit b of its bucket index at
    # output position b*len(cols) + d
    ndim = len(cols)
    key = F.lit(0).cast("long")
    for d, bcol in enumerate(bucket_cols):
        for b in range(bits_per_dim):
            key = key + F.shiftleft(
                F.shiftright(F.col(bcol), b).bitwiseAND(F.lit(1)),
                b * ndim + d,
            )
    out = out.withColumn("__zkey", key).drop(*bucket_cols)
    return out, "__zkey"


def write_zordered(
    df: DataFrame,
    dest_path: str,
    cols: list[str],
    num_files: int | None = None,
    bits_per_dim: int = 8,
) -> None:
    """Write ``df`` clustered on the Z-ORDER (Morton) curve over ``cols``
    — the multi-column generalization of ``write_sorted`` (round 9):
    linear sort gives perfect min/max pruning on the LEADING key and none
    on the others; the space-filling curve localizes EVERY keyed column,
    so parquet file/row-group stats prune predicates on any of them
    (~n^(1-1/d) of the files touched for a narrow predicate on one of d
    dims, vs all of them under a linear sort on a different dim).

    Same write shape as write_sorted: one range shuffle on the key +
    in-file sort; the key column is dropped before writing (parquet
    min/max stats on the DATA columns do the pruning)."""
    keyed, key = zorder_key(df, cols, bits_per_dim)
    n = num_files or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    (
        keyed.repartitionByRange(n, F.col(key))
        .sortWithinPartitions(key)
        .drop(key)
        .write.mode("overwrite")
        .parquet(dest_path)
    )


def overwrite_partitions(
    df: DataFrame,
    dest_path: str,
    partition_cols: list[str],
) -> None:
    """Dynamic partition overwrite: replace ONLY the partitions present in
    ``df``, leaving every other partition of the table untouched — the
    idempotent daily-batch sink (re-running a day's job rewrites that
    day's partitions, never truncating the table the way static
    ``mode("overwrite")`` would).

    Scoped conf: partitionOverwriteMode=dynamic is set for this write and
    restored after, so other writers in the session keep the (safer)
    static default. At 100 TB the partition columns must be coarse
    (date/source, not high-cardinality ids) so a batch touches few
    directories and the commit is metadata-bounded.
    """
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        (
            df.write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(dest_path)
        )
    finally:
        spark.conf.set(key, prev)
