"""Incremental near-dup screening of a NEW batch against an EXISTING
corpus index — the shape every continuously-ingesting training pipeline
runs daily (the full-corpus pair join in operators/dedup.py is the
backfill shape; this is the steady-state one).

100 TB design: the historical side collapses to its distinct (band,
value) bucket table — in production precomputed once, stored bucketed by
band value, and only APPENDED to as batches are admitted — so each new
batch costs: map-only signatures over the batch, one semi-join of batch
bands against the index (equi on the band key, no pair materialization),
and a flag join back. The new batch is typically ≪ the index, so the
batch side broadcasts when small. md5 hash family keeps the algebra
oracle-checkable (same contract as q_minhash_signature); swap xxhash64
in production for JVM-native speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from yark_spark.operators.dedup import tokens


def _md5_i(i: int):
    seed = str(i)
    return lambda t: F.md5(F.concat(F.lit(seed), t))



def _band_table(docs, id_cols, text_col, num_hashes, bands):
    """(id_cols..., b, v) band rows for every doc — the shared core of the
    one-shot, index-build, and screening entry points (one definition so
    the hash family/banding can never drift between them)."""
    per_band = num_hashes // bands
    toks = F.array_distinct(tokens(docs, text_col))
    sig = docs.select(
        *id_cols,
        *[F.array_min(F.transform(toks, _md5_i(i))).alias(f"h{i}") for i in range(num_hashes)],
    )
    band_structs = [
        F.struct(
            F.lit(j).alias("b"),
            F.concat(*[F.col(f"h{j * per_band + i}") for i in range(per_band)]).alias("v"),
        )
        for j in range(bands)
    ]
    return sig.select(*id_cols, F.explode(F.array(*band_structs)).alias("bv")).select(
        *id_cols, F.col("bv.b").alias("b"), F.col("bv.v").alias("v")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    hash_col: str = "content_hash",
) -> DataFrame:
    """Derive a change feed between two corpus snapshots: one row per key
    with status ``added`` (new only), ``removed`` (old only), ``changed``
    (both, hashes differ) or ``unchanged``. The CDC primitive a
    snapshot-only source needs before incremental reprocessing (only
    added/changed rows re-enter the pipeline).

    Both inputs carry (key_col, hash_col) — hash upstream (md5/sha2 of
    the payload) so the diff join moves 32-byte digests, never documents.

    100 TB design: one full-outer equi-join on the key both sides
    shuffle-partition identically (or zero shuffle when both snapshots
    are bucketed on the key by the writer); everything else is map-side
    column work.
    """
    o = old.select(F.col(key_col), F.col(hash_col).alias("_old_h"))
    n = new.select(F.col(key_col), F.col(hash_col).alias("_new_h"))
    return (
        o.join(n, key_col, "full_outer")
        .select(
            key_col,
            F.when(F.col("_old_h").isNull(), F.lit("added"))
            .when(F.col("_new_h").isNull(), F.lit("removed"))
            .when(F.col("_old_h") != F.col("_new_h"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
    )


def incremental_minhash_flags(
    docs: DataFrame,
    is_index: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Flag each NON-index document whose MinHash signature shares ≥1 LSH
    band with ANY index document. Returns ``(id_col, is_dup)``, one row
    per new document.

    ``is_index`` is a boolean Column partitioning ``docs`` into the
    historical index (True) and the new batch (False).

    NULL-text docs are dropped on BOTH sides before signature
    construction: a null signature can never band-match, and the DuckDB
    oracle (unnest of a NULL token list) emits no row for them — keeping
    them here would produce a spurious (id, is_dup=false) row the oracle
    lacks.
    """
    tagged = docs.filter(F.col(text_col).isNotNull()).withColumn(
        "__is_idx", is_index
    )
    band_df = _band_table(
        tagged, [F.col(id_col), F.col("__is_idx")], text_col, num_hashes, bands
    )
    index_buckets = band_df.filter(F.col("__is_idx")).select("b", "v").distinct()
    hits = (
        band_df.filter(~F.col("__is_idx"))
        .join(index_buckets, ["b", "v"], "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    return (
        tagged.filter(~F.col("__is_idx"))
        .select(id_col)
        .join(hits, id_col, "left")
        .select(id_col, F.coalesce(F.col("is_dup"), F.lit(False)).alias("is_dup"))
    )


def build_band_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Materializable form of the historical side: the distinct (band,
    value) bucket table for a corpus. Write it once (parquet, ideally
    partitioned/bucketed by ``b``), append each admitted batch's buckets,
    and daily screening never recomputes history — the steady-state cost
    is the NEW batch only."""
    return _band_table(docs, [], text_col, num_hashes, bands).distinct()


def screen_against_index(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Flag new documents sharing ≥1 LSH band bucket with a PERSISTED
    index (``build_band_index`` output, typically read back from
    parquet). Semantics identical to ``incremental_minhash_flags`` with
    the same hash family/banding; returns (id_col, is_dup)."""
    band_df = _band_table(new_docs, [F.col(id_col)], text_col, num_hashes, bands)
    hits = (
        band_df.join(index.select("b", "v"), ["b", "v"], "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    return (
        new_docs.select(id_col)
        .join(hits, id_col, "left")
        .select(id_col, F.coalesce(F.col("is_dup"), F.lit(False)).alias("is_dup"))
    )
