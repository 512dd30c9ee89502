#!/usr/bin/env python
"""Generate a key-shifted N× scale-up of a testdata SF directory (default:
sf0.1 × 10 ≈ "sf1") for the scale-up bench lane (VERDICT r6 item 1).

/root/testdata is read-only and ships no sf1, so the lane derives one from
sf0.1 itself:

- Fact/dim tables: union of N copies with every key column shifted by
  copy × 100M — referential integrity preserved (orders.o_custkey shifts
  with customer.c_custkey, lineitem.l_orderkey with orders, …). region and
  nation stay fixed (they are constant-size in TPC-H at every SF).
- events: event_id/user_id shift → user cardinality scales ×N (windows
  and sessionization get N× partitions, not N× rows per partition).
- documents: each copy applies a BIJECTIVE token renaming (token →
  token_c for the ~50% of tokens xxhash64 selects — same selection in
  every doc of a copy). Renaming preserves every within-copy token-set
  relation exactly (near-dup pairs scale ×N, linearly) while cross-copy
  Jaccard drops to ≈ (1-r)/(1+r) ≈ 0.33 < the 0.5 dedup threshold, so
  duplicating the corpus does NOT quadratically mint new true pairs.
  n_chars is recomputed for the rewritten text.
- embeddings: vec_id shifts; vectors stay (cosine cost is value-blind).

Usage:
    python scripts/make_scale_data.py [dest] [copies] [src]
    # defaults: /root/repo/.scale/sf1  10  /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys

SHIFT = 100_000_000

#: key columns to shift per table (referential domains line up)
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED_TABLES = ["region", "nation"]
SUBST_RATE_BUCKETS = 5  # of 10 -> r = 0.5 (the fixture vocabulary is small, so the
# REALIZED rate over ~50 distinct tokens can deviate from the nominal; 0.5 keeps
# cross-copy Jaccard ≈ (1-r)/(1+r) ≈ 0.33 clear of the 0.5 dedup threshold even
# on an unlucky vocab draw)


def scaled_table(spark, src: str, table: str, copies: int):
    from pyspark.sql import functions as F

    df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
    if table in FIXED_TABLES:
        return df
    parts = []
    for c in range(copies):
        part = df
        for col in KEY_COLS[table]:
            part = part.withColumn(col, F.col(col) + F.lit(c * SHIFT))
        if table == "documents" and c > 0:
            toks = F.split(F.lower(F.trim(F.col("text"))), "[ \\t\\n\\x0B\\f\\r]+")

            def _rename(copy_idx):
                suffix = F.lit(f"_{copy_idx}")
                return lambda t: F.when(
                    F.pmod(F.xxhash64(t), F.lit(10)) < SUBST_RATE_BUCKETS,
                    F.concat(t, suffix),
                ).otherwise(t)

            part = part.withColumn("text", F.array_join(F.transform(toks, _rename(c)), " "))
            part = part.withColumn("n_chars", F.length("text").cast("long"))
        if table == "embeddings" and c > 0:
            # cluster COUNT scales ×N, cluster SIZE stays fixed — the
            # premise of within-cluster ops (SemDeDup: n/k constant as the
            # corpus grows). Without this, copies pile into the same 10
            # labels and the within-cluster pair join grows quadratically,
            # measuring the data artifact instead of the operator.
            part = part.withColumn("label", (F.col("label") + F.lit(c * 10)).cast("int"))
        if table == "customer":
            # names embed the key (Customer#%09d) — recompute from the
            # SHIFTED key so name-keyed blocks (fuzzy match) stay bounded
            # instead of every copy duplicating the same name ×N. Width 12
            # (not the source's 9) because ≥10 copies shift keys past 9
            # digits and lpad would TRUNCATE, colliding names; applied to
            # every copy (incl. 0) so all names share one format.
            part = part.withColumn(
                "c_name",
                F.concat(F.lit("Customer#"), F.lpad(F.col("c_custkey").cast("string"), 12, "0")),
            )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    dest = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from yark_spark.session import get_spark

    spark = get_spark("make-scale-data")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dest, exist_ok=True)
    for table in FIXED_TABLES + list(KEY_COLS):
        out = os.path.join(dest, f"{table}.parquet")
        df = scaled_table(spark, src, table, copies)
        # `<table>.parquet` as a DIRECTORY of `copies` part files (Spark
        # reads it identically to the testdata's single file): a Spark-
        # written single file would be one 128 MB row group = a ONE-task
        # scan, silently serializing every sf1 read and poisoning the
        # scaling ratios. Multiple files keep split parallelism comparable
        # to the source layout.
        n_files = 1 if table in FIXED_TABLES else copies
        df.repartition(n_files).write.mode("overwrite").parquet(out)
        print(f"{table}: {spark.read.parquet(out).count()} rows -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
