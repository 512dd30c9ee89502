"""Statistical language-model scoring for corpus quality filtering —
the CCNet recipe (Wenzek et al. 2020): score each document by a cheap
n-gram LM trained on a trusted reference slice; low log-likelihood ⇒
out-of-domain or gibberish, the standard companion to rule-based
(Gopher) filters.

Spark-first shape: the "model" is two aggregates over the reference
bigram stream (bigram counts, unigram context counts) plus a scalar
vocabulary size — all DataFrames, joined back to the scored corpus by
equi-join on the bigram. Nothing is collected; at 100 TB the model
tables are orders of magnitude smaller than the corpus (vocabulary-
bounded) and broadcast when they fit, shuffle-join when they don't —
Catalyst/AQE picks per stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yark_spark.operators.dedup import tokens


def _bigrams(
    df: DataFrame, id_col: str, text_col: str, carry: list[str] = ()
) -> DataFrame:
    """(id[, *carry], w1, w2) — one row per consecutive token pair; docs
    with fewer than two tokens contribute nothing. ``carry`` columns are
    evaluated against the ORIGINAL row (so doc-level flags survive the
    projection) and replicated onto every bigram."""
    t = tokens(df, text_col)
    keep = [F.col(id_col)] + [F.col(c) for c in carry]
    base = df.select(*keep, t.alias("__t")).filter(F.size("__t") >= 2)
    return base.select(
        *keep,
        F.explode(F.sequence(F.lit(1), F.size("__t") - 1)).alias("__i"),
        "__t",
    ).select(
        *keep,
        F.element_at("__t", F.col("__i")).alias("w1"),
        F.element_at("__t", F.col("__i") + 1).alias("w2"),
    )


def bigram_lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_condition=None,
) -> DataFrame:
    """Per-document mean bigram log-likelihood under an add-one-smoothed
    bigram LM fit on the ``ref_condition`` slice of the SAME corpus
    (CCNet trains on Wikipedia; the fixture stand-in is an id slice).

    score(d) = mean over d's bigrams of ln((c(w1,w2)+1) / (c(w1·)+V)),
    with c(·) = reference counts and V = reference vocabulary size —
    unseen bigrams and unseen contexts degrade smoothly instead of
    zeroing. Returns (id, lm_score); documents with < 2 tokens have no
    bigrams and are absent.
    """
    if ref_condition is None:
        ref_condition = F.lit(True)
    bg = _bigrams(df, id_col, text_col)
    ref = bg.filter(ref_condition)
    bigram_counts = ref.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__cb"))
    context_counts = ref.groupBy("w1").agg(F.count(F.lit(1)).alias("__cu"))
    ref_toks = (
        df.filter(ref_condition)
        .select(F.explode(tokens(df, text_col)).alias("tok"))
        .agg(F.countDistinct("tok").alias("__v"))
    )
    term = F.log(
        (F.coalesce(F.col("__cb"), F.lit(0)) + 1)
        / (F.coalesce(F.col("__cu"), F.lit(0)) + F.col("__v"))
    )
    return (
        bg.join(bigram_counts, ["w1", "w2"], "left")
        .join(context_counts, ["w1"], "left")
        .crossJoin(F.broadcast(ref_toks))
        .groupBy(id_col)
        .agg(F.round(F.avg(term), 6).alias("lm_score"))
    )


def dsir_importance(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_condition=None,
    n_buckets: int = 256,
) -> DataFrame:
    """DSIR-style hashed n-gram importance filter (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    bigrams hash into ``n_buckets`` feature buckets; two smoothed
    bucket distributions are fit — p over the TARGET slice
    (``target_condition``, the trusted/domain corpus stand-in) and q
    over the full raw pool — and each document is scored by how much
    of its bigram mass falls in buckets where p > q.

    Everything stays integer-exact (the oracle's requirement): the
    bucket hash is md5-hex-ascii arithmetic both engines share, and
    the add-one-smoothed comparison p > q is cross-multiplied to
    ``(ct+1)·(Tr+B) > (cr+1)·(Tt+B)`` so no floats appear. Returns
    (id, n_bigrams, n_target_leaning, verdict) with verdict 'keep'
    when a majority of bigram occurrences lean target.

    Scale shape: the distributions are ≤ n_buckets rows (aggregated
    map-side, broadcast back), totals are one broadcast row, and the
    per-doc pass is one groupBy(id, bucket) — no join ever moves
    document text; raising n_buckets to DSIR's 10k leaves the plan
    unchanged. At 100 TB the target slice is typically a separate
    small corpus; pass it via target_condition on a unioned frame.
    """
    if target_condition is None:
        target_condition = F.lit(True)
    # evaluate the condition against the ORIGINAL rows and carry the flag
    # through the bigram explosion — conditions over any doc-level column
    # (e.g. an is_target marker on a unioned frame) work, not just id
    # predicates over the projected bigram stream
    bg = _bigrams(
        df.withColumn("__tgt", target_condition), id_col, text_col, carry=["__tgt"]
    )
    h = F.md5(F.concat_ws(" ", "w1", "w2"))
    bucket = F.pmod(
        F.ascii(F.substring(h, 1, 1)) * 131 + F.ascii(F.substring(h, 2, 1)),
        F.lit(n_buckets),
    )
    # one shuffle: per-(doc, bucket) occurrence counts; everything else
    # derives from this aggregate (target flagged per id, not re-scanned).
    # Cached via the release registry — three consumers (dist, totals
    # via dist, the per-doc score) would otherwise each re-run the
    # bigram explosion + shuffle, i.e. two extra corpus scans at scale.
    from yark_spark.operators.release import track

    # coalesce the cached intermediate to one partition per core: AQE
    # cannot re-coalesce a cached plan, so an un-clamped vanilla session
    # would pin 200 near-empty partitions into every downstream stage
    width = df.sparkSession.sparkContext.defaultParallelism
    per = track(
        bg.select(F.col(id_col), bucket.alias("__b"), F.col("__tgt").alias("__t"))
        .groupBy(id_col, "__b", "__t")
        .agg(F.count(F.lit(1)).alias("__c"))
        .coalesce(max(1, width))
        .cache()
    )
    dist = per.groupBy("__b").agg(
        F.sum("__c").alias("__cr"),
        F.sum(F.when(F.col("__t"), F.col("__c")).otherwise(F.lit(0))).alias("__ct"),
    )
    totals = dist.agg(
        F.sum("__cr").alias("__tr"), F.sum("__ct").alias("__tt")
    )
    lean = (
        dist.crossJoin(F.broadcast(totals))
        .select(
            "__b",
            (
                (F.col("__ct") + 1) * (F.col("__tr") + n_buckets)
                > (F.col("__cr") + 1) * (F.col("__tt") + n_buckets)
            )
            .cast("int")
            .alias("__lean"),
        )
    )
    return (
        per.join(F.broadcast(lean), "__b")
        .groupBy(id_col)
        .agg(
            F.sum("__c").alias("n_bigrams"),
            F.sum(F.col("__c") * F.col("__lean")).alias("n_target_leaning"),
        )
        .select(
            id_col,
            "n_bigrams",
            "n_target_leaning",
            F.when(
                F.col("n_target_leaning") * 2 > F.col("n_bigrams"), F.lit("keep")
            )
            .otherwise(F.lit("drop"))
            .alias("verdict"),
        )
    )


def langid_ngram_vote(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    train_condition=None,
    n_buckets: int = 1024,
) -> DataFrame:
    """Language identification by hashed char-trigram voting (round 12,
    VERDICT r11 task #3): a naive-Bayes-flavored classifier whose
    verdict is INTEGER-EXACT so it hash-matches a SQL oracle — the DSIR
    recipe generalized from 2 classes to K.

    Training: docs matching ``train_condition`` (the trusted slice) with
    their ``lang_col`` labels; char trigrams of lower(trim(text)) hash
    into ``n_buckets`` buckets (the md5-ascii arithmetic both engines
    share); per-(lang, bucket) counts + per-lang totals give add-one-
    smoothed likelihoods P(b|l) = (n+1)/(T+B).

    Instead of the float log-sum argmax, each BUCKET votes for its
    maximum-likelihood language — the pairwise comparison
    (n_a+1)/(T_a+B) > (n_b+1)/(T_b+B) cross-multiplies to pure int64
    arithmetic ((n_a+1)·(T_b+B) > (n_b+1)·(T_a+B)); ties go to the
    lexicographically larger lang, deterministically. A document's
    verdict is the language winning the most trigram-weighted bucket
    votes (ties again to the larger lang). This is the classic n-gram
    profile vote (Cavnar–Trenkle flavored) with hashed features.

    Plan shape at 100 TB: ONE wide shuffle — the per-(doc, bucket)
    occurrence counts; the training distribution is ≤ n_buckets × K
    rows aggregated map-side and resolved to a ≤ n_buckets-row winner
    table that BROADCASTS back onto the per-doc counts; the final
    argmax is a single max(struct) aggregate. Document text never
    joins; raising n_buckets leaves every edge unchanged.

    Returns (id, pred_lang, votes, n_trigrams); docs with fewer than 3
    chars contribute no trigrams and no row."""
    if train_condition is None:
        train_condition = F.lit(True)
    spark = df.sparkSession
    b = F.lit(n_buckets)
    s = F.lower(F.trim(F.col(text_col)))
    base = df.select(
        F.col(id_col),
        s.alias("__s"),
        train_condition.alias("__tr"),
        F.col(lang_col).alias("__lang"),
    ).filter(F.length("__s") >= 3)
    tri = base.select(
        F.col(id_col),
        "__tr",
        "__lang",
        F.explode(F.sequence(F.lit(1), F.length("__s") - 2)).alias("__i"),
        "__s",
    ).select(
        F.col(id_col),
        "__tr",
        "__lang",
        F.expr("substr(__s, __i, 3)").alias("__t"),
    )
    h = F.md5(F.col("__t"))
    bucket = F.pmod(
        F.ascii(F.substring(h, 1, 1)) * 131 + F.ascii(F.substring(h, 2, 1)), b
    )
    keyed = tri.select(F.col(id_col), "__tr", "__lang", bucket.alias("__b"))
    # ONE shuffle: per-(doc, bucket) counts; the training aggregates
    # derive from the same stream map-side (train rows carry the lang).
    from yark_spark.operators.release import track

    width = spark.sparkContext.defaultParallelism
    per = track(
        keyed.groupBy(id_col, "__b", "__tr", "__lang")
        .agg(F.count(F.lit(1)).alias("__c"))
        .coalesce(max(1, width))
        .cache()
    )
    train = per.filter(F.col("__tr")).groupBy("__b", "__lang").agg(
        F.sum("__c").alias("__n")
    )
    tot = per.filter(F.col("__tr")).groupBy("__lang").agg(F.sum("__c").alias("__T"))
    # full (bucket × lang) grid so untrained buckets still resolve
    grid = (
        spark.range(n_buckets)
        .select(F.col("id").cast("int").alias("__b"))
        .crossJoin(tot)
    )
    dist = grid.join(train, ["__b", "__lang"], "left").select(
        "__b", "__lang", F.coalesce("__n", F.lit(0)).alias("__n"), "__T"
    )
    a, o = dist.alias("a"), dist.alias("o")
    la, ta = F.col("a.__lang"), F.col("a.__T")
    lo, to = F.col("o.__lang"), F.col("o.__T")
    # decimal(19,0) factors -> decimal(38,0) exact products: at the
    # 100 TB design point per-lang trigram totals T reach ~1e13-1e14
    # and (n+1)*(T+B) overflows int64 (round-12 self-review); DuckDB's
    # oracle side promotes to hugeint natively
    na = F.col("a.__n").cast("decimal(19,0)")
    no = F.col("o.__n").cast("decimal(19,0)")
    tad = ta.cast("decimal(19,0)")
    tod = to.cast("decimal(19,0)")
    beaten = F.coalesce(
        F.max(
            (
                ((no + 1) * (tad + b) > (na + 1) * (tod + b))
                | (((no + 1) * (tad + b) == (na + 1) * (tod + b)) & (lo > la))
            ).cast("int")
        ),
        F.lit(0),  # a single-language corpus has no opponents at all
    )
    winners = (
        a.join(o, (F.col("a.__b") == F.col("o.__b")) & (la != lo), "left")
        .groupBy(F.col("a.__b").alias("__b"), la.alias("__wl"))
        .agg(beaten.alias("__beaten"))
        .filter(F.col("__beaten") == 0)
        .select("__b", "__wl")
    )
    votes = (
        per.join(F.broadcast(winners), "__b")
        .groupBy(id_col, "__wl")
        .agg(F.sum("__c").alias("__v"))
    )
    best = F.max(F.struct(F.col("__v"), F.col("__wl")))
    return (
        votes.groupBy(id_col)
        .agg(best.alias("__best"), F.sum("__v").alias("n_trigrams"))
        .select(
            F.col(id_col),
            F.col("__best.__wl").alias("pred_lang"),
            F.col("__best.__v").alias("votes"),
            F.col("n_trigrams"),
        )
    )
