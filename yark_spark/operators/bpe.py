"""Distributed BPE merge training (tokenizer induction) — SURVEY.md §2.8
(token counting's big sibling: not just counting with a fixed tokenizer,
but LEARNING the tokenizer from the corpus, Sennrich et al. 2016).

Shape per iteration (the classic algorithm, re-expressed as dataflow):

1. the corpus is reduced ONCE to a (word, freq) table — all subsequent
   work is over distinct words weighted by frequency, never raw text;
2. adjacent symbol pairs are counted with a JVM-side ``transform`` over
   each word's symbol array (explode + partial-agg groupBy — one shuffle
   whose key space is the pair vocabulary, not the corpus);
3. the argmax pair (count desc, then lexicographic — deterministic) is
   a ONE-ROW TakeOrdered collect: the merge decision is inherently a
   driver-side scalar, k rows total for k merges;
4. the merge is applied to every word with a pure-Column ``aggregate``
   fold (carry/emit state machine — left-to-right non-overlapping, the
   standard application order), no Python in the loop.

Each iteration persists its rewritten word table and unpersists the
previous one, so the plan stays one-iteration deep (the dedup_clusters
lesson). 100 TB posture: step 1 is the only corpus-sized job; the
iteration loop runs over |distinct words| rows with arrays of symbols —
orders of magnitude smaller — and its shuffle key space shrinks as
merges consume pairs.

Verification: ``q_bpe_pair_counts`` hash-matches iteration-0 pair counts
against a DuckDB oracle; the k-merge loop is pinned by an exact
equivalence test against a pure-Python reference implementation on the
same corpus (tests/test_bpe.py) and registered as the rows-only contract
for ``q_bpe_merges``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: repo-wide tokenizer parity class (operators/dedup.tokens)
_WS = r"[ \t\n\x0B\f\r]+"


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the whitespace-parity tokenization, lowercased;
    empty tokens (whitespace-only docs) dropped."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), _WS)).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _adjacent_pairs(seq):
    """array<string> -> array<struct<l,r>> of adjacent symbol pairs."""
    return F.transform(
        F.slice(seq, 1, F.size(seq) - 1),
        lambda x, i: F.struct(
            x.alias("l"), F.element_at(seq, i + F.lit(2)).alias("r")
        ),
    )


def pair_counts(words: DataFrame, seq_col: str = "seq") -> DataFrame:
    """Frequency-weighted adjacent-pair counts over the symbol arrays
    (every adjacent position counts, overlaps included — the classic
    get_stats). One explode + one partial-agg groupBy on (l, r)."""
    return (
        words.select("freq", F.explode(_adjacent_pairs(F.col(seq_col))).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("n"))
    )


def _apply_merge(seq, a: str, b: str):
    """Replace every left-to-right non-overlapping (a, b) with a+b via a
    carry/emit fold — pure Column expression, no Python per row."""
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("carry"),
    )

    def step(st, x):
        merged = st.carry.isNotNull() & (st.carry == F.lit(a)) & (x == F.lit(b))
        out = (
            F.when(merged, F.concat(st.out, F.array(F.lit(a + b))))
            .when(st.carry.isNotNull(), F.concat(st.out, F.array(st.carry)))
            .otherwise(st.out)
        )
        carry = F.when(merged, F.lit(None).cast("string")).otherwise(x)
        return F.struct(out.alias("out"), carry.alias("carry"))

    def fin(st):
        return F.when(
            st.carry.isNotNull(), F.concat(st.out, F.array(st.carry))
        ).otherwise(st.out)

    return F.aggregate(seq, init, step, fin)


def train_bpe_merges(
    docs: DataFrame,
    k_merges: int = 6,
    text_col: str = "text",
    local_max_vocab: "int | None" = None,
) -> DataFrame:
    """Learn the top-``k_merges`` BPE merges from a corpus. Returns
    (rank, left, right, pair_count) — rank 1 = first merge learned.
    Deterministic: ties broken by (left, right) lexicographically.

    Round 10: the per-rank iteration (pair count + top-1 + rewrite)
    runs with the shuffle width clamped to the word-table size
    (packing.sized_partitions, restored on exit) — the word table is
    |vocabulary| rows, tiny next to the corpus, and a wide vanilla
    session otherwise pays 2k tiny tasks per rank.

    Round 18 (VERDICT r17 #3): vocabularies at or under
    ``local_max_vocab`` distinct words (default
    ``spark.yark.bpe.localTrainMaxVocab`` = 200k, ``0`` disables)
    route to the driver-side incremental trainer
    (``train_bpe_merges_local`` — output pinned identical to the
    distributed loop and the classic reference in tests/test_bpe.py).
    The corpus-sized tokenize+reduce still runs distributed; only the
    (word, freq) table — bounded by the cap, ~tens of bytes/row —
    crosses to the driver, replacing 2 jobs x k_merges iterations of
    tiny-table shuffles with one bounded collect. The distributed
    iteration stays the at-scale path for vocabularies over the cap."""
    from yark_spark.operators.packing import sized_partitions

    spark = docs.sparkSession
    from yark_spark.operators.conf import scoped_shuffle_partitions

    if local_max_vocab is None:
        local_max_vocab = int(
            spark.conf.get("spark.yark.bpe.localTrainMaxVocab", "200000")
        )
    schema = "rank int, left string, right string, pair_count long"
    wf = word_freqs(docs, text_col)
    if local_max_vocab > 0:
        # bounded probe-and-collect: one job; > cap rows means the
        # vocabulary is too big to hold driver-side — fall through
        head = wf.limit(local_max_vocab + 1).collect()
        if len(head) <= local_max_vocab:
            merges_l = train_bpe_merges_local(
                [(r["word"], int(r["freq"])) for r in head], k_merges
            )
            return spark.createDataFrame(merges_l, schema)

    words = (
        wf.select("freq", F.split("word", "").alias("seq"))
        .persist()
    )
    n_words = words.count()  # materializes the cache AND sizes the loop
    merges: list[tuple[int, str, str, int]] = []
    # scoped clamp — single-threaded-session assumption documented in
    # operators/conf.py (ADVICE r10 low #1)
    try:
        with scoped_shuffle_partitions(spark, sized_partitions(spark, n_words)):
            for rank in range(1, k_merges + 1):
                top = (
                    pair_counts(words)
                    .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
                    .limit(1)
                    .collect()
                )
                if not top:
                    break
                l, r, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
                merges.append((rank, l, r, n))
                nxt = words.select(
                    "freq", _apply_merge(F.col("seq"), l, r).alias("seq")
                )
                nxt = nxt.persist()
                nxt.count()  # materialize before dropping the previous table
                words.unpersist()
                words = nxt
    finally:
        words.unpersist()
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count long"
    )


def train_bpe_merges_local(
    word_freq_pairs: list[tuple[str, int]], k_merges: int
) -> list[tuple[int, str, str, int]]:
    """Driver-side FAST trainer for production-size merge tables (round
    10, VERDICT r9 next-round #7): identical output to
    ``reference_bpe_merges`` (pinned in tests/test_bpe.py) but with
    incremental pair-count maintenance — a pair->words index plus a
    lazy-invalidation heap ordered by (count desc, pair asc) — so each
    merge touches only the words that contain it instead of recounting
    the whole vocabulary. 2,000 merges over a 20k-word vocabulary run in
    seconds where the O(ranks x vocab) reference needs minutes. Use for
    bench fixtures and small-driver training; the DISTRIBUTED trainer
    (``train_bpe_merges``) remains the at-scale path where the word
    table doesn't fit one machine."""
    import heapq

    words = [list(w) for w, _ in word_freq_pairs]
    freqs = [f for _, f in word_freq_pairs]
    stats: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set[int]] = {}
    for wi, seq in enumerate(words):
        f = freqs[wi]
        for i in range(len(seq) - 1):
            p = (seq[i], seq[i + 1])
            stats[p] = stats.get(p, 0) + f
            index.setdefault(p, set()).add(wi)
    heap = [(-n, p) for p, n in stats.items()]
    heapq.heapify(heap)
    out: list[tuple[int, str, str, int]] = []
    for rank in range(1, k_merges + 1):
        best = None
        while heap:
            negn, p = heapq.heappop(heap)
            if stats.get(p) == -negn:  # still-current heap entry
                best = (p, -negn)
                break
        if best is None:
            break
        (l, r), n = best
        out.append((rank, l, r, n))
        merged = l + r
        for wi in sorted(index.get((l, r), ())):
            seq = words[wi]
            f = freqs[wi]
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                left = stats.get(p, 0) - f
                if left > 0:
                    stats[p] = left
                    # push the decreased count too: the lazy heap only
                    # drops STALE entries, so every live count needs one
                    heapq.heappush(heap, (-left, p))
                else:
                    stats.pop(p, None)
                s = index.get(p)
                if s is not None:
                    s.discard(wi)
            i = 0
            while i < len(seq) - 1:
                if seq[i] == l and seq[i + 1] == r:
                    seq[i : i + 2] = [merged]
                i += 1
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                stats[p] = stats.get(p, 0) + f
                index.setdefault(p, set()).add(wi)
                heapq.heappush(heap, (-stats[p], p))
        stats.pop((l, r), None)
        index.pop((l, r), None)
    return out


def reference_bpe_merges(
    word_freq_pairs: list[tuple[str, int]], k_merges: int
) -> list[tuple[int, str, str, int]]:
    """Pure-Python reference implementation (the classic dict-based
    algorithm) used ONLY by tests to pin the distributed trainer —
    identical counting (overlapping adjacent positions) and identical
    (count desc, pair asc) tie-break."""
    words = [(list(w), f) for w, f in word_freq_pairs]
    out: list[tuple[int, str, str, int]] = []
    for rank in range(1, k_merges + 1):
        stats: dict[tuple[str, str], int] = {}
        for seq, f in words:
            for i in range(len(seq) - 1):
                stats[(seq[i], seq[i + 1])] = stats.get((seq[i], seq[i + 1]), 0) + f
        if not stats:
            break
        (l, r), n = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, l, r, n))
        merged = l + r
        for seq, _ in words:
            i = 0
            while i < len(seq) - 1:
                if seq[i] == l and seq[i + 1] == r:
                    seq[i : i + 2] = [merged]
                i += 1
    return out


def bpe_encode_expr(seq, merges: list[tuple[str, str]]):
    """ENCODE with a trained merge table, pure-Column path: the k merges
    are applied in rank order as a chain of ``_apply_merge`` folds — all
    JVM-side, zero Python per row. Exact BPE application semantics
    (left-to-right non-overlapping per merge, merges in rank order).

    Boundary: expression depth grows with k, so this path is for SMALL
    merge tables (k ≲ 100 — demo/query scale). A production tokenizer
    (~30k merges) uses ``bpe_encode_udf``; the two paths are pinned
    equal in tests/test_bpe.py."""
    out = seq
    for left, right in merges:
        out = _apply_merge(out, left, right)
    return out


def bpe_encode_udf(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ENCODE with a trained merge table, Arrow-batched path: the classic
    per-word merge loop inside ``mapInPandas`` — the production form for
    real merge-table sizes, where a Column chain per merge is infeasible.
    Map-only (no shuffle); the merge table ships once per task in the
    closure (a production 30k-table is ~1 MB — broadcast-class).
    Returns (id_col, tokens array<string>) with the whitespace-parity
    word split of ``word_freqs`` and per-word encode, concatenated in
    word order."""
    import re as _re

    from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

    ws = _re.compile(_WS)
    table = list(merges)
    ranks = {pair: i for i, pair in enumerate(table)}

    def _encode_word(word: str, cache: dict) -> list:
        # Round 10 (VERDICT r9 next-round #7): rank-dict loop instead of
        # scanning the whole table per word (O(k*len) — ruinous at
        # k=2000+). Each step finds the lowest-rank pair PRESENT and
        # applies that single left-to-right pass; the rank FLOOR keeps
        # the exact merges-in-rank-order semantics of bpe_encode_expr (a
        # later merge whose output recreates an earlier merge's pair
        # must NOT re-trigger it — that rank's pass already finished).
        # Cost: O(passes*len), independent of table size.
        got = cache.get(word)
        if got is not None:
            return got
        seq = list(word)
        floor = 0
        while len(seq) > 1:
            best = None
            for i in range(len(seq) - 1):
                rk = ranks.get((seq[i], seq[i + 1]))
                if rk is not None and rk >= floor and (best is None or rk < best):
                    best = rk
            if best is None:
                break
            left, right = table[best]
            i = 0
            while i < len(seq) - 1:
                if seq[i] == left and seq[i + 1] == right:
                    seq[i : i + 2] = [left + right]
                i += 1
            floor = best + 1
        cache[word] = seq
        return seq

    def _run(batches):
        import pandas as pd

        cache: dict = {}
        for pdf in batches:
            ids, toks = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in ws.split(str(t).strip().lower()) if w]
                out: list = []
                for w in words:
                    out.extend(_encode_word(w, cache))
                ids.append(int(i))
                toks.append(out)
            yield pd.DataFrame({id_col: ids, "tokens": toks})

    return docs.select(id_col, text_col).mapInPandas(
        _run,
        StructType(
            [
                StructField(id_col, LongType()),
                StructField("tokens", ArrayType(StringType())),
            ]
        ),
    )
