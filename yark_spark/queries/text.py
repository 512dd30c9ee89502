"""Text-analysis query keys over the documents table (§2.8 E5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from yark_spark.functions.text import (
    LANG_MARKERS,
    STOPWORDS,
    fingerprint,
    lang_id,
    mean_word_length,
    punct_ratio,
    quality_score,
    stopword_ratio,
    whitespace_token_count,
    word_token_count,
)
from yark_spark.io import load_table
from yark_spark.registry import query


@query(
    "q_text_stats",
    oracle=(
        "SELECT lang, source, count(*) AS n_docs, "
        "round(avg(n_chars), 6) AS avg_chars, "
        "round(avg(len(string_split(text, ' '))), 6) AS avg_tokens "
        "FROM documents GROUP BY lang, source"
    ),
)
def q_text_stats(spark, sf_dir):
    """E5 corpus stats per (lang, source): doc counts, length and token
    averages — one scan, map-side partial aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.round(F.avg(F.size(F.split(F.col("text"), " "))), 6).alias("avg_tokens"),
    )


@query(
    "q_token_count",
    oracle=(
        "SELECT doc_id, len(string_split(text, ' ')) AS ws_tokens, "
        "len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]')) AS word_tokens "
        "FROM documents"
    ),
)
def q_token_count(spark, sf_dir):
    """E5 token counting: whitespace tokens + BPE-ish regex tokens
    (alphanumeric runs / single punctuation)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z0-9]+|[^A-Za-z0-9 ]"), F.lit(0))
        ).alias("word_tokens"),
    )


def _marker_sql(markers: list[str]) -> str:
    vals = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter(toks, t -> t IN ({vals})))"


@query(
    "q_lang_id",
    oracle=(
        "WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS toks FROM documents), "
        "h AS (SELECT doc_id, "
        + ", ".join(f"{_marker_sql(m)} AS h_{lang}" for lang, m in LANG_MARKERS.items())
        + " FROM t) "
        "SELECT doc_id, CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und' "
        "WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en' "
        "WHEN h_de = greatest(h_en, h_de, h_fr, h_es) THEN 'de' "
        "WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr' "
        "ELSE 'es' END AS lang_guess FROM h"
    ),
)
def q_lang_id(spark, sf_dir):
    """E5 language-ID: marker-lexicon n-gram heuristic, deterministic
    dict-order tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id(F.col("text")).alias("lang_guess"))


_STOP_IN = ", ".join(f"'{s}'" for s in STOPWORDS)

@query(
    "q_quality_score",
    oracle=(
        "WITH t AS (SELECT doc_id, text, string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') AS toks "
        "FROM documents), "
        "feat AS (SELECT doc_id, "
        f"round(len(list_filter(toks, t -> t IN ({_STOP_IN}))) / greatest(len(toks), 1), 6) AS sw, "
        "round((length(text) - length(regexp_replace(text, '[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]', '', 'g')))"
        " / greatest(length(text), 1), 6) AS pr, "
        "round(list_aggregate(list_transform(toks, t -> length(t)), 'sum')"
        " / greatest(len(toks), 1), 6) AS mwl FROM t) "
        "SELECT doc_id, round("
        "least(sw * 4, 1.0) * 0.5 + (1 - least(pr * 5, 1.0)) * 0.3 "
        "+ (CASE WHEN mwl >= 3 AND mwl <= 10 THEN 1.0 ELSE 0.0 END) * 0.2, 6) AS quality "
        "FROM feat"
    ),
)
def q_quality_score(spark, sf_dir):
    """E5 quality scoring: stopword density + punctuation ratio + mean word
    length composite, [0, 1]."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score(F.col("text")).alias("quality"))


@query(
    "q_fingerprint",
    oracle=(
        "SELECT doc_id, md5(regexp_replace(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS fp "
        "FROM documents"
    ),
)
def q_fingerprint(spark, sf_dir):
    """E5 document fingerprint: md5 over whitespace-normalized lowercase
    text — identical hex in any engine, the exact-dedup join key."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))
