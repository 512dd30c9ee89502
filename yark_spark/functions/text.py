"""Text-analysis column functions for training-data pipelines
(BASELINE.json north-star; SURVEY.md §2.8 E5).

All pure Column expressions — language-ID, quality scoring, token counting
and fingerprinting run inside whole-stage codegen with zero Python in the
row path, so they cost one scan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language marker lexicons for the n-gram/stopword heuristic.
#: Deterministic and SQL-expressible so the DuckDB oracle can mirror it.
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "nicht"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def whitespace_token_count(text: Column) -> Column:
    """Token count by whitespace split (empty text → 0)."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), "\\s+"))
    )


def word_token_count(text: Column) -> Column:
    """BPE-ish token count: alphanumeric runs + single punctuation marks,
    approximating subword tokenizer output cheaply."""
    return F.size(F.regexp_extract_all(text, F.lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), 0))


def stopword_ratio(text: Column) -> Column:
    """Fraction of whitespace tokens that are stopwords — a standard
    quality-filter feature (low ratio on English text ⇒ likely non-prose)."""
    toks = F.split(F.lower(F.trim(text)), "\\s+")
    sw = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.round(sw / F.greatest(F.size(toks), F.lit(1)), 6)


def punct_ratio(text: Column) -> Column:
    punct = F.length(text) - F.length(F.regexp_replace(text, "[^A-Za-z0-9\\s]", ""))
    return F.round(punct / F.greatest(F.length(text), F.lit(1)), 6)


def mean_word_length(text: Column) -> Column:
    toks = F.split(F.lower(F.trim(text)), "\\s+")
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.round(total / F.greatest(F.size(toks), F.lit(1)), 6)


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: rewards prose-like stopword
    density and penalizes punctuation soup and degenerate word lengths."""
    sw = stopword_ratio(text)
    pr = punct_ratio(text)
    mwl = mean_word_length(text)
    score = (
        F.least(sw * 4, F.lit(1.0)) * 0.5
        + (1 - F.least(pr * 5, F.lit(1.0))) * 0.3
        + F.when((mwl >= 3) & (mwl <= 10), F.lit(1.0)).otherwise(F.lit(0.0)) * 0.2
    )
    return F.round(score, 6)


def lang_id(text: Column) -> Column:
    """Marker-lexicon language guess over whitespace tokens; 'und' when no
    lexicon matches. Deterministic tie-break: first language (dict order)
    with the max marker hits."""
    toks = F.split(F.lower(F.trim(text)), "\\s+")

    def _in_markers(markers):
        # closure factory: pyspark higher-order lambdas must take exactly the
        # lambda variables (a default arg would be bound as a second one)
        return lambda t: t.isin(*markers)

    hits = {
        lang: F.size(F.filter(toks, _in_markers(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # reversed so earlier languages win ties via later .when precedence
    for lang in reversed(list(hits)):
        expr = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text. Same-content docs collide regardless of spacing/case — the
    canonical key for exact dedup across formatting variants."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), "\\s+", " ")
    return F.md5(normalized)
