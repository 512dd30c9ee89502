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
        F.size(F.split(F.trim(text), "[ \\t\\n\\x0B\\f\\r]+"))
    )


def word_token_count(text: Column) -> Column:
    """BPE-ish token count: alphanumeric runs + single punctuation marks,
    approximating subword tokenizer output cheaply."""
    return F.size(F.regexp_extract_all(text, F.lit("[A-Za-z0-9]+|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]"), 0))


def stopword_ratio(text: Column) -> Column:
    """Fraction of whitespace tokens that are stopwords — a standard
    quality-filter feature (low ratio on English text ⇒ likely non-prose)."""
    toks = F.split(F.lower(F.trim(text)), "[ \\t\\n\\x0B\\f\\r]+")
    sw = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.round(sw / F.greatest(F.size(toks), F.lit(1)), 6)


def punct_ratio(text: Column) -> Column:
    punct = F.length(text) - F.length(F.regexp_replace(text, "[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]", ""))
    return F.round(punct / F.greatest(F.length(text), F.lit(1)), 6)


def mean_word_length(text: Column) -> Column:
    toks = F.split(F.lower(F.trim(text)), "[ \\t\\n\\x0B\\f\\r]+")
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
    toks = F.split(F.lower(F.trim(text)), "[ \\t\\n\\x0B\\f\\r]+")

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


#: PII patterns — written in the regex subset Java (Spark) and RE2 (DuckDB)
#: agree on, so the oracle can mirror the exact chain. Order matters:
#: emails first (their local part can look phone-like), then IPs, then
#: phone-like digit runs.
PII_PATTERNS = [
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("\\+?\\d[\\d\\- ]{7,}\\d", "<PHONE>"),
]


def redact_pii(text: Column) -> Column:
    """Chained regexp_replace over PII_PATTERNS — pure codegen'd column
    work, one scan at any scale."""
    out = text
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def token_repetition_ratio(text: Column) -> Column:
    """1 − distinct/total whitespace tokens: near 1 ⇒ degenerate repetition
    (a standard gibberish/boilerplate quality filter)."""
    toks = F.split(F.lower(F.trim(text)), "[ \\t\\n\\x0B\\f\\r]+")
    return F.round(
        1 - F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1)), 6
    )


def ngrams(text: Column, n: int = 5) -> Column:
    """Distinct word n-grams as an array — built map-side with
    transform-over-sequence (no explode), the unit for decontamination
    overlap checks."""
    toks = F.split(F.lower(F.trim(text)), "[ \\t\\n\\x0B\\f\\r]+")
    # floor the stop at 0: `when` evaluates BOTH branches, so the otherwise
    # expression must stay well-defined for short docs (sequence(0, 0) →
    # one truncated gram, discarded by the guard)
    starts = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))

    def _gram(i):
        return F.array_join(F.slice(toks, i + 1, n), " ")

    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(F.transform(starts, _gram))
    )


def winnow_fingerprints(text: Column, gram: int = 3, window: int = 4) -> Column:
    """Winnowing fingerprint set (Schleimer, Wilkerson & Aiken, SIGMOD
    2003) as an array column: md5-hash every ``gram``-token shingle, slide
    a ``window``-hash window, keep each window's minimum, distinct the
    result. Guarantee: two texts sharing at least ``window + gram - 1``
    consecutive tokens share at least one fingerprint (property-tested in
    tests/test_properties.py). Density ≈ 2/(window+1) of full shingling.
    Docs with fewer than ``window + gram - 1`` tokens yield an empty array
    (no full window exists). Pure column work — map-side at any scale."""
    toks = F.split(F.lower(F.trim(text)), "[ \\t\\n\\x0B\\f\\r]+")
    # `when` evaluates BOTH branches, so sequence stops are floored to keep
    # the otherwise-expression well-defined for short docs
    n_grams = F.greatest(F.size(toks) - (gram - 1), F.lit(1))
    hs = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, gram))),
    )
    n_wins = F.greatest(F.size(hs) - (window - 1), F.lit(1))
    wins = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_wins), lambda i: F.array_min(F.slice(hs, i, window))
        )
    )
    return F.when(
        F.size(toks) < gram + window - 1, F.array().cast("array<string>")
    ).otherwise(wins)


def normalize_text(text: Column) -> Column:
    """Canonical dedup-key normalization: lowercase, collapse every
    non-alphanumeric run to a single space, trim. The pre-pass that makes
    exact/fuzzy dedup robust to punctuation and casing noise. EXPLICIT
    character class (not ``\\W``/``\\s``) so Java regex and RE2 oracles
    agree byte-for-byte."""
    return F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text. Same-content docs collide regardless of spacing/case — the
    canonical key for exact dedup across formatting variants."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), "[ \\t\\n\\x0B\\f\\r]+", " ")
    return F.md5(normalized)

