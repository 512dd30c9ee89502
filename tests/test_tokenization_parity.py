"""Tokenization parity on a corpus with IRREGULAR whitespace.

The driver fixtures are single-spaced, which silently hides any
Spark-vs-oracle tokenizer drift (VERDICT r5 What's-wrong #4: Spark split
on \\s+ vs DuckDB string_split on ' ' agree on that corpus by luck). This
module re-runs every tokenization-sensitive oracle key over a copy of
sf0.001 whose documents table carries multi-space, tab, newline, and
leading/trailing-whitespace text, so the two tokenizers must REALLY agree.
"""

import os

import pandas as pd
import pytest

from tests.oracle_harness import TABLES, compare_query, duck_connection

SF_DIR = "/root/testdata/sf0.001"

#: every oracle-backed key whose result depends on tokenizing documents.text
TOKENIZATION_KEYS = [
    "q_minhash_signature",
    "q_jaccard_pairs",
    "q_containment_pairs",
    "q_dedup_clusters",
    "q_dedup_keep",
    "q_decontaminate",
    "q_decontaminate_join",
    "q_tfidf",
    "q_vocabulary",
    "q_lang_id",
    "q_quality_score",
    "q_repetition_ratio",
    "q_fingerprint",
    "q_text_stats",
    "q_token_count",
    "q_gopher_quality",
    "q_ngram_generate",
    "q_chunk_documents",
    "q_token_budget_sample",
    "q_pack_sequences",
    "q_posexplode",
    "q_dedup_exact",
    "q_token_entropy",
    "q_winnow_fingerprint",
    "q_boilerplate_lines",
    "q_source_overlap",
    "q_quality_by_source",
    "q_source_similarity",
    "q_line_dedup",
    "q_lm_score",
    "q_length_histogram",
    "q_minhash_estimate",
]


@pytest.fixture(scope="module")
def messy_sf_dir(tmp_path_factory):
    """sf0.001 with whitespace-mangled document text (other tables linked)."""
    dest = tmp_path_factory.mktemp("messy_sf")
    for t in TABLES:
        src = os.path.join(SF_DIR, f"{t}.parquet")
        if t != "documents":
            os.symlink(src, dest / f"{t}.parquet")
    docs = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
    # hit every query's id-range filter: decon bench (<10), jaccard (<20),
    # ngram (<30), containment/cluster (<40), posexplode (<50), tfidf (<80),
    # chunk (<100), plus an unfiltered row
    mangle = {
        3: lambda s: s.replace(" ", "  ", 5),          # double spaces
        12: lambda s: "  " + s,                         # leading whitespace
        25: lambda s: s + "   ",                        # trailing whitespace
        33: lambda s: s.replace(" ", "\t", 3),          # tabs
        47: lambda s: s.replace(" ", " \n", 2),         # newlines
        77: lambda s: s.replace(" ", "   ", 7),         # triple spaces
        205: lambda s: "\t" + s.replace(" ", "  ", 4) + " \n",
        8: lambda s: s.replace(" ", "\x0b", 2),        # vertical tab: Java \s has it, RE2 \s doesn't

    }
    ids = docs["doc_id"].to_numpy()
    texts = docs["text"].copy()
    for doc_id, fn in mangle.items():
        mask = ids == doc_id
        assert mask.any(), f"doc_id {doc_id} missing from fixture"
        texts.loc[mask] = [fn(s) for s in texts.loc[mask]]
    docs["text"] = texts
    docs.to_parquet(dest / "documents.parquet", index=False)
    return str(dest)


@pytest.fixture(scope="module")
def messy_duck(messy_sf_dir):
    con = duck_connection(messy_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("key", TOKENIZATION_KEYS)
def test_tokenization_parity_on_messy_corpus(spark, messy_sf_dir, messy_duck, key):
    from yark_spark.queries import ORACLES

    assert key in ORACLES, f"{key} lost its oracle"
    compare_query(spark, key, messy_sf_dir, con=messy_duck)
