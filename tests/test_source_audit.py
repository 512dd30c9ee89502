"""Round-6 corpus-audit keys: cross-source overlap and boilerplate lines.

The driver fixture has no cross-source duplicate fingerprints (the key
hash-matches on an empty result), so the overlap semantics are pinned here
on a synthetic corpus with known duplication structure.
"""

import pandas as pd

from yark_spark.queries import QUERIES


def _write_docs(tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def test_source_overlap_counts_shared_fingerprints(spark, tmp_path):
    sf = _write_docs(
        tmp_path,
        [
            # "alpha beta" appears in cc and wiki (different spacing — the
            # fingerprint normalizes whitespace, so they must still collide)
            (1, "alpha beta", "en", "cc", 10),
            (2, "alpha   beta ", "en", "wiki", 13),
            # "gamma" in all three sources
            (3, "gamma", "en", "cc", 5),
            (4, "gamma", "en", "wiki", 5),
            (5, "gamma", "en", "books", 5),
            # unique to books
            (6, "delta", "en", "books", 5),
            # duplicate WITHIN one source must not create a pair
            (7, "epsilon", "en", "cc", 7),
            (8, "epsilon", "en", "cc", 7),
        ],
    )
    got = {
        (r.source_a, r.source_b): r.n_shared
        for r in QUERIES["q_source_overlap"](spark, sf).collect()
    }
    assert got == {
        ("cc", "wiki"): 2,      # alpha-beta + gamma
        ("books", "cc"): 1,     # gamma
        ("books", "wiki"): 1,   # gamma
    }


def test_boilerplate_lines_flags_repeated_sentences(spark, tmp_path):
    boiler = "all rights reserved"
    sf = _write_docs(
        tmp_path,
        [
            (1, f"unique one. {boiler}", "en", "cc", 30),
            (2, f"unique two. {boiler}", "en", "cc", 30),
            (3, f"unique three. {boiler}", "en", "cc", 32),
            (4, "nothing shared here. another line", "en", "cc", 33),
        ],
    )
    got = {
        r.doc_id: (r.n_lines, r.n_boilerplate)
        for r in QUERIES["q_boilerplate_lines"](spark, sf).collect()
    }
    # the shared sentence appears in 3 docs (>= BOILER_MIN_DOCS) -> flagged
    assert got[1] == (2, 1) and got[2] == (2, 1) and got[3] == (2, 1)
    assert got[4] == (2, 0)
