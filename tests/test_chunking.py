"""Content-defined chunking (operators/chunking): tiling, determinism,
guard bounds, and the edit-resynchronization property that makes CDC
content-defined rather than offset-defined."""

import pandas as pd

from yark_spark.operators.chunking import cdc_chunks

WINDOW, MASK_BITS, MIN_LEN, MAX_LEN = 8, 4, 8, 64


def _chunks(spark, texts):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    out = cdc_chunks(
        df, "doc_id", "text",
        window=WINDOW, mask_bits=MASK_BITS, min_len=MIN_LEN, max_len=MAX_LEN,
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_start, r.chunk_len))
    return {k: sorted(v) for k, v in by_doc.items()}


def _corpus_text(seed, n):
    # deterministic pseudo-random text via an LCG (a short-period pattern
    # like i*i % 26 yields only ~26 distinct hash windows and can have ZERO
    # content boundaries — the chunker needs high-entropy input to test
    # boundary behavior)
    x, out = seed * 2654435761 % (2**31) or 1, []
    for _ in range(n):
        x = (x * 1103515245 + 12345) % (2**31)
        out.append(chr(97 + ((x >> 16) % 26)))
    return "".join(out)


def test_chunks_tile_document_exactly(spark):
    texts = [_corpus_text(s, n) for s, n in ((1, 500), (2, 63), (3, 0), (4, 7))]
    got = _chunks(spark, texts)
    for doc_id, text in enumerate(texts):
        chunks = got[doc_id]
        n = len(text.encode("utf-8"))
        assert chunks[0][1] == 0
        assert sum(c[2] for c in chunks) == n
        for (i1, s1, l1), (i2, s2, _) in zip(chunks, chunks[1:]):
            assert i2 == i1 + 1 and s2 == s1 + l1  # contiguous, ordered
        # guards: every chunk but the last respects [MIN_LEN, MAX_LEN]
        for _, _, length in chunks[:-1]:
            assert MIN_LEN <= length <= MAX_LEN
        assert chunks[-1][2] <= MAX_LEN


def test_chunking_deterministic(spark):
    texts = [_corpus_text(9, 800)]
    assert _chunks(spark, texts) == _chunks(spark, texts)


def test_prefix_edit_resynchronizes(spark):
    """THE content-defined property: after inserting a prefix, chunk
    boundaries re-align with the original (same content positions) once
    past the edit region — fixed-size chunking would shift every
    boundary."""
    base = _corpus_text(5, 2000)
    edited = "ZZZZZ" + base
    got = _chunks(spark, [base, edited])
    # compare boundary END positions measured from the END of the document
    # (suffix-stable coordinates)
    n0 = len(base)
    n1 = len(edited)
    ends0 = {n0 - (s + l) for _, s, l in got[0]}
    ends1 = {n1 - (s + l) for _, s, l in got[1]}
    shared = ends0 & ends1
    # all boundaries in the back half of the document must re-align
    back_half = {e for e in ends0 if e < n0 // 2}
    assert back_half and back_half <= shared, (sorted(ends0), sorted(ends1))


def test_vectorized_equals_scalar_reference(spark):
    """The numpy-vectorized sparse-candidate walk must produce EXACTLY the
    chunks of the per-byte scalar reference loop for varied shapes: empty,
    shorter than window, guard-dominated, and long high-entropy text."""
    import pandas as pd

    from yark_spark.operators.chunking import chunk_positions_reference

    texts = ["", "abc", "a" * 200, _corpus_text(7, 5000), _corpus_text(11, 63)]
    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    out = cdc_chunks(
        df, "doc_id", "text",
        window=WINDOW, mask_bits=MASK_BITS, min_len=MIN_LEN, max_len=MAX_LEN,
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_start, r.chunk_len))
    for doc_id, text in enumerate(texts):
        ref = chunk_positions_reference(text, WINDOW, MASK_BITS, MIN_LEN, MAX_LEN)
        assert sorted(got[doc_id]) == ref, (doc_id, sorted(got[doc_id])[:5], ref[:5])
