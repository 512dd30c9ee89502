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


def _hashed_chunks_df(spark, texts):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    return cdc_chunks(
        df, "doc_id", "text",
        window=WINDOW, mask_bits=MASK_BITS, min_len=MIN_LEN, max_len=MAX_LEN,
        with_hash=True,
    )


def test_with_hash_matches_chunk_bytes(spark):
    import hashlib

    text = _corpus_text(11, 600)
    rows = _hashed_chunks_df(spark, [text]).collect()
    data = text.encode("utf-8")
    for r in rows:
        expect = hashlib.md5(data[r.chunk_start : r.chunk_start + r.chunk_len]).hexdigest()
        assert r.chunk_hash == expect


def test_shared_block_produces_shared_chunks(spark):
    """The storage-dedup guarantee chunk_dedup rides on: two documents
    embedding the SAME long block inside different surrounding content
    share at least one identical chunk — content-defined boundaries
    resynchronize inside the block regardless of its byte offset. Block
    length ≫ max_len so interior content-defined boundaries must occur
    (max_len forces progress even through boundary deserts)."""
    from yark_spark.operators.chunking import shared_chunk_pairs

    block = _corpus_text(21, 8 * MAX_LEN)
    doc_a = _corpus_text(22, 200) + block + _corpus_text(23, 150)
    doc_b = _corpus_text(24, 517) + block + _corpus_text(25, 90)
    doc_c = _corpus_text(26, 900)  # no shared content
    chunks = _hashed_chunks_df(spark, [doc_a, doc_b, doc_c])
    pairs = {(r.id_a, r.id_b): r for r in shared_chunk_pairs(chunks, "doc_id").collect()}
    assert (0, 1) in pairs, "docs sharing an 8*max_len block must share a chunk"
    p = pairs[(0, 1)]
    assert p.n_shared >= 3  # several interior chunks align, not just one
    assert p.shared_bytes >= p.n_shared * MIN_LEN
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_shared_chunk_pairs_hot_bucket_cap(spark):
    """A chunk present in EVERY document (boilerplate) is exactly the
    hot-bucket hazard: max_bucket drops it before the pair join while a
    small shared bucket SURVIVES, and the Observation makes the capped
    work visible. (The corpus keeps the capped output non-empty on
    purpose: AQE's empty-relation propagation would eliminate the
    CollectMetrics node of an all-empty plan — see the operator
    docstring.)"""
    from pyspark.sql import Observation

    from yark_spark.operators.chunking import shared_chunk_pairs

    boiler = _corpus_text(31, 4 * MAX_LEN)  # shared by ALL docs -> capped
    pair_block = _corpus_text(32, 4 * MAX_LEN)  # shared by docs 0,1 only
    texts = [
        _corpus_text(40 + i, 120 + 37 * i)
        + boiler
        + (pair_block if i < 2 else _corpus_text(50 + i, 150))
        for i in range(6)
    ]
    chunks = _hashed_chunks_df(spark, texts)
    obs = Observation("cap")
    capped = shared_chunk_pairs(chunks, "doc_id", max_bucket=4, observation=obs)
    rows = {(r.id_a, r.id_b) for r in capped.collect()}
    got = obs.get
    assert got["capped_buckets"] > 0
    assert got["rows_in_capped_buckets"] >= 6  # the all-doc chunks were dropped
    # the small (size-2) pair_block bucket survives the cap...
    assert (0, 1) in rows
    # ...but every pair that only shared the boilerplate is gone
    uncapped = {
        (r.id_a, r.id_b) for r in shared_chunk_pairs(chunks, "doc_id").collect()
    }
    assert len(uncapped) == 15
    assert rows == {(0, 1)}
