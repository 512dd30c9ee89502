"""Governance: a rows-only key (no DuckDB oracle) is only acceptable with
a REGISTERED verification contract — an oracle-checked twin, an
equivalence test, or an accuracy bound. Adding a rows-only key without
updating this map fails the suite, so 'not SQL-expressible' can never
silently mean 'unchecked'."""

ROWS_ONLY_CONTRACTS = {
    "q_bpe_merges": "q_bpe_pair_counts pins the counting core; exact k-merge equivalence vs the pure-Python reference BPE (test_bpe)",
    "q_bpe_encode": "encode expr-path == Arrow-UDF path == pure-Python reference application, exact token-sequence equality (test_bpe)",
    "q_ann_lsh": "q_ann_lsh_full: zero-pruning probe == exact top-k oracle; recall tests (test_similarity_ivf)",
    "q_approx_count_distinct": "HLL++ within 15%/group of exact countDistinct (test_approx_contracts)",
    "q_approx_percentile": "approx_percentile within 1% TRUE rank error (test_approx_contracts)",
    "q_cdc_chunks": "q_cdc_boundaries: md5-variant boundaries hash-matched; tiling + resync property tests (test_chunking)",
    "q_curate_pipeline": "composite: every stage key oracle-checked individually; e2e invariants (test_curate)",
    "q_dedup_fuzzy": "q_minhash_signature + q_minhash_estimate + q_jaccard_pairs pin the algebra; capped-bucket stress outputs byte-stable",
    "q_grouped_pandas": "UPGRADED round 7: now oracle-checked (integer-us median)",
    "q_multimodal_features": "q_image_decode / q_audio_decode hash-match the REAL decode paths; this key is the stub-plumbing shape",
    "q_pack_greedy": "q_pack_sequences: prefix-sum packing oracle-checked; greedy variant asserts budget invariants (test_packing)",
    "q_image_phash": "DCT pHash invariance contracts: <=6-bit drift under JPEG q50 recompression, >=16 bits between distinct images, brightness/luma stability (test_phash)",
    "q_simhash": "q_simhash_md5: md5 bit-vote twin hash-matched",
    "q_simhash_pairs": "q_containment_pairs + q_simhash_md5 pin band/Hamming algebra",
    "q_stream_session": "row-set cross-checked against oracle-checked q_sessionize (test_stream_batch_equivalence)",
}


def test_rows_only_keys_all_have_contracts():
    from yark_spark.queries import ORACLES, QUERIES

    rows_only = set(QUERIES) - set(ORACLES)
    registered = set(ROWS_ONLY_CONTRACTS) - {"q_grouped_pandas"}  # upgraded: now oracle-backed
    missing = rows_only - registered
    stale = registered - rows_only
    assert not missing, f"rows-only keys without a registered contract: {sorted(missing)}"
    assert not stale, f"contracts for keys that are no longer rows-only: {sorted(stale)}"
