"""Plan-shape tests (SURVEY.md §4): the scale-critical physical properties
must hold, not just the results. These are the '100 TB posture' assertions —
a correct query with the wrong plan fails here."""

import pytest
from pyspark.sql import functions as F

from yark_spark.plans.explain import (
    assert_scan_pruned,
    count_broadcast_joins,
    count_exchanges,
    formatted_plan,
    has_whole_stage_codegen,
    pushed_filters,
    read_schemas,
)
from yark_spark.queries import QUERIES


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """q_filter_scan's predicate must land in PushedFilters, not a
    post-scan Filter only."""
    df = QUERIES["q_filter_scan"](spark, sf_dir)
    pf = pushed_filters(df)
    assert "EqualTo(l_returnflag,R)" in pf, pf


def test_point_lookup_pushdown(spark, sf_dir):
    df = QUERIES["q_point_lookup"](spark, sf_dir)
    pf = pushed_filters(df)
    assert "EqualTo(o_orderkey,7)" in pf, pf


def test_projection_prunes_scan(spark, sf_dir):
    """q_projection reads 3 of 6 orders columns — the scan schema must not
    include the rest."""
    df = QUERIES["q_projection"](spark, sf_dir)
    schemas = read_schemas(df)
    assert schemas and all("o_orderdate" not in s and "o_orderpriority" not in s for s in schemas), schemas


def test_dim_joins_broadcast(spark, sf_dir):
    """q_join_3way: both dimension joins must be broadcast — zero shuffle of
    the customer side."""
    df = QUERIES["q_join_3way"](spark, sf_dir)
    assert count_broadcast_joins(df) >= 2
    assert count_exchanges(df) == 0, formatted_plan(df)


def test_groupby_agg_partial_aggregation(spark, sf_dir):
    """q_groupby_agg must do map-side partial aggregation (two HashAggregate
    levels around one exchange)."""
    df = QUERIES["q_groupby_agg"](spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("HashAggregate") >= 2
    assert count_exchanges(df) == 1, plan


def test_topk_is_take_ordered(spark, sf_dir):
    """q_topk must compile to TakeOrderedAndProject — never a global sort."""
    df = QUERIES["q_topk"](spark, sf_dir)
    assert "TakeOrderedAndProject" in formatted_plan(df)


def test_scalar_queries_stay_in_codegen(spark, sf_dir):
    """Scalar transforms are native Column exprs — whole-stage codegen, no
    Python evaluation nodes."""
    for key in ("q_coalesce", "q_regexp_replace", "q_math_floor"):
        df = QUERIES[key](spark, sf_dir)
        plan = formatted_plan(df)
        assert has_whole_stage_codegen(df), key
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, key


def test_semi_join_no_row_explosion(spark, sf_dir):
    """q_semi_join must stay a semi join in the plan (existence, not
    multiplication)."""
    df = QUERIES["q_semi_join"](spark, sf_dir)
    assert "LeftSemi" in formatted_plan(df)


def test_entry_flagship_plan(spark):
    """Flagship: nation join broadcast; single agg shuffle; sort only on the
    25-row aggregated output."""
    import __spark_entry__ as e

    df = e.entry(spark)
    assert count_broadcast_joins(df) >= 1
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan or "Sort" in plan


def test_tpch_q6_filters_push_to_scan(spark, sf_dir):
    """Q6 is the pushdown showcase: every conjunct (shipdate range,
    discount band, quantity cap) must reach the Parquet scan."""
    from yark_spark.queries import QUERIES

    df = QUERIES["q_tpch_q6_shape"](spark, sf_dir)
    pf = pushed_filters(df)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pf, pf


def test_salted_agg_no_single_hot_partition(spark, sf_dir):
    """The salted join's shuffle key includes the salt column — the plan
    must hash-partition on (key, salt), never on the key alone."""
    from yark_spark.plans.explain import formatted_plan
    from yark_spark.queries import QUERIES

    plan = formatted_plan(QUERIES["q_salted_agg"](spark, sf_dir))
    assert "__salt" in plan, plan


def test_round3_tpch_dims_broadcast(spark, sf_dir):
    """Q14/Q16/Q19: the part side must broadcast — lineitem never
    shuffles for these joins."""
    for key in ("q_tpch_q14_shape", "q_tpch_q16_shape", "q_tpch_q19_shape"):
        df = QUERIES[key](spark, sf_dir)
        assert count_broadcast_joins(df) >= 1, key
        plan = formatted_plan(df)
        assert "SortMergeJoin" not in plan, key


def test_event_analytics_windows_partitioned(spark, sf_dir):
    """Sessionize/burst-dedup windows partition by user — the plan must
    hashpartition on user_id, never a single-partition Exchange."""
    for key in ("q_sessionize", "q_event_dedup_burst"):
        plan = formatted_plan(QUERIES[key](spark, sf_dir))
        assert "SinglePartition" not in plan, (key, plan)
        assert "user_id" in plan, key


def test_mixture_sample_broadcasts_rates(spark, sf_dir):
    """The rates table broadcasts; the corpus is filtered map-side (no
    corpus shuffle at all)."""
    df = QUERIES["q_mixture_sample"](spark, sf_dir)
    assert count_broadcast_joins(df) >= 1
    assert count_exchanges(df) <= 1  # at most the broadcast exchange


def test_interval_join_is_equi_on_user(spark, sf_dir):
    """The stream-twin interval join must hash-join on user_id with the
    time bound as a post-join condition — never a cross/nested-loop join."""
    plan = formatted_plan(QUERIES["q_stream_interval_join"](spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan


def test_winnow_fingerprint_map_side_until_explode(spark, sf_dir):
    """q_winnow_fingerprint (round 6): tokenize → shingle-hash → window-min
    → distinct-per-doc are all map-side transforms — ZERO shuffles in the
    whole plan, and the doc_id bound reaches the parquet scan."""
    df = QUERIES["q_winnow_fingerprint"](spark, sf_dir)
    assert count_exchanges(df) == 0, formatted_plan(df)
    assert "LessThan(doc_id,60)" in pushed_filters(df)
    assert_scan_pruned(df, ["lang", "source", "n_chars"])


def test_token_entropy_partial_aggregation(spark, sf_dir):
    """q_token_entropy (round 6): both aggregations must be partial
    (map-side combine before each shuffle) and the scan must prune to
    (doc_id, text)."""
    plan = formatted_plan(QUERIES["q_token_entropy"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 4, plan  # 2 aggs x partial+final
    assert_scan_pruned(QUERIES["q_token_entropy"](spark, sf_dir), ["lang", "source", "n_chars"])


def test_pii_count_single_map_only_scan(spark, sf_dir):
    """q_pii_count (round 6): pure column work — no shuffle, no join, bound
    pushed to the scan."""
    df = QUERIES["q_pii_count"](spark, sf_dir)
    assert count_exchanges(df) == 0, formatted_plan(df)
    assert "LessThan(doc_id,200)" in pushed_filters(df)


def test_source_audit_joins_are_hash_not_cartesian(spark, sf_dir):
    """q_source_overlap / q_source_similarity (round 6): the pair joins
    must be equi-joins on fingerprint/token — never a cartesian or
    broadcast-nested-loop — and scans must prune to the columns used."""
    for key, pruned in (
        ("q_source_overlap", ["lang", "n_chars", "doc_id"]),
        ("q_source_similarity", ["lang", "n_chars", "doc_id"]),
    ):
        df = QUERIES[key](spark, sf_dir)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan, (key, plan)
        assert "BroadcastNestedLoop" not in plan, (key, plan)
        assert_scan_pruned(df, pruned)


def test_quality_by_source_partial_agg_and_pruned(spark, sf_dir):
    """q_quality_by_source (round 6): the rollup must partial-aggregate
    and the scan must read only (source, text)."""
    df = QUERIES["q_quality_by_source"](spark, sf_dir)
    assert formatted_plan(df).count("Aggregate") >= 2, formatted_plan(df)
    assert_scan_pruned(df, ["lang", "n_chars", "doc_id"])


def test_cdc_boundaries_map_only(spark, sf_dir):
    """q_cdc_boundaries (round 6): pure column work until the explode —
    zero shuffles, doc_id bound pushed to the scan."""
    df = QUERIES["q_cdc_boundaries"](spark, sf_dir)
    assert count_exchanges(df) == 0, formatted_plan(df)
    assert "LessThan(doc_id,30)" in pushed_filters(df)


def test_chunk_dedup_equi_join_not_cartesian(spark, sf_dir):
    """q_chunk_dedup (round 7): the shared-chunk pair join must be an
    EQUI-join on the chunk hash — never cartesian/nested-loop — with a
    partial-agg pair count and the doc_id bound pushed to the scan."""
    df = QUERIES["q_chunk_dedup"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    assert plan.count("Aggregate") >= 2, plan
    assert "LessThan(doc_id,120)" in pushed_filters(df)


def test_line_dedup_line_cardinality_shuffle(spark, sf_dir):
    """q_line_dedup (round 7): line-count aggregate + equi-join back +
    per-doc reassembly — never cartesian, partial aggs present."""
    df = QUERIES["q_line_dedup"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan
    assert plan.count("Aggregate") >= 2, plan


def test_lm_score_model_joins_are_equi(spark, sf_dir):
    """q_lm_score (round 7): the model joins hit (w1, w2)/(w1) equi-keys;
    only the 1-row vocab scalar may broadcast-nested-loop (explicit
    crossJoin of a single-row aggregate)."""
    df = QUERIES["q_lm_score"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert plan.count("Aggregate") >= 4, plan  # bc, uc, vocab, final avg


def test_shuffle_rank_no_single_task_window(spark, sf_dir):
    """q_shuffle_rank (round 7): the global row number must go through the
    distributed prefix sum (range partition), never a single-partition
    global window."""
    df = QUERIES["q_shuffle_rank"](spark, sf_dir)
    plan = formatted_plan(df)
    # round 8b: the range-partitioned cumsum is eager behind a
    # localCheckpoint (boundary-sampling fix); the checkpointed scan is
    # its signature in the lazy plan (tests/test_packing.py pins behavior)
    assert "localCheckpoint" in plan, plan
    # the corpus-side cumsum windows over the partition id, and the
    # per-partition TOTALS (|partitions| rows, tiny by design) broadcast
    # back — the broadcast join is the signature of the two-pass shape
    assert "BroadcastHashJoin" in plan, plan


def test_bm25_term_filter_before_shuffle(spark, sf_dir):
    """q_bm25 (round 7): the query-term filter must run map-side before
    the tf shuffle (shuffle volume = matching postings, not all tokens),
    df/corpus stats must broadcast, and no join may be cartesian."""
    df = QUERIES["q_bm25"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert count_broadcast_joins(df) >= 2, plan  # df table + corpus stats
    # the isin filter appears as a post-scan Filter on the exploded token
    assert "tok" in plan and "Filter" in plan, plan
    assert plan.count("Aggregate") >= 2, plan


def test_gap_fill_joins_on_same_key_no_cartesian(spark, sf_dir):
    """q_gap_fill (round 7): the grid is generated distributed (explode of
    sequence, no driver loop) and joined back on the (user, bucket)
    equi-key."""
    df = QUERIES["q_gap_fill"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan
    assert "Generate" in plan, plan  # explode(sequence(...)) runs on executors
    assert plan.count("Aggregate") >= 2, plan


def test_outlier_trim_bands_broadcast_fact_unshuffled(spark, sf_dir):
    """q_outlier_trim (round 7): the per-source percentile band table
    broadcasts; the document side must NOT be exchanged for the join."""
    df = QUERIES["q_outlier_trim"](spark, sf_dir)
    plan = formatted_plan(df)
    assert count_broadcast_joins(df) >= 1, plan
    # only the band aggregation's own shuffle may appear; the fact scan
    # feeds the broadcast-hash join directly.
    assert "SortMergeJoin" not in plan, plan


def test_pseudonymize_single_partial_agg(spark, sf_dir):
    """q_pseudonymize (round 7): map-only hash then one partial-agg
    shuffle on the pseudonym."""
    df = QUERIES["q_pseudonymize"](spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("Aggregate") >= 2, plan
    assert_scan_pruned(df, ["ts", "value", "props", "event_id"])


def test_text_normalize_map_only(spark, sf_dir):
    """q_text_normalize (round 7): pure column work — zero exchanges,
    scan pruned to (doc_id, text)."""
    df = QUERIES["q_text_normalize"](spark, sf_dir)
    assert count_exchanges(df) == 0, formatted_plan(df)
    assert_scan_pruned(df, ["lang", "source", "n_chars"])


def test_top_bigram_window_partitioned_by_doc(spark, sf_dir):
    """q_top_bigram (round 7): the argmax window must partition by doc_id
    (hashpartitioning on doc id), never a single global sort, and bigrams
    are built map-side (transform over the token array, no self-join)."""
    df = QUERIES["q_top_bigram"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan
    assert "hashpartitioning(doc_id" in plan, plan
    assert plan.count("Aggregate") >= 2, plan


def test_substring_dedup_gram_equi_join_partial_agg(spark, sf_dir):
    """q_substring_dedup (round 7): the repeat filter must be a partial
    agg on the md5 gram key; the join back is an equi-join (never
    cartesian); the coverage window partitions by doc_id."""
    df = QUERIES["q_substring_dedup"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan
    assert plan.count("Aggregate") >= 2, plan
    assert "hashpartitioning(doc_id" in plan, plan


def test_dedup_incremental_semi_join_on_band(spark, sf_dir):
    """q_dedup_incremental (round 7): batch-vs-index screening must be a
    (Left)Semi equi-join on the band bucket — no pair materialization,
    no cartesian."""
    df = QUERIES["q_dedup_incremental"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan
    assert "Semi" in plan, plan


def test_join_full_preaggregated_sides(spark, sf_dir):
    """q_join_full (round 7): both sides pre-aggregate before the full
    outer join (two partial-agg pairs), sharing the user_id shuffle key."""
    df = QUERIES["q_join_full"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "FullOuter" in plan, plan
    assert plan.count("Aggregate") >= 4, plan  # 2x (partial + final)


def test_table_diff_moves_digests_not_documents(spark, sf_dir):
    """q_table_diff (round 7): the diff join's scans read (doc_id, text)
    only to build md5 digests map-side; the join itself is a full-outer
    equi-join on the key — no cartesian, no post-join text columns."""
    df = QUERIES["q_table_diff"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "FullOuter" in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan


def test_profile_table_one_pass(spark, sf_dir):
    """q_profile_table (round 7): all five columns profile in ONE
    aggregate pass — a single scan of documents (count-distinct Expand is
    fine; re-scanning per column is not)."""
    df = QUERIES["q_profile_table"](spark, sf_dir)
    assert len(read_schemas(df)) == 1, formatted_plan(df)


def test_data_quality_no_cartesian_anti_join_for_referential(spark, sf_dir):
    """q_data_quality (round 7): the referential check must be an anti
    equi-join; nothing in the report may be cartesian."""
    df = QUERIES["q_data_quality"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "Anti" in plan, plan


def test_salted_join_shuffles_on_key_plus_salt(spark, sf_dir):
    """q_salted_join (round 7): the join key must include the salt column
    (hot l_returnflag spread over salt reducers); never cartesian."""
    df = QUERIES["q_salted_join"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "__salt" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_score_calibration_window_partitioned_by_source(spark, sf_dir):
    """q_score_calibration (round 7): percent_rank windows partition by
    source — one shuffle on source, never a single global sort."""
    df = QUERIES["q_score_calibration"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "hashpartitioning(source" in plan, plan


def test_tpch_q2_shape_partwise_window_and_broadcast_dim(spark, sf_dir):
    """q_tpch_q2_shape (round 7): the best-supplier window partitions by
    part; supplier broadcasts; never a global single-partition sort."""
    df = QUERIES["q_tpch_q2_shape"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "hashpartitioning(l_partkey" in plan, plan
    assert count_broadcast_joins(df) >= 1, plan


def test_tpch_q21_shape_semi_and_anti(spark, sf_dir):
    """q_tpch_q21_shape (round 7): the double-correlated EXISTS/NOT EXISTS
    must compile to a semi AND an anti join — no cartesian."""
    df = QUERIES["q_tpch_q21_shape"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Semi" in plan and "Anti" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_lateral_topk_decorrelates_to_group_limit(spark, sf_dir):
    """q_lateral_topk (round 7): the correlated LATERAL must decorrelate
    into a WindowGroupLimit (map-side per-group top-k) over a
    source-partitioned window — never a per-source nested loop."""
    df = QUERIES["q_lateral_topk"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "WindowGroupLimit" in plan, plan
    assert "hashpartitioning(source" in plan, plan
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan, plan


def test_hybrid_rrf_topk_via_take_ordered(spark, sf_dir):
    """q_hybrid_rrf (round 7): each ranker's candidate list comes from
    TakeOrderedAndProject (map-side k-reduction); the fusion joins are
    bounded full-outer equi-joins — no corpus-sized global sort."""
    df = QUERIES["q_hybrid_rrf"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "FullOuter" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_tpch_q17_q20_q22_shapes(spark, sf_dir):
    """Round 7 TPC-H additions: Q17's brand filter pushes to the part
    scan with the part side broadcast; Q20 compiles to nested semi-joins;
    Q22 anti-joins orders with the scalar average broadcast. None may be
    cartesian."""
    q17 = formatted_plan(QUERIES["q_tpch_q17_shape"](spark, sf_dir))
    assert "Brand#13" in pushed_filters(QUERIES["q_tpch_q17_shape"](spark, sf_dir))
    assert "CartesianProduct" not in q17, q17

    q20 = formatted_plan(QUERIES["q_tpch_q20_shape"](spark, sf_dir))
    assert q20.count("Semi") >= 2, q20
    assert "CartesianProduct" not in q20, q20

    q22 = formatted_plan(QUERIES["q_tpch_q22_shape"](spark, sf_dir))
    assert "Anti" in q22, q22
    assert "CartesianProduct" not in q22, q22


def test_tpch_q7_q8_q10_q13_q15_shapes(spark, sf_dir):
    """Round 7 TPC-H completions: dims broadcast in the 5/8-way joins
    (Q7/Q8), Q10 ends in TakeOrderedAndProject, Q13's outer join stays
    an equi-join, Q15's scalar max broadcasts; nothing cartesian."""
    for key, checks in {
        "q_tpch_q7_shape": ["nocartesian", "broadcast2"],
        "q_tpch_q8_shape": ["nocartesian", "broadcast2"],
        "q_tpch_q10_shape": ["nocartesian", "takeordered"],
        "q_tpch_q13_shape": ["nocartesian", "outer"],
        "q_tpch_q15_shape": ["nocartesian", "broadcast1"],
    }.items():
        df = QUERIES[key](spark, sf_dir)
        plan = formatted_plan(df)
        if "nocartesian" in checks:
            assert "CartesianProduct" not in plan, (key, plan)
        if "broadcast2" in checks:
            assert count_broadcast_joins(df) >= 2, (key, plan)
        if "broadcast1" in checks:
            assert count_broadcast_joins(df) >= 1, (key, plan)
        if "takeordered" in checks:
            assert "TakeOrderedAndProject" in plan, (key, plan)
        if "outer" in checks:
            assert "LeftOuter" in plan, (key, plan)


@pytest.mark.slow
def test_registry_plan_lint_no_cartesian(spark, sf_dir):
    """Whole-surface invariant (round 7): NO registered key may compile to
    a CartesianProduct except the explicitly tiny-dim-guarded
    q_cross_join. (BroadcastNestedLoop is permitted — 1-row scalar
    crossJoins legitimately use it; true cartesians are the scale
    killer.) Lints the physical plan of every key without executing."""
    allowed = {"q_cross_join"}
    bad = []
    for key, fn in sorted(QUERIES.items()):
        try:
            plan = formatted_plan(fn(spark, sf_dir))
        except Exception as ex:  # noqa: BLE001 — lint must report, not abort
            bad.append((key, f"plan build failed: {ex}"))
            continue
        if "CartesianProduct" in plan and key not in allowed:
            bad.append((key, "CartesianProduct"))
        # row-at-a-time scalar Python UDFs are banned everywhere; the
        # UDTF node ("BatchEvalPythonUDTF") is the documented exception
        # (q_udtf_split) and Arrow nodes (ArrowEvalPython, MapInPandas)
        # are the sanctioned Python boundary.
        import re

        if re.search(r"BatchEvalPython(?!UDTF)", plan):
            bad.append((key, "row-at-a-time Python UDF"))
    assert not bad, bad
