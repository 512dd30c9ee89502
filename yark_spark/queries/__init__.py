"""Query-key implementations, grouped by SURVEY.md §2 section.

Importing this package populates ``yark_spark.registry.QUERIES/ORACLES``.

The driver's CORRECTNESS gate checks the first 50 keys of the dict that
``__spark_entry__.queries()`` returns.  Round 1 verified the 50 keys listed
in ``DRIVER_VERIFIED`` (CORRECTNESS_r01.json: 48 hash-match + 2
rows-only-by-design, 0 failures); ``driver_ordered`` rotates every
not-yet-verified key to the front so each round's window covers new keys
while the already-green ones keep their local DuckDB-parity regression
cover (tests/test_oracle_parity.py runs the identical comparison over ALL
keys every round).
"""

from yark_spark.registry import ORACLES, QUERIES  # noqa: F401

# Each import registers its query keys as a side effect.
from yark_spark.queries import scans  # noqa: F401,E402
from yark_spark.queries import relational  # noqa: F401,E402
from yark_spark.queries import extended  # noqa: F401,E402
from yark_spark.queries import functions_extra  # noqa: F401,E402
from yark_spark.queries import pipeline_ops  # noqa: F401,E402
from yark_spark.queries import scalars  # noqa: F401,E402
from yark_spark.queries import writes  # noqa: F401,E402
from yark_spark.queries import dedup  # noqa: F401,E402
from yark_spark.queries import similarity  # noqa: F401,E402
from yark_spark.queries import text  # noqa: F401,E402
from yark_spark.queries import streaming  # noqa: F401,E402
from yark_spark.queries import udf  # noqa: F401,E402
from yark_spark.queries import extras  # noqa: F401,E402  (late — see its docstring)
from yark_spark.queries import round7  # noqa: F401,E402
from yark_spark.queries import round8  # noqa: F401,E402
from yark_spark.queries import round8b  # noqa: F401,E402
from yark_spark.queries import round8c  # noqa: F401,E402
from yark_spark.queries import round9  # noqa: F401,E402
from yark_spark.queries import round10  # noqa: F401,E402
from yark_spark.queries import round11  # noqa: F401,E402
from yark_spark.queries import round12  # noqa: F401,E402
from yark_spark.queries import round12b  # noqa: F401,E402
from yark_spark.queries import round13  # noqa: F401,E402
from yark_spark.queries import round14  # noqa: F401,E402
from yark_spark.queries import round14b  # noqa: F401,E402
from yark_spark.queries import round15  # noqa: F401,E402
from yark_spark.queries import round16  # noqa: F401,E402
from yark_spark.queries import round17  # noqa: F401,E402
from yark_spark.queries import round3  # noqa: F401,E402  (keep LAST)

# Keys with a green driver CORRECTNESS row from round 1 (the first 50
# registered keys at the time; see VERDICT.md "Next round" item 1).
_R1_VERIFIED: frozenset[str] = frozenset(
    {
        "q_full_scan", "q_projection", "q_point_lookup", "q_filter_scan",
        "q_not_null_filter", "q_semi_join", "q_anti_join", "q_multi_key_dedup",
        "q_csv_scan", "q_json_scan",
        "q_join_inner", "q_join_3way", "q_join_left", "q_left_join_enrich",
        "q_join_range", "q_asof_join", "q_groupby_agg", "q_count_filtered",
        "q_count_distinct", "q_approx_count_distinct", "q_rollup",
        "q_window_rank", "q_window_running", "q_window_lag", "q_topk",
        "q_union", "q_intersect", "q_except", "q_date_trunc", "q_json_extract",
        "q_collect_explode",
        "q_cube", "q_grouping_sets", "q_pivot", "q_exists_subquery",
        "q_scalar_subquery", "q_cross_join", "q_union_all", "q_intersect_all",
        "q_except_all", "q_stats_agg", "q_minmax_by", "q_percentile",
        "q_approx_percentile", "q_window_dense", "q_window_sliding_frame",
        "q_window_lead", "q_date_functions", "q_string_functions",
        "q_posexplode",
    }
)


def _load_verified_rounds(
    reports: "list[tuple[int, dict]] | None" = None,
) -> dict[str, int]:
    """Map each key to the ROUND of its newest green row across every
    ``CORRECTNESS_r*.json`` in the repo root, so the rotation advances
    automatically each round without editing this file. Green = full
    hash-match, or a rows-only key (err == "no_oracle") that produced a
    row count. A key whose NEWEST report row is red is demoted to
    unverified (dropped from the map) regardless of older green rows, so
    regressions re-enter the window immediately instead of waiting out
    the staleness rotation. The round-1 set seeds keys verified before
    reports were committed. ``reports`` (a list of (round, report-dict))
    overrides the on-disk scan — for tests."""
    import glob
    import json
    import os
    import re

    if reports is None:
        reports = []
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
            m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
            rnd = int(m.group(1)) if m else 0
            try:
                with open(path) as f:
                    reports.append((rnd, json.load(f)))
            except (OSError, ValueError):
                continue

    rounds: dict[str, int] = {k: 1 for k in _R1_VERIFIED}
    newest_round: dict[str, int] = {k: 1 for k in _R1_VERIFIED}
    newest_green: dict[str, bool] = {k: True for k in _R1_VERIFIED}
    hash_verified: set[str] = set(_R1_VERIFIED)
    for rnd, report in sorted(reports, key=lambda t: t[0]):
        for key, row in report.items():
            if not isinstance(row, dict):
                continue
            full_pass = row.get("rows_match") and row.get("schema_match") and row.get("hash_match")
            rows_only_pass = row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            green = bool(full_pass or rows_only_pass)
            if full_pass:
                hash_verified.add(key)
            if green:
                rounds[key] = max(rounds.get(key, 0), rnd)
            if rnd >= newest_round.get(key, 0):
                newest_round[key] = rnd
                newest_green[key] = green
    # A key whose green history is rows-only but which NOW declares an
    # oracle has never been checked at the stronger level — treat it as
    # unverified so an oracle upgrade auto-fronts the key for a full
    # hash-match row (round-7: q_grouped_pandas gained an oracle).
    return {
        k: r
        for k, r in rounds.items()
        if newest_green.get(k, True) and (k in hash_verified or k not in ORACLES)
    }


_VERIFIED_ROUNDS: dict[str, int] = _load_verified_rounds()
DRIVER_VERIFIED: frozenset[str] = frozenset(_VERIFIED_ROUNDS)

#: Keys whose newest green driver row predates a known breakage+fix (the
#: round-5 verdict: q_sessionize/q_event_dedup_burst raised
#: AnalysisException on the NTZ fixtures while carrying green r3 rows; the
#: rows-only r2-era keys the verdict names ride along so none lands just
#: outside the 50-key window). Fronting AUTO-EXPIRES: a priority key is
#: only fronted while its newest green row is no newer than the breakage
#: round — once ONE post-fix re-verification lands (all eight got green
#: r8 rows) the key reverts permanently to the stalest-first rotation.
#: (The pre-r10 condition compared against the NEWEST report instead,
#: which re-fronted already-rechecked keys every other round and burned
#: 7 of the window's 50 slots on fresh r8 rows while r5-cohort keys
#: waited.)
_PRIORITY_RECHECK: tuple[str, ...] = (
    "q_sessionize",
    "q_event_dedup_burst",
    "q_dedup_fuzzy",
    "q_simhash_pairs",
    "q_ann_lsh",
    "q_stream_session",
    "q_multimodal_features",
    "q_grouped_pandas",
)

#: The round whose verdict reported the breakage _PRIORITY_RECHECK exists
#: to re-cover; a green row from any LATER round proves the fix.
_PRIORITY_RECHECK_BREAK_ROUND = 5


def driver_ordered(mapping: dict) -> dict:
    """Reorder ``mapping`` so the driver's fixed-size window (first N keys)
    always covers the keys most in need of a fresh row: never-verified keys
    first (registration order), then verified keys STALEST FIRST — ordered
    by the round of their newest green CORRECTNESS row, ascending, with
    registration order as the tie-break. With all keys verified this
    rotates the window through least-recently-checked keys each round
    instead of re-checking the same registration-order prefix."""
    reg_idx = {k: i for i, k in enumerate(mapping)}
    unverified = [k for k in mapping if k not in DRIVER_VERIFIED]
    priority = [
        k
        for k in _PRIORITY_RECHECK
        if k in mapping
        and k not in unverified
        and _VERIFIED_ROUNDS.get(k, 0) <= _PRIORITY_RECHECK_BREAK_ROUND
    ]
    rest = sorted(
        (k for k in mapping if k in DRIVER_VERIFIED and k not in priority),
        key=lambda k: (_VERIFIED_ROUNDS.get(k, 0), reg_idx[k]),
    )
    return {k: mapping[k] for k in (*unverified, *priority, *rest)}
