"""Driver-window staleness rotation (yark_spark/queries/__init__.py).

ADVICE r6 item 4: a key green in an early round but RED in a later round
must be demoted to unverified (so it re-enters the driver window at the
front) instead of keeping its old green round and waiting out the
stalest-first rotation.
"""

from yark_spark.queries import _load_verified_rounds

GREEN = {"rows_match": True, "schema_match": True, "hash_match": True,
         "spark_rows": 10, "oracle_rows": 10, "err": None}
RED = {"rows_match": False, "schema_match": True, "hash_match": False,
       "spark_rows": 10, "oracle_rows": 11, "err": None}
ROWS_ONLY = {"rows_match": None, "schema_match": None, "hash_match": None,
             "spark_rows": 7, "oracle_rows": None, "err": "no_oracle"}
ERRORED = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": "AnalysisException: boom"}


def test_green_keys_keep_newest_green_round():
    rounds = _load_verified_rounds([(3, {"k": GREEN}), (5, {"k": GREEN})])
    assert rounds["k"] == 5


def test_rows_only_counts_as_green():
    rounds = _load_verified_rounds([(4, {"k": ROWS_ONLY})])
    assert rounds["k"] == 4


def test_newest_red_row_demotes_despite_older_green():
    rounds = _load_verified_rounds([(3, {"k": GREEN}), (5, {"k": RED})])
    assert "k" not in rounds


def test_newest_errored_row_demotes_despite_older_green():
    rounds = _load_verified_rounds([(3, {"k": GREEN}), (5, {"k": ERRORED})])
    assert "k" not in rounds


def test_regreen_after_red_reverifies():
    rounds = _load_verified_rounds(
        [(3, {"k": GREEN}), (4, {"k": RED}), (6, {"k": GREEN})]
    )
    assert rounds["k"] == 6


def test_report_order_is_by_round_not_list_position():
    rounds = _load_verified_rounds([(5, {"k": GREEN}), (3, {"k": RED})])
    assert rounds["k"] == 5


def test_r1_seed_demoted_by_later_red():
    rounds = _load_verified_rounds([(4, {"q_full_scan": RED})])
    assert "q_full_scan" not in rounds
    # untouched seed keys keep round 1
    assert rounds["q_projection"] == 1


def test_rows_only_history_with_new_oracle_demotes():
    """Round-7: a key verified only rows-only that NOW declares an oracle
    re-enters the window unverified — the stronger check never ran."""
    rounds = _load_verified_rounds([(6, {"q_grouped_pandas": ROWS_ONLY})])
    assert "q_grouped_pandas" not in rounds


def test_hash_green_history_with_oracle_stays_verified():
    rounds = _load_verified_rounds([(6, {"q_grouped_pandas": GREEN})])
    assert rounds["q_grouped_pandas"] == 6
