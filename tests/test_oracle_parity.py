"""Differential tests: every oracle-declared query key must match DuckDB
exactly (row count + columns + order-insensitive values) — the local twin
of the driver's CORRECTNESS gate, run at sf0.001 for speed. Set
YARK_TEST_SF_DIR=/root/testdata/sf0.01 to run at the gate's scale factor.
"""

import pytest

from tests.oracle_harness import compare_query, duck_connection


def _oracle_keys():
    from yark_spark.queries import ORACLES

    return sorted(ORACLES)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("key", _oracle_keys())
def test_oracle_parity(spark, sf_dir, duck, key):
    compare_query(spark, key, sf_dir, con=duck)


def test_rows_only_keys_run(spark, sf_dir):
    """Keys without an oracle still must run and return a stable schema."""
    from yark_spark.queries import ORACLES, QUERIES

    for key in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[key](spark, sf_dir)
        assert df.columns, key
        assert df.count() >= 0, key


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"n_name", "revenue", "n_lineitems"}
