"""As-of operator equivalence tests + config validation (S9)."""

import datetime as dt

from pyspark.sql import functions as F

from yark_spark.config import JobConfig, load, validate
from yark_spark.operators.asof import asof_join, asof_join_grouped


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "e1"),
            (1, _ts("2024-01-01T12:00:00"), "e2"),
            (2, _ts("2024-01-01T09:00:00"), "e3"),  # before any right row
            (3, _ts("2024-01-01T10:00:00"), "e4"),  # key with no right rows
        ],
        "k long, t timestamp, name string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:30:00"), 10.0),
            (1, _ts("2024-01-01T12:00:00"), 20.0),  # exactly at e2 → visible
            (2, _ts("2024-01-01T09:30:00"), 30.0),
        ],
        "k long, rt timestamp, price double",
    )
    return left, right


EXPECTED = {"e1": 10.0, "e2": 20.0, "e3": None, "e4": None}


def test_asof_union_window(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, "k", "t", "rt", "price")
    got = {r["name"]: r["asof_price"] for r in out.collect()}
    assert got == EXPECTED


def test_asof_grouped_pandas_matches(spark):
    left, right = _frames(spark)
    a = asof_join(left, right, "k", "t", "rt", "price")
    b = asof_join_grouped(left, right, "k", "t", "rt", "price")
    key = lambda df: sorted((r["name"], r["asof_price"]) for r in df.collect())  # noqa: E731
    assert key(a) == key(b)


def test_config_validation_and_reset(tmp_path):
    cfg, problems = validate({"get_comments": True})
    assert problems and cfg == JobConfig()  # missing keys → defaults

    cfg, problems = validate({**JobConfig().__dict__, "shuffle_partitions": "many"})
    assert any("bad type" in p for p in problems) and cfg == JobConfig()

    cfg, problems = validate({**JobConfig().__dict__, "mystery": 1})
    assert any("unknown key" in p for p in problems)

    good = dict(JobConfig().__dict__)
    good["shuffle_partitions"] = 64
    cfg, problems = validate(good)
    assert not problems and cfg.shuffle_partitions == 64

    # load: missing file → defaults persisted (reference reset behavior)
    p = tmp_path / "configs.json"
    cfg, problems = load(str(p))
    assert p.exists() and cfg == JobConfig() and problems
    cfg2, problems2 = load(str(p))
    assert not problems2 and cfg2 == JobConfig()
