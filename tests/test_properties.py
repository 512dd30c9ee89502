"""Property-based spot checks (SURVEY.md §5.5, hypothesis): invariants the
reference relies on implicitly via PK/UNIQUE constraints."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from yark_spark.operators.writes import insert_ignore, upsert

KEYS = st.integers(min_value=0, max_value=9)
ROWS = st.lists(st.tuples(KEYS, st.integers(min_value=0, max_value=100)), max_size=8)

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _df(spark, rows):
    return spark.createDataFrame(rows or [(None, None)], "k int, v int").filter(
        F.col("k").isNotNull()
    )


@given(existing=ROWS, incoming=ROWS)
@_settings
def test_insert_ignore_idempotent_and_keyed(spark, existing, incoming):
    """f(f(x)) == f(x); result keys = union of input keys; existing rows
    never change."""
    e = _df(spark, existing).dropDuplicates(["k"])
    i = _df(spark, incoming)
    once = insert_ignore(e, i, ["k"])
    twice = insert_ignore(once, i, ["k"])
    got_once = sorted(map(tuple, once.collect()))
    got_twice = sorted(map(tuple, twice.collect()))
    assert got_once == got_twice
    assert {r[0] for r in got_once} == {r[0] for r in e.collect()} | {
        r[0] for r in i.collect()
    }
    kept = dict(map(tuple, e.collect()))
    for k, v in got_once:
        if k in kept:
            assert v == kept[k]


@given(target=ROWS, source=ROWS)
@_settings
def test_upsert_keys_and_idempotence(spark, target, source):
    """Upsert result keys = union; re-applying the same source is a no-op."""
    t = _df(spark, target).dropDuplicates(["k"])
    s = _df(spark, source).dropDuplicates(["k"])
    once = upsert(t, s, ["k"])
    twice = upsert(once, s, ["k"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    assert {r[0] for r in once.collect()} == {r[0] for r in t.collect()} | {
        r[0] for r in s.collect()
    }
    # source wins on matched keys (guard-less upsert)
    src = dict(map(tuple, s.collect()))
    for k, v in map(tuple, once.collect()):
        if k in src:
            assert v == src[k]


@given(rows=st.lists(st.tuples(KEYS, st.sampled_from(["a", "b", "c"])), max_size=10))
@_settings
def test_dedup_stable_under_permutation(spark, rows):
    """Exact dedup representative choice is order-independent."""
    from yark_spark.operators.dedup import exact_dedup

    df1 = spark.createDataFrame(rows or [(0, "a")], "id int, text string")
    df2 = spark.createDataFrame(list(reversed(rows)) or [(0, "a")], "id int, text string")
    r1 = sorted(map(tuple, exact_dedup(df1, ["text"], "id").select("id", "text").collect()))
    r2 = sorted(map(tuple, exact_dedup(df2, ["text"], "id").select("id", "text").collect()))
    assert r1 == r2


_TOKENS = st.lists(
    st.sampled_from([f"w{i}" for i in range(20)]), min_size=0, max_size=30
)


@given(prefix_a=_TOKENS, suffix_a=_TOKENS, prefix_b=_TOKENS, suffix_b=_TOKENS, shared=st.lists(st.sampled_from([f"s{i}" for i in range(40)]), min_size=6, max_size=12))
@_settings
def test_winnowing_shared_substring_guarantee(spark, prefix_a, suffix_a, prefix_b, suffix_b, shared):
    """The MOSS guarantee (Schleimer et al., SIGMOD 2003 §2): two texts
    sharing a run of >= window + gram - 1 = 6 consecutive tokens must share
    at least one winnowing fingerprint, wherever the run sits in either
    text."""
    from yark_spark.functions.text import winnow_fingerprints

    text_a = " ".join(prefix_a + shared + suffix_a)
    text_b = " ".join(prefix_b + shared + suffix_b)
    df = spark.createDataFrame([(1, text_a), (2, text_b)], "id int, text string")
    rows = df.select(
        "id", winnow_fingerprints(F.col("text"), gram=3, window=4).alias("fps")
    ).collect()
    fps = {r.id: set(r.fps) for r in rows}
    assert fps[1] & fps[2], (text_a, text_b)


@given(toks=st.lists(st.sampled_from([f"w{i}" for i in range(10)]), min_size=0, max_size=12))
@_settings
def test_winnowing_short_docs_empty(spark, toks):
    """Docs shorter than window + gram - 1 tokens have no full window and
    must yield an empty fingerprint set (never a partial-window hash)."""
    from yark_spark.functions.text import winnow_fingerprints

    df = spark.createDataFrame([(1, " ".join(toks))], "id int, text string")
    fps = df.select(winnow_fingerprints(F.col("text")).alias("f")).collect()[0].f
    if len(toks) < 6:
        assert fps == []
    else:
        assert len(fps) >= 1
