"""Hypothesis properties for the round-8 numeric operators — pure-Python
twins of the Column expressions, fuzzed over adversarial inputs (the
Spark-vs-oracle hash match pins cross-engine agreement; these pin the
MATH itself)."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

FLOATS = st.floats(
    min_value=-1.0, max_value=1.0, allow_nan=False, allow_infinity=False
)


@given(
    vec=st.lists(FLOATS, min_size=1, max_size=64).filter(
        # the real column is float32: denormal doubles (scale underflow)
        # can't occur there
        lambda v: max((abs(x) for x in v), default=0) > 1e-6
    )
)
@settings(max_examples=200, deadline=None)
def test_int8_quantization_roundtrip_bound(vec):
    """Codes fit int8 and every reconstruction error is ≤ scale/2 — the
    invariant q_embedding_quantize's SSE accounting relies on."""
    scale = max(abs(x) for x in vec) / 127.0
    for x in vec:
        code = math.floor(abs(x) / scale + 0.5) * (1 if x >= 0 else -1)
        assert -127 <= code <= 127
        assert abs(x - code * scale) <= scale / 2 + 1e-12


@given(
    series=st.lists(
        st.floats(min_value=0.0, max_value=100.0, allow_nan=False), min_size=1, max_size=30
    )
)
@settings(max_examples=200, deadline=None)
def test_ewma_lag_form_is_convex_and_tracks_constants(series):
    """The bounded 8-lag EWMA is a convex combination of the window values
    (stays inside [min, max] of the last 8) and is exact on constants."""
    alpha = 0.5
    w = [(1 - alpha) ** i for i in range(8)]
    for t in range(len(series)):
        window = series[max(0, t - 7) : t + 1][::-1]  # newest first
        num = sum(wi * x for wi, x in zip(w, window))
        den = sum(w[: len(window)])
        ewma = num / den
        assert min(window) - 1e-9 <= ewma <= max(window) + 1e-9
    if len(set(series)) == 1:
        assert abs(ewma - series[0]) < 1e-9


@given(
    a=st.lists(st.integers(0, 50), min_size=1, max_size=40),
    b=st.lists(st.integers(0, 50), min_size=1, max_size=40),
)
@settings(max_examples=200, deadline=None)
def test_ks_integer_form_matches_float_ecdf(a, b):
    """The integer comparison |cum1·n2 − cum2·n1| selects exactly the same
    D as the float ECDF difference — the q_ks_test exactness claim."""
    grid = sorted(set(a) | set(b))
    n1, n2 = len(a), len(b)
    cum1 = cum2 = 0
    best_int = 0
    best_float = 0.0
    for v in grid:
        cum1 += sum(1 for x in a if x == v)
        cum2 += sum(1 for x in b if x == v)
        best_int = max(best_int, abs(cum1 * n2 - cum2 * n1))
        best_float = max(best_float, abs(cum1 / n1 - cum2 / n2))
    assert abs(best_int / (n1 * n2) - best_float) < 1e-12


@given(xs=st.lists(st.integers(0, 10_000), min_size=2, max_size=60))
@settings(max_examples=200, deadline=None)
def test_gini_rank_form_bounds_and_invariance(xs):
    """Rank-form Gini stays in [0, 1), is 0 for constant corpora, and is
    scale-invariant — the q_gini axioms."""
    if sum(xs) == 0:
        return
    def gini(values):
        s = sorted(values)
        n = len(s)
        srx = sum((i + 1) * x for i, x in enumerate(s))
        return (2.0 * srx) / (n * sum(s)) - (n + 1.0) / n

    g = gini(xs)
    assert -1e-9 <= g < 1
    if len(set(xs)) == 1:
        assert abs(g) < 1e-9
    assert abs(gini([x * 3 for x in xs]) - g) < 1e-9


@given(
    weights=st.lists(st.integers(1, 20), min_size=2, max_size=20),
    d=st.integers(1, 1000),
    values=st.data(),
)
@settings(max_examples=100, deadline=None)
def test_time_weighted_avg_reduces_to_plain_avg_on_equal_gaps(weights, d, values):
    """With ALL segment durations equal to a drawn constant d the
    duration-weighted formula sum(v*d)/(d*n) must reduce to the plain mean
    of the held values (the q_time_weighted_avg sanity axiom), and the TWA
    must be invariant to rescaling every duration by the same factor —
    both exercised through the weighted formula itself, not an identical
    re-derivation (ADVICE r8: the old form compared a value to itself)."""
    vals = [values.draw(st.floats(0, 100, allow_nan=False)) for _ in weights]
    n = len(vals)
    twa_equal = sum(v * d for v in vals) / (d * n)
    plain_mean = sum(vals) / n
    assert abs(twa_equal - plain_mean) < 1e-6
    twa = sum(v * w for v, w in zip(vals, weights)) / sum(weights)
    twa_scaled = sum(v * w * d for v, w in zip(vals, weights)) / sum(
        w * d for w in weights
    )
    assert abs(twa - twa_scaled) < 1e-6
    assert min(vals) - 1e-9 <= twa <= max(vals) + 1e-9
