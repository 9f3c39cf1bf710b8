"""Hypothesis property tests for the round-8 exact statistics: W1,
Mann-Whitney, isotonic PAV and the span island-merge — randomized
multisets drive both the Spark operators and independent pure-Python
simulators (the test_basket_properties pattern)."""

import math
from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import (
    dedup,
    evaluation,
)

small_ints = st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=60)


def py_w1_frac(xs, ys):
    n1, n2 = len(xs), len(ys)
    vals = sorted(set(xs) | set(ys))
    cc1 = cc2 = num = 0
    for v, nv in zip(vals[:-1], vals[1:]):
        cc1 += xs.count(v)
        cc2 += ys.count(v)
        num += abs(cc1 * n2 - cc2 * n1) * (nv - v)
    return num


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(small_ints, small_ints)
def test_w1_property(spark, xs, ys):
    rows = [(v, True) for v in xs] + [(v, False) for v in ys]
    df = spark.createDataFrame(rows, "v bigint, s boolean")
    r = evaluation.wasserstein_two_sample(df, "v", F.col("s")).collect()[0]
    assert int(r.w1_num) == py_w1_frac(xs, ys)
    assert (r.n1, r.n2) == (len(xs), len(ys))
    # metric properties on the exact rational: symmetry + identity
    rows_sw = [(v, False) for v in xs] + [(v, True) for v in ys]
    r2 = evaluation.wasserstein_two_sample(
        spark.createDataFrame(rows_sw, "v bigint, s boolean"), "v", F.col("s")
    ).collect()[0]
    assert r2.w1_num == r.w1_num


def py_mw(xs, ys):
    from collections import Counter

    cnt = Counter(xs + ys)
    n1 = len(xs)
    r1x2 = cum = tie = 0
    for v in sorted(cnt):
        t = cnt[v]
        r1x2 += xs.count(v) * (2 * cum + t + 1)
        tie += t**3 - t
        cum += t
    return r1x2, r1x2 - n1 * (n1 + 1), tie


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(small_ints, small_ints)
def test_mw_property(spark, xs, ys):
    rows = [(v, True) for v in xs] + [(v, False) for v in ys]
    df = spark.createDataFrame(rows, "v int, s boolean")
    r = evaluation.mann_whitney_u(df, "v", F.col("s")).collect()[0]
    r1x2, u1x2, tie = py_mw(xs, ys)
    assert int(r.r1_x2) == r1x2 and int(r.u1_x2) == u1x2
    assert int(r.tie_cubes) == tie
    # U1 + U2 = 2*n1*n2 always (doubled)
    assert int(r.u1_x2) + int(r.u2_x2) == 2 * len(xs) * len(ys)
    # rank sums bound: n1(n1+1) <= 2R1 <= n1(n1+2n2+1)
    n1, n2 = len(xs), len(ys)
    assert n1 * (n1 + 1) <= r1x2 <= n1 * (n1 + 2 * n2 + 1)


def py_pav_frac(pairs):
    stack = []
    for b, n, s in pairs:
        stack.append([n, s, [b]])
        while len(stack) >= 2 and Fraction(stack[-2][1], stack[-2][0]) >= Fraction(
            stack[-1][1], stack[-1][0]
        ):
            n2, s2, b2 = stack.pop()
            stack[-1][0] += n2
            stack[-1][1] += s2
            stack[-1][2].extend(b2)
    return {b: Fraction(s, n) for n, s, bs in stack for b in bs}


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(1, 12), st.integers(0, 12)).filter(lambda p: p[1] <= p[0]),
        min_size=1,
        max_size=10,
    )
)
def test_isotonic_property(spark, bins):
    # bins[i] = (n, s) with s <= n; bin ids are positions
    rows = []
    for b, (n, s) in enumerate(bins):
        rows += [(b, 1)] * s + [(b, 0)] * (n - s)
    df = spark.createDataFrame(rows, "b int, y int")
    got = {
        r.bin: r.fitted
        for r in evaluation.isotonic_fit_bins(df, F.col("b"), F.col("y")).collect()
    }
    want = py_pav_frac([(b, n, s) for b, (n, s) in enumerate(bins)])
    assert set(got) == set(want)
    for b in want:
        assert math.isclose(got[b], float(want[b]), rel_tol=1e-12, abs_tol=1e-15)
    fitted = [got[b] for b in sorted(got)]
    assert all(a <= c + 1e-15 for a, c in zip(fitted, fitted[1:]))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(1, 60), min_size=1, max_size=25, unique=True),
    st.integers(2, 8),
)
def test_span_merge_property(spark, positions, gram):
    """merge_position_spans == interval union of [p, p+gram-1]."""
    df = spark.createDataFrame([(1, p) for p in positions], "_id bigint, _pos int")
    got = {
        (r.span_start, r.span_end, r.span_len, r.n)
        for r in dedup.merge_position_spans(df, gram, "doc_id", "n").collect()
    }
    # independent interval-union reference
    ivs = sorted((p, p + gram - 1) for p in positions)
    merged = []
    for lo, hi in ivs:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], hi)
            merged[-1][2] += 1
        else:
            merged.append([lo, hi, 1])
    want = {(lo, hi, hi - lo + 1, n) for lo, hi, n in merged}
    assert got == want
