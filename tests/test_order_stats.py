"""Order-statistics operators built on the bucketed parallel prefix-sum:
skyline (Pareto frontier), MAD outlier screen, quantile binning, and the
discrete-quantile backbone — each against an independent brute-force
Python reference, with hypothesis driving the data shapes."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import relational

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)

points = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ),
    min_size=1,
    max_size=60,
)


def _brute_skyline(pts):
    out = []
    for i, (x, y) in enumerate(pts):
        dominated = any(
            (x2 <= x and y2 <= y and (x2 < x or y2 < y))
            for j, (x2, y2) in enumerate(pts)
            if j != i
        )
        if not dominated:
            out.append((x, y))
    return sorted(out)


@given(points)
@SET
def test_skyline_equals_brute_force(spark, pts):
    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    got = sorted(
        (int(r["x"]), int(r["y"]))
        for r in relational.skyline_min2(
            df, "x", "y", bucket_expr=F.floor(F.col("x") / F.lit(8.0))
        ).collect()
    )
    assert got == _brute_skyline(pts)


def _lower_median(vals):
    s = sorted(vals)
    return s[(len(s) + 1) // 2 - 1]


values = st.lists(
    st.floats(min_value=0.0, max_value=100.0, allow_nan=False, width=32),
    min_size=1,
    max_size=50,
)


@given(values)
@SET
def test_mad_matches_python_reference(spark, vals):
    vals = [float(v) for v in vals]
    df = spark.createDataFrame([("g", v) for v in vals], ["grp", "v"])
    row = relational.mad_outlier_stats(df, ["grp"], "v", c=3.0).collect()[0]
    med = _lower_median(vals)
    mad = _lower_median([abs(v - med) for v in vals])
    n_out = sum(1 for v in vals if abs(v - med) > 3.0 * mad)
    assert row["med"] == med
    assert row["mad"] == mad
    assert row["n"] == len(vals)
    assert row["n_outliers"] == n_out


def _py_quantile_bins(vals, n_bins=10):
    s = sorted(vals)
    n = len(s)
    edges = [
        s[-((-i * n) // n_bins) - 1]  # element at ceil(i*n/n_bins), 0-based
        for i in range(1, n_bins)
    ]
    bins = {}
    for v in vals:
        b = 1 + sum(1 for e in edges if v > e)
        lo, hi, c = bins.get(b, (math.inf, -math.inf, 0))
        bins[b] = (min(lo, v), max(hi, v), c + 1)
    return bins


@given(values)
@SET
def test_quantile_bins_match_python_reference(spark, vals):
    vals = [float(v) for v in vals]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = {
        r["bin"]: (r["lo"], r["hi"], r["n_rows"])
        for r in relational.quantile_bins(
            df, "v", n_bins=10, bucket_expr=F.floor(F.col("v") / F.lit(10.0))
        ).collect()
    }
    assert got == _py_quantile_bins(vals)
    assert sum(c for _, _, c in got.values()) == len(vals)


def test_grouped_value_cum_inclusive_counts(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("a", 2.0), ("b", 5.0)], ["g", "v"]
    )
    got = {
        (r["g"], r["v"]): (r["cc"], r["n"])
        for r in relational.grouped_value_cum(df, ["g"], "v").collect()
    }
    assert got == {("a", 1.0): (2, 3), ("a", 2.0): (3, 3), ("b", 5.0): (1, 1)}


@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=50), min_size=1, max_size=60
    )
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_grouped_discrete_quantiles_match_single_picks(spark, vals):
    """The one-scan conditional-aggregate multi-pick must return
    bit-identical values to k independent grouped_discrete_quantile
    calls over the same cum table (the GK-bounds collapse)."""
    rows = [("g1" if v % 2 else "g2", float(v)) for v in vals]
    df = spark.createDataFrame(rows, ["g", "v"])
    cum = relational.grouped_value_cum(df, ["g"], "v")
    qs = [(12, 25, "p48"), (1, 2, "p50"), (9, 10, "p90"), (1, 1, "p100")]
    multi = {
        r["g"]: tuple(r[out] for _, _, out in qs)
        for r in relational.grouped_discrete_quantiles(
            cum, ["g"], "v", qs
        ).collect()
    }
    single = {}
    for num, den, out in qs:
        for r in relational.grouped_discrete_quantile(
            cum, ["g"], "v", num, den, out_col=out
        ).collect():
            single.setdefault(r["g"], []).append(r[out])
    assert multi == {g: tuple(v) for g, v in single.items()}


def test_grouped_discrete_quantiles_unreachable_target_keeps_null_row(spark):
    """Pins the ONE documented contract divergence (ADVICE r12): for a
    target no row can reach (q_num > q_den => rank target > n), the
    single-pick form DROPS the group while the multi-pick form keeps
    the group's row with a NULL pick. Irrelevant for real quantiles
    (targets <= n by construction) — pinned here so a future caller
    can't trip over it silently."""
    df = spark.createDataFrame([("g1", 1.0), ("g1", 2.0)], ["g", "v"])
    cum = relational.grouped_value_cum(df, ["g"], "v")
    single = relational.grouped_discrete_quantile(
        cum, ["g"], "v", 3, 2, out_col="p150"
    ).collect()
    assert single == []  # unreachable target: group drops out
    multi = relational.grouped_discrete_quantiles(
        cum, ["g"], "v", [(1, 2, "p50"), (3, 2, "p150")]
    ).collect()
    assert len(multi) == 1
    assert multi[0]["p50"] == 1.0 and multi[0]["p150"] is None
