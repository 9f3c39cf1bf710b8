"""Bounded-lookback fixed-point EWMA: python-reference parity, weight
normalization at sequence heads, and the smoothing-direction sanity the
closed form must preserve."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from probability_of_buying_two_products_together_hadoop_project_spark.operators import timeseries

A_NUM, A_DEN, L, UNIT = 1, 4, 8, 10**6
WEIGHTS = [(A_DEN - A_NUM) ** i * A_DEN ** (L - i) for i in range(L + 1)]


def _py_ewma(vals):
    import math

    out = []
    qs = [int(math.floor(v * UNIT)) for v in vals]
    for t in range(len(qs)):
        num = den = 0
        for i, w in enumerate(WEIGHTS):
            if t - i >= 0:
                num += w * qs[t - i]
                den += w
        out.append((num // den) / UNIT)
    return out


series = st.lists(
    st.floats(min_value=0.0, max_value=500.0, allow_nan=False, width=32),
    min_size=1,
    max_size=40,
)


@given(series)
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_ewma_matches_python_reference(spark, vals):
    vals = [float(v) for v in vals]
    rows = [(i, i, "u", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["ts", "event_id", "user_id", "value"])
    got = [
        r["ewma"]
        for r in timeseries.ewma_bounded(df)
        .orderBy("event_id")
        .collect()
    ]
    assert got == _py_ewma(vals)


def test_ewma_first_row_is_own_value_quantized(spark):
    df = spark.createDataFrame(
        [(0, 0, "u", 3.25), (1, 1, "u", 3.25)],
        ["ts", "event_id", "user_id", "value"],
    )
    got = [r["ewma"] for r in timeseries.ewma_bounded(df).orderBy("event_id").collect()]
    assert got[0] == 3.25  # single lag present -> weight cancels exactly
    assert got[1] == 3.25  # constant series is a fixed point


def test_ewma_tracks_level_shift_monotonically(spark):
    vals = [0.0] * 10 + [100.0] * 10
    rows = [(i, i, "u", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["ts", "event_id", "user_id", "value"])
    got = [r["ewma"] for r in timeseries.ewma_bounded(df).orderBy("event_id").collect()]
    after = got[10:]
    assert all(b >= a for a, b in zip(after, after[1:]))
    assert 0.0 < after[0] < 100.0
    # lookback-8: by the 9th post-shift row every lag is 100 -> exact level
    assert after[-1] == 100.0
