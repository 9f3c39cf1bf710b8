"""Debounce (greedy throttle fold), burst detection, lag-1
autocorrelation, and KMV merge-vs-rebuild equivalence — python
references drive each contract."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import sketches, timeseries

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


def _py_debounce(times, gap):
    kept, last = [], None
    for i, t in enumerate(sorted(times)):
        if last is None or t - last >= gap:
            kept.append(i)
            last = t
    return kept


steps = st.lists(st.integers(min_value=0, max_value=10), min_size=1, max_size=30)


@given(steps)
@SET
def test_debounce_matches_greedy_python(spark, deltas):
    gap = 5
    times = []
    t = 0
    for d in deltas:
        t += d
        times.append(t)
    times = sorted(set(times))  # unique micros; ties would need id order
    rows = [(i, "u", "view", t_us) for i, t_us in enumerate(times)]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "t_us"]
    ).withColumn("ts", F.timestamp_micros("t_us"))
    got = sorted(
        r["event_id"]
        for r in timeseries.debounce(df, gap_us=gap).collect()
    )
    want = _py_debounce(times, gap)
    assert got == want


def test_debounce_beats_raw_lag_on_steady_drip(spark):
    # events every 3 us, gap 5: greedy keeps 0,6,12,...; raw-lag keeps only 0
    rows = [(i, "u", "view", i * 3) for i in range(10)]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "t_us"]
    ).withColumn("ts", F.timestamp_micros("t_us"))
    got = sorted(r["event_id"] for r in timeseries.debounce(df, gap_us=5).collect())
    assert got == [0, 2, 4, 6, 8]  # t=0,6,12,18,24 -> every 2nd event


def test_burst_detect_gap_and_flag_semantics(spark):
    base = 3_600_000_000
    rows = (
        [(i, "u", "view", 0 * base + i) for i in range(4)]
        + [(10 + i, "u", "view", 1 * base + i) for i in range(8)]
        + [(20 + i, "u", "view", 3 * base + i) for i in range(2)]  # gap hour 2
    )
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "t_us"]
    ).withColumn("ts", F.timestamp_micros("t_us"))
    out = {
        r["hr"].hour: (r["cnt"], r["prev_cnt"], r["is_burst"])
        for r in timeseries.burst_detect(df).collect()
    }
    assert out[0] == (4, None, None)  # first bucket: no baseline
    assert out[1] == (8, 4, 1)  # 8 >= 2*4 -> burst
    assert out[3] == (2, None, None)  # hour 2 silent -> no comparison


def _py_cusum_scaled(counts):
    """The textbook SEQUENTIAL fold, scaled by n — the ground truth the
    prefix-min closed form must reproduce exactly."""
    n, total = len(counts), sum(counts)
    s, out = 0, []
    for c in counts:
        s = max(0, s + (n * c - total))
        out.append(s)
    return out


@given(st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=24))
@SET
def test_cusum_prefix_min_identity_matches_fold(spark, counts):
    base = 3_600_000_000
    rows = []
    eid = 0
    for h, c in enumerate(counts):
        for j in range(c):
            rows.append((eid, "u", "view", h * base + j))
            eid += 1
    if not rows:
        return  # all-zero hours produce no events at all
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "t_us"]
    ).withColumn("ts", F.timestamp_micros("t_us"))
    got = {
        r["hr"].hour: int(r["cusum_scaled"])
        for r in timeseries.cusum_detect(df).collect()
    }
    observed = [(h, c) for h, c in enumerate(counts) if c > 0]
    want = _py_cusum_scaled([c for _, c in observed])
    assert got == {h: w for (h, _), w in zip(observed, want)}


def test_cusum_planted_level_shift_alarms(spark):
    """10 quiet hours at 2/hr then 6 loud hours at 30/hr: the chart must
    stay silent through the quiet regime and alarm inside the loud one."""
    counts = [2] * 10 + [30] * 6
    base = 3_600_000_000
    rows = []
    eid = 0
    for h, c in enumerate(counts):
        for j in range(c):
            rows.append((eid, "u", "view", h * base + j))
            eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "t_us"]
    ).withColumn("ts", F.timestamp_micros("t_us"))
    out = {
        r["hr"].hour: (int(r["cusum_scaled"]), r["is_alarm"], r["cusum_means"])
        for r in timeseries.cusum_detect(df, alarm_mean_mult=4).collect()
    }
    n, total = len(counts), sum(counts)
    # quiet regime: statistic pinned at 0 (counts below the global mean)
    for h in range(10):
        assert out[h] == (0, 0, 0.0)
    # loud regime accumulates; the alarm fires once cumulative excess
    # reaches 4 hourly means and stays on
    fired = [h for h in range(10, 16) if out[h][1] == 1]
    assert fired and fired == list(range(min(fired), 16))
    # exact threshold semantics: scaled stat vs 4 * total (= 4 means
    # in n-scaled units), means column = scaled / total
    assert n == len(counts)
    for h in range(10, 16):
        assert out[h][1] == (1 if out[h][0] >= 4 * total else 0)
        assert out[h][2] == out[h][0] / float(total)


def test_cusum_validation():
    import pytest

    with pytest.raises(ValueError):
        timeseries.cusum_detect(None, alarm_mean_mult=0)


def test_autocorr_matches_python_reference(spark):
    counts = [5, 7, 6, 9, 4, 8, 10, 3]
    base = 3_600_000_000
    rows = []
    eid = 0
    for h, c in enumerate(counts):
        for j in range(c):
            rows.append((eid, "u", "view", h * base + j))
            eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "t_us"]
    ).withColumn("ts", F.timestamp_micros("t_us"))
    row = timeseries.autocorr_lag1(df).collect()[0]
    xs, ys = counts[:-1], counts[1:]
    n = float(len(xs))
    sx, sy = float(sum(xs)), float(sum(ys))
    sxy = float(sum(a * b for a, b in zip(xs, ys)))
    sxx, syy = float(sum(a * a for a in xs)), float(sum(b * b for b in ys))
    want = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert row["n_pairs"] == len(xs)
    assert row["autocorr_lag1"] == want


def test_autocorr_constant_series_is_null_not_nan(spark):
    rows = [(i, "u", "view", h * 3_600_000_000 + i) for h in range(5) for i in range(3)]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "t_us"]
    ).withColumn("ts", F.timestamp_micros("t_us"))
    row = timeseries.autocorr_lag1(df).collect()[0]
    assert row["autocorr_lag1"] is None


@given(st.integers(min_value=0, max_value=400), st.integers(min_value=0, max_value=400))
@SET
def test_kmv_merge_equals_full_rebuild(spark, n_a, n_b):
    k = 16
    a_keys = [f"a{i}" for i in range(n_a)]
    b_keys = [f"b{i}" for i in range(n_b)] + a_keys[: n_a // 2]  # overlap
    if not a_keys and not b_keys:
        return
    # explicit schema: the None-placeholder fallback cannot infer the key
    # type when hypothesis draws an empty side (n_a=0 falsifying example)
    schema = "grp string, key string"
    da = spark.createDataFrame([("g", x) for x in a_keys], schema)
    db = spark.createDataFrame([("g", x) for x in b_keys], schema)
    full = spark.createDataFrame([("g", x) for x in a_keys + b_keys], schema)
    sa = sketches.kmv_sample(da, "key", ["grp"], k=k)
    sb = sketches.kmv_sample(db, "key", ["grp"], k=k)
    merged = sketches.kmv_estimate(
        sketches.kmv_merge_samples(sa, sb, ["grp"], k=k), ["grp"], k=k
    ).collect()
    direct = sketches.kmv_distinct(full, "key", ["grp"], k=k).collect()
    assert [tuple(r) for r in merged] == [tuple(r) for r in direct]


def test_ohlc_tie_contract_and_aggregates(spark):
    from probability_of_buying_two_products_together_hadoop_project_spark.operators import timeseries as ts_ops

    base = 3_600_000_000
    rows = [
        # hour 0: two events at the SAME timestamp -> id breaks the tie
        (2, "u", "view", 100, 5.0),
        (1, "u", "view", 100, 3.0),   # open: id 1 -> 3.0
        (3, "u", "view", 200, 9.0),
        (4, "u", "view", 200, 1.0),   # close: same t, larger id -> 1.0
        # hour 1: single event
        (5, "u", "view", base + 7, 4.5),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "t_us", "value"]
    ).withColumn("ts", F.timestamp_micros("t_us"))
    out = {r["bkt"].hour: r for r in ts_ops.ohlc(df).collect()}
    h0 = out[0]
    assert (h0["open"], h0["high"], h0["low"], h0["close"], h0["volume"]) == (
        3.0, 9.0, 1.0, 1.0, 4,
    )
    h1 = out[1]
    assert (h1["open"], h1["close"], h1["volume"]) == (4.5, 4.5, 1)


def _py_theilsen(counts_by_hour):
    pts = sorted(counts_by_hour.items())
    slopes = []
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            (x1, y1), (x2, y2) = pts[i], pts[j]
            slopes.append(((y2 - y1) / (x2 - x1), x1, x2))
    slopes.sort()
    return len(slopes), slopes[(len(slopes) + 1) // 2 - 1][0]


def test_theilsen_matches_reference_and_resists_outlier(spark):
    # linear trend 3/hr with one wild outlier bucket
    counts = {h: 10 + 3 * h for h in range(10)}
    counts[5] = 500
    base = 3_600_000_000
    rows = []
    eid = 0
    for h, c in counts.items():
        for j in range(c):
            rows.append((eid, "u", "view", h * base + j))
            eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "t_us"]
    ).withColumn("ts", F.timestamp_micros("t_us"))
    row = timeseries.theilsen_trend(df).collect()[0]
    n_want, want = _py_theilsen(counts)
    assert row.n_pairs == n_want == 45
    assert row.trend_per_hour == want
    # robustness: the median slope stays near the true 3/hr despite the
    # outlier (least-squares beta would be pulled far off)
    assert 2.0 <= row.trend_per_hour <= 4.5


def test_theilsen_single_bucket_emits_nothing(spark):
    rows = [(i, "u", "view", i) for i in range(5)]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "t_us"]
    ).withColumn("ts", F.timestamp_micros("t_us"))
    assert timeseries.theilsen_trend(df).count() == 0


def test_cusum_downward_arm_detects_drop(spark):
    """10 loud hours then 6 quiet ones: the DOWNWARD arm (outage
    detection) must alarm in the quiet regime while the upward arm
    alarms in the loud one — and both equal their sequential folds."""
    counts = [30] * 10 + [2] * 6
    base = 3_600_000_000
    rows = []
    eid = 0
    for h, c in enumerate(counts):
        for j in range(c):
            rows.append((eid, "u", "view", h * base + j))
            eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "t_us"]
    ).withColumn("ts", F.timestamp_micros("t_us"))
    out = {
        r["hr"].hour: (int(r["cusum_down_scaled"]), r["is_alarm_down"],
                       r["is_alarm"])
        for r in timeseries.cusum_detect(df, alarm_mean_mult=4).collect()
    }
    n, total = len(counts), sum(counts)
    # sequential fold for the downward arm, n-scaled
    s, want = 0, {}
    for h, c in enumerate(counts):
        s = max(0, s + (total - n * c))
        want[h] = s
    assert {h: v[0] for h, v in out.items()} == want
    # the drop alarms (downward) and the loud start does not
    assert any(out[h][1] == 1 for h in range(10, 16))
    assert all(out[h][1] == 0 for h in range(3))
    for h, v in out.items():
        assert v[1] == (1 if v[0] >= 4 * total else 0)
