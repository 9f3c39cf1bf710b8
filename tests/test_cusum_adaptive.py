"""EWMA-referenced CUSUM: the closed form must equal the sequential
textbook fold S_t = max(0, S_{t-1} + d_t) with the time-varying
EWMA-predicted reference, for both arms."""

import datetime
import random

import pytest
from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import (
    timeseries,
)

UNIT = 10**6


def py_adaptive(counts, alpha_num=1, alpha_den=4, lookback=8, mult=4):
    """Sequential reference: integer EWMA + the textbook CUSUM folds.
    counts: ordered list of ints. Returns per-row dict."""
    r = alpha_den - alpha_num
    weights = [r**i * alpha_den ** (lookback - i) for i in range(lookback + 1)]
    qs = [c * UNIT for c in counts]
    ew = []
    for t in range(len(qs)):
        num = den = 0
        for i, w in enumerate(weights):
            if t - i >= 0:
                num += qs[t - i] * w
                den += w
        ew.append(num // den)  # non-negative: // == truncating DIV
    n, total = len(counts), sum(counts)
    s = s_dn = 0
    out = []
    for t in range(len(qs)):
        d = 0 if t == 0 else qs[t] - ew[t - 1]
        s = max(0, s + d)
        s_dn = max(0, s_dn - d)
        out.append(
            dict(
                pred=None if t == 0 else ew[t - 1] / UNIT,
                s=s,
                s_dn=s_dn,
                alarm=int(n * s >= mult * total * UNIT),
                alarm_dn=int(n * s_dn >= mult * total * UNIT),
            )
        )
    return out


def _hc(spark, counts, group="a"):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (group, t0 + datetime.timedelta(hours=i), c) for i, c in enumerate(counts)
    ]
    return spark.createDataFrame(rows, "event_type string, hr timestamp, cnt bigint")


def test_adaptive_cusum_matches_sequential_fold(spark):
    rng = random.Random(13)
    # trend + a level break at hour 60: the adaptive chart must absorb
    # the trend (EWMA tracks it) and alarm on the break
    counts = [20 + i // 4 + rng.randint(-3, 3) for i in range(60)]
    counts += [120 + rng.randint(-3, 3) for _ in range(20)]
    got = (
        timeseries.cusum_adaptive_from_counts(_hc(spark, counts))
        .orderBy("hr")
        .collect()
    )
    want = py_adaptive(counts)
    assert len(got) == len(counts)
    for g, w, c in zip(got, want, counts):
        assert g.cnt == c
        assert int(g.cusum_units) == w["s"]
        assert int(g.cusum_down_units) == w["s_dn"]
        assert g.is_alarm == w["alarm"]
        assert g.is_alarm_down == w["alarm_dn"]
        if w["pred"] is None:
            assert g.ewma_pred is None
        else:
            assert g.ewma_pred == pytest.approx(w["pred"], abs=1e-12)
    # the break is caught
    assert any(g.is_alarm for g in got[60:])
    # the pure trend section never alarms (EWMA absorbs it)
    assert not any(g.is_alarm for g in got[:60])


def test_adaptive_cusum_downward_break_and_groups(spark):
    rng = random.Random(7)
    a = [100 + rng.randint(-5, 5) for _ in range(40)] + [5] * 25
    b = [50 + rng.randint(-2, 2) for _ in range(50)]
    df = _hc(spark, a, "a").unionByName(_hc(spark, b, "b"))
    got = timeseries.cusum_adaptive_from_counts(df).orderBy("event_type", "hr")
    rows = got.collect()
    ga = [r for r in rows if r.event_type == "a"]
    gb = [r for r in rows if r.event_type == "b"]
    wa, wb = py_adaptive(a), py_adaptive(b)
    assert [int(r.cusum_down_units) for r in ga] == [w["s_dn"] for w in wa]
    assert [int(r.cusum_units) for r in gb] == [w["s"] for w in wb]
    assert any(r.is_alarm_down for r in ga[40:])  # outage caught
    assert not any(r.is_alarm or r.is_alarm_down for r in gb)  # steady: quiet


def test_adaptive_cusum_validation(spark):
    df = _hc(spark, [1, 2, 3])
    with pytest.raises(ValueError):
        timeseries.cusum_adaptive_from_counts(df, alarm_mean_mult=0)
    with pytest.raises(ValueError):
        timeseries.cusum_adaptive_from_counts(df, alpha_num=4, alpha_den=4)
    with pytest.raises(ValueError):
        timeseries.cusum_adaptive_from_counts(df, lookback=0)
    with pytest.raises(ValueError):
        timeseries.cusum_adaptive_from_counts(df, group_cols=("cusum_units",))
