"""Unit tests for the time-series resample/gap-fill operators.

Hand-built frames with known gaps pin the LOCF and interpolation values
exactly; the composition test pins reaggregate == direct coarse agg.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import timeseries


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def toy(spark):
    # key "a": observations in hours 0, 1, 4 (gaps at 2, 3); hour-1 has
    # two rows so the bucket average is exercised. key "b": single hour.
    rows = [
        ("a", _ts(0, 5), 10.0),
        ("a", _ts(1, 10), 20.0),
        ("a", _ts(1, 40), 30.0),
        ("a", _ts(4, 59), 40.0),
        ("b", _ts(7, 1), 5.0),
    ]
    return spark.createDataFrame(rows, "series_key string, ts timestamp, value double")


def test_gapfill_dense_spine_and_values(toy):
    out = timeseries.resample_gapfill(toy, "series_key", "ts", "value", unit="hour")
    rows = {(r.series_key, r.bucket_ts.hour): r for r in out.collect()}
    # key a: dense hours 0..4 (5 rows); key b: 1 row
    assert len(rows) == 6
    a0, a1, a2, a3, a4 = (rows[("a", h)] for h in range(5))
    assert (a0.n_events, a1.n_events, a2.n_events, a4.n_events) == (1, 2, 0, 1)
    assert a1.avg_value == 25.0
    # gaps: LOCF carries hour-1's average; interpolation walks toward 40
    assert a2.is_gap and a3.is_gap and not a4.is_gap
    assert a2.avg_value is None and a2.locf_value == 25.0
    # hour 2 is 1/3 of the way from hour1 (25.0) to hour4 (40.0)
    assert a2.interp_value == pytest.approx(25.0 + 15.0 / 3, abs=1e-12)
    assert a3.interp_value == pytest.approx(25.0 + 2 * 15.0 / 3, abs=1e-12)
    # observed rows: interp == locf == avg
    assert a4.interp_value == a4.locf_value == a4.avg_value == 40.0
    b = rows[("b", 7)]
    assert b.n_events == 1 and not b.is_gap and b.interp_value == 5.0


def test_gapfill_edges_have_no_interpolation(spark):
    # leading/trailing gaps cannot interpolate: only hours 1 and 3 observed,
    # spine is 1..3 so there is exactly one interior gap.
    df = spark.createDataFrame(
        [("k", _ts(1), 1.0), ("k", _ts(3), 3.0)],
        "series_key string, ts timestamp, value double",
    )
    out = timeseries.resample_gapfill(df, "series_key", "ts", "value").collect()
    assert len(out) == 3
    gap = [r for r in out if r.is_gap]
    assert len(gap) == 1 and gap[0].interp_value == 2.0 and gap[0].locf_value == 1.0


def test_reaggregate_equals_direct(spark, sf_oracle):
    ev = spark.read.parquet(f"{sf_oracle}/events.parquet")
    if dict(ev.dtypes).get("ts") == "timestamp_ntz":
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    hourly = timeseries.bucket_partials(ev, "event_type", "ts", "value", unit="hour")
    composed = timeseries.reaggregate(hourly, unit="day")
    direct = timeseries.bucket_agg(ev, "event_type", "ts", "value", unit="day")
    c = {(r.series_key, r.bucket_ts): (r.n_events, r.avg_value) for r in composed.collect()}
    d = {(r.series_key, r.bucket_ts): (r.n_events, r.avg_value) for r in direct.collect()}
    assert c == d  # bit-equal doubles: decimal partials compose exactly


def test_bad_unit_raises(toy):
    with pytest.raises(ValueError):
        timeseries.resample_gapfill(toy, "series_key", "ts", "value", unit="fortnight")


def test_dau_wau_matches_python(spark, tmp_path):
    import datetime
    import random

    from probability_of_buying_two_products_together_hadoop_project_spark import registry
    from pyspark.sql import functions as F

    rng = random.Random(8)
    base = datetime.datetime(2024, 3, 1)
    rows = [
        (i, rng.randint(0, 30),
         int((base + datetime.timedelta(days=rng.randint(0, 20),
                                        seconds=rng.randint(0, 86399))
              ).timestamp() * 1_000_000),
         "view", 0.0, "{}")
        for i in range(800)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, user_id bigint, tsu bigint, event_type string, "
        "value double, props string",
    ).select(
        "event_id", F.timestamp_micros(F.col("tsu")).alias("ts"), "user_id",
        "event_type", "value", "props",
    )
    df.write.parquet(str(tmp_path / "events.parquet"), mode="overwrite")
    got = {
        r.day.date(): (r.dau, r.wau)
        for r in registry.REGISTRY["dau_wau_events"].fn(spark, str(tmp_path)).collect()
    }
    active = {}
    for _, uid, tsu, *_ in rows:
        d = datetime.datetime.fromtimestamp(tsu / 1_000_000).date()
        active.setdefault(d, set()).add(uid)
    want = {}
    for d, users in active.items():
        wau = set()
        for off in range(7):
            wau |= active.get(d - datetime.timedelta(days=off), set())
        want[d] = (len(users), len(wau))
    assert got == want
