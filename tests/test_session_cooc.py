"""Tests for sessionized co-occurrence and the z-score anomaly screen."""

import datetime as dt

from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import basket, relational


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )


def _sessions_pairs(spark, ev, gap=1800):
    s = relational.sessionize(ev, "user_id", "ts", gap, "event_id")
    item = F.struct(
        F.unix_micros(F.col("ts")).alias("t"),
        F.col("event_id").alias("e"),
        F.col("event_type").alias("v"),
    )
    baskets = s.groupBy("user_id", "session_id").agg(
        F.transform(F.array_sort(F.collect_list(item)), lambda x: x["v"]).alias(
            "items"
        )
    )
    return basket.cooccurrence_pairs(baskets.select("items"))


def test_session_boundary_breaks_pairs(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0)
    # user 1: A B within one session, then (2h later, new session) C D.
    rows = [
        (1, t0, 1, "A"),
        (2, t0 + dt.timedelta(minutes=1), 1, "B"),
        (3, t0 + dt.timedelta(hours=2), 1, "C"),
        (4, t0 + dt.timedelta(hours=2, minutes=1), 1, "D"),
    ]
    got = {
        (r.item, r.neighbor): (r.pair_cnt, r.prob)
        for r in _sessions_pairs(spark, _ev(spark, rows)).collect()
    }
    # cross-session pairs (A,C), (B,D) etc. must NOT appear
    assert got == {("A", "B"): (1, 1.0), ("C", "D"): (1, 1.0)}


def test_session_pairs_window_truncation(spark):
    # within one session: A B A C -> A pairs with B only (window stops
    # before A's re-occurrence), then the second A pairs with C; B pairs
    # with A and C.
    t0 = dt.datetime(2024, 1, 1, 12, 0)
    seq = ["A", "B", "A", "C"]
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 7, v) for i, v in enumerate(seq)
    ]
    got = {
        (r.item, r.neighbor): r.pair_cnt
        for r in _sessions_pairs(spark, _ev(spark, rows)).collect()
    }
    assert got == {
        ("A", "B"): 1,
        ("A", "C"): 1,
        ("B", "A"): 1,
        ("B", "C"): 1,
    }


def test_anomaly_zscore_flags_planted_outlier(spark, tmp_path):
    import math

    from probability_of_buying_two_products_together_hadoop_project_spark.registry import REGISTRY

    # 100 values at ~50 plus one huge outlier, written as an events table
    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, i % 60), i, "click", 50.0 + (i % 5), "{}")
        for i in range(100)
    ]
    rows.append((999, dt.datetime(2024, 1, 2), 999, "click", 5000.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = REGISTRY["anomaly_zscore_events"].fn(spark, str(tmp_path)).collect()
    assert [r.event_id for r in out] == [999]
    # z of the outlier against exact moments
    vals = [50.0 + (i % 5) for i in range(100)] + [5000.0]
    n = len(vals)
    mean = sum(vals) / n
    var = sum(v * v for v in vals) / n - mean * mean
    assert abs(out[0].zscore - (5000.0 - mean) / math.sqrt(var)) < 1e-9
