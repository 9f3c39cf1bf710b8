"""Physical-plan shape guards for the sixth-session operators: the
one-exchange contracts (OHLC, EWMA, debounce), the broadcast contracts
(MAD fences, quantile-bin edges, skyline prefix offsets), and the
hot-value skew immunity of the order-statistics backbone."""

import os

from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import relational, timeseries
from probability_of_buying_two_products_together_hadoop_project_spark.plans import explain


def _events(spark, sf_smoke):
    import __spark_entry__  # noqa: F401  (registry's _t handles ts variants)
    from probability_of_buying_two_products_together_hadoop_project_spark import registry

    return registry._t(spark, sf_smoke, "events")


def test_ohlc_single_exchange(spark, sf_smoke):
    """Rank windows and final agg share the (type, hour) partitioning."""
    df = timeseries.ohlc(_events(spark, sf_smoke))
    n = explain.count_exchanges(df)
    assert n == 1, f"ohlc must be exactly 1 exchange, got {n}"


def test_ewma_single_exchange(spark, sf_smoke):
    """9 lag columns, ONE window spec, one user_id exchange."""
    df = timeseries.ewma_bounded(_events(spark, sf_smoke))
    n = explain.count_exchanges(df)
    assert n == 1, f"ewma must be exactly 1 exchange, got {n}"


def test_debounce_single_exchange(spark, sf_smoke):
    """Group collect + fold: one (user, type) exchange, nothing else."""
    df = timeseries.debounce(_events(spark, sf_smoke))
    n = explain.count_exchanges(df)
    assert n == 1, f"debounce must be exactly 1 exchange, got {n}"


def test_mad_broadcasts_fences(spark, sf_smoke):
    df = relational.mad_outlier_stats(
        _events(spark, sf_smoke).select("event_type", "value"),
        ["event_type"],
        "value",
    )
    assert explain.has_broadcast_join(df)


def test_quantile_bins_broadcasts_edges(spark, sf_smoke):
    orders = spark.read.parquet(os.path.join(sf_smoke, "orders.parquet"))
    df = relational.quantile_bins(
        orders.select("o_totalprice"),
        "o_totalprice",
        bucket_expr=F.floor(F.col("o_totalprice") / F.lit(10000.0)),
    )
    assert explain.has_broadcast_join(df)


def test_skyline_broadcasts_prefix_offsets(spark, sf_smoke):
    orders = spark.read.parquet(os.path.join(sf_smoke, "orders.parquet"))
    df = relational.skyline_min2(
        orders.select("o_orderkey", "o_totalprice", "o_orderdate"),
        "o_totalprice",
        "o_orderdate",
        bucket_expr=F.floor(F.col("o_totalprice") / F.lit(10000.0)),
    )
    assert explain.has_broadcast_join(df)


def test_grouped_value_cum_hot_value_immune(spark):
    """A value holding 50% of the rows collapses to ONE distinct-value
    row before any window sees it — the duplicate mass rides the
    map-side count agg, so no window partition inflates."""
    rows = [("g", 7.0)] * 5000 + [("g", float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, ["grp", "v"])
    out = relational.grouped_value_cum(df, ["grp"], "v")
    got = {r["v"]: (r["cc"], r["n"]) for r in out.collect()}
    assert len(got) == 100  # 7.0 appears once among the distinct values
    assert got[7.0] == (5000 + 8, 5100)  # 0..7 precede it: 8 values


def test_kmv_sample_bounded_window_partitions(spark):
    """The tournament's first window partitions by (group, h mod
    n_buckets): the plan must hash on the bucket column, never on the
    bare group (which would funnel a hot group's distinct keys)."""
    from probability_of_buying_two_products_together_hadoop_project_spark.operators import sketches

    df = spark.createDataFrame(
        [("g", f"k{i}") for i in range(1000)], ["grp", "key"]
    )
    plan = explain.formatted_plan(
        sketches.kmv_sample(df, "key", ["grp"], k=8, n_buckets=64)
    )
    assert "pmod" in plan


def test_observe_metrics_surface(spark, sf_smoke):
    """DataFrame.observe(): accumulator-style metrics ride the normal
    action without a second scan — the monitoring surface a pipeline
    wraps around every stage."""
    from pyspark.sql import Observation

    obs = Observation("orders_metrics")
    orders = spark.read.parquet(os.path.join(sf_smoke, "orders.parquet"))
    df = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("total"),
        F.max("o_orderdate").alias("latest"),
    )
    n_rows = df.count()
    got = obs.get
    assert got["n"] == n_rows
    assert got["total"] > 0 and got["latest"] is not None
