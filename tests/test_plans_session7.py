"""Physical-plan shape guards for the seventh-session operators:
exchange-count contracts for the streak/seasonal single-key pipelines,
broadcast contracts for the evaluation operators' reduced-table joins,
and the BFS no-edge-reshuffle contract."""

import os

from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import (  # noqa: E501
    evaluation,
    graph,
    text,
    timeseries,
)
from probability_of_buying_two_products_together_hadoop_project_spark.plans import explain


def _events(spark, sf_smoke):
    from probability_of_buying_two_products_together_hadoop_project_spark import registry

    return registry._t(spark, sf_smoke, "events")


def _docs(spark, sf_smoke):
    return spark.read.parquet(os.path.join(sf_smoke, "documents.parquet"))


def test_seasonal_hourly_two_exchanges(spark, sf_smoke):
    """One (type, hour) bucket agg exchange + one (type, hod) window
    exchange over the REDUCED bucket table — raw events shuffle once."""
    df = timeseries.seasonal_hourly(_events(spark, sf_smoke))
    n = explain.count_exchanges(df)
    assert n == 2, f"seasonal_hourly must be 2 exchanges, got {n}"


def test_activity_streaks_two_exchanges(spark, sf_smoke):
    """Exactly two: the (user, day) distinct — whose partial agg dedups
    MAP-SIDE, so raw events never shuffle whole (a single user-keyed
    exchange would) — then the user re-key for the window, which the
    island and key aggregations both reuse."""
    df = timeseries.activity_streaks(_events(spark, sf_smoke))
    n = explain.count_exchanges(df)
    assert n == 2, f"activity_streaks must be 2 exchanges, got {n}"


def test_target_encode_broadcasts_global_row(spark, sf_smoke):
    orders = spark.read.parquet(os.path.join(sf_smoke, "orders.parquet"))
    df = evaluation.target_encode(orders, "o_orderpriority", "o_totalprice")
    plan = explain.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_roc_auc_prefix_offsets_broadcast(spark, sf_smoke):
    d = _docs(spark, sf_smoke).select(
        "source", "n_chars", (F.col("lang") == "en").cast("int").alias("y")
    )
    df = evaluation.roc_auc(d, "y", "n_chars", ("source",))
    assert explain.has_broadcast_join(df)


def test_pmi_no_join_backs(spark, sf_smoke):
    """Marginals are window sums over the reduced bigram table: the
    corpus-sized token stream shuffles exactly once (the bigram agg);
    the two marginal windows and the total are over reduced rows."""
    df = text.pmi_collocations(_docs(spark, sf_smoke))
    plan = explain.formatted_plan(df)
    # no SortMergeJoin anywhere: the only join is the broadcast of the
    # one-row total
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_bfs_broadcast_mode_never_reshuffles_edges(spark):
    """In broadcast-frontier mode every per-round join is broadcast —
    the (checkpointed) edge table is never hash-repartitioned."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("b", "a"), ("c", "b")], "src string, dst string"
    )
    df = graph.bfs_hops(edges, max_hops=2)
    plan = explain.formatted_plan(df)
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_readability_zero_exchanges(spark, sf_smoke):
    df = text.readability_scores(_docs(spark, sf_smoke))
    n = explain.count_exchanges(df)
    assert n == 0, f"readability must be a pure projection, got {n} exchanges"


def test_sample_quantiles_bounded_windows(spark, sf_smoke):
    """No single-partition funnel: every rank window partitions by the
    group (and hash bucket); the plan carries no empty-partition-spec
    Window over data-sized input."""
    from probability_of_buying_two_products_together_hadoop_project_spark.operators import (
        sketches,
    )

    orders = spark.read.parquet(os.path.join(sf_smoke, "orders.parquet"))
    df = sketches.hash_sample_quantiles(
        orders, "o_orderkey", "o_totalprice", ["o_orderpriority"], k=16
    )
    plan = explain.formatted_plan(df)
    import re

    for m in re.finditer(r"Arguments: \[.*?partitionBy=\[\]", plan):
        raise AssertionError(f"unpartitioned window found: {m.group(0)[:120]}")
