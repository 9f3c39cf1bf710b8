"""Physical-plan shape guards for the round-9-continuation operators:
broadcast contracts (UniMax totals, Heaps bucket counts / prefix
offsets), the bounded-exchange FD profile, and the no-cartesian SCAN
wedge build."""

import os

from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import (
    graph,
    relational,
    text,
)
from probability_of_buying_two_products_together_hadoop_project_spark.plans import explain


def _docs(spark, sf_smoke):
    return spark.read.parquet(os.path.join(sf_smoke, "documents.parquet"))


def test_unimax_broadcasts_totals_and_waterline(spark, sf_smoke):
    df = text.unimax_allocation(_docs(spark, sf_smoke))
    plan = explain.formatted_plan(df)
    # the 1-row totals/waterline sides cross as BroadcastNestedLoopJoin
    # over a BroadcastExchange — broadcast, never a shuffled cross
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    # the corpus scan happens exactly once: the count table is pinned
    assert plan.count("Scan parquet") <= 1


def test_heaps_broadcasts_small_tables(spark, sf_smoke):
    df = text.heaps_law_fit(_docs(spark, sf_smoke))
    plan = explain.formatted_plan(df)
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    # two corpus passes by contract (token explode + narrow total);
    # the pinned first-occurrence table feeds everything else
    assert plan.count("Scan parquet") <= 2


def test_fd_profile_bounded_exchanges(spark, sf_smoke):
    orders = spark.read.parquet(os.path.join(sf_smoke, "orders.parquet"))
    df = relational.fd_profile(orders, ("o_custkey",), "o_orderpriority")
    n = explain.count_exchanges(df)
    # (X, Y) count -> per-X reduce -> global 1-row reduce
    assert n <= 3, f"fd_profile must stay <= 3 exchanges, got {n}"


def test_scan_edge_similarity_no_cartesian(spark, sf_smoke):
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")],
        "item string, neighbor string",
    )
    df = graph.scan_edge_similarity(pairs)
    plan = explain.formatted_plan(df)
    assert "CartesianProduct" not in plan


def test_wordpiece_candidates_bounded_by_vocab_probe(spark):
    # the effective candidate cap shrinks to the actual longest piece:
    # with a 2-char vocab the explode upper bound must be 2, visible as
    # sequence(1, least(2, ...)) in the analyzed plan
    wdf = spark.createDataFrame(
        [("abab", 1, "abab")], "word string, cnt long, target string"
    )
    vdf = spark.createDataFrame([("ab",), ("a",)], "piece string")
    out = text.wordpiece_greedy_encode(wdf, vdf, max_piece_len=24)
    rows = {r.word: r for r in out.collect()}
    assert rows["abab"].wp_seq == "ab ab"


def test_shapley_single_corpus_scan_and_broadcast(spark, sf_smoke):
    from probability_of_buying_two_products_together_hadoop_project_spark.operators import evaluation

    ev = spark.read.parquet(os.path.join(sf_smoke, "events.parquet"))
    df = evaluation.shapley_attribution(
        ev, ("click", "error", "signup", "view"), "purchase"
    )
    plan = explain.formatted_plan(df)
    # the per-user mask table is pinned: the corpus parquet appears once
    assert plan.count("Scan parquet") <= 1
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_qq_table_broadcasts_offsets_no_global_sort(spark, sf_smoke):
    from probability_of_buying_two_products_together_hadoop_project_spark.operators import evaluation

    ev = spark.read.parquet(os.path.join(sf_smoke, "events.parquet"))
    df = evaluation.qq_quantile_table(
        ev,
        "value",
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8",
        bucket_fn=lambda v: F.floor(v / F.lit(50.0)),
    )
    plan = explain.formatted_plan(df)
    assert "BroadcastExchange" in plan  # prefix offsets + quantile list
    assert "CartesianProduct" not in plan
