"""The `pre_canonical` fast path must be output-identical to the
self-canonicalizing path: feeding the distinct canonical (a < b) edge
set with pre_canonical=True skips the canonicalize + distinct shuffle
but may not change a single row."""

from __future__ import annotations

from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import graph


def _pairs(spark):
    # messy pair evidence: duplicates, both orientations, self-loops
    rows = []
    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 1), (2, 4), (6, 7)]
    for a, b in edges:
        rows += [(a, b), (b, a), (a, b)]
    rows += [(1, 1), (4, 4)]
    return spark.createDataFrame(rows, "item bigint, neighbor bigint")


def _canon(spark):
    return (
        _pairs(spark)
        .filter(F.col("item") != F.col("neighbor"))
        .select(
            F.least("item", "neighbor").alias("item"),
            F.greatest("item", "neighbor").alias("neighbor"),
        )
        .distinct()
    )


def test_triangle_stats_pre_canonical_identical(spark):
    want = sorted(map(tuple, graph.triangle_stats(_pairs(spark)).collect()))
    got = sorted(
        map(
            tuple,
            graph.triangle_stats(_canon(spark), pre_canonical=True).collect(),
        )
    )
    assert got == want
    # sampled mode too (the registry's combination): deterministic draw,
    # same sparsified graph either way
    want_s = sorted(
        map(
            tuple,
            graph.triangle_stats(_pairs(spark), edge_sample_pct=50).collect(),
        )
    )
    got_s = sorted(
        map(
            tuple,
            graph.triangle_stats(
                _canon(spark), edge_sample_pct=50, pre_canonical=True
            ).collect(),
        )
    )
    assert got_s == want_s


def test_kcore_peel_pre_canonical_identical(spark):
    want = sorted(
        map(tuple, graph.kcore_peel(_pairs(spark), k=2, rounds=3).collect())
    )
    got = sorted(
        map(
            tuple,
            graph.kcore_peel(
                _canon(spark), k=2, rounds=3, pre_canonical=True
            ).collect(),
        )
    )
    assert got == want
    # the peel must actually do something on this graph (nodes 6/7 have
    # degree 1 < 2 and drop round 1)
    assert any(r[1] != r[2] for r in want)
