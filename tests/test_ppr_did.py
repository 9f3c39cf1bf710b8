"""Personalized PageRank (fixed-point mirror, seed locality, absent-seed
mass loss) and the DiD registry composition's pivot arithmetic."""

import random

from probability_of_buying_two_products_together_hadoop_project_spark.operators import graph

UNITS = graph.UNITS


def py_ppr(edges, seeds, iters=5, damping_pct=85):
    out = {}
    for s, d in edges:
        out.setdefault(s, set()).add(d)
    nodes = sorted(out)
    deg = {v: len(ds) for v, ds in out.items()}
    ns = len(seeds)
    tp = (100 - damping_pct) * UNITS // (100 * ns)
    r = {v: (UNITS // ns if v in seeds else 0) for v in nodes}
    for _ in range(iters):
        sums = {v: 0 for v in nodes}
        for s, ds in out.items():
            c = r[s] // deg[s]
            for d in ds:
                sums[d] += c
        r = {
            v: (tp if v in seeds else 0) + (damping_pct * sums[v]) // 100
            for v in nodes
        }
    return r


def _spark_ppr(spark, edges, seeds, **kw):
    df = spark.createDataFrame(sorted(set(edges)), "src string, dst string")
    rows = graph.personalized_pagerank(df, seeds, **kw).collect()
    return {r.node: r.rank_units for r in rows}


def test_ppr_matches_python_reference_random(spark):
    rng = random.Random(19)
    nodes = [f"n{i}" for i in range(25)]
    pairs = {tuple(rng.sample(nodes, 2)) for _ in range(90)}
    edges = sorted(pairs | {(b, a) for a, b in pairs})
    seeds = ("n0", "n1")
    assert _spark_ppr(spark, edges, seeds) == py_ppr(edges, set(seeds))


def test_ppr_mass_concentrates_near_seeds(spark):
    # a path graph a-b-c-d-e with seed a: rank must decay with distance
    chain = ["a", "b", "c", "d", "e"]
    pairs = [(x, y) for x, y in zip(chain, chain[1:])]
    edges = sorted(set(pairs) | {(y, x) for x, y in pairs})
    got = _spark_ppr(spark, edges, ("a",))
    assert got["a"] > got["c"] > got["e"]


def test_ppr_absent_seed_mass_vanishes(spark):
    edges = [("x", "y"), ("y", "x")]
    got = _spark_ppr(spark, edges, ("x", "ghost"))
    # ghost's share of start mass and teleport is simply gone
    assert got["x"] + got["y"] < UNITS
    assert got["x"] > 0


def test_ppr_rejects_empty_seeds(spark):
    import pytest

    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        graph.personalized_pagerank(df, ())


def test_did_pivot_matches_hand_computation(spark):
    from probability_of_buying_two_products_together_hadoop_project_spark import registry

    # reuse the registered query against the smallest SF and recompute
    # the pivot from its own per-cell means
    rows = registry.REGISTRY["did_cohort_events"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    cells = {(r.cohort, r.period): r.mean_v for r in rows}
    want = (
        cells[("B", "post")]
        - cells[("B", "pre")]
        - (cells[("A", "post")] - cells[("A", "pre")])
    )
    assert len(rows) == 4
    for r in rows:
        assert abs(r.did_estimate - want) < 1e-12
