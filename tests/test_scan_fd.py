"""SCAN edge similarity and FD profiling: pure-Python mirrors over
randomized inputs plus hand-built contracts."""

import math
import random
from itertools import combinations

from probability_of_buying_two_products_together_hadoop_project_spark.operators import (
    graph,
    relational,
)


def py_scan(pairs):
    """Mirror: per canonical edge, common open neighbors + 2 and the
    closed-neighborhood sigma."""
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    out = {}
    for a, b in edges:
        common = len(nbrs[a] & nbrs[b]) + 2
        da, db = len(nbrs[a]), len(nbrs[b])
        out[(a, b)] = (da, db, common, common / math.sqrt((da + 1) * (db + 1)))
    return out


def _spark_scan(spark, pairs):
    df = spark.createDataFrame(sorted(pairs), "item string, neighbor string")
    rows = graph.scan_edge_similarity(df).collect()
    return {(r.item_a, r.item_b): r for r in rows}


def test_scan_triangle_with_pendant(spark):
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    got = _spark_scan(spark, pairs)
    want = py_scan(pairs)
    assert sorted(got) == sorted(want)
    # the triangle edges share one common neighbor (+2); the pendant none
    assert got[("a", "b")].common_closed == 3
    assert got[("c", "d")].common_closed == 2
    for e, r in got.items():
        da, db, common, sigma = want[e]
        assert (r.deg_a, r.deg_b, r.common_closed) == (da, db, common)
        assert abs(r.sigma - sigma) < 1e-15


def test_scan_matches_python_reference_random(spark):
    rng = random.Random(13)
    nodes = [f"n{i:02d}" for i in range(18)]
    pairs = set()
    for a, b in combinations(nodes, 2):
        if rng.random() < 0.25:
            pairs.add((a, b))
    got = _spark_scan(spark, pairs)
    want = py_scan(pairs)
    assert sorted(got) == sorted(want)
    for e, r in got.items():
        da, db, common, sigma = want[e]
        assert (r.deg_a, r.deg_b, r.common_closed) == (da, db, common)
        assert abs(r.sigma - sigma) < 1e-15


def test_fd_profile_mirror(spark):
    rows = [
        (1, "A"), (1, "A"), (1, "B"),     # x=1: n=3, best=2, viol=1
        (2, "C"), (2, "C"),               # clean
        (3, None), (3, None), (3, "D"),   # NULL majority: best=2, viol=1
        (None, "E"), (None, "F"),         # NULL key: n=2, best=1, viol=1
    ]
    df = spark.createDataFrame(rows, "x int, y string")
    r = relational.fd_profile(df, ("x",), "y").collect()[0]
    assert r.n_rows == 10
    assert r.n_determinants == 4
    assert r.n_clean_determinants == 1
    assert r.n_violations == 3
    assert abs(r.g3_error - 0.3) < 1e-15


def test_fd_profile_exact_fd_zero_error(spark):
    df = spark.createDataFrame(
        [(i, f"v{i % 3}") for i in range(30)], "x int, y string"
    )
    r = relational.fd_profile(df, ("x",), "y").collect()[0]
    assert r.n_violations == 0 and r.g3_error == 0.0
    assert r.n_clean_determinants == r.n_determinants == 30


def test_fd_profile_needs_determinant(spark):
    import pytest

    df = spark.createDataFrame([(1, "a")], "x int, y string")
    with pytest.raises(ValueError):
        relational.fd_profile(df, (), "y")
