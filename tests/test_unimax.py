"""UniMax allocation (text.unimax_allocation): a pure-Python mirror of
the sequential water-filling loop drives randomized source tables, plus
edge contracts (all-capped, tiny budget, single source)."""

import random

from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import text


def py_unimax(sizes, budget_num, budget_den, epoch_cap):
    """The literal sequential loop: hand the smallest remaining source
    its full capacity while that is below the uniform share; then split
    the remainder evenly (floor division, matching the engine)."""
    tot = sum(sizes.values())
    b = tot * budget_num // budget_den
    caps = sorted(
        ((n * epoch_cap, s) for s, n in sizes.items())
    )
    alloc, remaining, left = {}, list(caps), b
    while remaining:
        share = left // len(remaining)
        cap, s = remaining[0]
        if cap <= share:
            alloc[s] = cap
            left -= cap
            remaining.pop(0)
        else:
            break
    if remaining:
        share = left // len(remaining)
        for cap, s in remaining:
            alloc[s] = share
    return b, alloc


def _spark_unimax(spark, sizes, **kw):
    rows = [(s, "w " * n) for s, n in sizes.items()]
    df = spark.createDataFrame(rows, "source string, text string")
    out = text.unimax_allocation(df, **kw).collect()
    return {r.source: r for r in out}


def test_unimax_matches_sequential_loop_random(spark):
    rng = random.Random(5)
    for trial in range(3):
        sizes = {f"s{i:02d}": rng.randint(1, 400) for i in range(12)}
        num, den, cap = rng.choice([(1, 2, 3), (9, 5, 2), (3, 1, 2)])
        b, want = py_unimax(sizes, num, den, cap)
        got = _spark_unimax(
            spark, sizes, budget_num=num, budget_den=den, epoch_cap=cap
        )
        assert {s: r.alloc_tokens for s, r in got.items()} == want
        for s, r in got.items():
            assert r.n_tokens == sizes[s]
            assert r.capacity == sizes[s] * cap
            assert r.is_capped == (1 if want[s] == sizes[s] * cap else 0)
            assert abs(r.epochs - want[s] / sizes[s]) < 1e-12
            assert abs(r.budget_share - want[s] / b) < 1e-12


def test_unimax_budget_exceeds_capacity_all_capped(spark):
    sizes = {"a": 10, "b": 20, "c": 5}
    got = _spark_unimax(spark, sizes, budget_num=10, budget_den=1, epoch_cap=2)
    for s, r in got.items():
        assert r.is_capped == 1 and r.alloc_tokens == sizes[s] * 2
        assert r.epochs == 2.0


def test_unimax_tiny_budget_uniform_split(spark):
    sizes = {"a": 100, "b": 200, "c": 300}
    # budget = 600 // 100 = 6 tokens -> nobody capped, everyone gets 2
    got = _spark_unimax(spark, sizes, budget_num=1, budget_den=100, epoch_cap=2)
    for r in got.values():
        assert r.is_capped == 0 and r.alloc_tokens == 2


def test_unimax_single_source(spark):
    got = _spark_unimax(spark, {"only": 50}, budget_num=1, budget_den=2, epoch_cap=4)
    r = got["only"]
    # budget 25 < capacity 200 -> waterline 25
    assert r.is_capped == 0 and r.alloc_tokens == 25
    assert abs(r.epochs - 0.5) < 1e-12


def test_unimax_rejects_bad_params(spark):
    import pytest

    df = spark.createDataFrame([("a", "x")], "source string, text string")
    with pytest.raises(ValueError):
        text.unimax_allocation(df, budget_den=0)
    with pytest.raises(ValueError):
        text.unimax_allocation(df, epoch_cap=0)
