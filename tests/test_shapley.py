"""Shapley attribution: pure-Python subset-lattice mirror plus the
efficiency, symmetry and null-player axioms on constructed data."""

import math
import random

from probability_of_buying_two_products_together_hadoop_project_spark.operators import evaluation

CH = ("c0", "c1", "c2", "c3")


def py_shapley(user_rows, channels=CH):
    c = len(channels)
    masks = {}
    for user, touched, conv in user_rows:
        m = sum(1 << i for i, ch in enumerate(channels) if ch in touched)
        n, cv = masks.get(m, (0, 0))
        masks[m] = (n + 1, cv + (1 if conv else 0))

    def v(s):
        n, cv = masks.get(s, (0, 0))
        return cv / n if n else 0.0

    fact = [math.factorial(k) for k in range(c + 1)]
    phi = {}
    for i, ch in enumerate(channels):
        bit = 1 << i
        total = 0
        for s in range(1 << c):
            if s & bit:
                continue
            a = fact[bin(s).count("1")] * fact[c - 1 - bin(s).count("1")]
            term = round(a * (v(s | bit) - v(s)) / fact[c], 6)
            total = round(total + term, 6)
        phi[ch] = total
    return phi, v


def _run(spark, user_rows):
    rows = []
    for user, touched, conv in user_rows:
        for ch in touched:
            rows.append((user, ch))
        if conv:
            rows.append((user, "purchase"))
        if not touched and not conv:
            rows.append((user, "noise"))  # keeps the user in the table
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = evaluation.shapley_attribution(df, CH, "purchase").collect()
    return {r.channel: r for r in out}


def test_shapley_matches_python_mirror_random(spark):
    rng = random.Random(29)
    user_rows = []
    for u in range(300):
        touched = tuple(ch for ch in CH if rng.random() < 0.4)
        # conversion more likely with c0 and c2 touched
        p = 0.1 + 0.3 * ("c0" in touched) + 0.2 * ("c2" in touched)
        user_rows.append((u, touched, rng.random() < p))
    got = _run(spark, user_rows)
    want, _ = py_shapley(user_rows)
    for ch in CH:
        assert abs(got[ch].phi - want[ch]) < 1e-9, ch
    # the causal channels should earn the credit
    assert got["c0"].phi > got["c1"].phi
    assert got["c2"].phi > got["c3"].phi


def test_shapley_efficiency_axiom(spark):
    # every subset observed -> sum(phi) == v(full) - v(empty)
    rng = random.Random(7)
    user_rows = []
    u = 0
    for m in range(16):
        touched = tuple(ch for i, ch in enumerate(CH) if m & (1 << i))
        for _ in range(8):
            user_rows.append((u, touched, rng.random() < 0.2 + 0.04 * bin(m).count("1")))
            u += 1
    got = _run(spark, user_rows)
    want, v = py_shapley(user_rows)
    total = sum(r.phi for r in got.values())
    assert abs(total - (v(15) - v(0))) < 1e-5


def test_shapley_null_player_near_zero(spark):
    # c3 never influences conversion AND appears independently
    rng = random.Random(3)
    user_rows = []
    for u in range(400):
        base = tuple(ch for ch in CH[:3] if rng.random() < 0.5)
        touched = base + (("c3",) if rng.random() < 0.5 else ())
        user_rows.append((u, touched, rng.random() < 0.5 * ("c0" in base)))
    got = _run(spark, user_rows)
    want, _ = py_shapley(user_rows)
    assert abs(got["c3"].phi - want["c3"]) < 1e-9
    # null-ish player: far less credit than the causal channel
    assert abs(got["c3"].phi) < abs(got["c0"].phi) / 3


def test_shapley_rejects_bad_channels(spark):
    import pytest

    df = spark.createDataFrame([(1, "a")], "user_id long, event_type string")
    with pytest.raises(ValueError):
        evaluation.shapley_attribution(df, (), "purchase")
    with pytest.raises(ValueError):
        evaluation.shapley_attribution(df, ("a", "purchase"), "purchase")


def test_qq_table_matches_sorted_pick(spark):
    from pyspark.sql import functions as F

    import random

    rng = random.Random(11)
    rows = [(True, round(rng.uniform(0, 100), 2)) for _ in range(137)]
    rows += [(False, round(rng.uniform(10, 120), 2)) for _ in range(211)]
    df = spark.createDataFrame(rows, "a boolean, v double")
    got = {
        r.q: r
        for r in evaluation.qq_quantile_table(
            df, "v", F.col("a"), q_den=10
        ).collect()
    }
    va = sorted(v for a, v in rows if a)
    vb = sorted(v for a, v in rows if not a)
    for q in range(1, 10):
        ra = (q * len(va) + 9) // 10
        rb = (q * len(vb) + 9) // 10
        assert got[q].rank_a == ra and got[q].rank_b == rb
        assert got[q].value_a == va[ra - 1]
        assert got[q].value_b == vb[rb - 1]
        assert abs(got[q].qq_gap - (vb[rb - 1] - va[ra - 1])) < 1e-12


def test_qq_table_identical_samples_zero_gap(spark):
    from pyspark.sql import functions as F

    rows = [(s, float(v)) for v in range(1, 101) for s in (True, False)]
    df = spark.createDataFrame(rows, "a boolean, v double")
    got = evaluation.qq_quantile_table(df, "v", F.col("a"), q_den=4).collect()
    assert len(got) == 3
    assert all(r.qq_gap == 0.0 for r in got)
