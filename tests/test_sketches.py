"""KMV distinct sketches: python-reference parity (the sketch is a
deterministic function of the data), estimator accuracy, the small-group
exact path, and mergeability of the k-minima selection."""

import hashlib

import pytest
from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import sketches

K = 16
TWO32 = float(1 << 32)


def _h(key) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16)


def _py_kmv(keys, k=K):
    hs = sorted({_h(x) for x in keys})
    sample = hs[:k]
    if len(sample) < k:
        return sample, float(len(sample))
    u_k = (sample[-1] + 0.5) / TWO32
    return sample, (k - 1) / u_k


def _df(spark, groups):
    rows = [(g, key) for g, keys in groups.items() for key in keys]
    return spark.createDataFrame(rows, ["grp", "key"])


def test_kmv_matches_python_reference_bitwise(spark):
    groups = {
        "big": [f"u{i}" for i in range(500)],
        "small": [f"v{i}" for i in range(5)] * 3,  # dup rows, 5 distinct
    }
    out = {
        r["grp"]: (r["n_sample"], r["kth_hash"], r["est_distinct"])
        for r in sketches.kmv_distinct(_df(spark, groups), "key", ["grp"], k=K).collect()
    }
    for g, keys in groups.items():
        sample, est = _py_kmv(keys)
        n_sample, kth, got_est = out[g]
        assert n_sample == len(sample)
        assert kth == (sample[-1] if len(sample) == K else None)
        assert got_est == est  # bit-identical dyadic division


def test_kmv_exact_path_small_groups(spark):
    groups = {"tiny": [f"x{i}" for i in range(7)]}
    row = sketches.kmv_distinct(_df(spark, groups), "key", ["grp"], k=K).collect()[0]
    assert row["est_distinct"] == 7.0 and row["n_sample"] == 7


def test_kmv_estimator_accuracy(spark):
    n = 2000
    groups = {"g": [f"user-{i}" for i in range(n)]}
    row = sketches.kmv_distinct(
        _df(spark, groups), "key", ["grp"], k=64
    ).collect()[0]
    # KMV relative stddev ~ 1/sqrt(k-2) ~ 12.7% at k=64; 4 sigma bound
    assert abs(row["est_distinct"] - n) / n < 0.51


def test_kmv_sample_is_global_k_minima(spark):
    """The two-level tournament must equal the straight k smallest."""
    keys = [f"m{i}" for i in range(300)]
    got = sorted(
        r["h"]
        for r in sketches.kmv_sample(
            _df(spark, {"g": keys}), "key", ["grp"], k=K, n_buckets=8
        ).collect()
    )
    assert got == sorted({_h(x) for x in keys})[:K]


def test_kmv_set_ops_matches_python_reference(spark):
    a = [f"u{i}" for i in range(0, 300)]
    b = [f"u{i}" for i in range(150, 450)]  # 50% overlap
    df = _df(spark, {"A": a, "B": b}).withColumnRenamed("grp", "g")
    row = sketches.kmv_set_ops(df, "key", "g", "A", "B", k=K).collect()[0]

    sa, _ = _py_kmv(a)
    sb, _ = _py_kmv(b)
    comb = sorted(set(sa) | set(sb))[:K]
    theta = comb[-1]
    est_union = (
        float(len(comb))
        if len(comb) < K
        else (len(comb) - 1) / ((theta + 0.5) / TWO32)
    )
    inter = len([h for h in comb if h in set(sa) and h in set(sb)])
    est_j = inter / len(comb)
    assert row["n_combined"] == len(comb)
    assert row["est_union"] == est_union
    assert row["est_jaccard"] == est_j
    assert row["est_intersection"] == est_j * est_union
    # loose truth sanity: union=450, inter=150, jaccard=1/3
    assert abs(row["est_union"] - 450) / 450 < 0.6
    assert 0.0 < row["est_jaccard"] < 0.8


# ---------------------------------------------------------------------------
# hash_sample_quantiles
# ---------------------------------------------------------------------------


def py_sample_quantiles(rows, k=8):
    """rows: (group, id, value). Mirror of the deterministic contract."""
    import hashlib
    from collections import defaultdict

    by_g = defaultdict(list)
    for g, i, v in set(rows):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        by_g[g].append((h, v, i))
    out = {}
    for g, hs in by_g.items():
        smp = sorted(hs)[:k]
        vals = sorted((v, h, i) for h, v, i in smp)
        ns = len(vals)
        def pick(num, den):
            return vals[(num * ns + den - 1) // den - 1][0]
        out[g] = (ns, pick(1, 4), pick(1, 2), pick(3, 4))
    return out


def test_hash_sample_quantiles_matches_reference(spark):
    import random

    rng = random.Random(31)
    rows = [
        (f"g{i % 3}", i, float(rng.randint(0, 1000)))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = {
        r.g: (r.n_sample, r.q_1_4, r.q_1_2, r.q_3_4)
        for r in sketches.hash_sample_quantiles(
            df, "id", "v", ["g"], k=8
        ).collect()
    }
    assert got == py_sample_quantiles(rows, k=8)


def test_hash_sample_quantiles_merge_equals_full(spark):
    """k-min-by-hash of a union == merge of the parts' samples: running
    the sketch over each half and re-sketching the union of retained
    rows must answer identically to the full-data sketch."""
    import random

    rng = random.Random(37)
    rows = [("g", i, float(rng.randint(0, 99))) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    full = sketches.hash_sample_quantiles(df, "id", "v", ["g"], k=16).collect()
    h1 = spark.createDataFrame(rows[:100], "g string, id long, v double")
    h2 = spark.createDataFrame(rows[100:], "g string, id long, v double")
    # parts keep k rows each (id survives inside the sketch contract via
    # the same min-by-hash rule), union re-sketches
    merged_input = h1.union(h2)
    merged = sketches.hash_sample_quantiles(
        merged_input, "id", "v", ["g"], k=16
    ).collect()
    assert [tuple(r) for r in full] == [tuple(r) for r in merged]


def test_hash_sample_quantiles_small_group_is_exact(spark):
    # fewer rows than k: the sample IS the data -> exact discrete quantiles
    rows = [("g", i, float(v)) for i, v in enumerate([5, 1, 9, 3])]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    [r] = sketches.hash_sample_quantiles(df, "id", "v", ["g"], k=64).collect()
    assert (r.n_sample, r.q_1_4, r.q_1_2, r.q_3_4) == (4, 1.0, 3.0, 5.0)
