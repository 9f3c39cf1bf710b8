"""Fixed-point Lloyd k-means: independent pure-Python reference of the
same contract (md5 seed draw, integer distances, trunc-division
updates, smaller-cid tie-break, empty clusters keep position)."""

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from probability_of_buying_two_products_together_hadoop_project_spark.operators import similarity

UNIT = 10**6


def trunc_div(a: int, b: int) -> int:
    q = abs(a) // b
    return -q if a < 0 else q


def py_kmeans(vecs: dict[int, list[float]], k: int, iters: int):
    """Reference implementation of kmeans_lloyd's documented contract:
    floor(v * UNIT) on the double product, matching both engines."""
    import math

    q = {i: [math.floor(float(v) * float(UNIT)) for v in vs] for i, vs in vecs.items()}
    draws = sorted(
        (hashlib.md5(f"km|{i}".encode()).hexdigest(), i) for i in vecs
    )
    cents = {cid: (list(q[i]), 0) for cid, (_, i) in enumerate(draws[:k])}
    for _ in range(iters):
        assign: dict[int, int] = {}
        for i, qv in q.items():
            best = min(
                (sum((a - b) ** 2 for a, b in zip(qv, c)), cid)
                for cid, (c, _) in cents.items()
            )
            assign[i] = best[1]
        new = {}
        for cid, (c, _) in cents.items():
            members = [q[i] for i, a in assign.items() if a == cid]
            if not members:
                new[cid] = (c, 0)
            else:
                new[cid] = (
                    [
                        trunc_div(sum(m[p] for m in members), len(members))
                        for p in range(len(c))
                    ],
                    len(members),
                )
        cents = new
    return cents


vec = st.lists(
    st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
    min_size=4,
    max_size=4,
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(vec, min_size=3, max_size=12, unique_by=lambda v: tuple(v)))
def test_kmeans_matches_python_reference(spark, vec_lists):
    k, iters = 3, 2
    vecs = dict(enumerate(vec_lists))
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    got = {}
    for r in similarity.kmeans_lloyd(df, k=min(k, len(vecs)), iters=iters).collect():
        c_units, n = got.setdefault(r["cid"], ({}, r["n_members"]))
        c_units[r["pos"]] = r["centroid_units"]
        assert n == r["n_members"]
    # float32 -> double widening is exact, so the reference quantizes
    # the same doubles the engine's cast produces
    import numpy as np

    want = py_kmeans(
        {i: [float(np.float32(x)) for x in vecs[i]] for i in vecs},
        min(k, len(vecs)),
        iters,
    )
    assert set(got) == set(want)
    for cid, (c_units, n) in got.items():
        want_c, want_n = want[cid]
        assert n == want_n
        assert [c_units[p] for p in sorted(c_units)] == want_c


def test_kmeans_empty_cluster_keeps_position(spark):
    """Two far seeds, all points at one of them: the starved centroid
    keeps its seed position with n_members = 0."""
    rows = [(0, [0.0, 0.0]), (1, [0.001, 0.0]), (2, [0.002, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.kmeans_lloyd(df, k=2, iters=2).collect()
    by_cid: dict[int, list] = {}
    for r in out:
        by_cid.setdefault(r["cid"], []).append(r)
    counts = {cid: rs[0]["n_members"] for cid, rs in by_cid.items()}
    assert sorted(counts.values()) in ([0, 3], [1, 2])
    total = sum(counts.values())
    assert total == 3
