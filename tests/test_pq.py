"""Product quantization: structural invariants of training/encoding and
an exactness property — when every vector is its own codeword
(k_codes >= n points), ADC distances equal the exact quantized
distances, pinning the whole chain (train -> encode -> LUT -> sum)."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
import numpy as np

from probability_of_buying_two_products_together_hadoop_project_spark.operators import similarity

UNIT = 10**6


def _q(vs):
    return [math.floor(float(np.float32(v)) * float(UNIT)) for v in vs]


vec8 = st.lists(
    st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
    min_size=8,
    max_size=8,
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(vec8, min_size=2, max_size=8, unique_by=lambda v: tuple(v)))
def test_adc_exact_when_every_vector_is_a_codeword(spark, vec_lists):
    n = len(vec_lists)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vec_lists)],
        "vec_id long, embedding array<float>",
    )
    out = similarity.pq_adc_topk(
        df, n_queries=n, k=n, m_sub=2, dim=8, k_codes=n, iters=1
    ).collect()
    got = {(r["qid"], r["vec_id"]): r["approx_d2_units"] for r in out}
    q = {i: _q(v) for i, v in enumerate(vec_lists)}
    for (qid, vid), est in got.items():
        exact = sum((a - b) ** 2 for a, b in zip(q[qid], q[vid]))
        assert est == exact, (qid, vid)
    # ranks are exact-nearest order with vec_id tie-break
    for r in out:
        assert r["qid"] != r["vec_id"]


def test_pq_train_shapes_and_code_ranges(spark):
    rng = np.random.RandomState(7)
    rows = [
        (i, [float(x) for x in rng.uniform(-1, 1, 16)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    codebook, codes = similarity.pq_train(
        df, m_sub=4, dim=16, k_codes=4, iters=2
    )
    cb = codebook.collect()
    # m_sub x k_codes x sub_dim rows, each subspace's positions only
    assert len(cb) == 4 * 4 * 4
    for r in cb:
        assert r["pos"] // 4 == r["s"]
        assert 0 <= r["code"] < 4
    cd = codes.collect()
    assert len(cd) == 40 * 4  # one code per (vector, subspace)
    per_vec = {}
    for r in cd:
        per_vec.setdefault(r["_id"], set()).add(r["s"])
        assert 0 <= r["code"] < 4
    assert all(v == {0, 1, 2, 3} for v in per_vec.values())


def test_pq_rejects_bad_dims(spark):
    df = spark.createDataFrame(
        [(0, [0.0] * 10)], "vec_id long, embedding array<float>"
    )
    import pytest

    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_train(df, m_sub=4, dim=10)
