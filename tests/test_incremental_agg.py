"""Incremental aggregate maintenance: delta application must equal the
direct aggregate over the patched base, including key drop-out and
exact decimal subtraction; randomized insert/delete mixes."""

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import relational

row = st.tuples(
    st.integers(min_value=0, max_value=4),  # key
    st.decimals(
        min_value=Decimal("-99.99"),
        max_value=Decimal("99.99"),
        places=2,
        allow_nan=False,
        allow_infinity=False,
    ),
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(row, min_size=1, max_size=20),
    st.lists(row, min_size=0, max_size=10),
    st.sets(st.integers(min_value=0, max_value=19)),
)
def test_delta_apply_equals_direct_recompute(spark, base_rows, insert_rows, delete_idx):
    base = spark.createDataFrame(
        [(k, float(v)) for k, v in base_rows], "k long, v double"
    )
    state = relational.agg_state(base, ["k"], "v", scale=4)
    deletes = [base_rows[i] for i in sorted(delete_idx) if i < len(base_rows)]
    delta_rows = [(k, float(v), -1) for k, v in deletes] + [
        (k, float(v), 1) for k, v in insert_rows
    ]
    if delta_rows:
        delta = spark.createDataFrame(delta_rows, "k long, v double, _sign int")
    else:
        delta = spark.createDataFrame([], "k long, v double, _sign int")
    merged = relational.apply_agg_delta(state, delta, ["k"], "v", scale=4)
    got = {
        r["k"]: (r["n_rows"], r["sum_dec"])
        for r in merged.collect()
    }

    final = [r for i, r in enumerate(base_rows) if i not in delete_idx] + insert_rows
    want: dict[int, tuple[int, Decimal]] = {}
    for k, v in final:
        n, s = want.get(k, (0, Decimal(0)))
        want[k] = (n + 1, s + v)
    want = {k: (n, s) for k, (n, s) in want.items() if n > 0}
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == want[k][1].quantize(Decimal("0.0001"))


def test_all_rows_of_key_deleted_drops_key(spark):
    base = spark.createDataFrame(
        [(1, 10.5), (1, 2.25), (2, 3.0)], "k long, v double"
    )
    state = relational.agg_state(base, ["k"], "v")
    delta = spark.createDataFrame(
        [(1, 10.5, -1), (1, 2.25, -1)], "k long, v double, _sign int"
    )
    out = relational.apply_agg_delta(state, delta, ["k"], "v").collect()
    assert [(r["k"], r["n_rows"], float(r["sum_dec"])) for r in out] == [
        (2, 1, 3.0)
    ]


def test_insert_only_key_appears(spark):
    base = spark.createDataFrame([(1, 1.0)], "k long, v double")
    state = relational.agg_state(base, ["k"], "v")
    delta = spark.createDataFrame([(9, 7.5, 1)], "k long, v double, _sign int")
    out = {
        r["k"]: (r["n_rows"], float(r["sum_dec"]))
        for r in relational.apply_agg_delta(state, delta, ["k"], "v").collect()
    }
    assert out == {1: (1, 1.0), 9: (1, 7.5)}
