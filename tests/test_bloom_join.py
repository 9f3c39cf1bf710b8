"""bloom_semi_prefilter: superset-prefilter + exact-join equality, row
multiplicity preservation, and zero-exchange plan shape."""

from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import relational
from probability_of_buying_two_products_together_hadoop_project_spark.plans.explain import (
    count_exchanges,
)


def _counts(rows):
    out = {}
    for r in rows:
        k = tuple(r)
        out[k] = out.get(k, 0) + 1
    return out


def test_bloom_prefilter_plus_exact_join_equals_plain(spark):
    fact = spark.createDataFrame(
        [(i % 50, f"v{i}") for i in range(400)], "k long, payload string"
    )
    keys = spark.createDataFrame([(i,) for i in range(0, 50, 3)], "kk long")
    plain = fact.join(keys, fact.k == keys.kk).drop("kk")
    for m_bits in (64, 1 << 10, 1 << 16):  # tiny filters = heavy fp pressure
        pruned = relational.bloom_semi_prefilter(
            fact, keys, "k", "kk", m_bits=m_bits, k_hashes=4
        )
        got = pruned.join(keys, pruned.k == keys.kk).drop("kk")
        assert _counts(got.collect()) == _counts(plain.collect()), m_bits


def test_bloom_prefilter_preserves_duplicate_rows(spark):
    """EXACT duplicate fact rows must keep their multiplicity (the
    groupBy-all-columns formulation would collapse them)."""
    fact = spark.createDataFrame(
        [(1, "same"), (1, "same"), (1, "same"), (2, "other")],
        "k long, payload string",
    )
    keys = spark.createDataFrame([(1,)], "kk long")
    out = relational.bloom_semi_prefilter(fact, keys, "k", "kk").collect()
    assert _counts(out)[(1, "same")] == 3


def test_bloom_prefilter_is_superset_and_no_fact_exchange(spark):
    fact = spark.createDataFrame(
        [(i, i * 10) for i in range(1000)], "k long, v long"
    )
    keys = spark.createDataFrame([(7,), (13,)], "kk long")
    pruned = relational.bloom_semi_prefilter(
        fact, keys, "k", "kk", m_bits=1 << 12, k_hashes=5
    )
    got_keys = {r["k"] for r in pruned.collect()}
    assert {7, 13} <= got_keys  # no false negatives, ever
    # fact side: k broadcast probes, no shuffle of the fact at all
    # (the bloom build aggregates, but it is checkpointed before probing)
    assert count_exchanges(pruned) == 0


def test_bloom_prefilter_empty_key_side(spark):
    fact = spark.createDataFrame([(1, "a")], "k long, payload string")
    keys = spark.createDataFrame([], "kk long")
    assert relational.bloom_semi_prefilter(fact, keys, "k", "kk").count() == 0
