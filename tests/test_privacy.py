"""k-anonymity / l-diversity audit + suppression tests
(`relational.k_anonymity_audit` / `k_anonymity_suppress`)."""

import pytest

from probability_of_buying_two_products_together_hadoop_project_spark.operators import relational
from pyspark.sql import functions as F


def _df(spark):
    # (city, age_band) quasi-identifiers; disease is the sensitive column
    rows = [
        # class A: size 3 (< k), diverse
        ("oslo", 30, "flu"), ("oslo", 30, "cold"), ("oslo", 30, "flu"),
        # class B: size 5, but sensitive is CONSTANT (l violation)
        *[("bergen", 40, "flu")] * 5,
        # class C: size 6, diverse — the only releasable class
        ("tromso", 50, "flu"), ("tromso", 50, "cold"), ("tromso", 50, "flu"),
        ("tromso", 50, "cold"), ("tromso", 50, "asthma"), ("tromso", 50, "flu"),
    ]
    return spark.createDataFrame(rows, "city string, age_band int, disease string")


def test_audit_flags(spark):
    got = {
        (r.city, r.age_band): (
            r.class_size, r.n_sensitive_distinct,
            r.k_violation, r.l_violation, r.violates,
        )
        for r in relational.k_anonymity_audit(
            _df(spark), ["city", "age_band"], "disease", k=5, l_div=2
        ).collect()
    }
    assert got == {
        ("oslo", 30): (3, 2, True, False, True),
        ("bergen", 40): (5, 1, False, True, True),
        ("tromso", 50): (6, 3, False, False, False),
    }


def test_suppress_keeps_only_passing_classes(spark):
    out = relational.k_anonymity_suppress(
        _df(spark), ["city", "age_band"], "disease", k=5, l_div=2
    )
    assert out.count() == 6
    assert {r.city for r in out.select("city").distinct().collect()} == {"tromso"}
    # row multiplicity preserved exactly (semi join, not a dedup)
    assert (
        out.filter(F.col("disease") == "flu").count() == 3
    )


def test_k1_l1_releases_everything(spark):
    df = _df(spark)
    assert relational.k_anonymity_suppress(
        df, ["city", "age_band"], "disease", k=1, l_div=1
    ).count() == df.count()


def test_validation(spark):
    with pytest.raises(ValueError):
        relational.k_anonymity_audit(_df(spark), ["city"], "disease", k=0)
    with pytest.raises(ValueError):
        relational.k_anonymity_audit(_df(spark), ["city"], "disease", l_div=0)
