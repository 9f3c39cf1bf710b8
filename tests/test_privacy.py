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


# ---------------------------------------------------------------------------
# dp_noisy_counts (Laplace mechanism shape)
# ---------------------------------------------------------------------------


def _py_laplace_noise(key, b=2.0):
    import hashlib
    import math
    from decimal import ROUND_HALF_UP, Decimal

    h = int(hashlib.md5(f"dp|{key}".encode()).hexdigest()[:8], 16)
    num = abs(2 * h + 1 - 2**32)
    sgn = 1 if 2 * h + 1 >= 2**32 else -1
    lap = math.log(1.0 - num / 2**32)
    lap_q = Decimal(repr(lap)).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP
    )
    return Decimal(-sgn) * lap_q * Decimal("2.000000")


def test_dp_noisy_counts_matches_python_mirror(spark):
    from decimal import Decimal

    rows = [(f"g{i % 4}",) for i in range(40)]
    df = spark.createDataFrame(rows, "g string")
    got = {
        r.g: Decimal(r.noisy_count_str)
        for r in relational.dp_noisy_counts(df, ["g"]).collect()
    }
    for g in ("g0", "g1", "g2", "g3"):
        want = Decimal(10) + _py_laplace_noise(g)
        assert got[g] == want, g


def test_dp_noisy_counts_noise_is_bounded_and_two_sided(spark):
    # over many groups the md5-derived Laplace draw must produce both
    # signs and stay within the b*ln(2^32) tail bound
    rows = [(f"k{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "g string")
    out = relational.dp_noisy_counts(df, ["g"]).collect()
    noises = [r.noisy_count - 1.0 for r in out]
    assert any(n > 0 for n in noises) and any(n < 0 for n in noises)
    assert all(abs(n) <= 2.0 * 23.0 for n in noises)
    # median magnitude near b*ln(2) ~ 1.39 (Laplace median |x| = b ln 2)
    mags = sorted(abs(n) for n in noises)
    assert 0.7 < mags[len(mags) // 2] < 2.8


def test_dp_noisy_counts_validation(spark):
    df = spark.createDataFrame([("a",)], "g string")
    with pytest.raises(ValueError):
        relational.dp_noisy_counts(df, [])
    with pytest.raises(ValueError):
        relational.dp_noisy_counts(df, ["g"], epsilon_permille=0)
    with pytest.raises(ValueError):
        relational.dp_noisy_counts(df, ["g"], epsilon_permille=3)
