"""Fellegi-Sunter record linkage tests (`dedup.fellegi_sunter_link`,
`dedup.fs_weights`): weight math vs an independent mirror, NULL
agreement convention, classification thresholds, and fail-loud guards."""

import math
from decimal import ROUND_HALF_UP, Decimal

import pytest

from probability_of_buying_two_products_together_hadoop_project_spark.operators import dedup
from pyspark.sql import functions as F


def _q6(x):
    return Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)


def test_fs_weights_quantization():
    wa, wd = dedup.fs_weights(0.95, 0.01)
    assert Decimal(wa) == _q6(math.log2(0.95 / 0.01))
    assert Decimal(wd) == _q6(math.log2(0.05 / 0.99))
    with pytest.raises(ValueError):
        dedup.fs_weights(0.5, 0.5)
    with pytest.raises(ValueError):
        dedup.fs_weights(0.2, 0.4)


def _frames(spark):
    a = spark.createDataFrame(
        [(1, "ann", "x"), (2, "bob", "y"), (3, None, "x")],
        "a_id bigint, a_name string, a_blk string",
    )
    b = spark.createDataFrame(
        [(10, "ann", "x"), (11, "ann", "y"), (12, "zed", "x")],
        "b_id bigint, b_name string, b_blk string",
    )
    return a, b


def test_scores_match_python_mirror(spark):
    a, b = _frames(spark)
    out = dedup.fellegi_sunter_link(
        a, b,
        F.col("a_blk") == F.col("b_blk"),
        [("name", F.col("a_name") == F.col("b_name"), 0.9, 0.1)],
        lower=0.0, upper=3.0,
    )
    wa, wd = (Decimal(w) for w in dedup.fs_weights(0.9, 0.1))
    got = {
        (r.a_id, r.b_id): (r.agree_name, Decimal(str(r.score)), r.classification)
        for r in out.collect()
    }
    # block x: pairs (1,10),(1,12),(3,10),(3,12); block y: (2,11)
    want = {
        (1, 10): (True, wa, "match"),
        (1, 12): (False, wd, "non_match"),
        (3, 10): (False, wd, "non_match"),  # NULL name -> disagreement
        (3, 12): (False, wd, "non_match"),
        (2, 11): (False, wd, "non_match"),
    }
    assert got == want


def test_possible_band(spark):
    a, b = _frames(spark)
    out = dedup.fellegi_sunter_link(
        a, b,
        F.col("a_blk") == F.col("b_blk"),
        [("name", F.col("a_name") == F.col("b_name"), 0.9, 0.1)],
        lower=-10.0, upper=10.0,
    )
    assert {r.classification for r in out.collect()} == {"possible"}


def test_column_clash_raises(spark):
    a, _ = _frames(spark)
    with pytest.raises(ValueError, match="disjoint"):
        dedup.fellegi_sunter_link(
            a, a, F.lit(True), [("x", F.lit(True), 0.9, 0.1)], 0, 1
        )
