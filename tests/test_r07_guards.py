"""Fail-loud working-column clash guards for the r07 operators (the
asof _rv lesson, applied preemptively): caller-supplied group/id/value
column names that would silently collide with internal working or
output names must raise instead."""

import pytest

from probability_of_buying_two_products_together_hadoop_project_spark.operators import (  # noqa: E501
    dedup,
    evaluation,
    relational,
    text,
    timeseries,
)
from pyspark.sql import functions as F


def test_cusum_group_clash_raises():
    with pytest.raises(ValueError, match="clash"):
        timeseries.cusum_from_counts(None, ("cusum_scaled",))


def test_theilsen_group_clash_raises():
    with pytest.raises(ValueError, match="clash"):
        timeseries.theilsen_trend(None, ("_slope",))


def test_ks_value_clash_raises(spark):
    with pytest.raises(ValueError, match="clash"):
        evaluation.ks_two_sample(None, "_vb", F.lit(True))


def test_welch_group_clash_raises(spark):
    with pytest.raises(ValueError, match="clash"):
        evaluation.welch_ttest(None, "v", F.lit(True), group_cols=("t_stat",))


def test_benford_group_clash_raises():
    with pytest.raises(ValueError, match="clash"):
        evaluation.benford_screen(None, "v", ("chi2",))


def test_fs_em_duplicate_flags_raise(spark):
    df = spark.createDataFrame([(True, False)], "a boolean, b boolean")
    with pytest.raises(ValueError, match="distinct"):
        dedup.fs_em(df, ["a", "a"])


def test_dp_group_clash_raises():
    with pytest.raises(ValueError, match="clash"):
        relational.dp_noisy_counts(None, ["n_true"])


def test_hashing_trick_id_clash_raises():
    with pytest.raises(ValueError, match="clash"):
        text.hashing_trick_features(None, dim=8, id_col="vec_csv")
