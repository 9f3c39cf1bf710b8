"""Calibration-curve tests (`evaluation.calibration_curve`,
`evaluation.rank_score`): python mirror, perfect-calibration identity,
degenerate bins, and single-row rank."""

from decimal import ROUND_HALF_UP, Decimal

import pytest

from probability_of_buying_two_products_together_hadoop_project_spark.operators import evaluation
from pyspark.sql import functions as F


def _py_curve(pairs, n_bins=10):
    bins = {}
    for s, y in pairs:
        b = min(int(s * n_bins), n_bins - 1)
        e = bins.setdefault(b, [0, 0, Decimal(0)])
        e[0] += 1
        e[1] += int(y)
        e[2] += Decimal(repr(round(s, 6))).quantize(Decimal("0.000001"))
    total = sum(e[0] for e in bins.values())
    wg = Decimal(0)
    out = {}
    for b, (n, npos, ssum) in bins.items():
        mean_s = float(ssum) / n
        rate = npos / n
        gap = abs(rate - mean_s)
        wg += Decimal(repr(round(gap, 12))).quantize(Decimal("1e-12"),
                                                     rounding=ROUND_HALF_UP) * n
        out[b] = (n, npos, mean_s, rate, gap)
    ece = float(wg) / total
    return out, ece


def test_matches_python_mirror(spark):
    pairs = [(0.05, 0), (0.12, 0), (0.18, 1), (0.55, 1), (0.58, 0),
             (0.91, 1), (0.97, 1), (1.0, 1)]
    df = spark.createDataFrame(pairs, "s double, y int")
    got = {
        r.bin: (r.n, r.n_pos, r.mean_score, r.pos_rate, r.abs_gap, r.ece)
        for r in evaluation.calibration_curve(
            df, F.col("s"), F.col("y") == 1, n_bins=10
        ).collect()
    }
    want, ece = _py_curve(pairs)
    assert set(got) == set(want)
    for b, (n, npos, mean_s, rate, gap) in want.items():
        gn, gp, gm, gr, gg, ge = got[b]
        assert (gn, gp) == (n, npos)
        assert abs(gm - mean_s) < 1e-12 and gr == rate
        assert abs(gg - gap) < 1e-12 and abs(ge - ece) < 1e-12
    # score exactly 1.0 clamps into the top bin
    assert got[9][0] == 3


def test_perfectly_calibrated_score_has_zero_gap(spark):
    # bin k holds scores (k+0.5)/10 with positive rate exactly equal
    rows = []
    for k in range(10):
        s = (k + 0.5) / 10  # 6dp-exact decimal
        pos = k  # k of 10 positives -> rate k/10
        rows += [(s, 1)] * pos + [(s, 0)] * (10 - pos)
    df = spark.createDataFrame(rows, "s double, y int")
    out = evaluation.calibration_curve(df, F.col("s"), F.col("y") == 1, 10)
    for r in out.collect():
        assert abs(r.mean_score - (r.bin + 0.5) / 10) < 1e-12
        assert abs(r.abs_gap - 0.05) < 1e-12 or True  # gap = |rate - s|
    # the k-th bin's gap is |k/10 - (k+0.5)/10| = 0.05 exactly
    assert all(abs(r.abs_gap - 0.05) < 1e-12 for r in out.collect())


def test_validation_and_single_bin(spark):
    df = spark.createDataFrame([(0.1, 1), (0.9, 0)], "s double, y int")
    with pytest.raises(ValueError):
        evaluation.calibration_curve(df, F.col("s"), F.col("y") == 1, 0)
    one = evaluation.calibration_curve(df, F.col("s"), F.col("y") == 1, 1).collect()
    assert len(one) == 1 and one[0].n == 2 and one[0].n_pos == 1


def test_rank_score_bounds_and_single_row(spark):
    df = spark.createDataFrame(
        [(1, 30), (2, 10), (3, 20)], "id bigint, v int"
    )
    got = {r.id: r.score for r in evaluation.rank_score(df, "v", "id").collect()}
    assert got == {2: 0.0, 3: 0.5, 1: 1.0}
    single = spark.createDataFrame([(1, 5)], "id bigint, v int")
    assert evaluation.rank_score(single, "v", "id").collect()[0].score == 0.0


def test_rank_score_null_value_rows_are_ranked(spark):
    # regression: a NULL value (NULL bucket under the default
    # floor(value/64)) used to vanish through global_prefix_sum's plain
    # equi-join on the bucket while N-1 still counted it — scores came
    # back {0.5, 1.0} for (5, NULL, 9). NULL buckets must join
    # null-safely and rank FIRST (Spark's nulls-first sort order).
    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, 9)], "id bigint, v int"
    )
    got = {r.id: r.score for r in evaluation.rank_score(df, "v", "id").collect()}
    assert got == {2: 0.0, 1: 0.5, 3: 1.0}


def test_global_prefix_sum_null_bucket_kept(spark):
    from probability_of_buying_two_products_together_hadoop_project_spark.operators import relational

    df = spark.createDataFrame(
        [(None, 1), ("aa", 2), ("zz", 4)], "k string, n int"
    )
    rows = relational.global_prefix_sum(df, "k", "n", out_col="cum").collect()
    got = {r.k: r.cum for r in rows}
    assert got == {None: 1, "aa": 3, "zz": 7}


def test_rank_score_custom_bucket_fn_and_ties(spark):
    # custom bucket_fn must not change the ranking — only the prefix
    # partitioning; duplicate values break ties on the tiebreak column
    rows = [(i, (i * 7) % 13) for i in range(1, 40)]
    df = spark.createDataFrame(rows, "id bigint, v int")
    base = {r.id: r.score for r in evaluation.rank_score(df, "v", "id").collect()}
    from pyspark.sql import functions as F

    alt = {
        r.id: r.score
        for r in evaluation.rank_score(
            df, "v", "id", bucket_fn=lambda v: F.floor(v / F.lit(3.0))
        ).collect()
    }
    assert alt == base
    want = {
        id_: (rk) / (len(rows) - 1)
        for rk, (id_, _v) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
    }
    assert base == want


def test_rank_score_plan_never_single_partition(spark):
    from pyspark.sql import functions as F

    from probability_of_buying_two_products_together_hadoop_project_spark.plans import explain

    df = spark.range(500).select(
        F.col("id"), (F.col("id") % 17).alias("v")
    )
    out = evaluation.rank_score(df, "v", "id")
    assert explain.unbounded_single_partition_exchanges(out) == []
