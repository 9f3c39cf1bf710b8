"""Regression tests for the r08-ADVICE fixes (round 9): NULL group
keys are regular groups across the grouped drift/calibration family,
kendall's sample is deterministic under duplicate keys, and cut_spans
honors the NULL-text contract."""

from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import (
    dedup,
    evaluation,
)


def test_benford_null_group_key_aggregates_like_any_group(spark):
    # group None: values 10..18 hit every digit once; group "a": all 1s
    rows = [(None, float(10 + i)) for i in range(9)]
    rows += [("a", 1.0), ("a", 1.5), ("a", 19.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = evaluation.benford_screen(df, "v", ("g",)).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append(r)
    # NULL group emits the full 9-row spine with its REAL counts
    assert len(by_g[None]) == 9
    assert sum(r.n_obs for r in by_g[None]) == 9
    assert all(r.n_total == 9 for r in by_g[None])
    # digit 1 observed once (value 10..18 -> first digits 1..1? no:
    # 10-18 give digit 1 nine times? 10,11,...,18 all start with 1)
    assert all(r.n_obs == (1 if r.digit == 1 else 0) or True for r in by_g[None])
    d1 = next(r for r in by_g[None] if r.digit == 1)
    assert d1.n_obs == 9  # 10..18 all have first digit 1
    assert len(by_g["a"]) == 9
    assert next(r for r in by_g["a"] if r.digit == 1).n_obs == 3


def _two_sided(spark, rows):
    return spark.createDataFrame(rows, "g string, v bigint, s boolean")


def test_ks_w1_mw_keep_null_group(spark):
    rows = []
    for g in [None, "x"]:
        rows += [(g, v, True) for v in (1, 2, 3, 4)]
        rows += [(g, v, False) for v in (3, 4, 5, 6)]
    df = _two_sided(spark, rows)
    ks = evaluation.ks_two_sample(df, "v", F.col("s"), group_cols=("g",)).collect()
    w1 = evaluation.wasserstein_two_sample(
        df, "v", F.col("s"), group_cols=("g",)
    ).collect()
    mw = evaluation.mann_whitney_u(
        df, "v", F.col("s"), group_cols=("g",)
    ).collect()
    for out in (ks, w1, mw):
        gs = {r.g for r in out}
        assert gs == {None, "x"}, gs
        for r in out:
            assert (r.n1, r.n2) == (4, 4)
    # identical data per group => identical statistics
    ks_by = {r.g: r.d_num for r in ks}
    assert ks_by[None] == ks_by["x"]
    w1_by = {r.g: r.w1_num for r in w1}
    assert w1_by[None] == w1_by["x"]


def test_isotonic_keeps_null_group(spark):
    rows = []
    for g in [None, "x"]:
        rows += [(g, b, y) for b, y in [(0, 0), (0, 1), (1, 1), (2, 0), (2, 1)]]
    df = spark.createDataFrame(rows, "g string, b bigint, y bigint")
    out = evaluation.isotonic_fit_bins(
        df, F.col("b"), F.col("y"), group_cols=("g",)
    ).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append(r)
    assert set(by_g) == {None, "x"}
    for g, rs in by_g.items():
        fitted = [r.fitted for r in sorted(rs, key=lambda r: r.bin)]
        assert fitted == sorted(fitted)  # monotone
    a = sorted((r.bin, r.fitted) for r in by_g[None])
    b = sorted((r.bin, r.fitted) for r in by_g["x"])
    assert a == b


def test_kendall_duplicate_keys_collapse_deterministically(spark):
    # key 1 appears twice with different (x, y): the lexicographically
    # smallest struct survives, so the result is pinned
    rows = [(1, 10, 5), (1, 2, 9), (2, 3, 3), (3, 7, 1)]
    df = spark.createDataFrame(rows, "k bigint, x bigint, y bigint")
    out1 = evaluation.kendall_tau_sampled(df, "k", "x", "y", k=10).collect()[0]
    out2 = evaluation.kendall_tau_sampled(df, "k", "x", "y", k=10).collect()[0]
    assert out1 == out2
    assert out1.n == 3  # duplicates collapsed
    # the surviving key-1 row is (2, 9) (min struct); replicate exactly
    expected = evaluation.kendall_tau_sampled(
        spark.createDataFrame(
            [(1, 2, 9), (2, 3, 3), (3, 7, 1)], "k bigint, x bigint, y bigint"
        ),
        "k",
        "x",
        "y",
        k=10,
    ).collect()[0]
    assert out1 == expected


def test_kendall_assume_unique_matches_collapse_on_unique_keys(spark):
    rows = [(i, i * 3 % 7, i * 5 % 11) for i in range(20)]
    df = spark.createDataFrame(rows, "k bigint, x bigint, y bigint")
    a = evaluation.kendall_tau_sampled(df, "k", "x", "y", k=12).collect()[0]
    b = evaluation.kendall_tau_sampled(
        df, "k", "x", "y", k=12, assume_unique_key=True
    ).collect()[0]
    assert a == b


def _py_brier(pairs, den, n_bins=10):
    """(p_num, y) pairs -> Murphy decomposition, Python reference."""
    from decimal import ROUND_HALF_UP, Decimal

    def q9(x):
        return Decimal(repr(x)).quantize(
            Decimal("0.000000001"), rounding=ROUND_HALF_UP
        )

    n = len(pairs)
    sse = sum((pn - den * y) ** 2 for pn, y in pairs)
    ytot = sum(y for _, y in pairs)
    bins = {}
    for pn, y in pairs:
        b = min((n_bins * pn) // den, n_bins - 1)
        nk, yk, pk = bins.get(b, (0, 0, 0))
        bins[b] = (nk + 1, yk + y, pk + pn)
    obar = ytot / n
    rel = res = Decimal(0)
    for nk, yk, pk in bins.values():
        pbar = pk / (nk * den)
        obk = yk / nk
        rel += q9(nk * (pbar - obk) * (pbar - obk))
        res += q9(nk * (obk - obar) * (obk - obar))
    brier = sse / n / den / den
    return {
        "n": n,
        "base_rate": obar,
        "sse_units": str(sse),
        "brier": brier,
        "reliability": float(rel) / n,
        "resolution": float(res) / n,
        "uncertainty": obar * (1.0 - obar),
    }


def test_brier_decomposition_matches_python_reference(spark):
    # 40 forecasts over denominator 39 with a noisy monotone outcome
    den = 39
    pairs = [(i, 1 if (i * 7) % 40 < i else 0) for i in range(40)]
    df = spark.createDataFrame(
        [(pn, den, y) for pn, y in pairs], "pn bigint, pd bigint, y bigint"
    )
    out = evaluation.brier_decomposition(
        df, F.col("pn"), F.col("pd"), F.col("y")
    ).collect()[0]
    ref = _py_brier(pairs, den)
    assert out.n == ref["n"]
    assert out.base_rate == ref["base_rate"]
    assert out.sse_units == ref["sse_units"]
    assert out.brier == ref["brier"]
    assert abs(out.reliability - ref["reliability"]) < 1e-12
    assert abs(out.resolution - ref["resolution"]) < 1e-12
    assert out.uncertainty == ref["uncertainty"]
    # decomposition identity up to the within-bin residual
    assert abs(
        out.brier - (out.reliability - out.resolution + out.uncertainty)
        - out.residual
    ) < 1e-15


def test_brier_perfect_and_constant_forecasts(spark):
    # perfect forecast: p = y exactly -> brier 0, reliability 0
    den = 1
    rows = [(0, den, 0)] * 5 + [(1, den, 1)] * 5
    df = spark.createDataFrame(rows, "pn bigint, pd bigint, y bigint")
    out = evaluation.brier_decomposition(
        df, F.col("pn"), F.col("pd"), F.col("y")
    ).collect()[0]
    assert out.brier == 0.0 and out.reliability == 0.0
    assert out.resolution == out.uncertainty  # perfect resolution
    # constant forecast at the base rate: resolution 0
    rows2 = [(1, 2, y) for y in (0, 1, 0, 1)]
    out2 = evaluation.brier_decomposition(
        spark.createDataFrame(rows2, "pn bigint, pd bigint, y bigint"),
        F.col("pn"),
        F.col("pd"),
        F.col("y"),
    ).collect()[0]
    assert out2.resolution == 0.0
    assert out2.brier == 0.25 and out2.uncertainty == 0.25


def test_cut_spans_null_text_emits_empty_contract(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, "keep these words")], "doc_id bigint, text string"
    )
    spans = spark.createDataFrame(
        [], "doc_id bigint, span_start bigint, span_end bigint"
    )
    out = {r.doc_id: r for r in dedup.cut_spans(docs, spans).collect()}
    assert out[1].text_clean == "" and out[1].n_tokens == 0
    assert out[1].n_tokens_removed == 0
    assert out[2].text_clean == "keep these words" and out[2].n_tokens == 3


def test_isotonic_decreasing_matches_negated_increasing(spark):
    import random

    rng = random.Random(17)
    rows = []
    for b in range(15):
        p = max(0.05, min(0.95, 0.9 - 0.06 * b + rng.uniform(-0.15, 0.15)))
        for _ in range(rng.randint(4, 30)):
            rows.append((b, 1 if rng.random() < p else 0))
    df = spark.createDataFrame(rows, "b int, y int")
    dec = {
        r.bin: r
        for r in evaluation.isotonic_fit_bins(
            df, F.col("b"), F.col("y"), decreasing=True
        ).collect()
    }
    # dual contract: decreasing fit on y == -(increasing fit on -y)
    inc_neg = {
        r.bin: r
        for r in evaluation.isotonic_fit_bins(
            df, F.col("b"), -F.col("y")
        ).collect()
    }
    assert sorted(dec) == sorted(inc_neg)
    for b in dec:
        assert abs(dec[b].fitted + inc_neg[b].fitted) < 1e-12
        assert dec[b].n == inc_neg[b].n
    # non-increasing by construction
    fitted = [dec[b].fitted for b in sorted(dec)]
    assert all(a >= c - 1e-15 for a, c in zip(fitted, fitted[1:]))


def test_isotonic_decreasing_already_antitone_is_identity(spark):
    rows = [(b, y) for b in range(5) for y in ([1] * (5 - b) + [0] * b)]
    df = spark.createDataFrame(rows, "b int, y int")
    got = {
        r.bin: r
        for r in evaluation.isotonic_fit_bins(
            df, F.col("b"), F.col("y"), decreasing=True
        ).collect()
    }
    for b in range(5):
        assert abs(got[b].fitted - (5 - b) / 5.0) < 1e-12
        assert got[b].mean_raw == got[b].fitted
