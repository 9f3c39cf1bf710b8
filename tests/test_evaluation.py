"""Property tests for operators/evaluation.py (ROC-AUC, Gini,
Kaplan-Meier) and text.pmi_collocations against independent pure-Python
references."""

import math
import random
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import (  # noqa: E501
    evaluation,
    text,
)


# ---------------------------------------------------------------------------
# pure-python references
# ---------------------------------------------------------------------------


def py_auc(pairs):
    """Exact AUC by brute-force pair comparison (ties count half)."""
    pos = [s for y, s in pairs if y == 1]
    neg = [s for y, s in pairs if y == 0]
    if not pos or not neg:
        return None
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


def py_gini(values):
    xs = sorted(values)
    n = len(xs)
    tot = sum(xs)
    if n <= 1 or tot <= 0:
        return None
    num = sum((i + 1) * x for i, x in enumerate(xs))
    return float((2 * num - (n + 1) * tot) / (n * tot))


def _round6(x: float) -> Decimal:
    """The engine's F.round contract: decimal HALF_UP on the shortest
    repr of the double (mirrors the BM25 test fix)."""
    return Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)


def py_km(subjects):
    """(duration, n_risk, n_events, n_censored, log_survival) rows."""
    from collections import Counter

    n = len(subjects)
    exits = Counter(d for d, _ in subjects)
    deaths = Counter(d for d, e in subjects if e == 1)
    out = {}
    cc = 0
    ls = Decimal(0)
    absorbed = False
    for d in sorted(exits):
        m = exits[d]
        dd = deaths.get(d, 0)
        risk = n - cc
        if dd >= risk:
            absorbed = True
        elif dd > 0:
            ls += _round6(math.log(1.0 - dd / risk))
        out[d] = (risk, dd, m - dd, None if absorbed else float(ls))
        cc += m
    return out


# ---------------------------------------------------------------------------
# roc_auc
# ---------------------------------------------------------------------------


def test_roc_auc_matches_bruteforce_with_ties(spark):
    rng = random.Random(7)
    rows = [
        ("g1", rng.randint(0, 1), rng.randint(0, 15)) for _ in range(300)
    ] + [("g2", rng.randint(0, 1), rng.randint(0, 3)) for _ in range(200)]
    df = spark.createDataFrame(rows, "g string, y int, score int")
    got = {
        r.g: (r.n_pos, r.n_neg, r.auc)
        for r in evaluation.roc_auc(df, "y", "score", ("g",)).collect()
    }
    for g in ("g1", "g2"):
        sub = [(y, s) for gg, y, s in rows if gg == g]
        want = py_auc(sub)
        npos = sum(y for y, _ in sub)
        assert got[g][0] == npos and got[g][1] == len(sub) - npos
        assert got[g][2] == pytest.approx(want, abs=1e-12)


def py_ks(xs, ys):
    """Brute-force two-sample KS over the pooled support: returns
    (d_num, at_value) with d_num = max |c1*n2 - c2*n1|, smallest value
    attaining it."""
    n1, n2 = len(xs), len(ys)
    best, at = -1, None
    for v in sorted(set(xs) | set(ys)):
        c1 = sum(1 for x in xs if x <= v)
        c2 = sum(1 for y in ys if y <= v)
        gap = abs(c1 * n2 - c2 * n1)
        if gap > best:
            best, at = gap, v
    return best, at


def test_ks_two_sample_matches_bruteforce(spark):
    rng = random.Random(11)
    xs = [rng.randint(0, 30) for _ in range(120)]
    ys = [rng.randint(5, 40) for _ in range(80)]
    rows = [(v, True) for v in xs] + [(v, False) for v in ys]
    df = spark.createDataFrame(rows, "v int, s boolean")
    row = evaluation.ks_two_sample(df, "v", F.col("s")).collect()[0]
    d_num, at = py_ks(xs, ys)
    assert (row.n1, row.n2) == (len(xs), len(ys))
    assert int(row.d_num) == d_num
    assert row.at_value == at
    assert row.ks_d == d_num / float(len(xs) * len(ys))


def test_ks_identical_and_disjoint(spark):
    xs = list(range(50))
    # identical samples: D = 0 at the smallest pooled value
    rows = [(v, True) for v in xs] + [(v, False) for v in xs]
    row = evaluation.ks_two_sample(
        spark.createDataFrame(rows, "v int, s boolean"), "v", F.col("s")
    ).collect()[0]
    assert int(row.d_num) == 0 and row.ks_d == 0.0 and row.at_value == 0
    # disjoint supports: D = 1 exactly
    rows = [(v, True) for v in range(10)] + [(v + 100, False) for v in range(7)]
    row = evaluation.ks_two_sample(
        spark.createDataFrame(rows, "v int, s boolean"), "v", F.col("s")
    ).collect()[0]
    assert row.ks_d == 1.0 and int(row.d_num) == 10 * 7 and row.at_value == 9


def test_ks_empty_side_is_null(spark):
    rows = [(v, True) for v in range(5)]
    row = evaluation.ks_two_sample(
        spark.createDataFrame(rows, "v int, s boolean"), "v", F.col("s")
    ).collect()[0]
    assert row.n2 == 0 and row.ks_d is None


def test_ks_null_values_are_excluded(spark):
    # NULLs must not enter n1/n2 or the ECDF (ADVICE r07): the result
    # with NULL rows present equals the result with them pre-filtered
    rng = random.Random(29)
    xs = [rng.randint(0, 20) for _ in range(60)]
    ys = [rng.randint(3, 25) for _ in range(40)]
    clean = [(v, True) for v in xs] + [(v, False) for v in ys]
    dirty = clean + [(None, True)] * 5 + [(None, False)] * 3
    r_clean = evaluation.ks_two_sample(
        spark.createDataFrame(clean, "v int, s boolean"), "v", F.col("s")
    ).collect()[0]
    r_dirty = evaluation.ks_two_sample(
        spark.createDataFrame(dirty, "v int, s boolean"), "v", F.col("s")
    ).collect()[0]
    assert r_dirty == r_clean
    assert (r_dirty.n1, r_dirty.n2) == (len(xs), len(ys))


def test_roc_auc_perfect_and_degenerate(spark):
    rows = [("a", 1, 10), ("a", 1, 9), ("a", 0, 1), ("a", 0, 2)] + [
        ("b", 1, 5),
        ("b", 1, 7),
    ]
    df = spark.createDataFrame(rows, "g string, y int, score int")
    got = {r.g: r.auc for r in evaluation.roc_auc(df, "y", "score", ("g",)).collect()}
    assert got["a"] == 1.0
    assert got["b"] is None  # single-class: no ranking to grade


def test_roc_auc_all_tied_is_half(spark):
    rows = [("a", y, 3) for y in (0, 1, 0, 1, 1)]
    df = spark.createDataFrame(rows, "g string, y int, score int")
    [r] = evaluation.roc_auc(df, "y", "score", ("g",)).collect()
    assert r.auc == 0.5


# ---------------------------------------------------------------------------
# gini_coefficient
# ---------------------------------------------------------------------------


def test_gini_matches_reference_and_bounds(spark):
    rng = random.Random(13)
    groups = {
        "even": [100] * 50,
        "skew": [0] * 30 + [1] * 15 + [10_000] * 5,
        "rand": [rng.randint(0, 500) for _ in range(120)],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v int").select(
        "g", F.col("v").cast("decimal(18,4)").alias("v")
    )
    got = {
        r.g: (r.n, r.total, r.gini)
        for r in evaluation.gini_coefficient(df, "v", ("g",)).collect()
    }
    for g, vs in groups.items():
        assert got[g][0] == len(vs)
        assert got[g][1] == pytest.approx(sum(vs))
        assert got[g][2] == pytest.approx(py_gini(vs), abs=1e-12)
    assert got["even"][2] == 0.0
    assert got["skew"][2] > 0.85


def test_gini_null_on_zero_total_or_singleton(spark):
    df = spark.createDataFrame(
        [("z", 0), ("z", 0), ("s", 7)], "g string, v int"
    ).select("g", F.col("v").cast("decimal(18,4)").alias("v"))
    got = {r.g: r.gini for r in evaluation.gini_coefficient(df, "v", ("g",)).collect()}
    assert got == {"z": None, "s": None}


# ---------------------------------------------------------------------------
# kaplan_meier
# ---------------------------------------------------------------------------


def test_kaplan_meier_matches_reference(spark):
    rng = random.Random(29)
    subjects = [
        (rng.randint(0, 12), rng.randint(0, 1)) for _ in range(400)
    ]
    df = spark.createDataFrame(subjects, "duration long, event int")
    got = {
        r.duration: (r.n_risk, r.n_events, r.n_censored, r.log_survival)
        for r in evaluation.kaplan_meier(df).collect()
    }
    want = py_km(subjects)
    assert set(got) == set(want)
    for d, (risk, dd, cens, ls) in want.items():
        assert got[d][:3] == (risk, dd, cens)
        if ls is None:
            assert got[d][3] is None
        else:
            assert got[d][3] == pytest.approx(ls, abs=1e-12)
    # survival is non-increasing over the defined prefix
    defined = [got[d][3] for d in sorted(got) if got[d][3] is not None]
    assert all(a >= b for a, b in zip(defined, defined[1:]))


def test_kaplan_meier_absorption_nulls_suffix(spark):
    # every subject dies at d=2: survival hits exactly 0 there
    subjects = [(0, 0), (1, 1), (2, 1), (2, 1)]
    df = spark.createDataFrame(subjects, "duration long, event int")
    got = {
        r.duration: r.log_survival for r in evaluation.kaplan_meier(df).collect()
    }
    assert got[0] == 0.0  # censor only: no hazard
    assert got[1] < 0.0
    assert got[2] is None


# ---------------------------------------------------------------------------
# pmi_collocations
# ---------------------------------------------------------------------------


def py_pmi(texts, min_count, k):
    from collections import Counter

    bi = Counter()
    for t in texts:
        tk = t.lower().split()
        bi.update(" ".join(p) for p in zip(tk, tk[1:]))
    n = sum(bi.values())
    left = Counter()
    right = Counter()
    for g, c in bi.items():
        a, b = g.split(" ")
        left[a] += c
        right[b] += c
    out = []
    for g, c in bi.items():
        if c < min_count:
            continue
        a, b = g.split(" ")
        pmi = float(
            _round6(math.log((float(c) * float(n)) / (float(left[a]) * float(right[b]))))
        )
        out.append((g, c, left[a], right[b], pmi))
    out.sort(key=lambda r: (-r[4], r[0]))
    return out[:k]


def test_pmi_matches_reference(spark):
    rng = random.Random(41)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for _ in range(80):
        toks = [rng.choice(vocab) for _ in range(rng.randint(2, 40))]
        # plant a strong collocation
        if rng.random() < 0.6:
            toks += ["deep", "learning"]
        texts.append(" ".join(toks))
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = [
        (r.bigram, r.cnt, r.c_left, r.c_right, r.pmi)
        for r in text.pmi_collocations(df, min_count=3, k=20).collect()
    ]
    assert got == py_pmi(texts, 3, 20)
    assert got[0][0] == "deep learning"  # the planted phrase tops the list


def test_pmi_rejects_bad_min_count(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        text.pmi_collocations(df, min_count=0)


# ---------------------------------------------------------------------------
# activity_streaks (gaps-and-islands)
# ---------------------------------------------------------------------------


def py_streaks(day_sets):
    out = {}
    for u, days in day_sets.items():
        ds = sorted(set(days))
        runs = []
        cur = 1
        for a, b in zip(ds, ds[1:]):
            if (b - a).days == 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        out[u] = (max(runs), len(runs), len(ds))
    return out


def test_activity_streaks_matches_reference(spark):
    import datetime

    from probability_of_buying_two_products_together_hadoop_project_spark.operators import (  # noqa: E501
        timeseries,
    )

    rng = random.Random(17)
    base = datetime.date(2024, 3, 1)
    day_sets = {
        u: [
            base + datetime.timedelta(days=rng.randint(0, 40))
            for _ in range(rng.randint(1, 60))
        ]
        for u in range(12)
    }
    rows = [
        (u, datetime.datetime.combine(d, datetime.time(hour=rng.randint(0, 23))))
        for u, ds in day_sets.items()
        for d in ds
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r.user_id: (r.longest_streak, r.n_streaks, r.active_days)
        for r in timeseries.activity_streaks(df).collect()
    }
    assert got == py_streaks(day_sets)


# ---------------------------------------------------------------------------
# target_encode
# ---------------------------------------------------------------------------


def test_target_encode_matches_reference(spark):
    rows = [("a", 10.0)] * 3 + [("a", 20.0)] + [("b", 100.0)] + [
        ("c", 1.0),
        ("c", 3.0),
    ]
    df = spark.createDataFrame(rows, "cat string, v double")
    got = {
        r.cat: (r.n, r.cat_mean, r.encoded)
        for r in evaluation.target_encode(df, "cat", "v", smoothing=2).collect()
    }
    gm = sum(v for _, v in rows) / len(rows)
    for cat in ("a", "b", "c"):
        vs = [v for c, v in rows if c == cat]
        want_enc = (sum(vs) + 2 * gm) / (len(vs) + 2)
        assert got[cat][0] == len(vs)
        assert got[cat][1] == pytest.approx(sum(vs) / len(vs), abs=1e-12)
        assert got[cat][2] == pytest.approx(want_enc, abs=1e-12)
    # shrinkage direction: the singleton category moves toward the prior
    assert abs(got["b"][2] - gm) < abs(got["b"][1] - gm)


def test_target_encode_zero_smoothing_is_raw_mean(spark):
    df = spark.createDataFrame(
        [("a", 4.0), ("a", 6.0), ("b", 10.0)], "cat string, v double"
    )
    got = {
        r.cat: r.encoded
        for r in evaluation.target_encode(df, "cat", "v", smoothing=0).collect()
    }
    assert got == {"a": 5.0, "b": 10.0}


def test_target_encode_rejects_negative_smoothing(spark):
    df = spark.createDataFrame([("a", 1.0)], "cat string, v double")
    with pytest.raises(ValueError):
        evaluation.target_encode(df, "cat", "v", smoothing=-1)


# ---------------------------------------------------------------------------
# hypothesis: rounding-tie hunting (the BM25-lesson guard) for KM + AUC
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

subjects_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=6), st.integers(0, 1)),
    min_size=1,
    max_size=40,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(subjects_strategy)
def test_kaplan_meier_hypothesis_vs_reference(spark, subjects):
    df = spark.createDataFrame(subjects, "duration long, event int")
    got = {
        r.duration: (r.n_risk, r.n_events, r.n_censored, r.log_survival)
        for r in evaluation.kaplan_meier(df).collect()
    }
    want = py_km(subjects)
    assert set(got) == set(want)
    for d, w in want.items():
        assert got[d][:3] == w[:3]
        if w[3] is None:
            assert got[d][3] is None
        else:
            # exact: both sides sum identical 6dp decimals
            assert got[d][3] == w[3]


scored_strategy = st.lists(
    st.tuples(st.integers(0, 1), st.integers(min_value=-3, max_value=3)),
    min_size=1,
    max_size=30,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(scored_strategy)
def test_roc_auc_hypothesis_vs_bruteforce(spark, pairs):
    df = spark.createDataFrame(
        [("g", y, s) for y, s in pairs], "g string, y int, score int"
    )
    [r] = evaluation.roc_auc(df, "y", "score", ("g",)).collect()
    want = py_auc(pairs)
    if want is None:
        assert r.auc is None
    else:
        assert r.auc == pytest.approx(want, abs=1e-12)


# ---------------------------------------------------------------------------
# spearman_corr
# ---------------------------------------------------------------------------


def py_spearman(pairs):
    from collections import Counter

    def ranks(vals):
        cnt = Counter(vals)
        cum = {}
        cc = 0
        for v in sorted(cnt):
            cc += cnt[v]
            cum[v] = 2 * cc - cnt[v] + 1  # 2x-scaled tie-averaged rank
        return [cum[v] for v in vals]

    xs = ranks([x for x, _ in pairs])
    ys = ranks([y for _, y in pairs])
    n = len(pairs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(a * a for a in xs)
    syy = sum(a * a for a in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    if vx <= 0 or vy <= 0:
        return None
    return (n * sxy - sx * sy) / math.sqrt(vx * vy)


def test_spearman_matches_reference_with_ties(spark):
    rng = random.Random(53)
    pairs = [(rng.randint(0, 20), rng.randint(0, 8)) for _ in range(300)]
    df = spark.createDataFrame(pairs, "x int, y int")
    [r] = evaluation.spearman_corr(df, "x", "y").collect()
    assert r.n == 300
    assert r.spearman == pytest.approx(py_spearman(pairs), abs=1e-12)


def test_spearman_perfect_monotone_and_constant(spark):
    inc = [(i, i * i) for i in range(30)]  # monotone, nonlinear
    df = spark.createDataFrame(inc, "x int, y int")
    [r] = evaluation.spearman_corr(df, "x", "y").collect()
    assert r.spearman == pytest.approx(1.0, abs=1e-12)
    dec = [(i, -3 * i) for i in range(30)]
    [r2] = evaluation.spearman_corr(
        spark.createDataFrame(dec, "x int, y int"), "x", "y"
    ).collect()
    assert r2.spearman == pytest.approx(-1.0, abs=1e-12)
    const = [(i, 7) for i in range(10)]
    [r3] = evaluation.spearman_corr(
        spark.createDataFrame(const, "x int, y int"), "x", "y"
    ).collect()
    assert r3.spearman is None


# ---------------------------------------------------------------------------
# classification_report
# ---------------------------------------------------------------------------


def test_classification_report_matches_reference(spark):
    rows = (
        [("a", "a")] * 8 + [("a", "b")] * 2       # a: tp=8 fn=2
        + [("b", "b")] * 5 + [("b", "c")] * 1     # b: tp=5 fn=1, fp=2 (from a)
        + [("c", "a")] * 3                         # c never predicted right
        + [("d", "e")] * 2                         # e never in truth
    )
    df = spark.createDataFrame(rows, "t string, p string")
    got = {
        r.label: (r.support, r.tp, r.fp, r.fn, r.precision, r.recall, r.f1)
        for r in evaluation.classification_report(df, "t", "p").collect()
    }
    assert got["a"] == (10, 8, 3, 2, 8 / 11, 0.8, 16 / 21)
    assert got["b"] == (6, 5, 2, 1, 5 / 7, 5 / 6, 10 / 13)
    assert got["c"][:4] == (3, 0, 1, 3) and got["c"][4] == 0.0 and got["c"][5] == 0.0
    # e: present only as a prediction -> support 0, recall NULL
    assert got["e"][:4] == (0, 0, 2, 0)
    assert got["e"][4] == 0.0 and got["e"][5] is None
    # d: never predicted -> precision NULL (not 0.0)
    assert got["d"][:4] == (2, 0, 0, 2) and got["d"][4] is None


def test_classification_summary_matches_report(spark):
    rows = (
        [("a", "a")] * 8 + [("a", "b")] * 2
        + [("b", "b")] * 5 + [("b", "c")] * 1
        + [("c", "a")] * 3
        + [("d", "e")] * 2
    )
    df = spark.createDataFrame(rows, "t string, p string")
    [s] = evaluation.classification_summary(df, "t", "p").collect()
    assert s.n_rows == len(rows)
    assert s.accuracy == pytest.approx((8 + 5) / len(rows), abs=1e-12)
    rep = evaluation.classification_report(df, "t", "p").collect()
    for metric, col in (
        ("macro_precision", "precision"),
        ("macro_recall", "recall"),
        ("macro_f1", "f1"),
    ):
        defined = [
            float(
                Decimal(repr(round(getattr(r, col), 6))).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )
            for r in rep
            if getattr(r, col) is not None
        ]
        assert getattr(s, metric) == pytest.approx(
            sum(defined) / len(defined), abs=1e-9
        )


def py_welch(xs, ys):
    n1, n2 = len(xs), len(ys)
    if n1 < 2 or n2 < 2:
        return None
    m1, m2 = sum(xs) / n1, sum(ys) / n2
    v1 = (n1 * sum(x * x for x in xs) - sum(xs) ** 2) / (n1 * (n1 - 1))
    v2 = (n2 * sum(y * y for y in ys) - sum(ys) ** 2) / (n2 * (n2 - 1))
    a, b = v1 / n1, v2 / n2
    if a + b <= 0:
        return None
    t = (m1 - m2) / math.sqrt(a + b)
    dfw = (a + b) ** 2 / (a * a / (n1 - 1) + b * b / (n2 - 1))
    return t, dfw


def test_welch_matches_reference(spark):
    rng = random.Random(9)
    xs = [round(rng.uniform(10, 50), 2) for _ in range(60)]
    ys = [round(rng.uniform(20, 80), 2) for _ in range(40)]
    rows = [(v, True) for v in xs] + [(v, False) for v in ys]
    df = spark.createDataFrame(rows, "v double, s boolean")
    row = evaluation.welch_ttest(df, "v", F.col("s")).collect()[0]
    t, dfw = py_welch(xs, ys)
    assert (row.n1, row.n2) == (60, 40)
    assert row.mean1 == pytest.approx(sum(xs) / 60, abs=1e-9)
    assert row.t_stat == pytest.approx(t, rel=1e-12)
    assert row.df_welch == pytest.approx(dfw, rel=1e-12)
    # df must land between min(n)-1 and n1+n2-2 (Welch bounds)
    assert 39 <= row.df_welch <= 98


def test_welch_degenerate_sides_null(spark):
    rows = [(1.0, True), (2.0, False), (3.0, False)]
    df = spark.createDataFrame(rows, "v double, s boolean")
    row = evaluation.welch_ttest(df, "v", F.col("s")).collect()[0]
    assert row.t_stat is None and row.df_welch is None
    assert row.mean1 == 1.0
    # constant values on both sides: se = 0 -> null, not inf
    rows = [(5.0, True)] * 3 + [(5.0, False)] * 3
    df = spark.createDataFrame(rows, "v double, s boolean")
    row = evaluation.welch_ttest(df, "v", F.col("s")).collect()[0]
    assert row.t_stat is None


def test_benford_on_benford_and_uniform_data(spark):
    rng = random.Random(17)
    # genuinely Benford: magnitudes spanning decades (exp of uniform)
    benford_vals = [math.exp(rng.uniform(0, 12)) + 1 for _ in range(4000)]
    uniform_vals = [rng.uniform(40000, 60000) for _ in range(4000)]
    rows = [("nat", v) for v in benford_vals] + [("gen", v) for v in uniform_vals]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r.g, r.digit): r for r in evaluation.benford_screen(df, "v", ("g",)).collect()
    }
    chi_nat = got[("nat", 1)].chi2
    chi_gen = next(r.chi2 for (g, _), r in got.items() if g == "gen")
    # natural magnitudes conform (small chi2); the uniform band fails wildly
    assert chi_nat < chi_gen / 10
    # exact accounting: per-group counts sum to the total, shares to ~1
    for g, vals in (("nat", benford_vals), ("gen", uniform_vals)):
        n = sum(got[(g, d)].n_obs for d in range(1, 10) if (g, d) in got)
        n_total = next(r.n_total for (gg, _), r in got.items() if gg == g)
        assert n == len(vals) == n_total
    # digit-1 share for Benford data near log10(2) = .301
    assert abs(got[("nat", 1)].obs_share - 0.301) < 0.03
    assert got[("nat", 1)].exp_share == float(evaluation.BENFORD_P6[1])


def test_benford_excludes_sub_one_values(spark):
    df = spark.createDataFrame(
        [(0.5,), (0.9,), (12.0,), (19.0,), (None,)], "v double"
    )
    rows = {r.digit: r for r in evaluation.benford_screen(df, "v").collect()}
    # the digit spine: all 9 digits present, absent ones at n_obs 0
    assert sorted(rows) == list(range(1, 10))
    assert rows[1].n_obs == 2 and rows[1].n_total == 2
    assert all(rows[d].n_obs == 0 for d in range(2, 10))
    # sub-1 and NULL rows are skipped AND counted
    assert all(rows[d].n_skipped == 3 for d in range(1, 10))


def test_benford_absent_digit_contributes_expected_term(spark):
    # all values start with digit 1: digits 2..9 are wholly absent and
    # must each contribute their full (0-E)^2/E = E chi2 term — the
    # strongest fabrication signal (ADVICE r07 medium finding)
    df = spark.createDataFrame(
        [(float(10 + i % 10),) for i in range(50)], "v double"
    )
    rows = {r.digit: r for r in evaluation.benford_screen(df, "v").collect()}
    assert sorted(rows) == list(range(1, 10))
    n = 50
    exp_chi2 = 0.0
    for d in range(1, 10):
        e = float(evaluation.BENFORD_P6[d]) * n
        o = n if d == 1 else 0
        exp_chi2 += round((o - e) ** 2 / e, 9)
    assert abs(rows[1].chi2 - exp_chi2) < 1e-6
    # the absent-digit terms dominate: chi2 far above digit-1's term alone
    e1 = float(evaluation.BENFORD_P6[1]) * n
    assert rows[1].chi2 > (n - e1) ** 2 / e1 + 1.0


def test_benford_all_skipped_group_emits_nothing(spark):
    df = spark.createDataFrame(
        [("a", 12.0), ("b", 0.2), ("b", None)], "g string, v double"
    )
    rows = evaluation.benford_screen(df, "v", ("g",)).collect()
    assert {r.g for r in rows} == {"a"} and len(rows) == 9


def py_mi(pairs):
    from collections import Counter

    n = len(pairs)
    cxy, cx, cy = Counter(pairs), Counter(x for x, _ in pairs), Counter(
        y for _, y in pairs
    )
    q6 = lambda v: _round6(v)  # noqa: E731
    mi = sum(c * q6(math.log(c * n / (cx[x] * cy[y]))) for (x, y), c in cxy.items())
    hx = sum(c * q6(-math.log(c / n)) for c in cx.values())
    hy = sum(c * q6(-math.log(c / n)) for c in cy.values())
    return float(mi) / n, float(hx) / n, float(hy) / n


def test_mutual_information_matches_reference(spark):
    rng = random.Random(19)
    # dependent pair: y follows x 70% of the time
    pairs = []
    for _ in range(2000):
        x = rng.randint(0, 3)
        y = x if rng.random() < 0.7 else rng.randint(0, 3)
        pairs.append((x, y))
    df = spark.createDataFrame(pairs, "x int, y int")
    row = evaluation.mutual_information(df, F.col("x"), F.col("y")).collect()[0]
    mi, hx, hy = py_mi(pairs)
    assert row.n_rows == 2000
    assert row.mi_nats == pytest.approx(mi, abs=1e-9)
    assert row.hx_nats == pytest.approx(hx, abs=1e-9)
    assert row.nmi == pytest.approx(mi / math.sqrt(hx * hy), abs=1e-9)
    assert row.mi_nats > 0.3  # the dependence is real


def test_mutual_information_independent_and_constant(spark):
    # independent uniform pair: MI near 0 (and never negative beyond
    # quantization slack)
    rng = random.Random(23)
    pairs = [(rng.randint(0, 3), rng.randint(0, 3)) for _ in range(4000)]
    df = spark.createDataFrame(pairs, "x int, y int")
    row = evaluation.mutual_information(df, F.col("x"), F.col("y")).collect()[0]
    assert abs(row.mi_nats) < 0.01
    # constant y: hy = 0 -> nmi null
    df2 = spark.createDataFrame([(i % 3, 7) for i in range(30)], "x int, y int")
    row2 = evaluation.mutual_information(df2, F.col("x"), F.col("y")).collect()[0]
    assert row2.hy_nats == 0.0 and row2.nmi is None and row2.mi_nats == 0.0


def py_psi(xs, ys, lo, hi, n_bins):
    from collections import Counter

    def binize(v):
        b = math.floor(((v - lo) * n_bins) / float(hi - lo))
        return min(n_bins - 1, max(0, int(b)))

    cx, cy = Counter(map(binize, xs)), Counter(map(binize, ys))
    bins = sorted(set(cx) | set(cy))
    c1 = {b: cx.get(b, 0) + 1 for b in bins}
    c2 = {b: cy.get(b, 0) + 1 for b in bins}
    n1, n2 = sum(c1.values()), sum(c2.values())
    total = 0
    out = {}
    for b in bins:
        p9 = (c1[b] * 10**9) // n1
        q9 = (c2[b] * 10**9) // n2
        lnr = _round6(math.log((c1[b] * n2) / (c2[b] * n1)))
        out[b] = (c1[b], c2[b], (p9 - q9) * lnr)
        total += (p9 - q9) * lnr
    return out, float(total) / 1e9


def test_psi_matches_reference_and_detects_shift(spark):
    rng = random.Random(13)
    xs = [rng.uniform(10, 50) for _ in range(3000)]
    ys = [rng.uniform(30, 80) for _ in range(2000)]  # shifted cohort
    rows = [(v, True) for v in xs] + [(v, False) for v in ys]
    df = spark.createDataFrame(rows, "v double, s boolean")
    got = {
        r.bin: r
        for r in evaluation.psi_drift(df, "v", F.col("s"), 0, 100, 10).collect()
    }
    want, psi = py_psi(xs, ys, 0, 100, 10)
    for b, (c1, c2, term) in want.items():
        assert (got[b].c1, got[b].c2) == (c1, c2)
        assert got[b].term == pytest.approx(float(term) / 1e9, abs=1e-15)
    any_bin = next(iter(got))
    assert got[any_bin].psi == pytest.approx(psi, abs=1e-12)
    assert got[any_bin].psi > 0.25  # the shift is detected


def test_psi_identical_cohorts_near_zero_and_validation(spark):
    vals = [float(v % 37) for v in range(4000)]
    rows = [(v, i % 2 == 0) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "v double, s boolean")
    got = evaluation.psi_drift(df, "v", F.col("s"), 0, 40, 8).collect()
    assert abs(got[0].psi) < 0.01
    with pytest.raises(ValueError):
        evaluation.psi_drift(df, "v", F.col("s"), 5, 5)
    with pytest.raises(ValueError):
        evaluation.psi_drift(df, "v", F.col("s"), 0, 10, n_bins=1)


def test_psi_null_values_are_excluded(spark):
    # floor(NULL) must not mint an 11th bin or enter the totals
    # (ADVICE r07): NULL rows present == NULL rows pre-filtered
    rng = random.Random(31)
    clean = [(rng.uniform(0, 40), i % 2 == 0) for i in range(500)]
    dirty = clean + [(None, True)] * 7 + [(None, False)] * 4
    r_clean = sorted(
        evaluation.psi_drift(
            spark.createDataFrame(clean, "v double, s boolean"),
            "v", F.col("s"), 0, 40, 8,
        ).collect()
    )
    r_dirty = sorted(
        evaluation.psi_drift(
            spark.createDataFrame(dirty, "v double, s boolean"),
            "v", F.col("s"), 0, 40, 8,
        ).collect()
    )
    assert r_dirty == r_clean
    assert all(0 <= r.bin < 8 for r in r_dirty)


def test_psi_grouped_matches_ungrouped_per_group(spark):
    rng = random.Random(31)
    rows = []
    for g in ("a", "b"):
        shift = 0 if g == "a" else 25
        for _ in range(800):
            rows.append((g, rng.uniform(10 + shift, 50 + shift), True))
        for _ in range(700):
            rows.append((g, rng.uniform(20, 60), False))
    df = spark.createDataFrame(rows, "g string, v double, s boolean")
    grouped = {
        (r.g, r.bin): (r.c1, r.c2, r.psi)
        for r in evaluation.psi_drift(
            df, "v", F.col("s"), 0, 100, 10, group_cols=("g",)
        ).collect()
    }
    for g in ("a", "b"):
        solo = {
            r.bin: (r.c1, r.c2, r.psi)
            for r in evaluation.psi_drift(
                df.filter(F.col("g") == g), "v", F.col("s"), 0, 100, 10
            ).collect()
        }
        assert {b: v for (gg, b), v in grouped.items() if gg == g} == solo
    # clash guard
    with pytest.raises(ValueError, match="clash"):
        evaluation.psi_drift(df, "v", F.col("s"), 0, 1, group_cols=("psi",))
