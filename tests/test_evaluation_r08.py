"""Round-8 evaluation operators: Wasserstein-1, Mann-Whitney U,
parallel isotonic (PAV) fit — each against an independent pure-Python
reference."""

import math
import random
from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import (
    evaluation,
)


def py_w1(xs, ys):
    """Exact integer W1 numerator over integer samples: sum over
    consecutive pooled values of |cc1*n2 - cc2*n1| * dv."""
    n1, n2 = len(xs), len(ys)
    vals = sorted(set(xs) | set(ys))
    cc1 = cc2 = 0
    num = 0
    for i, v in enumerate(vals[:-1]):
        cc1 += sum(1 for x in xs if x == v)
        cc2 += sum(1 for y in ys if y == v)
        num += abs(cc1 * n2 - cc2 * n1) * (vals[i + 1] - v)
    return num


def test_wasserstein_matches_bruteforce(spark):
    rng = random.Random(7)
    xs = [rng.randint(0, 40) for _ in range(150)]
    ys = [rng.randint(10, 60) for _ in range(90)]
    rows = [(v, True) for v in xs] + [(v, False) for v in ys]
    df = spark.createDataFrame(rows, "v bigint, s boolean")
    row = evaluation.wasserstein_two_sample(df, "v", F.col("s")).collect()[0]
    num = py_w1(xs, ys)
    assert (row.n1, row.n2) == (len(xs), len(ys))
    assert int(row.w1_num) == num
    assert row.w1 == num / float(len(xs) * len(ys))
    # cross-check against the textbook mean-of-|ECDF-diff| integral
    want = float(
        sum(
            Fraction(abs(sum(1 for x in xs if x <= v) * len(ys)
                         - sum(1 for y in ys if y <= v) * len(xs)),
                     len(xs) * len(ys)) * (nv - v)
            for v, nv in zip(sorted(set(xs) | set(ys))[:-1],
                             sorted(set(xs) | set(ys))[1:])
        )
    )
    assert row.w1 == pytest.approx(want, rel=1e-12)


def test_wasserstein_shift_and_identity(spark):
    xs = list(range(100))
    # identical samples: W1 = 0
    rows = [(v, True) for v in xs] + [(v, False) for v in xs]
    row = evaluation.wasserstein_two_sample(
        spark.createDataFrame(rows, "v bigint, s boolean"), "v", F.col("s")
    ).collect()[0]
    assert int(row.w1_num) == 0 and row.w1 == 0.0
    # pure shift by +5: W1 = 5 exactly (KS would report a modest sup-gap)
    rows = [(v, True) for v in xs] + [(v + 5, False) for v in xs]
    row = evaluation.wasserstein_two_sample(
        spark.createDataFrame(rows, "v bigint, s boolean"), "v", F.col("s")
    ).collect()[0]
    assert row.w1 == 5.0


def test_wasserstein_nulls_empty_and_type_guard(spark):
    rows = [(1, True), (3, True), (None, True), (2, False), (None, False)]
    df = spark.createDataFrame(rows, "v bigint, s boolean")
    row = evaluation.wasserstein_two_sample(df, "v", F.col("s")).collect()[0]
    assert (row.n1, row.n2) == (2, 1)
    assert int(row.w1_num) == py_w1([1, 3], [2])
    # empty side -> null
    row = evaluation.wasserstein_two_sample(
        spark.createDataFrame([(1, True)], "v bigint, s boolean"), "v", F.col("s")
    ).collect()[0]
    assert row.n2 == 0 and row.w1 is None
    # float column refused loudly
    with pytest.raises(ValueError):
        evaluation.wasserstein_two_sample(
            spark.createDataFrame([(1.0, True)], "v double, s boolean"),
            "v",
            F.col("s"),
        )


def py_mw(xs, ys):
    """Midrank Mann-Whitney: returns (2*R1, 2*U1, tie_cubes)."""
    pooled = sorted(xs + ys)
    n1 = len(xs)
    # midrank per value (1-based ranks)
    from collections import Counter

    cnt = Counter(pooled)
    r1x2 = 0
    cum = 0
    tie = 0
    for v in sorted(cnt):
        t = cnt[v]
        c1 = sum(1 for x in xs if x == v)
        r1x2 += c1 * (2 * cum + t + 1)
        tie += t**3 - t
        cum += t
    u1x2 = r1x2 - n1 * (n1 + 1)
    return r1x2, u1x2, tie


def test_mann_whitney_matches_reference(spark):
    rng = random.Random(19)
    xs = [rng.randint(0, 25) for _ in range(130)]
    ys = [rng.randint(5, 30) for _ in range(70)]
    rows = [(v, True) for v in xs] + [(v, False) for v in ys]
    df = spark.createDataFrame(rows, "v int, s boolean")
    row = evaluation.mann_whitney_u(df, "v", F.col("s")).collect()[0]
    r1x2, u1x2, tie = py_mw(xs, ys)
    n1, n2 = len(xs), len(ys)
    assert (row.n1, row.n2) == (n1, n2)
    assert int(row.r1_x2) == r1x2
    assert int(row.u1_x2) == u1x2
    assert int(row.u2_x2) == 2 * n1 * n2 - u1x2
    assert int(row.tie_cubes) == tie
    nn = n1 + n2
    sigma2 = n1 * n2 * (nn**3 - nn - tie) / (12.0 * nn * (nn - 1))
    want_z = (u1x2 - n1 * n2) / (2.0 * math.sqrt(sigma2))
    assert row.z == pytest.approx(want_z, rel=1e-12)


def test_mann_whitney_degenerate_cases(spark):
    # all values tied: variance 0 -> z null
    rows = [(7, True)] * 5 + [(7, False)] * 4
    row = evaluation.mann_whitney_u(
        spark.createDataFrame(rows, "v int, s boolean"), "v", F.col("s")
    ).collect()[0]
    assert row.z is None and int(row.tie_cubes) == 9**3 - 9
    # empty side -> z null; NULL values excluded
    rows = [(1, True), (2, True), (None, True)]
    row = evaluation.mann_whitney_u(
        spark.createDataFrame(rows, "v int, s boolean"), "v", F.col("s")
    ).collect()[0]
    assert (row.n1, row.n2) == (2, 0) and row.z is None
    # clean separation: xs all below ys -> U1 = 0, z strongly negative
    rows = [(v, True) for v in range(10)] + [(v + 100, False) for v in range(10)]
    row = evaluation.mann_whitney_u(
        spark.createDataFrame(rows, "v int, s boolean"), "v", F.col("s")
    ).collect()[0]
    assert int(row.u1_x2) == 0 and row.z < -3.5


def py_pav(pairs):
    """Classic sequential pool-adjacent-violators over (n, s) bins,
    returning bin -> fitted value."""
    blocks = [[b, n, s] for b, n, s in pairs]  # (first_bin, n, s)
    out = []
    stack = []
    for b, n, s in blocks:
        stack.append([n, s, [b]])
        while len(stack) >= 2 and (
            stack[-2][1] * stack[-1][0] >= stack[-1][1] * stack[-2][0]
        ):
            n2, s2, b2 = stack.pop()
            stack[-1][0] += n2
            stack[-1][1] += s2
            stack[-1][2].extend(b2)
    fit = {}
    for n, s, bs in stack:
        for b in bs:
            fit[b] = s / n
    return fit


def test_isotonic_matches_sequential_pav(spark):
    rng = random.Random(3)
    # noisy monotone-ish signal: p(y=1) grows with bin, with violations
    rows = []
    for b in range(20):
        p = min(0.95, 0.05 + 0.05 * b + rng.uniform(-0.15, 0.15))
        for _ in range(rng.randint(5, 40)):
            rows.append((b, 1 if rng.random() < p else 0))
    df = spark.createDataFrame(rows, "b int, y int")
    got = {
        r.bin: r
        for r in evaluation.isotonic_fit_bins(df, F.col("b"), F.col("y")).collect()
    }
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for b, y in rows:
        agg[b][0] += 1
        agg[b][1] += y
    pairs = [(b, n, s) for b, (n, s) in sorted(agg.items())]
    want = py_pav(pairs)
    assert sorted(got) == sorted(want)
    for b in want:
        assert got[b].fitted == pytest.approx(want[b], rel=1e-12)
        assert got[b].n == agg[b][0] and got[b].s == agg[b][1]
    # monotone non-decreasing by construction
    fitted = [got[b].fitted for b in sorted(got)]
    assert all(a <= c + 1e-15 for a, c in zip(fitted, fitted[1:]))


def test_isotonic_already_monotone_is_identity_and_guard(spark):
    rows = [(b, y) for b in range(5) for y in ([1] * b + [0] * (5 - b))]
    df = spark.createDataFrame(rows, "b int, y int")
    got = {
        r.bin: r
        for r in evaluation.isotonic_fit_bins(df, F.col("b"), F.col("y")).collect()
    }
    for b in range(5):
        assert got[b].fitted == pytest.approx(b / 5.0, rel=1e-12)
        assert got[b].mean_raw == got[b].fitted
    with pytest.raises(ValueError):
        evaluation.isotonic_fit_bins(
            spark.createDataFrame([(1, 0.5)], "b int, y double"),
            F.col("b"),
            F.col("y"),
        )


def test_isotonic_grouped_matches_ungrouped_per_group(spark):
    rng = random.Random(41)
    rows = []
    for g in ("a", "b", "c"):
        bias = {"a": 0.0, "b": 0.3, "c": -0.1}[g]
        for b in range(12):
            p = min(0.95, max(0.02, 0.1 + 0.07 * b + bias + rng.uniform(-0.1, 0.1)))
            for _ in range(rng.randint(3, 25)):
                rows.append((g, b, 1 if rng.random() < p else 0))
    df = spark.createDataFrame(rows, "g string, b int, y int")
    grouped = {
        (r.g, r.bin): r
        for r in evaluation.isotonic_fit_bins(
            df, F.col("b"), F.col("y"), group_cols=("g",)
        ).collect()
    }
    for g in ("a", "b", "c"):
        solo = {
            r.bin: r
            for r in evaluation.isotonic_fit_bins(
                df.filter(F.col("g") == g), F.col("b"), F.col("y")
            ).collect()
        }
        assert {b for gg, b in grouped if gg == g} == set(solo)
        for b, r in solo.items():
            got = grouped[(g, b)]
            assert (got.n, got.s) == (r.n, r.s)
            assert got.fitted == r.fitted
    with pytest.raises(ValueError):
        evaluation.isotonic_fit_bins(df, F.col("b"), F.col("y"), group_cols=("bin",))


def test_join_size_report_exact_forecast(spark):
    from probability_of_buying_two_products_together_hadoop_project_spark.operators import (
        relational,
    )

    # skewed left: key 0 is hot; right has its own multiplicities
    left = [(k,) for k in [0] * 50 + [1] * 5 + [2] * 3 + [3]]
    right = [(k,) for k in [0] * 4 + [1] * 7 + [2] * 2 + [9]]
    ldf = spark.createDataFrame(left, "k bigint")
    rdf = spark.createDataFrame(right, "k bigint")
    rows = relational.join_size_report(ldf, rdf, "k", "k", top=2).collect()
    # exact forecast: 50*4 + 5*7 + 3*2 = 241 pairs over 3 matched keys
    assert len(rows) == 2
    hot = rows[0]
    assert hot.key == 0 and hot.pair_rows == "200"
    assert hot.total_pair_rows == "241"
    assert (hot.matched_keys, hot.left_keys, hot.right_keys) == (3, 4, 4)
    assert hot.share == pytest.approx(200 / 241)
    assert rows[1].key == 1 and rows[1].pair_rows == "35"
    # the forecast equals the actual join size
    assert ldf.join(rdf, "k").count() == 241
    with pytest.raises(ValueError):
        relational.join_size_report(ldf, rdf, "k", "k", top=0)


def test_weight_ess_uniform_and_degenerate(spark):
    # uniform weights: ESS == n exactly
    df = spark.createDataFrame([(1.0,)] * 40, "w double")
    r = evaluation.weight_ess(df, "w").collect()[0]
    assert r.n == 40 and r.ess == pytest.approx(40.0) and r.ess_ratio == 1.0
    assert r.sum_w_units == str(40 * 10**6)
    # one dominant weight: ESS collapses toward 1
    rows = [(1000.0,)] + [(0.001,)] * 99
    r = evaluation.weight_ess(
        spark.createDataFrame(rows, "w double"), "w"
    ).collect()[0]
    assert 1.0 <= r.ess < 1.01
    # exact reference on quantized mixed weights
    ws = [round(v, 6) for v in (0.25, 1.5, 0.125, 2.0, 0.333333)]
    r = evaluation.weight_ess(
        spark.createDataFrame([(w,) for w in ws], "w double"), "w"
    ).collect()[0]
    units = [round(w * 10**6) for w in ws]
    s, q = sum(units), sum(u * u for u in units)
    assert (r.sum_w_units, r.sum_w2_units) == (str(s), str(q))
    assert r.ess == pytest.approx(s * s / q, rel=1e-15)
    # zero mass -> null
    r = evaluation.weight_ess(
        spark.createDataFrame([(0.0,)] * 3, "w double"), "w"
    ).collect()[0]
    assert r.ess is None
    # grouped
    rows = [("a", 1.0)] * 10 + [("b", 5.0)] + [("b", 0.5)] * 4
    got = {
        r[0]: r
        for r in evaluation.weight_ess(
            spark.createDataFrame(rows, "g string, w double"), "w", ("g",)
        ).collect()
    }
    assert got["a"].ess == pytest.approx(10.0)
    assert got["b"].ess < 2.1


def test_blocking_quality_exact_rates(spark):
    from probability_of_buying_two_products_together_hadoop_project_spark.operators import (
        evaluation as ev,
    )

    # 10 records; truth: 4 dup pairs; blocker found 3 of them plus junk
    true = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (7, 8)], "a_id bigint, b_id bigint"
    )
    cand = spark.createDataFrame(
        [(2, 1), (3, 4), (5, 6), (9, 10), (1, 5), (6, 5)],  # dups+reversed
        "a_id bigint, b_id bigint",
    )
    r = ev.blocking_quality(cand, true, n_records=10).collect()[0]
    assert (r.n_candidates, r.n_true, r.n_found) == (5, 4, 3)
    assert r.pair_completeness == pytest.approx(3 / 4)
    assert r.reduction_ratio == pytest.approx(1 - 5 / 45)
    with pytest.raises(ValueError):
        ev.blocking_quality(cand, true, n_records=1)


def test_w1_and_mw_grouped_match_ungrouped_per_group(spark):
    rng = random.Random(47)
    rows = []
    for g in ("x", "y"):
        shift = 0 if g == "x" else 8
        rows += [(g, rng.randint(0, 30) + shift, True) for _ in range(80)]
        rows += [(g, rng.randint(5, 40), False) for _ in range(60)]
    df = spark.createDataFrame(rows, "g string, v bigint, s boolean")
    gw = {
        r.g: r
        for r in evaluation.wasserstein_two_sample(
            df, "v", F.col("s"), group_cols=("g",)
        ).collect()
    }
    gm = {
        r.g: r
        for r in evaluation.mann_whitney_u(
            df, "v", F.col("s"), group_cols=("g",)
        ).collect()
    }
    for g in ("x", "y"):
        sub = df.filter(F.col("g") == g)
        sw = evaluation.wasserstein_two_sample(sub, "v", F.col("s")).collect()[0]
        sm = evaluation.mann_whitney_u(sub, "v", F.col("s")).collect()[0]
        assert (gw[g].n1, gw[g].n2, gw[g].w1_num, gw[g].w1) == tuple(sw)
        assert tuple(gm[g])[1:] == tuple(sm)
    with pytest.raises(ValueError):
        evaluation.wasserstein_two_sample(df, "v", F.col("s"), group_cols=("w1",))
    with pytest.raises(ValueError):
        evaluation.mann_whitney_u(df, "v", F.col("s"), group_cols=("z",))


def test_ks_grouped_matches_ungrouped_per_group(spark):
    rng = random.Random(53)
    rows = []
    for g in ("p", "q", "r"):
        lo = {"p": 0, "q": 10, "r": 5}[g]
        rows += [(g, rng.randint(lo, lo + 25), True) for _ in range(70)]
        rows += [(g, rng.randint(3, 30), False) for _ in range(50)]
    df = spark.createDataFrame(rows, "g string, v int, s boolean")
    grouped = {
        r.g: r
        for r in evaluation.ks_two_sample(
            df, "v", F.col("s"), group_cols=("g",)
        ).collect()
    }
    for g in ("p", "q", "r"):
        solo = evaluation.ks_two_sample(
            df.filter(F.col("g") == g), "v", F.col("s")
        ).collect()[0]
        assert tuple(grouped[g])[1:] == tuple(solo)
    with pytest.raises(ValueError):
        evaluation.ks_two_sample(df, "v", F.col("s"), group_cols=("ks_d",))


def py_kendall(pairs_xy):
    C = D = tx = ty = txy = 0
    for i in range(len(pairs_xy)):
        for j in range(i + 1, len(pairs_xy)):
            (xa, ya), (xb, yb) = pairs_xy[i], pairs_xy[j]
            dx = (xa > xb) - (xa < xb)
            dy = (ya > yb) - (ya < yb)
            if dx * dy > 0:
                C += 1
            elif dx * dy < 0:
                D += 1
            elif dx == 0 and dy == 0:
                txy += 1
            elif dx == 0:
                tx += 1
            else:
                ty += 1
    return C, D, tx, ty, txy


def test_kendall_sampled_matches_bruteforce(spark):
    rng = random.Random(61)
    rows = [
        (i, rng.randint(0, 15), rng.randint(0, 15)) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "k bigint, x int, y int")
    # k larger than the relation: the "sample" is everything -> exact
    r = evaluation.kendall_tau_sampled(df, "k", "x", "y", k=500).collect()[0]
    C, D, tx, ty, txy = py_kendall([(x, y) for _, x, y in rows])
    assert (r.concordant, r.discordant) == (C, D)
    assert (r.ties_x, r.ties_y, r.ties_xy) == (tx, ty, txy)
    n0 = 120 * 119 // 2
    assert r.n_pairs == n0 == C + D + tx + ty + txy
    want = (C - D) / math.sqrt((n0 - tx - txy) * (n0 - ty - txy))
    assert r.tau_b == pytest.approx(want, rel=1e-14)
    # perfect monotone relation: tau_b = 1
    mono = spark.createDataFrame(
        [(i, i, i * 2) for i in range(50)], "k bigint, x int, y int"
    )
    r2 = evaluation.kendall_tau_sampled(mono, "k", "x", "y", k=500).collect()[0]
    assert r2.tau_b == 1.0
    # constant margin: undefined -> null
    const = spark.createDataFrame(
        [(i, 7, i) for i in range(10)], "k bigint, x int, y int"
    )
    r3 = evaluation.kendall_tau_sampled(const, "k", "x", "y", k=500).collect()[0]
    assert r3.tau_b is None
    with pytest.raises(ValueError):
        evaluation.kendall_tau_sampled(df, "k", "x", "y", k=1)
