"""Kneser-Ney bigram LM: an exact-fraction Python mirror, the
probability-mass contract (observed sums < 1, leaving backoff share),
and the continuation-count distinction KN exists for."""

from fractions import Fraction

from probability_of_buying_two_products_together_hadoop_project_spark.operators import text


def py_kn(docs):
    from collections import Counter, defaultdict

    bigrams = Counter()
    for d in docs:
        tk = d.lower().split()
        for a, b in zip(tk, tk[1:]):
            bigrams[(a, b)] += 1
    c_v = defaultdict(int)
    n1p_from = defaultdict(int)
    n1p_to = defaultdict(int)
    for (v, w), c in bigrams.items():
        c_v[v] += c
        n1p_from[v] += 1
        n1p_to[w] += 1
    nn = len(bigrams)
    d = Fraction(3, 4)
    out = {}
    for (v, w), c in bigrams.items():
        p = (Fraction(c) - d) / c_v[v] + d * Fraction(
            n1p_from[v], c_v[v]
        ) * Fraction(n1p_to[w], nn)
        out[(v, w)] = p
    return out


def test_kn_matches_fraction_mirror(spark):
    docs = [
        "san francisco is foggy",
        "san francisco is big",
        "york is big",
        "new york new york",
        "francisco",  # unigram-only doc contributes no bigrams
        "big francisco energy",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    rows = text.kneser_ney_bigram(df).collect()
    want = py_kn(docs)
    got = {(r.prev, r.cur): r for r in rows}
    assert sorted(got) == sorted(want)
    for k, p in want.items():
        assert abs(got[k].p_kn - float(p)) < 1e-15, k


def test_kn_observed_mass_below_one(spark):
    docs = ["a b a c a b b c", "c a b a"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    rows = text.kneser_ney_bigram(df).collect()
    from collections import defaultdict

    mass = defaultdict(float)
    for r in rows:
        mass[r.prev] += r.p_kn
    for v, m in mass.items():
        assert 0.0 < m < 1.0 + 1e-12, (v, m)


def test_kn_continuation_beats_raw_count(spark):
    # 'x' appears ONLY after 'q' (high raw count, 1 context);
    # 'y' appears after many different words (lower count, many contexts).
    docs = ["q x q x q x q x q x", "a y", "b y", "c y", "d y"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    rows = {(r.prev, r.cur): r for r in text.kneser_ney_bigram(df).collect()}
    # continuation count of y (4 contexts) far exceeds x's (1)
    assert rows[("a", "y")].n1p_to == 4
    assert rows[("q", "x")].n1p_to == 1


def test_negative_sampling_three_quarter_power(spark):
    import math

    docs = [(1, "a a a a a a a a a a a a a a a a b"), (2, "b c")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r.token: r for r in text.negative_sampling_table(df).collect()}
    assert rows["a"].n == 16 and rows["b"].n == 2 and rows["c"].n == 1
    # 16^(3/4) = 8 exactly; flattening: a has 16x c's count but only 8x weight
    assert abs(rows["a"].weight - 8.0) < 1e-9
    assert abs(rows["c"].weight - 1.0) < 1e-9
    assert abs(rows["b"].weight - round(math.sqrt(2) * math.sqrt(math.sqrt(2)), 6)) < 1e-9
    assert abs(sum(r.share for r in rows.values()) - 1.0) < 1e-9
