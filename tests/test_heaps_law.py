"""Heaps'-law fit (text.heaps_law_fit): a pure-Python mirror of the
stream layout + checkpoint contract drives a randomized corpus, plus
the degenerate tiny-corpus fit."""

import hashlib
import math
import random

from probability_of_buying_two_products_together_hadoop_project_spark.operators import text


def py_heaps_curve(docs, min_k=3):
    """(checkpoint -> v_types) mirror: md5(doc_id) order, 1-based
    positions, power-of-two checkpoints below N plus N itself."""
    ordered = sorted(docs, key=lambda d: hashlib.md5(str(d[0]).encode()).hexdigest())
    stream = [t for _, txt in ordered for t in txt.split()]
    n = len(stream)
    first = {}
    for i, t in enumerate(stream, 1):
        first.setdefault(t, i)
    cps = [1 << k for k in range(min_k, 63) if (1 << k) < n] + [n]
    return {c: sum(1 for p in first.values() if p <= c) for c in cps}, n, len(first)


def test_heaps_matches_python_mirror_random(spark):
    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(300)]
    docs = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(5, 60))))
        for i in range(80)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = text.heaps_law_fit(df).collect()
    want, n, v = py_heaps_curve(docs)
    got = {r.checkpoint: r for r in rows}
    assert sorted(got) == sorted(want)
    for c, r in got.items():
        assert r.v_types == want[c]
        assert r.n_tokens == n and r.n_types == v
    # fit columns constant across rows and sane: 0 < beta <= 1 for a
    # growing vocabulary, r2 high for a smooth power law
    betas = {r.beta for r in rows}
    assert len(betas) == 1
    beta = betas.pop()
    assert 0.0 < beta <= 1.0
    assert all(r.r2 > 0.8 for r in rows)
    # independently recompute the OLS over the curve with the same
    # 6dp quantization
    pts = [
        (round(math.log(c), 6), round(math.log(vt), 6))
        for c, vt in want.items()
    ]
    np_, sx = len(pts), sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    slope = (np_ * sxy - sx * sy) / (np_ * sxx - sx * sx)
    assert abs(beta - slope) < 1e-9


def test_heaps_tiny_corpus_degenerate_fit(spark):
    # 5 tokens total -> no power-of-two checkpoint (8 > 5): single
    # point, fit columns NULL
    df = spark.createDataFrame([(1, "a b a c a")], "doc_id long, text string")
    rows = text.heaps_law_fit(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.checkpoint == 5 and r.v_types == 3
    assert r.n_tokens == 5 and r.n_types == 3
    assert r.beta is None and r.lnk is None and r.r2 is None


def test_heaps_repeated_token_saturates(spark):
    # one type repeated 20 times: V is 1 at every checkpoint
    df = spark.createDataFrame(
        [(i, "x x x x x") for i in range(4)], "doc_id long, text string"
    )
    rows = text.heaps_law_fit(df).collect()
    assert {r.checkpoint for r in rows} == {8, 16, 20}
    assert all(r.v_types == 1 for r in rows)
    # zero y-variance -> r2 NULL, beta 0
    assert all(r.r2 is None for r in rows)
    assert all(abs(r.beta) < 1e-12 for r in rows)
