"""Property tests for the late-r04 text operators: independent pure-Python
references (the repo's winnow-parity pattern) drive randomized corpora
through both the simulator and the Spark pipeline."""

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import text

words = st.sampled_from(["spark", "join", "window", "scan", "agg", "row", "x", "yy"])
docs_strategy = st.lists(
    st.lists(words, min_size=0, max_size=12), min_size=1, max_size=8
)


def py_ngrams(tokens, n):
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


def _spark_round(x: float, places: str) -> Decimal:
    """Spark's round(double, n): BigDecimal.valueOf(double) parses
    Double.toString's shortest round-trip decimal (same string Python's
    repr produces), then setScale(n, HALF_UP). Python's round() instead
    rounds the underlying binary double, which disagrees at decimal ties
    (e.g. 1.40075 -> 1.4007, Spark/DuckDB -> 1.4008)."""
    return Decimal(repr(float(x))).quantize(
        Decimal(places), rounding=ROUND_HALF_UP
    )


def py_bm25(docs, terms, k1=1.2, b=0.75):
    """Independent BM25 reference mirroring the operator's rounding
    contract: 6dp HALF_UP per-term partials, exact decimal sum (dsum),
    cast to double, 4dp HALF_UP total."""
    n_docs = len(docs)
    if n_docs == 0:
        return {}
    avgdl = sum(len(d) for d in docs.values()) / n_docs
    df = Counter(t for d in docs.values() for t in set(d) if t in terms)
    scores = {}
    for did, toks in docs.items():
        tf = Counter(t for t in toks if t in terms)
        if not tf:
            continue
        s = Decimal(0)
        for t, f in sorted(tf.items()):
            idf = math.log(1 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
            s += _spark_round(
                idf * f * (k1 + 1) / (f + k1 * (1 - b + b * len(toks) / avgdl)),
                "0.000001",
            )
        scores[did] = float(_spark_round(float(s), "0.0001"))
    return scores


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_strategy)
def test_ngram_array_matches_python(spark, doc_lists):
    n = 3
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(doc_lists)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: list(r["g"])
        for r in df.select(
            "doc_id",
            F.when(
                F.size(text.normalized_tokens()) >= n,
                text.ngram_array(text.normalized_tokens(), n),
            )
            .otherwise(F.array().cast("array<string>"))
            .alias("g"),
        ).collect()
    }
    for i, toks in enumerate(doc_lists):
        want = py_ngrams(toks, n) if len(toks) >= n else []
        assert got[i] == want, (i, toks)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_strategy)
def test_bm25_matches_python_reference(spark, doc_lists):
    terms = ["spark", "join"]
    docs = {i: toks for i, toks in enumerate(doc_lists)}
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs.items()],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["score"]
        for r in text.bm25_topk(df, terms, k=len(doc_lists) + 1).collect()
    }
    want = py_bm25(docs, set(terms))
    # same doc set scored, same 4dp scores (exact: both sides share the
    # decimal-sum rounding contract)
    assert got == want, (got, want)


def test_bm25_rounding_tie_regression(spark):
    """Pinned hypothesis falsifying example (r04): doc ['spark']*2 scores
    an exact per-term partial of 1.40075 — a 4-decimal tie. Spark/DuckDB
    round the decimal half-up (1.4008); Python's round() rounds the
    nearest binary double (1.4007499...) down. The reference must follow
    the engine's decimal HALF_UP contract."""
    doc_lists = [[], [], ["spark"] * 2, ["join"] * 6, ["spark"] * 11 + ["join"]]
    terms = ["spark", "join"]
    docs = dict(enumerate(doc_lists))
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs.items()],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["score"]
        for r in text.bm25_topk(df, terms, k=len(doc_lists) + 1).collect()
    }
    want = py_bm25(docs, set(terms))
    assert got == want, (got, want)
    assert got[2] == 1.4008  # the tie rounds half-UP, not to the binary double


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_strategy, st.sampled_from([64, 256, 1 << 12]))
def test_bloom_decontaminate_equals_exact(spark, doc_lists, m_bits):
    """Superset-prefilter + exact-verify: the bloom variant must equal
    the exact join on random corpora at ANY filter size, including
    pathologically tiny filters where almost every gram is a false
    positive."""
    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(doc_lists)],
        "doc_id long, text string",
    )
    bench = docs.filter(F.col("doc_id") % 3 == 0)
    exact = {
        (r["doc_id"], r["n_shared_grams"])
        for r in text.ngram_decontaminate(docs, bench, n=2).collect()
    }
    got = {
        (r["doc_id"], r["n_shared_grams"])
        for r in text.ngram_decontaminate_bloom(
            docs, bench, n=2, m_bits=m_bits
        ).collect()
    }
    assert got == exact


def py_dsir(doc_tokens, targets, width=512):
    """Independent DSIR reference mirroring the operator's contract:
    md5-bucketed unigram+bigram features, add-one smoothed target/raw
    LMs, 6dp HALF_UP per-bucket log terms x integer counts, exact
    decimal sum, 4dp HALF_UP (decimal-domain) total."""
    import hashlib

    def bucket(g):
        return int(hashlib.md5(("dsir|" + g).encode()).hexdigest()[:8], 16) % width

    per_doc = {}
    ct, cr = Counter(), Counter()
    for did, toks in doc_tokens.items():
        grams = list(toks) + py_ngrams(toks, 2)
        if not grams:
            continue
        c = Counter(bucket(g) for g in grams)
        per_doc[did] = c
        for b, n in c.items():
            cr[b] += n
            if targets[did]:
                ct[b] += n
    n_t = sum(ct.values())
    n_r = sum(cr.values())
    out = {}
    for did, c in per_doc.items():
        s = Decimal(0)
        for b, n in sorted(c.items()):
            lam_t = _spark_round(math.log((ct[b] + 1.0) / (n_t + width)), "0.000001")
            lam_r = _spark_round(math.log((cr[b] + 1.0) / (n_r + width)), "0.000001")
            s += n * (lam_t - lam_r)
        out[did] = float(s.quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))
    return out


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_strategy)
def test_dsir_matches_python_reference(spark, doc_lists):
    doc_tokens = {i: toks for i, toks in enumerate(doc_lists)}
    # alternate docs into the target domain; ensure at least one target
    targets = {i: (i % 2 == 0) for i in doc_tokens}
    rows = [(i, " ".join(toks)) for i, toks in doc_tokens.items()]
    df = spark.createDataFrame(rows, "doc_id bigint, text string").withColumn(
        "is_t", F.col("doc_id") % 2 == 0
    )
    got = {
        r.doc_id: (r.is_target, r.n_grams, r.log_weight)
        for r in text.dsir_importance(df, F.col("is_t")).collect()
    }
    want = py_dsir(doc_tokens, targets)
    expected_ids = {i for i, toks in doc_tokens.items() if toks}
    assert set(got) == expected_ids
    for did in expected_ids:
        toks = doc_tokens[did]
        assert got[did][0] == targets[did]
        assert got[did][1] == len(toks) + max(0, len(toks) - 1)
        assert got[did][2] == want[did], (did, got[did], want[did])
