"""Tests for RAG chunking (chunk_documents) and reciprocal-rank-fusion
hybrid retrieval (hybrid_rrf_topk): python-mirror properties plus exact
reassembly/contract checks."""

import random

import pytest
from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def py_chunk_count(n, c, s):
    if n < 1:
        return 0
    if n <= c:
        return 1
    return 1 + (n - c + s - 1) // s


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------


def test_chunk_boundaries_exact(spark):
    c, s = 200, 150
    lengths = [0, 1, 149, 150, 151, 199, 200, 201, 349, 350, 351, 500, 1000]
    rows = [(i, "x" * n) for i, n in enumerate(lengths)]
    got = (
        text.chunk_documents(_docs(spark, rows), chunk_chars=c, stride=s)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("k"))
        .collect()
    )
    counts = {r.doc_id: r.k for r in got}
    for i, n in enumerate(lengths):
        assert counts.get(i, 0) == py_chunk_count(n, c, s), (i, n)


def test_chunk_reassembly_roundtrip(spark):
    """chunk0[:stride] + chunk1[:stride] + ... + last chunk == text, and
    every chunk matches the substring contract."""
    rng = random.Random(42)
    alpha = "abcdefgh \n"
    rows = [
        (i, "".join(rng.choice(alpha) for _ in range(rng.randint(1, 700))))
        for i in range(40)
    ]
    c, s = 120, 90
    out = (
        text.chunk_documents(_docs(spark, rows), chunk_chars=c, stride=s)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, txt in rows:
        chunks = by_doc[i]
        assert [r.chunk_id for r in chunks] == list(range(len(chunks)))
        assert len(chunks) == py_chunk_count(len(txt), c, s)
        rebuilt = "".join(r.chunk_text[:s] for r in chunks[:-1]) + chunks[-1].chunk_text
        assert rebuilt == txt
        for r in chunks:
            start0 = r.chunk_start - 1
            assert r.chunk_text == txt[start0 : start0 + c]
            assert r.chunk_len == len(r.chunk_text)
        # no tail chunk fully contained in its predecessor
        if len(chunks) > 1:
            assert chunks[-2].chunk_start + c - 1 < len(txt)


def test_chunk_empty_doc_dropped(spark):
    out = text.chunk_documents(_docs(spark, [(1, ""), (2, "abc")])).collect()
    assert {r.doc_id for r in out} == {2}


def test_chunk_validation():
    with pytest.raises(ValueError):
        text.chunk_documents(None, chunk_chars=0)
    with pytest.raises(ValueError):
        text.chunk_documents(None, chunk_chars=100, stride=0)
    with pytest.raises(ValueError):
        text.chunk_documents(None, chunk_chars=100, stride=101)


# ---------------------------------------------------------------------------
# hybrid_rrf_topk
# ---------------------------------------------------------------------------

UNIT = 10**12


def _corpus(rng, n=60):
    vocab = ["spark", "join", "window", "shuffle", "table", "scan", "agg"]
    rows = []
    for i in range(n):
        k = rng.randint(0, 30)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(k))))
    return rows


def py_rrf(spark, rows, terms, pool=50, rrf_k=60, k=15):
    """Fusion mirror: BM25 ranks come from the engine's own (already
    independently-tested) bm25_topk; the coverage ranker and the fusion
    arithmetic are recomputed in pure python."""
    df = _docs(spark, rows)
    bm = text.bm25_topk(df, terms, k=pool).collect()
    rank_bm = {r.doc_id: i + 1 for i, r in enumerate(bm)}
    cov_rows = []
    for doc_id, txt in rows:
        toks = txt.split()
        cov = len({t for t in toks if t in terms})
        if cov >= 1:
            cov_rows.append((cov, len(toks), doc_id))
    cov_rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    rank_cov = {doc_id: i + 1 for i, (_, _, doc_id) in enumerate(cov_rows[:pool])}
    fused = {}
    for d in set(rank_bm) | set(rank_cov):
        u = 0
        if d in rank_bm:
            u += UNIT // (rrf_k + rank_bm[d])
        if d in rank_cov:
            u += UNIT // (rrf_k + rank_cov[d])
        fused[d] = (
            rank_bm.get(d),
            rank_cov.get(d),
            u,
        )
    order = sorted(fused, key=lambda d: (-fused[d][2], d))[:k]
    return [(d, *fused[d]) for d in order]


def test_rrf_matches_python_reference(spark):
    rng = random.Random(3)
    for seed in range(3):
        rng.seed(seed * 17 + 5)
        rows = _corpus(rng)
        terms = ["spark", "join", "window"]
        got = [
            (r.doc_id, r.rank_bm25, r.rank_cov, r.rrf_units)
            for r in text.hybrid_rrf_topk(_docs(spark, rows), terms, k=15).collect()
        ]
        assert got == py_rrf(spark, rows, terms)


def test_rrf_score_is_exact_unit_division(spark):
    rng = random.Random(9)
    rows = _corpus(rng, n=30)
    out = text.hybrid_rrf_topk(
        _docs(spark, rows), ["spark", "join"], k=10
    ).collect()
    assert out, "fusion returned no rows"
    for r in out:
        assert r.rrf_score == r.rrf_units / float(UNIT)
        assert r.rrf_units > 0
        assert r.rank_bm25 is not None or r.rank_cov is not None


def test_rrf_doc_in_both_lists_beats_single_list_peer(spark):
    # doc 1 matches both rankers' top; doc 2 only coverage (no bm25 terms
    # barely: craft doc 2 with a single rare term so bm25 rank exists too) —
    # instead pin the simplest invariant: a doc ranked 1st by both rankers
    # fuses strictly above a doc absent from one list.
    rows = [
        (1, "spark join spark join"),
        (2, "spark " + "filler " * 200),
        (3, "nothing relevant here at all"),
    ]
    out = text.hybrid_rrf_topk(_docs(spark, rows), ["spark", "join"], k=5).collect()
    by_id = {r.doc_id: r for r in out}
    assert 3 not in by_id
    assert by_id[1].rrf_units > by_id[2].rrf_units


# ---------------------------------------------------------------------------
# inverted_index_terms (registry composition)
# ---------------------------------------------------------------------------


def test_inverted_index_postings_consistent(spark, sf_oracle):
    from probability_of_buying_two_products_together_hadoop_project_spark import registry

    rows = registry.REGISTRY["inverted_index_terms"].fn(spark, sf_oracle).collect()
    assert rows, "index is empty"
    for r in rows:
        ids = r.postings.split(",")
        assert len(ids) == r.df  # one posting per matching doc
        assert ids == sorted(ids, key=int)  # sorted, no duplicates
        assert len(set(ids)) == r.df
        assert r.total_tf >= r.df  # tf >= 1 per posting
        assert 20 <= r.df <= 5000
