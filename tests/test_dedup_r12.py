"""Round-12 pins for the re-implemented near-dup paths.

- `containment_pairs` gained a PPJoin-style positional filter and a
  map-only unigram `gram_rows`; both must be output-invisible — pinned
  against a pure-Python brute force over the same normalization.
- `simhash_signatures` (xxhash64 family) moved onto the shared
  explode + 64-conditional-sum helper; pinned bit-identical to the
  original HOF balance/pack template, like the md5 sibling.
- `simhash_fast_recall_report` is a new property-bound report; its
  counts and invariant flags are pinned on a planted corpus and on
  degenerate inputs.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import dedup


def _norm_tokens(text: str) -> list[str]:
    return [w for w in re.sub(r"\s+", " ", text.lower().strip()).split(" ") if w]


def test_containment_pairs_matches_bruteforce(spark):
    """The positional filter is recall-lossless and the unigram
    map-only gram_rows is semantics-identical: containment_pairs must
    emit exactly the brute-force pair set (distinct unigrams,
    containment = |a ∩ b| / |a| >= 0.8), verified row-by-row."""
    vocab = [f"tok{i}" for i in range(30)]
    rows = []
    for i in range(60):
        # overlapping sliding windows of the vocab -> plenty of true
        # pairs at varying containment, sizes 5..12; two blocks so the
        # block boundary is exercised too
        lo = (i * 3) % 25
        sz = 5 + (i % 8)
        toks = [vocab[(lo + j) % 30] for j in range(sz)]
        # sprinkle duplicates in-text (distinctness must dedupe them)
        rows.append((i, " ".join(toks + toks[:2]), f"blk{i % 2}"))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")

    got = {
        (r["doc_id"], r["container_id"]): r["containment"]
        for r in dedup.containment_pairs(
            docs, threshold=0.8, t_num=4, t_den=5
        ).collect()
    }

    sets = {i: set(_norm_tokens(t)) for i, t, _ in rows}
    blk = {i: s for i, _, s in rows}
    want = {}
    for a in sets:
        for b in sets:
            if a == b or blk[a] != blk[b]:
                continue
            c = len(sets[a] & sets[b]) / len(sets[a])
            if c >= 0.8:
                want[(a, b)] = c
    assert len(want) >= 10  # the corpus must actually plant pairs
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, k


def test_gram_rows_unigram_is_distinct_tokens_with_size(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a  c ", "s"),
            (2, "  ", "s"),
            (3, "x", "s"),
        ],
        "doc_id bigint, text string, source string",
    )
    out = dedup.gram_rows(docs, "source", "text", 1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], set()).add((r["g"], r["sz"]))
    assert by_doc[1] == {("a", 3), ("b", 3), ("c", 3)}
    assert 2 not in by_doc  # blank text -> no gram rows
    assert by_doc[3] == {("x", 1)}


def test_simhash_xxhash_signatures_match_template_form(spark):
    """The shared exploded helper must reproduce the original HOF
    balance/pack template bit-for-bit for the xxhash64 family,
    including the empty-token (sh=0) and NULL-text (sh=NULL)
    contracts."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words entirely here"),
            (4, "   "),
            (5, None),
            (6, "one"),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["sh"] for r in dedup.simhash_signatures(docs).collect()}
    hashes = F.expr(
        "transform(filter(split(regexp_replace(lower(trim(text)),"
        " '\\\\s+', ' '), ' '), x -> x != ''), t -> xxhash64(t))"
    )
    want = {
        r["doc_id"]: r["sh"]
        for r in docs.select("doc_id", hashes.alias("hs"))
        .select(
            "doc_id",
            F.expr(dedup._SIMHASH_BALANCE_EXPR.format(hs="hs")).alias("bal"),
        )
        .select(
            "doc_id", F.expr(dedup._SIMHASH_PACK_EXPR.format(bal="bal")).alias("sh")
        )
        .collect()
    }
    assert got == want
    assert got[4] == 0 and got[5] is None and got[1] != got[3]


def test_simhash_fast_recall_report_planted(spark):
    """Planted corpus: one exact-dup pair (whitespace/case variants of
    the same normalized text), one exact-dup TRIPLE, near-dups, and a
    NULL text. The report must count groups/pairs exactly and certify
    all three invariants."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, "  THE   quick brown fox jumps over the lazy dog again and again "),
        (3, "alpha beta gamma delta epsilon zeta eta theta"),
        (4, "alpha beta gamma delta epsilon zeta eta theta"),
        (5, "ALPHA beta gamma delta epsilon zeta eta theta"),
        (6, base.replace("dog", "cat")),  # near-dup of 1/2, not exact
        (7, "completely unrelated content lives here with other words"),
        (8, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = dedup.simhash_fast_recall_report(docs, max_hamming=3, n_chunks=4).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 7  # NULL text excluded
    assert r["n_exact_dup_groups"] == 2  # {1,2} and {3,4,5}
    assert r["n_exact_dup_pairs"] == 1 + 3
    assert r["exact_dups_all_found"] is True
    assert r["pairs_within_bound"] is True
    assert r["pairs_ordered"] is True


def test_simhash_fast_recall_report_degenerate(spark):
    # all-NULL corpus: zero docs, zero groups, invariants vacuously true
    docs = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id bigint, text string"
    )
    r = dedup.simhash_fast_recall_report(docs).collect()[0]
    assert r["n_docs"] == 0
    assert r["n_exact_dup_groups"] == 0 and r["n_exact_dup_pairs"] == 0
    assert r["exact_dups_all_found"] is True
    assert r["pairs_within_bound"] is True
    assert r["pairs_ordered"] is True
