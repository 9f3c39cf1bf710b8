"""Text-analysis operator tests: token stats, language ID, quality
scoring, fingerprinting — small deterministic fixtures."""

from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import text


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_text_stats_counts(spark):
    docs = _docs(spark, [(1, "Hello, world! 42 times"), (2, ""), (3, "a a a")])
    out = {r["doc_id"]: r for r in text.text_stats(docs).collect()}
    assert out[1]["n_tokens"] == 4
    assert out[1]["n_punct"] == 2  # comma + exclamation
    assert out[1]["n_digit"] == 2
    assert out[2]["n_tokens"] == 0
    assert out[3]["n_tokens"] == 3
    assert out[3]["n_distinct_tokens"] == 1


def test_lang_id_markers(spark):
    docs = _docs(
        spark,
        [
            (1, "the cat and the dog sat in a house of cards"),
            (2, "le chat est un animal et la maison est grande"),
            (3, "el perro es un animal y la casa es grande de verdad"),
            (4, "der hund und die katze das ist gut"),
            (5, "xyzzy plugh"),
        ],
    )
    out = {r["doc_id"]: r["pred_lang"] for r in text.lang_id(docs).collect()}
    assert out[1] == "en"
    assert out[2] == "fr"
    assert out[3] == "es"
    assert out[4] == "de"
    assert out[5] == "und"


def test_quality_score_orders_sensibly(spark):
    good = " ".join(
        "the quick brown fox jumps over a lazy dog and runs to the old barn".split()
        * 3
    )
    junk = "!!! ### $$$ %%% 123 456 789 000 !!! ### $$$ %%%"
    out = {
        r["doc_id"]: r["quality"]
        for r in text.quality_score(_docs(spark, [(1, good), (2, junk)])).collect()
    }
    assert 0.0 <= out[2] < out[1] <= 1.0


def test_fingerprint_normalization_invariance(spark):
    docs = _docs(spark, [(1, "Some  Text Here"), (2, "some text   here"), (3, "other")])
    out = {r["doc_id"]: r["fp"] for r in text.fingerprint(docs).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_bpe_ish_token_count(spark):
    from pyspark.sql import functions as F

    docs = _docs(spark, [(1, "don't stop-me now!!")])
    out = docs.select(text.bpe_ish_token_count(F.col("text")).alias("n")).collect()
    # don ' t stop - me now ! !  -> 9
    assert out[0]["n"] == 9


def test_top_distinctive_terms_ranking(spark):
    """tf dominates; df breaks tf ties (rarer corpus-wide wins); term
    breaks (tf, df) ties lexicographically."""
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana cherry"),
            (2, "banana banana cherry cherry date"),
            (3, "apple banana"),
        ],
        ["doc_id", "text"],
    )
    out = text.top_distinctive_terms(docs, k=2)
    got = {
        (r["doc_id"], r["rk"]): (r["term"], r["tf"], r["df"])
        for r in out.collect()
    }
    # doc 1: apple tf=2 first; banana/cherry tf=1 tie -> cherry df=2 beats
    # banana df=3
    assert got[(1, 1)] == ("apple", 2, 2)
    assert got[(1, 2)] == ("cherry", 1, 2)
    # doc 2: banana/cherry both tf=2 -> cherry (df=2) before banana (df=3)
    assert got[(2, 1)] == ("cherry", 2, 2)
    assert got[(2, 2)] == ("banana", 2, 3)
    # doc 3: apple/banana tf=1, df 2 vs 3 -> apple first
    assert got[(3, 1)] == ("apple", 1, 2)
    assert got[(3, 2)] == ("banana", 1, 3)


def test_corpus_ngrams_counts_and_order(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x"), (3, "z")], ["doc_id", "text"]
    )
    out = text.corpus_ngrams(docs, n=2, k=10).collect()
    got = [(r["ngram"], r["n"]) for r in out]
    # "a b" occurs 3x (twice in doc1 with multiplicity, once in doc2)
    assert got[0] == ("a b", 3)
    assert dict(got)["b a"] == 1 and dict(got)["b c"] == 1 and dict(got)["b x"] == 1
    assert "z" not in dict(got)  # single-token doc contributes nothing
    # total order: count desc, then lexicographic
    assert got == sorted(got, key=lambda t: (-t[1], t[0]))


def test_corpus_trigrams(spark):
    docs = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    got = {r["ngram"]: r["n"] for r in text.corpus_ngrams(docs, n=3, k=10).collect()}
    assert got == {"a b c": 1, "b c d": 1}


def test_pseudonymize_masks_and_stabilizes(spark):
    import hashlib

    df = spark.createDataFrame(
        [(1, "Customer#000042"), (2, "no digits here"), (3, "a1b22c333")],
        ["id", "name"],
    )
    out = {r["id"]: r for r in text.pseudonymize(df, "id", "name").collect()}
    assert out[1]["redacted"] == "Customer#<ID>"
    assert out[1]["n_masked_runs"] == 1
    # surrogate is KEYED (sha256 over salt||value): an unkeyed hash of a
    # low-entropy identifier is dictionary-reversible (r03 advisory)
    assert (
        out[1]["pseudonym"]
        == hashlib.sha256(b"pepperCustomer#000042").hexdigest()
    )
    assert (
        text.pseudonymize(df, "id", "name", salt="other")
        .filter(F.col("id") == 1)
        .first()["pseudonym"]
        != out[1]["pseudonym"]
    )
    assert out[2]["redacted"] == "no digits here" and out[2]["n_masked_runs"] == 0
    assert out[3]["redacted"] == "a<ID>b<ID>c<ID>" and out[3]["n_masked_runs"] == 3


def test_repetition_stats_flags_degenerate_text(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "spam spam spam spam spam"),            # one token repeated
            (2, "go to go to go to go to"),             # repeated bigram
            (3, "one"),                                 # < 2 tokens
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in text.repetition_stats(docs).collect()}
    assert out[1]["top_token_frac"] == 1.0 and out[1]["is_repetitive"]
    # "go to go to go to go to": 7 bigrams, 2 distinct -> 1 - 2/7
    assert abs(out[2]["dup_bigram_frac"] - round(1 - 2 / 7, 4)) < 1e-9
    assert out[2]["is_repetitive"]
    assert not out[0]["is_repetitive"]
    # "the" appears twice in 10 tokens
    assert out[0]["top_token_frac"] == 0.2
    # single-token doc: no bigrams (frac 0), but its one token is 100%
    # of the mass so the top-token rule flags it — length gating is
    # quality_score's job, not the repetition formula's
    assert out[3]["dup_bigram_frac"] == 0.0
    assert out[3]["top_token_frac"] == 1.0 and out[3]["is_repetitive"]


def test_bm25_ranking_ground_truth(spark):
    """BM25 against a hand-computed fixture: the doc where the query term
    is rarer-corpus-wide but denser in-doc must outrank longer diluted
    docs; docs without any query term don't appear."""
    import math

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark"),            # dense hit, short
            (2, "spark and a lot of other words here to dilute the score"),
            (3, "no relevant terms at all"),
            (4, "join join spark"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["score"] for r in text.bm25_topk(docs, ["spark", "join"], k=10).collect()}
    assert 3 not in out and set(out) == {1, 2, 4}
    # hand-computed for doc 1: N=4, avgdl=(3+12+5+3)/4=5.75, spark df=3
    idf_spark = math.log(1 + (4 - 3 + 0.5) / (3 + 0.5))
    tf, dl = 3, 3
    s1 = idf_spark * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 5.75))
    assert abs(out[1] - round(round(s1, 6), 4)) < 1e-9
    # doc 4 scores on both terms; doc 2's single diluted hit scores least
    assert out[4] > out[1] > out[2]


def test_bm25_term_prefilter_plan(spark):
    """The token array filters to query terms BEFORE explode: the plan
    must not contain a Generate over the full token array (the explode
    input is the filtered array)."""
    docs = spark.createDataFrame([(1, "a b c"), (2, "b c d")], "doc_id long, text string")
    plan = text.bm25_topk(docs, ["b"], k=5)._jdf.queryExecution().optimizedPlan().toString()
    assert "filter(" in plan  # ArrayFilter feeds the explode


def test_ngram_decontaminate_planted_overlap(spark):
    """A corpus doc sharing a 3-gram with a benchmark doc is flagged with
    the right distinct-gram count; non-overlapping docs and benchmark
    members themselves are not flagged."""
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),        # benchmark (0 % 97 == 0)
            (1, "x alpha beta gamma y"),          # shares 'alpha beta gamma'
            (2, "completely different words here"),
            (3, "alpha beta gamma delta"),        # exact copy of benchmark doc
        ],
        "doc_id long, text string",
    )
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    out = {r["doc_id"]: r["n_shared_grams"] for r in text.ngram_decontaminate(docs, bench, n=3).collect()}
    # doc 1 shares exactly 1 distinct 3-gram; doc 3 shares both of the
    # benchmark doc's 3-grams despite being excluded from the corpus side
    # only by id (text-equality exclusion would hide it — the bug the
    # anti-join-on-id design avoids)
    assert out == {1: 1, 3: 2}


def test_ngram_decontaminate_bloom_matches_exact(spark):
    """The bloom-prefiltered variant is a superset prefilter + exact
    verify, so its output must be bit-identical to the exact join — even
    under heavy false-positive pressure (m_bits=64 crams every gram into
    one word, so most grams pass the bloom and the exact join does all
    the work)."""
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "x alpha beta gamma y"),
            (2, "completely different words here"),
            (3, "alpha beta gamma delta"),
            (97, "epsilon zeta eta theta iota"),   # 2nd benchmark doc
            (5, "zz epsilon zeta eta theta qq"),   # shares 2 of its 3-grams
        ],
        "doc_id long, text string",
    )
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    exact = {
        r["doc_id"]: r["n_shared_grams"]
        for r in text.ngram_decontaminate(docs, bench, n=3).collect()
    }
    for m_bits in (1 << 18, 64):
        got = {
            r["doc_id"]: r["n_shared_grams"]
            for r in text.ngram_decontaminate_bloom(
                docs, bench, n=3, m_bits=m_bits
            ).collect()
        }
        assert got == exact, m_bits
    assert exact == {1: 1, 3: 2, 5: 2}


def test_ngram_decontaminate_bloom_sf_table(spark):
    """Full-table equality vs the exact variant on the real documents
    fixture (the registry configuration: 4-grams, doc_id % 97 benchmark
    split)."""
    import os

    sf = os.path.join(
        os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001"
    )
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    exact = text.ngram_decontaminate(docs, bench, n=4)
    bloom = text.ngram_decontaminate_bloom(docs, bench, n=4)
    a = {(r["doc_id"], r["n_shared_grams"]) for r in exact.collect()}
    b = {(r["doc_id"], r["n_shared_grams"]) for r in bloom.collect()}
    assert a == b and len(a) > 0


def test_redact_pii_rules(spark):
    """Typed placeholders, pinned rule order (emails before phones, IPs
    before phones), counts on pre-redaction text, PII-free text passes
    through unchanged."""
    docs = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "server 192.168.0.1 answered"),
            (3, "call +1 555-0100 today"),
            (4, "clean text with no identifiers"),
            (5, "a@b.io 10.0.0.7 +44 20-7946-0958"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["redacted"], r["n_email"], r["n_ip"], r["n_phone"])
        for r in text.redact_pii_docs(docs).collect()
    }
    assert out[1] == ("mail <EMAIL> now", 1, 0, 0)
    assert out[2] == ("server <IP> answered", 0, 1, 0)
    assert out[3] == ("call <PHONE> today", 0, 0, 1)
    assert out[4] == ("clean text with no identifiers", 0, 0, 0)
    # dots break the phone charset, so the IP is not double-counted as a
    # phone; each category matches exactly once
    assert out[5] == ("<EMAIL> <IP> <PHONE>", 1, 1, 1)


def test_build_vocab_ranking(spark):
    """Dense ids in (count desc, token) order; min_count filter; the
    prefix-sum rank must equal the naive row_number semantics exactly,
    including count ties broken lexicographically."""
    docs = spark.createDataFrame(
        [
            (1, "b b b a a c"),
            (2, "a b z z"),
            (3, "c a z"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["token"]: (r["n"], r["vocab_id"])
        for r in text.build_vocab(docs, min_count=2).collect()
    }
    # counts: a=4, b=4, z=3, c=2 -> tie a/b broken lexicographically
    assert out == {"a": (4, 1), "b": (4, 2), "z": (3, 3), "c": (2, 4)}


# ---------------------------------------------------------------------------
# hashing-trick feature vectors
# ---------------------------------------------------------------------------


def _py_hashing_trick(text_val, dim=64):
    import hashlib
    import re

    toks = [t for t in re.sub(r"\s+", " ", text_val.strip().lower()).split(" ") if t]
    vec = [0] * dim
    for t in toks:
        idx = int(hashlib.md5(f"fh|{t}".encode()).hexdigest()[:8], 16) % dim
        sign = 1 if int(hashlib.md5(f"fs|{t}".encode()).hexdigest()[:2], 16) % 2 == 0 else -1
        vec[idx] += sign
    return vec


def test_hashing_trick_matches_python_mirror(spark):
    rows = [
        (1, "spark spark join filter aggregate"),
        (2, "the quick brown fox the quick"),
        (3, ""),
        (4, "  Mixed   CASE   tokens  "),
    ]
    df = _docs(spark, rows)
    got = {
        r.doc_id: (r.n_buckets_hit, r.l1_signed, [int(x) for x in r.vec_csv.split(",")])
        for r in text.hashing_trick_features(df, dim=64).collect()
    }
    for i, t in rows:
        vec = _py_hashing_trick(t)
        assert got[i][2] == vec, i
        assert got[i][1] == sum(abs(v) for v in vec)
    # empty doc: zero vector, zero buckets
    assert got[3] == (0, 0, [0] * 64)


def test_hashing_trick_repeated_token_accumulates(spark):
    df = _docs(spark, [(1, "x x x x x")])
    row = text.hashing_trick_features(df, dim=8).collect()[0]
    vec = [int(v) for v in row.vec_csv.split(",")]
    assert sorted(vec)[0] == -5 or sorted(vec)[-1] == 5
    assert row.n_buckets_hit == 1 and row.l1_signed == 5


def test_hashing_trick_validation(spark):
    import pytest

    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        text.hashing_trick_features(df, dim=0)
