"""BPE merge learning: independent pure-Python reference of the same
engine-portable contract (weighted adjacent-pair counts, (count desc,
pair asc) argmax, space-padded two-pass replace merge) driven over
randomized corpora — the winnow-parity pattern."""

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from probability_of_buying_two_products_together_hadoop_project_spark.operators import text

words = st.sampled_from(
    ["spark", "join", "aaaaa", "aaa", "abab", "ababab", "x", "yy", "banana"]
)
docs_strategy = st.lists(
    st.lists(words, min_size=1, max_size=6), min_size=1, max_size=6
)


def py_bpe(corpus_words, n_merges, end_mark="</w>"):
    """Reference implementation of _bpe_rounds' documented contract."""
    wc = Counter(corpus_words)
    seqs = {w: " ".join(list(w)) + " " + end_mark for w in wc}
    merges = []
    for rnd in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for w, cnt in wc.items():
            sy = seqs[w].split(" ")
            for i in range(len(sy) - 1):
                pairs[(sy[i], sy[i + 1])] += cnt
        if not pairs:
            break
        # argmax: count desc, then lexicographic pair string asc
        best = min(pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        (l, r), cnt = best
        merges.append((rnd, l, r, l + r, cnt))
        patt, repl = f" {l} {r} ", f" {l}{r} "
        for w in seqs:
            s = f" {seqs[w]} ".replace(patt, repl).replace(patt, repl)
            seqs[w] = s.strip()
    return merges, {w: (wc[w], seqs[w]) for w in wc}


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_strategy, st.integers(min_value=1, max_value=10))
def test_bpe_matches_python_reference(spark, doc_lists, n_merges):
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(doc_lists)],
        "doc_id long, text string",
    )
    corpus = [t for toks in doc_lists for t in toks]
    want_merges, want_vocab = py_bpe(corpus, n_merges)

    got_merges = [
        (r["round"], r["left_sym"], r["right_sym"], r["merged"], r["cnt"])
        for r in text.bpe_learn_merges(df, n_merges=n_merges)
        .orderBy("round")
        .collect()
    ]
    assert got_merges == want_merges

    got_vocab = {
        r["word"]: (r["cnt"], r["seq"])
        for r in text.bpe_encode_words(df, n_merges=n_merges).collect()
    }
    assert got_vocab == want_vocab


def test_bpe_identical_run_contract(spark):
    """The documented scan-merge contract on an odd identical run:
    'aaaaa' with winning pair (a, a) merges scan-order occurrences
    (1-2 and 4-5), yielding 'aa a aa' — NOT canonical greedy's
    'aa aa a'. Pinned so both engines and the reference stay on the
    same contract."""
    df = spark.createDataFrame([(0, "aaaaa")], "doc_id long, text string")
    got = {
        r["word"]: r["seq"]
        for r in text.bpe_encode_words(df, n_merges=1).collect()
    }
    assert got == {"aaaaa": "aa a aa </w>"}


def test_bpe_exhausts_merges_cleanly(spark):
    """More rounds than learnable merges: the loop stops at exhaustion
    (single-symbol words yield no pairs) and returns only the merges
    that exist."""
    df = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    merges = text.bpe_learn_merges(df, n_merges=10).orderBy("round").collect()
    # 'a b </w>' -> 'ab </w>' -> 'ab</w>' -> nothing left
    assert [(m["round"], m["merged"]) for m in merges] == [
        (1, "ab"),
        (2, "ab</w>"),
    ]
    vocab = text.bpe_encode_words(df, n_merges=10).collect()
    assert [(v["word"], v["seq"], v["n_symbols"]) for v in vocab] == [
        ("ab", "ab</w>", 1)
    ]
