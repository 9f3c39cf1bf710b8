"""duplicated_substring_spans — Lee-et-al-style exact substring dedup:
pure-Python reference parity plus contract edges."""

import hashlib
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import (
    dedup,
)


def py_spans(docs, gram, min_count=2):
    """(id -> text) -> set of (id, start, end, span_len, n_grams)."""
    toks = {
        i: " ".join(t.strip().lower().split()).split()
        for i, t in docs.items()
    }
    grams = []
    for i, tk in toks.items():
        if len(tk) < gram:
            continue
        for p in range(len(tk) - gram + 1):
            grams.append((i, p + 1, " ".join(tk[p : p + gram])))
    cnt = Counter(g for _, _, g in grams)
    out = set()
    for i in toks:
        pos = sorted(p for d, p, g in grams if d == i and cnt[g] >= min_count)
        if not pos:
            continue
        start = prev = pos[0]
        n = 1
        for p in pos[1:]:
            if p > prev + gram:
                out.add((i, start, prev + gram - 1, prev + gram - start, n))
                start, n = p, 0
            prev = p
            n += 1
        out.add((i, start, prev + gram - 1, prev + gram - start, n))
    return out


def _rows(df):
    return {
        (r.doc_id, r.span_start, r.span_end, r.span_len, r.n_dup_grams)
        for r in df.collect()
    }


def test_spans_match_python_reference(spark):
    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(30)]
    boiler = "the quick brown fox jumps over the lazy dog again today"
    docs = {}
    for i in range(25):
        body = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 60)))
        if i % 3 == 0:  # a third of docs embed the same boilerplate block
            docs[i] = body + " " + boiler + " " + body[::-1]
        else:
            docs[i] = body
    df = spark.createDataFrame(list(docs.items()), "doc_id bigint, text string")
    got = _rows(dedup.duplicated_substring_spans(df, gram=4))
    assert got == py_spans(docs, 4)
    # the boilerplate block must surface in every embedding doc
    embedders = {i for i in docs if i % 3 == 0}
    assert embedders <= {i for i, *_ in got}


def test_spans_merge_adjacent_and_within_doc_repeats(spark):
    # one doc repeats its own phrase: within-doc repetition counts
    docs = {
        1: "alpha beta gamma delta epsilon alpha beta gamma delta epsilon",
        2: "unrelated words only here nothing shared at all",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id bigint, text string")
    got = _rows(dedup.duplicated_substring_spans(df, gram=5))
    assert got == py_spans(docs, 5)
    assert {i for i, *_ in got} == {1}
    # the two occurrences of the 5-gram are adjacent (positions 1 and 6)
    # -> merged into ONE span covering the whole doc
    assert got == {(1, 1, 10, 10, 2)}


def test_spans_validation_and_empty(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        dedup.duplicated_substring_spans(df, gram=1)
    with pytest.raises(ValueError):
        dedup.duplicated_substring_spans(df, min_count=1)
    # nothing duplicated -> empty result
    df2 = spark.createDataFrame(
        [(1, "a b c d e f g h i"), (2, "j k l m n o p q r")],
        "doc_id bigint, text string",
    )
    assert dedup.duplicated_substring_spans(df2, gram=8).count() == 0


def py_bench_spans(docs, bench_texts, gram):
    """Spans of docs covered by grams present in the benchmark set."""
    def toks(t):
        return " ".join(t.strip().lower().split()).split()

    bench = set()
    for t in bench_texts:
        tk = toks(t)
        for p in range(len(tk) - gram + 1):
            bench.add(" ".join(tk[p : p + gram]))
    out = set()
    for i, t in docs.items():
        tk = toks(t)
        pos = sorted(
            p + 1
            for p in range(len(tk) - gram + 1)
            if " ".join(tk[p : p + gram]) in bench
        )
        if not pos:
            continue
        start = prev = pos[0]
        n = 1
        for p in pos[1:]:
            if p > prev + gram:
                out.add((i, start, prev + gram - 1, prev + gram - start, n))
                start, n = p, 0
            prev = p
            n += 1
        out.add((i, start, prev + gram - 1, prev + gram - start, n))
    return out


def test_decontaminate_span_report_matches_python(spark):
    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(40)]
    bench_texts = [
        "what is the capital of france paris obviously",
        "solve for x in two x plus three equals seven",
    ]
    docs = {}
    for i in range(20):
        body = " ".join(rng.choice(vocab) for _ in range(rng.randint(10, 50)))
        if i % 4 == 0:  # leak a benchmark fragment into some docs
            frag = bench_texts[i % 2].split()[0:6]
            docs[i] = body + " " + " ".join(frag) + " " + body
        else:
            docs[i] = body
    corpus = spark.createDataFrame(list(docs.items()), "doc_id bigint, text string")
    bench = spark.createDataFrame(
        [(1000 + j, t) for j, t in enumerate(bench_texts)],
        "doc_id bigint, text string",
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_len, r.n_bench_grams)
        for r in dedup.decontaminate_span_report(corpus, bench, gram=4).collect()
    }
    assert got == py_bench_spans(docs, bench_texts, 4)
    # every leaking doc is caught, clean docs are not
    assert {i for i, *_ in got} == {i for i in docs if i % 4 == 0}


def test_cut_spans_removes_exactly_the_spans(spark):
    docs = {
        1: "alpha beta gamma delta epsilon alpha beta gamma delta epsilon",
        2: "unrelated words only here nothing shared at all",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id bigint, text string")
    spans = dedup.duplicated_substring_spans(df, gram=5)
    out = {r.doc_id: r for r in dedup.cut_spans(df, spans).collect()}
    # doc 1's single span covers the whole doc -> everything cut
    assert out[1].text_clean == "" and out[1].n_tokens_removed == 10
    # doc 2 untouched (normalized join of its own tokens)
    assert out[2].text_clean == docs[2]
    assert out[2].n_tokens_removed == 0 and out[2].n_tokens == 8


def test_cut_spans_partial_and_positions(spark):
    # hand-built spans: cut tokens 2..3 and 6..6 of a 7-token doc
    df = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5 t6 t7")], "doc_id bigint, text string"
    )
    spans = spark.createDataFrame(
        [(1, 2, 3), (1, 6, 6)],
        "doc_id bigint, span_start bigint, span_end bigint",
    )
    r = dedup.cut_spans(df, spans).collect()[0]
    assert r.text_clean == "t1 t4 t5 t7"
    assert (r.n_tokens, r.n_tokens_removed) == (7, 3)
    # case/whitespace normalization is part of the contract
    df2 = spark.createDataFrame([(9, "  A   B\tC ")], "doc_id bigint, text string")
    r2 = dedup.cut_spans(
        df2, spans.filter(F.col("doc_id") < 0)
    ).collect()[0]
    assert r2.text_clean == "a b c" and r2.n_tokens_removed == 0
