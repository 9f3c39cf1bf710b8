"""Tests for source KL divergence, running distinct-count window, and the
cluster-canonical registry composition (python mirrors on small frames)."""

import math
import random
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark import registry


def _round_half_up(x, nd):
    # mirror engine semantics: decimal HALF_UP over the shortest repr
    return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-nd), ROUND_HALF_UP))


def py_source_kl(rows):
    counts = {}
    for source, txt in rows:
        for w in txt.lower().split():
            counts[(source, w)] = counts.get((source, w), 0) + 1
    t_all = sum(counts.values())
    t_s, c_w = {}, {}
    for (s, w), c in counts.items():
        t_s[s] = t_s.get(s, 0) + c
        c_w[w] = c_w.get(w, 0) + c
    out = {}
    for (s, w), c in counts.items():
        p = c / t_s[s]
        term = _round_half_up(p * math.log((c * t_all) / (t_s[s] * c_w[w])), 6)
        n, k = out.get(s, (0, Decimal(0)))
        out[s] = (n + 1, k + Decimal(repr(term)))
    return {
        s: (n, _round_half_up(float(k), 4)) for s, (n, k) in out.items()
    }


def test_source_kl_matches_python(spark, tmp_path):
    rng = random.Random(11)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    rows = [
        (i, rng.choice(["web", "books", "code"]),
         " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40))))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    p = str(tmp_path / "documents.parquet")
    df.write.parquet(p, mode="overwrite")
    got = {
        r.source: (r.n_words, r.kl)
        for r in registry.REGISTRY["source_kl_divergence"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert got == py_source_kl([(s, t) for _, s, t in rows])


def test_source_kl_identical_sources_zero(spark, tmp_path):
    # all sources share the corpus distribution exactly -> KL == 0
    rows = [(i, src, "a b c") for i, src in enumerate(["x", "y", "z"] * 4)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    df.write.parquet(str(tmp_path / "documents.parquet"), mode="overwrite")
    out = registry.REGISTRY["source_kl_divergence"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 3
    for r in out:
        assert r.kl == 0.0 and r.n_words == 3


def test_window_distinct_running_matches_python(spark, tmp_path):
    rng = random.Random(5)
    rows = []
    for i in range(300):
        rows.append(
            (i, rng.randint(0, 20), rng.randint(0, 10 ** 6),
             rng.choice(["view", "click", "purchase", "refund"]), 0.0, "{}")
        )
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, tsu bigint, event_type string, value double, props string"
    ).select(
        "event_id", F.timestamp_micros(F.col("tsu")).alias("ts"), "user_id",
        "event_type", "value", "props"
    )
    df.write.parquet(str(tmp_path / "events.parquet"), mode="overwrite")
    got = {
        r.event_id: r.n_types_seen
        for r in registry.REGISTRY["window_distinct_running_events"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    per_user = {}
    for eid, uid, tsu, et, _, _ in rows:
        per_user.setdefault(uid, []).append((tsu, eid, et))
    want = {}
    for uid, evs in per_user.items():
        seen = set()
        for _, eid, et in sorted(evs):
            seen.add(et)
            want[eid] = len(seen)
    assert got == want


def test_cluster_canonical_partitions_and_picks_best(spark, sf_smoke):
    reg = registry.REGISTRY
    clusters = {
        r.doc_id: r.cluster_id
        for r in reg["dedup_clusters"].fn(spark, sf_smoke).collect()
    }
    quality = {
        r.doc_id: r.quality for r in reg["text_quality"].fn(spark, sf_smoke).collect()
    }
    got = reg["dedup_cluster_canonical"].fn(spark, sf_smoke).collect()
    # one row per cluster, membership sums to corpus size
    assert {r.cluster_id for r in got} == set(clusters.values())
    assert sum(r.n_members for r in got) == len(clusters)
    for r in got:
        members = [d for d, c in clusters.items() if c == r.cluster_id]
        assert len(members) == r.n_members
        best = min(members, key=lambda d: (-quality[d], d))
        assert r.canonical_doc == best
        assert r.quality == quality[best]


def test_window_running_median_matches_python(spark, tmp_path):
    import datetime

    rng = random.Random(21)
    rows = [
        (i, rng.randint(0, 15),
         datetime.date(1995, 1, 1) + datetime.timedelta(days=rng.randint(0, 400)),
         round(rng.uniform(10, 1000), 2), "O", "p", 0)
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderdate date, "
        "o_totalprice double, o_orderstatus string, o_orderpriority string, "
        "o_shippriority int",
    )
    df.write.parquet(str(tmp_path / "orders.parquet"), mode="overwrite")
    got = {
        r.o_orderkey: r.run_median
        for r in registry.REGISTRY["window_running_median_orders"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    per_cust = {}
    for k, c, d, p, *_ in rows:
        per_cust.setdefault(c, []).append((d, k, p))
    want = {}
    for c, evs in per_cust.items():
        evs.sort()
        for i in range(len(evs)):
            frame = sorted(p for _, _, p in evs[max(0, i - 5) : i + 1])
            n = len(frame)
            want[evs[i][1]] = (
                frame[n // 2]
                if n % 2 == 1
                else (frame[n // 2 - 1] + frame[n // 2]) / 2.0
            )
    assert got == want


def test_nb_confusion_separable_corpus_is_diagonal(spark, tmp_path):
    rng = random.Random(4)
    vocab = {"aa": ["red", "crimson", "scarlet"],
             "bb": ["blue", "azure", "navy"],
             "cc": ["green", "lime", "olive"]}
    rows = []
    i = 0
    for lang, words in vocab.items():
        for _ in range(30):
            rows.append(
                (i, " ".join(rng.choice(words) for _ in range(12)), lang, "s", 0)
            )
            i += 1
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars int"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"), mode="overwrite")
    out = registry.REGISTRY["nb_lang_confusion"].fn(spark, str(tmp_path)).collect()
    conf = {(r.lang, r.pred_lang): r.n_docs for r in out}
    assert conf == {("aa", "aa"): 30, ("bb", "bb"): 30, ("cc", "cc"): 30}
