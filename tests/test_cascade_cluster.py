"""Tests for the GDPR cascade-forget operator and semantic cluster
topic labeling (`relational.cascade_forget`, `similarity.cluster_topics`)."""

from collections import Counter

from probability_of_buying_two_products_together_hadoop_project_spark.operators import relational, similarity
from pyspark.sql import functions as F
from tests.test_semantic_dedup import py_semantic_dedup


def _world(spark):
    cust = spark.createDataFrame(
        [(1, "ann"), (2, "bob"), (3, "cyn")], "c_id bigint, c_name string"
    )
    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2), (13, 3)], "o_id bigint, o_cust bigint"
    )
    items = spark.createDataFrame(
        [(10, "x"), (10, "y"), (11, "z"), (12, "w"), (13, "v")],
        "i_order bigint, sku string",
    )
    return cust, orders, items


def test_cascade_counts_and_kept(spark):
    cust, orders, items = _world(spark)
    root = cust.filter(F.col("c_id") == 1).select("c_id")
    summary, kept = relational.cascade_forget(
        root,
        "c_id",
        [
            ("customer", cust, "c_id", "c_id"),
            ("orders", orders, "o_cust", "o_id"),
            ("items", items, "i_order", None),
        ],
    )
    got = {r.tbl: (r.rows_before, r.rows_purged, r.rows_after) for r in summary.collect()}
    assert got == {
        "customer": (3, 1, 2),
        "orders": (4, 2, 2),
        "items": (5, 3, 2),
    }
    assert {r.c_name for r in kept["customer"].collect()} == {"bob", "cyn"}
    assert {r.o_id for r in kept["orders"].collect()} == {12, 13}
    assert {r.sku for r in kept["items"].collect()} == {"w", "v"}
    # kept relations carry ONLY the original columns
    assert kept["orders"].columns == ["o_id", "o_cust"]


def test_cascade_empty_request_is_noop(spark):
    cust, orders, items = _world(spark)
    root = cust.filter(F.col("c_id") < 0).select("c_id")
    summary, kept = relational.cascade_forget(
        root,
        "c_id",
        [
            ("customer", cust, "c_id", "c_id"),
            ("orders", orders, "o_cust", "o_id"),
            ("items", items, "i_order", None),
        ],
    )
    assert all(r.rows_purged == 0 and r.rows_before == r.rows_after
               for r in summary.collect())
    assert kept["items"].count() == 5


def test_cluster_topics_single_cluster_ranking(spark):
    """k=1: every doc in one cluster; ranking reduces to (count DESC,
    term ASC) with the cluster-frequency penalty constant."""
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.8, 0.2])],
        "vec_id bigint, embedding array<float>",
    )
    docs = spark.createDataFrame(
        [(0, "apple apple banana"), (1, "apple cherry"), (2, "banana apple")],
        "doc_id bigint, text string",
    )
    got = [
        (r.cid, r.term, r.n_in_cluster, r.rk)
        for r in similarity.cluster_topics(emb, docs, k=1, iters=1, top_k=3)
        .orderBy("rk")
        .collect()
    ]
    assert got == [(0, "apple", 4, 1), (0, "banana", 2, 2), (0, "cherry", 1, 3)]


def test_cluster_topics_matches_assignment_mirror(spark):
    """Two separable clusters: topics computed from the python k-means
    assignment mirror must equal the operator's output."""
    vecs = {
        0: [1.0, 0.0, 0.0, 0.0],
        1: [0.9, 0.1, 0.0, 0.0],
        2: [0.0, 0.0, 1.0, 0.0],
        3: [0.0, 0.0, 0.9, 0.1],
    }
    texts = {0: "red apple", 1: "red fruit", 2: "blue sky", 3: "blue sea"}
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id bigint, embedding array<float>"
    )
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id bigint, text string"
    )
    # assignment via the shared semantic-dedup mirror (cid, rk, sim, kept)
    assign = {i: v[0] for i, v in py_semantic_dedup(vecs, k=2, iters=2, threshold=2.0).items()}
    ct = Counter()
    for i, t in texts.items():
        for w in t.split():
            ct[(assign[i], w)] += 1
    cf = Counter(w for (_, w) in ct)
    want = set()
    for cid in set(assign.values()):
        terms = sorted(
            [(w, n) for (c, w), n in ct.items() if c == cid],
            key=lambda x: (-x[1], cf[x[0]], x[0]),
        )
        for rk, (w, n) in enumerate(terms[:5], 1):
            want.add((cid, w, n, cf[w], rk))
    got = {
        (r.cid, r.term, r.n_in_cluster, r.n_clusters_with_term, r.rk)
        for r in similarity.cluster_topics(emb, docs, k=2, iters=2, top_k=5).collect()
    }
    assert got == want
