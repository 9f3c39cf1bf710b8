"""Similarity-search tests: brute-force cosine vs numpy ground truth;
SRP-LSH returns well-formed, deterministic approximate results."""

import math

import numpy as np
import pytest
from pyspark.sql.functions import col as F_col

from probability_of_buying_two_products_together_hadoop_project_spark.operators import similarity


def _emb(spark, n=40, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]], int(i % 3)) for i in range(n)]
    return (
        spark.createDataFrame(rows, ["vec_id", "embedding", "label"]),
        vecs.astype("float64"),
    )


def test_bruteforce_topk_matches_numpy(spark):
    df, vecs = _emb(spark)
    out = similarity.cosine_topk_bruteforce(df, [0, 1], k=5)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append((r["rk"], r["neighbor_id"], r["cos_sim"]))
    norms = np.linalg.norm(vecs, axis=1)
    for q in (0, 1):
        sims = vecs @ vecs[q] / (norms * norms[q])
        order = [
            (round(float(sims[i]), 4), i) for i in range(len(vecs)) if i != q
        ]
        # replicate the engine's ordering: rounded sim desc, neighbor asc
        order.sort(key=lambda t: (-t[0], t[1]))
        want = [(rk + 1, i, s) for rk, (s, i) in enumerate(order[:5])]
        got_q = sorted(got[q])
        assert [(rk, i) for rk, i, _ in got_q] == [(rk, i) for rk, i, _ in want]
        for (_, _, s_got), (_, _, s_want) in zip(got_q, want):
            assert math.isclose(s_got, s_want, abs_tol=1e-9)


def test_cosine_column_exact(spark):
    df, vecs = _emb(spark, n=4)
    a, b = df.alias("a"), df.alias("b")
    rows = (
        a.join(b, F_col("a.vec_id") < F_col("b.vec_id"))
        .select(
            F_col("a.vec_id").alias("i"),
            F_col("b.vec_id").alias("j"),
            similarity.cosine(F_col("a.embedding"), F_col("b.embedding")).alias("c"),
        )
        .collect()
    )
    norms = np.linalg.norm(vecs, axis=1)
    for r in rows:
        want = float(vecs[r["i"]] @ vecs[r["j"]] / (norms[r["i"]] * norms[r["j"]]))
        assert math.isclose(r["c"], want, rel_tol=1e-12)


def test_ivf_topk_recall_vs_bruteforce(spark):
    df, vecs = _emb(spark, n=80, dim=8)
    queries = [0, 1, 2]
    exact = similarity.cosine_topk_bruteforce(df, queries, k=5).collect()
    approx = similarity.ivf_topk(df, queries, k=5, n_lists=8, n_probe=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # probing half the lists must recover a majority of true neighbors
    total = sum(len(exact_sets[q]) for q in queries)
    hit = sum(len(exact_sets[q] & approx_sets.get(q, set())) for q in queries)
    assert hit / total >= 0.5, (hit, total)
    # ranks are dense 1..n per query
    for q in queries:
        rks = sorted(r["rk"] for r in approx if r["query_id"] == q)
        assert rks == list(range(1, len(rks) + 1))


def test_ivf_sampled_fit_bounded_and_recall_holds(spark):
    """Forcing the sampled-fit path (fit_sample_size << corpus) must keep
    IVF recall at the same bar as the full fit: centroids only need the
    density landscape, not every point."""
    df, _ = _emb(spark, n=80, dim=8)
    queries = [0, 1, 2]
    assigned, centroids = similarity.ivf_index(df, n_lists=8, fit_sample_size=40)
    assert len(centroids) == 8
    assert assigned.count() == 80  # assignment covers the FULL corpus
    exact = similarity.cosine_topk_bruteforce(df, queries, k=5).collect()
    approx = similarity.ivf_topk(
        df, queries, k=5, n_lists=8, n_probe=4, fit_sample_size=40
    ).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    total = sum(len(exact_sets[q]) for q in queries)
    hit = sum(len(exact_sets[q] & approx_sets.get(q, set())) for q in queries)
    assert hit / total >= 0.5, (hit, total)


def test_with_recall_vs_exact_matches_python(spark):
    """recall_at_k must equal the hand-computed |approx ∩ exact| / k per
    query, and be constant across a query's rows."""
    df, _ = _emb(spark, n=80, dim=8)
    queries = [0, 1, 2]
    exact_df = similarity.cosine_topk_bruteforce(df, queries, k=5)
    approx_df = similarity.ivf_topk(df, queries, k=5, n_lists=8, n_probe=4)
    out = similarity.with_recall_vs_exact(approx_df, exact_df, k=5).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact_df.collect():
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx_df.collect():
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in out:
        want = len(exact_sets[r["query_id"]] & approx_sets[r["query_id"]]) / 5.0
        assert math.isclose(r["recall_at_k"], round(want, 4)), r


def test_ivf_partitioned_layout_prunes(spark, tmp_path):
    """The IVF index written partitionBy(list_id) must give directory-
    level partition pruning when probing: the scan's PartitionFilters
    carry the list_id predicate (no full-index read)."""
    from probability_of_buying_two_products_together_hadoop_project_spark.plans.explain import (
        formatted_plan,
    )

    df, _ = _emb(spark, n=80, dim=8)
    assigned, _ = similarity.ivf_index(df, n_lists=8)
    path = str(tmp_path / "ivf")
    similarity.write_ivf_index(assigned, path)
    probed = similarity.probe_ivf_index(spark, path, [1, 3])
    plan = formatted_plan(probed)
    assert "PartitionFilters" in plan and "list_id" in plan.split("PartitionFilters", 1)[1][:200]
    got_lists = {r["list_id"] for r in probed.collect()}
    assert got_lists <= {1, 3}
    # probed rows are exactly the assignment's rows for those lists
    want = assigned.filter(F_col("list_id").isin([1, 3])).count()
    assert probed.count() == want


def test_srp_lsh_wellformed_and_deterministic(spark):
    df, _ = _emb(spark, n=60)
    out1 = similarity.srp_lsh_topk(df, [0, 1, 2], k=5).collect()
    out2 = similarity.srp_lsh_topk(df, [0, 1, 2], k=5).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    by_q = {}
    for r in out1:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        assert len(rows) <= 5
        assert all(r["neighbor_id"] != q for r in rows)
        rks = sorted(r["rk"] for r in rows)
        assert rks == list(range(1, len(rows) + 1))


def test_ivf_index_runs_no_count_action(spark, monkeypatch):
    """ivf_index must not run a full-scan count() pre-pass to size the
    fit sample (r03 verdict) — any DataFrame.count() during the call is
    a regression."""
    from pyspark.sql import DataFrame

    emb = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), 1.0]) for i in range(64)],
        "vec_id bigint, embedding array<float>",
    )

    def boom(self):
        raise AssertionError("DataFrame.count() called inside ivf_index")

    monkeypatch.setattr(DataFrame, "count", boom)
    assigned, centroids = similarity.ivf_index(emb, n_lists=4)
    monkeypatch.undo()
    assert assigned.count() == 64
    assert len(centroids) == 4


def test_cosine_near_dup_finds_planted_pairs(spark):
    """Planted near-identical vectors (cos ~ 1: every SRP bit agrees ->
    all bands collide) must be surfaced; orthogonal vectors must not."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),      # orthogonal to 0/1
        (3, [0.0, 0.9999, 0.001, 0.0]), # near-dup of 2
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in similarity.cosine_near_dup_pairs(
            emb, threshold=0.9, num_planes=24, bands=8
        ).collect()
    }
    assert (0, 1) in got and got[(0, 1)] >= 0.99
    assert (2, 3) in got and got[(2, 3)] >= 0.99
    assert (0, 2) not in got and (1, 2) not in got


def test_cosine_near_dup_rejects_bad_band_split():
    import pytest

    with pytest.raises(ValueError, match="divisible"):
        similarity.cosine_near_dup_pairs(None, num_planes=24, bands=7)


def _spark_round4(x: float) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(float(x))).quantize(Decimal("0.0001"), ROUND_HALF_UP))


def test_ivf_grid_matches_python_reference(spark):
    """Full-pipeline equality vs an independent numpy/python replication
    of the grid quantizer: cell assignment, Chebyshev-1 clamped probe
    set, exact cosine re-rank, deterministic tie-break — bit-for-bit
    (the property the DuckDB oracle also pins)."""
    df, vecs = _emb(spark, n=60, dim=8)
    queries, k, lo, step, g = [0, 1, 2], 5, -0.6, 0.3, 4

    def cell_coords(v):
        return [
            min(max(int(math.floor((float(v[j]) - lo) / step)), 0), g - 1)
            for j in range(2)
        ]

    def cell_id(c):
        return c[0] + g * c[1]

    cells = {i: cell_id(cell_coords(vecs[i])) for i in range(len(vecs))}
    want = []
    for q in queries:
        c = cell_coords(vecs[q])
        probe = {
            cell_id(
                [min(max(c[0] + dx, 0), g - 1), min(max(c[1] + dy, 0), g - 1)]
            )
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        }
        cand = [i for i in range(len(vecs)) if i != q and cells[i] in probe]
        sims = []
        for i in cand:
            cs = float(
                np.dot(vecs[q], vecs[i])
                / (np.linalg.norm(vecs[q]) * np.linalg.norm(vecs[i]))
            )
            sims.append((i, _spark_round4(cs)))
        sims.sort(key=lambda t: (-t[1], t[0]))
        want += [(q, nid, cs, rk + 1) for rk, (nid, cs) in enumerate(sims[:k])]

    got = [
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rk"])
        for r in similarity.ivf_topk_grid(
            df, queries, k=k, dims=2, lo=lo, step=step, g=g
        )
        .orderBy("query_id", "rk")
        .collect()
    ]
    assert got == want


def test_ivf_grid_border_clamp_and_determinism(spark):
    """Vectors far outside the grid range clamp into border cells (no
    lost rows, no invalid probe ids); reruns are identical."""
    rows = [
        (0, [10.0] * 8, 0),     # clamps to the (3,3) corner
        (1, [-10.0] * 8, 0),    # clamps to the (0,0) corner
        (2, [9.0] * 8, 0),      # same corner as 0 -> must be found
        (3, [0.1] * 8, 0),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out1 = similarity.ivf_topk_grid(df, [0], k=3).collect()
    out2 = similarity.ivf_topk_grid(df, [0], k=3).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    assert {r["neighbor_id"] for r in out1} >= {2}


def test_semantic_diverse_sample_caps_dense_cells(spark):
    # 20 vectors piled into one grid cell (all coords ~0.0 -> cell of
    # (0.0+0.6)/0.3 = 2 on both axes) and 2 lone vectors in other cells:
    # the dense cell caps at per_cell, the sparse ones all survive.
    dense = [(i, [0.01 * (i % 3), 0.01 * (i % 2), 0.0], 0) for i in range(20)]
    sparse = [(100, [-0.55, -0.55, 0.0], 0), (101, [0.55, -0.55, 0.0], 0)]
    df = spark.createDataFrame(dense + sparse, ["vec_id", "embedding", "label"])
    out = similarity.semantic_diverse_sample(df, per_cell=5).collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r.cell, []).append(r)
    dense_cell = [rs for rs in by_cell.values() if rs[0].cell_n == 20]
    assert len(dense_cell) == 1 and len(dense_cell[0]) == 5
    lone = [r for r in out if r.cell_n == 1]
    assert {r.vec_id for r in lone} == {100, 101}
    # the draw is deterministic: rerun picks the identical ids
    again = {r.vec_id for r in similarity.semantic_diverse_sample(df, per_cell=5).collect()}
    assert again == {r.vec_id for r in out}


def test_tfidf_cosine_pairs_matches_python_bruteforce(spark):
    import math
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    # tiny corpus where every 3-gram has df <= 3 -> blocking is total
    # recall, so the operator must equal the brute-force cosine.
    corpus = {
        1: "spark joins the window over a sorted frame quickly",
        2: "spark joins the window over a sorted frame slowly",
        3: "ducks prefer exact decimal sums in every engine",
        4: "ducks prefer exact decimal sums in some engine",
        5: "completely unrelated text about graph iteration rounds",
    }
    df = spark.createDataFrame(list(corpus.items()), "doc_id bigint, text string")
    got = {
        (r.doc_a, r.doc_b): r.cos_sim
        for r in similarity.tfidf_cosine_pairs(
            df, n=3, rare_df_min=1, rare_df_max=5, threshold=0.0
        ).collect()
    }

    def grams(s):
        t = s.split()
        return Counter(" ".join(t[i : i + 3]) for i in range(len(t) - 2))

    gs = {k: grams(v) for k, v in corpus.items()}
    dfreq = Counter(g for c in gs.values() for g in c)
    n = len(corpus)

    def w(tf, d):
        idf = Decimal(repr(math.log(1.0 + n / d))).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
        return tf * idf

    want = {}
    for a in corpus:
        for b in corpus:
            if a >= b:
                continue
            shared = set(gs[a]) & set(gs[b])
            if not shared:
                continue
            dot = float(sum(w(gs[a][g], dfreq[g]) * w(gs[b][g], dfreq[g]) for g in shared))
            na = math.sqrt(float(sum(w(tf, dfreq[g]) ** 2 for g, tf in gs[a].items())))
            nb = math.sqrt(float(sum(w(tf, dfreq[g]) ** 2 for g, tf in gs[b].items())))
            want[(a, b)] = dot / (na * nb)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), k
    # the near-duplicate pairs outscore every unrelated pair
    others = [v for k, v in got.items() if k not in {(1, 2), (3, 4)}]
    assert min(got[(1, 2)], got[(3, 4)]) > max(others, default=0.0)


def test_tfidf_cosine_blocking_contract(spark):
    # a gram above rare_df_max generates no candidates: three identical
    # docs (df=3 for every gram) with rare_df_max=2 -> empty output.
    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(3)],
        "doc_id bigint, text string",
    )
    out = similarity.tfidf_cosine_pairs(df, rare_df_min=2, rare_df_max=2)
    assert out.count() == 0


def test_embedding_centroids_match_numpy(spark):
    df, vecs = _emb(spark, n=30, dim=4)
    got = {
        (r.label, r.pos): (r.n_vecs, r.component_mean)
        for r in similarity.embedding_centroids(df).collect()
    }
    import numpy as np

    labels = [i % 3 for i in range(30)]
    for lab in range(3):
        sel = np.float32(vecs[[i for i in range(30) if labels[i] == lab]])
        # the quantized mean is within 1/unit of the float mean
        for pos in range(4):
            n, cm = got[(lab, pos)]
            assert n == len(sel)
            assert abs(cm - float(np.float64(sel[:, pos]).mean())) < 1e-6
    # determinism: a different partitioning yields identical bits
    again = {
        (r.label, r.pos): r.component_mean
        for r in similarity.embedding_centroids(df.repartition(7)).collect()
    }
    assert again == {k: v[1] for k, v in got.items()}


def test_nearest_centroid_assign_separable_clusters(spark):
    import numpy as np

    # three well-separated clusters -> the confusion matrix is diagonal
    rng = np.random.default_rng(3)
    rows = []
    for lab, center in [(0, 0.0), (1, 10.0), (2, -10.0)]:
        for i in range(12):
            v = (center + rng.normal(scale=0.1, size=4)).astype("float32")
            rows.append((lab * 100 + i, [float(x) for x in v], lab))
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = {
        (r.true_label, r.assigned_label): r.n
        for r in similarity.nearest_centroid_assign(df).collect()
    }
    assert got == {(0, 0): 12, (1, 1): 12, (2, 2): 12}


# ---------------------------------------------------------------------------
# quantize_int8
# ---------------------------------------------------------------------------


def test_quantize_int8_matches_python_mirror(spark):
    import math
    import random

    rng = random.Random(17)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)], 0) for i in range(50)
    ] + [(100, [0.0] * 16, 0)]  # zero vector must be excluded
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    got = {r.vec_id: r for r in similarity.quantize_int8(df).collect()}
    assert 100 not in got
    # floats round-trip through float32; mirror from the collected values
    src = {r.vec_id: r.embedding for r in df.collect()}
    for i, _, _ in rows[:-1]:
        v = [float(x) for x in src[i]]
        scale = max(abs(x) for x in v) / 127.0
        q = [math.floor(x / scale + 0.5) for x in v]
        assert all(-127 <= c <= 127 for c in q)
        assert got[i].q_csv == ",".join(str(c) for c in q)
        assert got[i].scale == scale
        mse = sum((x - c * scale) ** 2 for x, c in zip(v, q)) / len(v)
        assert abs(got[i].mse - mse) < 1e-7


def test_quantize_int8_reconstruction_bound(spark, sf_oracle):
    # per-element error bound: |v - q*scale| <= scale/2 => mse <= scale^2/4
    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    out = similarity.quantize_int8(emb).collect()
    assert out
    for r in out:
        assert r.mse <= r.scale * r.scale / 4.0 + 1e-12
