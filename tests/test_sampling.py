"""Deterministic stratified sampling: reproducible, capped per stratum,
and engine-independent (md5 order, no RNG)."""

import pytest
from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import relational


def _df(spark):
    rows = [(i, "abc"[i % 3], float(i)) for i in range(90)]
    return spark.createDataFrame(rows, ["id", "grp", "v"])


def test_stratified_sample_caps_and_reproduces(spark):
    df = _df(spark)
    s1 = relational.deterministic_stratified_sample(df, ["grp"], "id", 5)
    s2 = relational.deterministic_stratified_sample(df, ["grp"], "id", 5)
    rows1 = sorted(map(tuple, s1.collect()))
    rows2 = sorted(map(tuple, s2.collect()))
    assert rows1 == rows2  # bit-identical rerun
    per = {r["grp"]: 0 for r in s1.collect()}
    for r in s1.collect():
        per[r["grp"]] += 1
    assert per == {"a": 5, "b": 5, "c": 5}


def test_stratified_sample_matches_python_md5_order(spark):
    import hashlib

    df = _df(spark)
    got = {
        r["grp"]: None
        for r in relational.deterministic_stratified_sample(df, ["grp"], "id", 3).collect()
    }
    out = relational.deterministic_stratified_sample(df, ["grp"], "id", 3).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], set()).add(r["id"])
    for g in "abc":
        ids = [i for i in range(90) if "abc"[i % 3] == g]
        want = set(
            sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:3]
        )
        assert by_grp[g] == want


def test_sample_grows_monotonically(spark):
    """n=3 sample must be a subset of the n=5 sample (prefix property of
    a fixed order — lets pipelines grow a holdout without resampling)."""
    df = _df(spark)
    s3 = {(r["grp"], r["id"]) for r in
          relational.deterministic_stratified_sample(df, ["grp"], "id", 3).collect()}
    s5 = {(r["grp"], r["id"]) for r in
          relational.deterministic_stratified_sample(df, ["grp"], "id", 5).collect()}
    assert s3 < s5


def test_keep_latest_per_key(spark):
    rows = [
        (1, "a", 10, 100.0),
        (1, "a", 20, 200.0),  # newer ts wins
        (1, "b", 10, 300.0),
        (2, "a", 20, 400.0),
        (2, "a", 21, 500.0),  # same... higher tiebreak wins below
    ]
    df = spark.createDataFrame(rows, ["k1", "k2", "ts", "v"])
    out = {
        (r["k1"], r["k2"]): (r["ts"], r["v"])
        for r in relational.keep_latest(df, ["k1", "k2"], "ts", "v").collect()
    }
    assert out == {(1, "a"): (20, 200.0), (1, "b"): (10, 300.0), (2, "a"): (21, 500.0)}


def test_salted_join_equals_plain_join(spark):
    left = spark.createDataFrame(
        [(k, i, float(i)) for i in range(200) for k in ([1] * 3 + [i % 7])],
        ["k", "row_id", "v"],
    )
    right = spark.createDataFrame([(k, f"dim{k}") for k in range(7)], ["rk", "name"])
    plain = left.join(right, left["k"] == right["rk"]).select("k", "row_id", "v", "name")
    salted = relational.salted_join(
        left, right, "k", "rk", salt_cols=("row_id",), n_salts=4
    ).select("k", "row_id", "v", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # the salt must actually spread a hot key's rows across buckets
    from pyspark.sql import functions as F
    n_buckets = (
        left.filter(F.col("k") == 1)
        .select(F.pmod(F.xxhash64("row_id"), F.lit(4)).alias("s"))
        .distinct()
        .count()
    )
    assert n_buckets > 1


def test_salted_join_rejects_right_preserving_shapes(spark):
    """Right/full-outer would duplicate unmatched right rows once per
    salt (ADVICE r03) — salted_join must refuse them."""
    import pytest

    df = spark.range(4).withColumnRenamed("id", "k")
    rhs = spark.range(4).withColumnRenamed("id", "r")
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="not left-preserving"):
            relational.salted_join(df, rhs, "k", "r", salt_cols=("k",), how=how)


def test_interval_join_matches_bruteforce_and_drops_long_intervals(spark):
    """Banded interval join must equal the naive range join exactly —
    bucket-boundary straddles produce each pair exactly once — and
    intervals longer than max_interval_sec are dropped entirely, never
    partially matched."""
    from pyspark.sql import functions as F

    pts = spark.createDataFrame(
        [(i, 1, i * 37) for i in range(40)], ["pid", "k", "sec"]
    ).select("pid", "k", F.timestamp_seconds("sec").alias("ts"))
    iv_rows = [(100 + j, 1, j * 53, j * 53 + 90) for j in range(25)]
    iv_rows.append((999, 1, 0, 10_000))  # longer than max_interval: dropped
    ivs = spark.createDataFrame(iv_rows, ["iid", "ik", "s", "e"]).select(
        "iid", "ik",
        F.timestamp_seconds("s").alias("ws"),
        F.timestamp_seconds("e").alias("we"),
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in relational.interval_join(
            pts, ivs, "k", "ik", "ts", "ws", "we", max_interval_sec=90
        ).collect()
    )
    want = sorted(
        (p, i)
        for p in range(40)
        for (i, _, s, e) in iv_rows
        if i != 999 and s <= p * 37 < e
    )
    assert got == want and len(want) > 20
    assert all(i != 999 for _, i in got)


def test_hash_sample_is_deterministic_and_join_consistent(spark):
    """md5-bucket sampling must (a) draw the same rows on rerun, (b)
    keep referential integrity when two tables sample on the same key:
    every sampled child row's parent is in the parent sample."""
    from pyspark.sql import functions as F

    parents = spark.range(1000).withColumnRenamed("id", "k")
    children = (
        spark.range(3000)
        .select((F.col("id") % 1000).alias("k"), F.col("id").alias("cid"))
    )
    ps1 = {r["k"] for r in relational.hash_sample(parents, ["k"], 100).collect()}
    ps2 = {r["k"] for r in relational.hash_sample(parents, ["k"], 100).collect()}
    cs = {(r["k"], r["cid"]) for r in relational.hash_sample(children, ["k"], 100).collect()}
    assert ps1 == ps2 and 50 <= len(ps1) <= 150  # ~10% of 1000
    assert {k for k, _ in cs} <= ps1  # child sample's keys ⊆ parent sample
    # salt rotates the draw
    ps3 = {r["k"] for r in relational.hash_sample(parents, ["k"], 100, salt="v2").collect()}
    assert ps3 != ps1


def test_salted_collect_equals_plain_collect(spark):
    """Salting must be result-invisible: the two-phase salted collect,
    flattened and sorted, equals sort_array(collect_list) computed the
    naive way — including a deliberately hot key holding most rows."""
    rows = [(1, f"v{i % 7}") for i in range(200)] + [(2, "a"), (2, "b"), (3, "z")]
    df = spark.createDataFrame(rows, "k long, v string")
    salted = {
        r["k"]: list(r["values"])
        for r in relational.salted_collect(df, ["k"], "v", n_salts=4).collect()
    }
    plain = {
        r["k"]: list(r["vs"])
        for r in df.groupBy("k")
        .agg(F.sort_array(F.collect_list("v")).alias("vs"))
        .collect()
    }
    assert salted == plain
    # the hot key's 200 values really spread: phase 1 emits one partial
    # per distinct salt of the value hashes (> 1 for 7 distinct values)
    partials = (
        df.filter(F.col("k") == 1)
        .select(F.pmod(F.xxhash64("v"), F.lit(4)).alias("s"))
        .distinct()
        .count()
    )
    assert partials > 1


def test_mix_sources_weights_and_consistency(spark):
    from probability_of_buying_two_products_together_hadoop_project_spark.operators import relational

    rows = [(i, f"src{i % 4}") for i in range(4000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    got = relational.mix_sources(
        df, {"src0": 1000, "src1": 0, "src2": 500}, default_permille=250
    )
    by_src = {
        r["source"]: r["n"]
        for r in got.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_src.get("src0") == 1000  # weight 1000 keeps every row
    assert "src1" not in by_src  # weight 0 drops the source entirely
    assert 400 <= by_src.get("src2", 0) <= 600  # ~half of 1000
    assert 150 <= by_src.get("src3", 0) <= 350  # default 250 permille
    # the draw is the SAME md5 bucket as hash_sample: a row kept at
    # permille p is kept at every permille >= p (nested samples)
    narrow = {
        r["doc_id"]
        for r in relational.mix_sources(df, {"src2": 250}).collect()
    }
    wide = {
        r["doc_id"]
        for r in relational.mix_sources(df, {"src2": 500}).collect()
    }
    assert narrow <= wide
    # rerun-stable
    again = {
        r["doc_id"]
        for r in relational.mix_sources(df, {"src2": 500}).collect()
    }
    assert wide == again


def test_train_val_test_split_determinism_and_coverage(spark):
    """The salted-md5 split: every row lands in exactly one split, the
    assignment is rerun-stable, and proportions track 80/10/10."""
    from pyspark.sql import functions as F

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    h = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(1000),
    )
    split = (
        F.when(h < 800, F.lit("train"))
        .when(h < 900, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    runs = []
    for _ in range(2):
        runs.append(
            {r["doc_id"]: r["s"] for r in df.select("doc_id", split.alias("s")).collect()}
        )
    assert runs[0] == runs[1]
    assert len(runs[0]) == 2000  # exactly one split per row
    from collections import Counter

    c = Counter(runs[0].values())
    assert 0.75 < c["train"] / 2000 < 0.85
    assert 0.07 < c["val"] / 2000 < 0.13
    assert 0.07 < c["test"] / 2000 < 0.13


# ---------------------------------------------------------------------------
# weighted_sample (A-ES)
# ---------------------------------------------------------------------------


def test_weighted_sample_matches_python_mirror(spark):
    import hashlib
    import math
    from decimal import ROUND_HALF_UP, Decimal

    rows = [(i, float(1 + (i * 7) % 50)) for i in range(500)]
    df = spark.createDataFrame(rows, "k bigint, w double")
    got = relational.weighted_sample(df, ["k"], "w", k=30, salt="t").collect()

    def prio(key, w):
        h = int(hashlib.md5(f"t{key}".encode()).hexdigest()[:8], 16)
        # ln(u) quantizes to 6dp HALF_UP over the shortest repr — the
        # r07 hardening (raw ln is 1-ulp engine-divergent on ~7% of
        # dyadic inputs), mirrored exactly like the BM25 reference
        lnu = math.log((h + 0.5) / 2**32)
        lnu_q = float(
            Decimal(repr(lnu)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        return lnu_q / w

    want = sorted(rows, key=lambda r: (-prio(r[0], r[1]), r[0]))[:30]
    assert [r.k for r in got] == [k for k, _ in want]
    for r in got:
        assert abs(r._aes_priority - prio(r.k, r.w)) <= 1e-12 * abs(r._aes_priority)


def test_weighted_sample_inclusion_tracks_weight(spark):
    # one heavy item (weight 100) among light ones (weight 1): across many
    # salt rotations the heavy item must be drawn far more often
    rows = [(0, 100.0)] + [(i, 1.0) for i in range(1, 200)]
    df = spark.createDataFrame(rows, "k bigint, w double")
    hits = 0
    for s in range(40):
        got = relational.weighted_sample(df, ["k"], "w", k=10, salt=f"s{s}")
        hits += any(r.k == 0 for r in got.collect())
    # P(include heavy) ~ 1 - prod(...) >> uniform 10/200; expect a large
    # majority of draws to include it (weight 100 vs 199 light items)
    assert hits >= 25, hits


def test_weighted_sample_drops_nonpositive_and_validates(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 5.0)], "k bigint, w double"
    )
    got = relational.weighted_sample(df, ["k"], "w", k=10).collect()
    assert [r.k for r in got] == [3]
    with pytest.raises(ValueError):
        relational.weighted_sample(df, ["k"], "w", k=0)


def test_stratified_split_exact_quotas(spark, sf_oracle):
    from probability_of_buying_two_products_together_hadoop_project_spark import registry

    rows = registry.REGISTRY["stratified_split_by_source"].fn(
        spark, sf_oracle
    ).collect()
    per_source = {}
    for r in rows:
        per_source.setdefault(r.source, {})[r.split] = r.n_docs
    assert per_source
    for source, splits in per_source.items():
        n = sum(splits.values())
        assert splits.get("train", 0) == (n * 80) // 100, source
        assert splits.get("train", 0) + splits.get("val", 0) == (n * 90) // 100


# ---------------------------------------------------------------------------
# temperature_mix (T=2 source rebalancing)
# ---------------------------------------------------------------------------


def test_temperature_mix_matches_reference_and_rebalances(spark):
    import hashlib
    import math
    from decimal import Decimal

    from probability_of_buying_two_products_together_hadoop_project_spark.operators import (
        relational,
    )

    rows = [(i, "big") for i in range(900)] + [
        (1000 + i, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(
        (r.doc_id, r.source)
        for r in relational.temperature_mix(df).collect()
    )
    # python mirror
    counts = {"big": 900, "small": 100}
    w = {s: Decimal(repr(round(math.sqrt(n), 6))) for s, n in counts.items()}
    ww = float(sum(w.values()))
    nn = sum(counts.values())
    keep = {
        s: min(1.0, (nn * 1 // 2) * float(w[s]) / (ww * n))
        for s, n in counts.items()
    }
    want = sorted(
        (i, s)
        for i, s in rows
        if (int(hashlib.md5(f"tmix{i}".encode()).hexdigest()[:8], 16) + 0.5)
        / float(1 << 32)
        < keep[s]
    )
    assert got == want
    # rebalancing direction: the small source keeps a larger FRACTION
    kept = {"big": 0, "small": 0}
    for _, s in got:
        kept[s] += 1
    assert kept["small"] / 100 > kept["big"] / 900
    assert relational.temperature_mix(df).count() > 0


def test_temperature_mix_rejects_bad_budget(spark):
    from probability_of_buying_two_products_together_hadoop_project_spark.operators import (
        relational,
    )

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    import pytest as _pt

    with _pt.raises(ValueError):
        relational.temperature_mix(df, budget_den=0)


def test_temperature_mix_t4_flattens_harder_than_t2(spark):
    """sqrt_steps=2 (T=4, w=n^(1/4)) up-weights the small source more
    aggressively than T=2; both draws mirror the python contract."""
    import hashlib
    import math
    from decimal import Decimal

    from probability_of_buying_two_products_together_hadoop_project_spark.operators import (
        relational,
    )

    rows = [(i, "big") for i in range(1600)] + [
        (5000 + i, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    def py_mix(steps):
        counts = {"big": 1600, "small": 100}
        def wgt(n):
            v = float(n)
            for _ in range(steps):
                v = math.sqrt(v)
            return Decimal(repr(round(v, 6)))
        w = {s: wgt(n) for s, n in counts.items()}
        ww, nn = float(sum(w.values())), sum(counts.values())
        keep = {
            s: min(1.0, (nn // 2) * float(w[s]) / (ww * n))
            for s, n in counts.items()
        }
        return sorted(
            (i, s)
            for i, s in rows
            if (int(hashlib.md5(f"tmix{i}".encode()).hexdigest()[:8], 16) + 0.5)
            / float(1 << 32)
            < keep[s]
        )

    for steps in (1, 2):
        got = sorted(
            (r.doc_id, r.source)
            for r in relational.temperature_mix(df, sqrt_steps=steps).collect()
        )
        assert got == py_mix(steps)

    def frac_small(drawn):
        kept = {"big": 0, "small": 0}
        for _, s in drawn:
            kept[s] += 1
        return kept["small"] / 100, kept["big"] / 1600

    s2_small, s2_big = frac_small(py_mix(1))
    s4_small, s4_big = frac_small(py_mix(2))
    # T=4 keeps a larger share of the small source relative to the big one
    assert s4_small / max(s4_big, 1e-9) > s2_small / max(s2_big, 1e-9)
    import pytest as _pt

    with _pt.raises(ValueError):
        relational.temperature_mix(df, sqrt_steps=0)
