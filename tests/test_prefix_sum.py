"""Parallel prefix-sum and token sharding: exact equality with the
naive single-partition global window, bucket-boundary correctness, and
the plan property that the full-data window is bucket-partitioned."""

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import relational, text
from probability_of_buying_two_products_together_hadoop_project_spark.plans import explain


def _naive(df, order_col, value_col):
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("cum", F.sum(value_col).over(w).cast("long"))


def test_prefix_sum_equals_naive_global_window(spark):
    rng = random.Random(5)
    rows = [(f"{i:04d}-{rng.randrange(10**6):06d}", rng.randrange(100)) for i in range(3000)]
    # md5-style hex keys so the default 2-char-prefix bucket applies
    df = spark.createDataFrame(rows, ["raw", "v"]).select(
        F.md5("raw").alias("k"), "v"
    )
    got = {
        r["k"]: r["cum"]
        for r in relational.global_prefix_sum(df, "k", "v", out_col="cum").collect()
    }
    want = {r["k"]: r["cum"] for r in _naive(df, "k", "v").collect()}
    assert got == want and len(got) == 3000


def test_prefix_sum_bucket_boundaries_exact(spark):
    # keys crafted to straddle bucket boundaries: buckets "aa" vs "ab"
    rows = [("aa01", 1), ("aa02", 2), ("ab01", 4), ("ab02", 8), ("zz99", 16)]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {
        r["k"]: r["cum"]
        for r in relational.global_prefix_sum(df, "k", "v").collect()
    }
    assert got == {"aa01": 1, "aa02": 3, "ab01": 7, "ab02": 15, "zz99": 31}


def test_prefix_sum_plan_is_bucket_partitioned(spark):
    df = spark.range(1000).select(F.md5(F.col("id").cast("string")).alias("k"),
                                  F.lit(1).alias("v"))
    out = relational.global_prefix_sum(df, "k", "v")
    plan = explain.formatted_plan(out)
    # the full-data window partitions by the bucket column, and the only
    # SinglePartition exchange feeds the <=256-row offsets aggregate
    assert "hashpartitioning(_psb" in plan
    assert plan.count("SinglePartition") == 1


def test_token_shards_pack_to_budget(spark):
    docs = spark.createDataFrame(
        [(i, "tok " * (i % 7 + 1)) for i in range(200)], ["doc_id", "text"]
    )
    out = relational and text.token_shards(docs, budget=50).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard_id"], []).append(r)
    # every shard except the last is filled past its boundary by at most
    # one document (greedy cut semantics), and shard ids are contiguous
    ids = sorted(by_shard)
    assert ids == list(range(len(ids)))
    for sid in ids[:-1]:
        toks = sum(r["n_tokens"] for r in by_shard[sid])
        assert toks >= 50 - max(r["n_tokens"] for r in by_shard[sid + 1])
    # cum of the last doc equals the corpus total
    assert max(r["cum_tokens"] for r in out) == sum(r["n_tokens"] for r in out)


def test_offsets_cardinality_bounded_by_bucket_domain(spark, sf_oracle):
    """The boundedness contract behind the runtime `WindowExec: No
    Partition Defined` warning the plan tripwire can't classify: the
    only unpartitioned window in the prefix-sum family consumes the
    per-(group, bucket) TOTALS relation, whose cardinality is the
    bucket DOMAIN (integer value range under the default floor()
    bucket; 256 for 2-hex-char prefixes) — never data-sized. Pinned
    two ways: (a) the offsets cardinality respects the domain bound on
    the real GK feed, (b) doubling the data rows leaves it unchanged.
    """
    li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice"
    )

    def offsets_card(df):
        # replicate grouped_value_cum's internal totals/offsets relation
        dv = (
            df.groupBy("l_returnflag", "l_extendedprice")
            .count()
            .withColumn("_vb", F.floor("l_extendedprice"))
        )
        return dv.groupBy("l_returnflag", "_vb").count().count()

    card = offsets_card(li)
    bounds = li.groupBy("l_returnflag").agg(
        F.floor(F.min("l_extendedprice")).alias("lo"),
        F.floor(F.max("l_extendedprice")).alias("hi"),
    )
    domain = sum(r["hi"] - r["lo"] + 1 for r in bounds.collect())
    assert card <= domain
    # data-size independence: 2x the rows, identical offsets table
    assert offsets_card(li.union(li)) == card

    # global_prefix_sum's default 2-hex-char prefix bucket: <= 256
    # offsets rows regardless of row count
    df = spark.range(5000).select(
        F.md5(F.col("id").cast("string")).alias("k"), F.lit(1).alias("v")
    )
    n_buckets = df.select(F.substring("k", 1, 2)).distinct().count()
    assert n_buckets <= 256
