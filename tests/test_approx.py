"""Accuracy bound for the approximate-distinct sketch (HLL++) and the
DataSketches HLL merge. Since r11 the registry queries carry the bound
IN the row hash (exact NDVs + within-5% booleans the oracle states as
TRUE literals); these tests assert the raw estimates directly and that
the query booleans hold."""

import os


def test_approx_count_distinct_within_5pct(spark, sf_oracle):
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    row = e.queries()["agg_approx_count_distinct"](spark, sf_oracle).collect()[0]
    assert row["parts_within_5pct"] and row["orders_within_5pct"]
    li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet")
    raw = li.agg(
        F.approx_count_distinct("l_partkey", 0.015).alias("ap"),
        F.countDistinct("l_partkey").alias("ep"),
        F.approx_count_distinct("l_orderkey", 0.015).alias("ao"),
        F.countDistinct("l_orderkey").alias("eo"),
    ).collect()[0]
    assert raw["ep"] == row["exact_parts"] and raw["eo"] == row["exact_orders"]
    for approx, exact in ((raw["ap"], raw["ep"]), (raw["ao"], raw["eo"])):
        assert exact > 0
        assert abs(approx - exact) / exact < 0.05, (approx, exact)


def test_hll_sketch_merge_is_associative_and_accurate(spark, sf_oracle):
    """The partitioned-sketch union must agree with the direct
    whole-data sketch to well under the sketch's own error bound (the
    union path re-encodes HLL_4 partials through HLL_8, so estimates
    can differ by a few counts — NOT bit-exact), and land within 5% of
    the exact distinct count. Composability at 100 TB rests on this:
    rollups over precomputed sketch tables cost a union, not a
    re-scan."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    rows = {
        r["o_orderpriority"]: r["within_5pct"]
        for r in e.queries()["hll_sketch_partitioned_merge"](
            spark, sf_oracle
        ).collect()
    }
    assert len(rows) == 6  # 5 priorities + merged row
    assert all(rows.values()), rows
    orders = spark.read.parquet(f"{sf_oracle}/orders.parquet")
    sk = orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    merged = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long")
    ).first()[0]
    direct = (
        orders.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).cast("long")
        ).first()[0]
    )
    exact = orders.select("o_custkey").distinct().count()
    assert abs(merged - direct) / direct < 0.01
    assert abs(merged - exact) / exact < 0.05
