"""Accuracy bound for the approximate-distinct sketch (HLL++): the
rows-only oracle can't check values, so this pins the relative error."""

import os


def test_approx_count_distinct_within_5pct(spark, sf_oracle):
    import __spark_entry__ as e

    row = e.queries()["agg_approx_count_distinct"](spark, sf_oracle).collect()[0]
    for approx, exact in (
        (row["approx_parts"], row["exact_parts"]),
        (row["approx_orders"], row["exact_orders"]),
    ):
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
        r["o_orderpriority"]: r["approx_customers"]
        for r in e.queries()["hll_sketch_partitioned_merge"](
            spark, sf_oracle
        ).collect()
    }
    orders = spark.read.parquet(f"{sf_oracle}/orders.parquet")
    direct = (
        orders.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).cast("long")
        ).first()[0]
    )
    exact = orders.select("o_custkey").distinct().count()
    assert abs(rows["__merged__"] - direct) / direct < 0.01
    assert abs(rows["__merged__"] - exact) / exact < 0.05
    assert len(rows) == 6  # 5 priorities + merged row
