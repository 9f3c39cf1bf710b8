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
