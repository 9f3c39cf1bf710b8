"""Plan introspection helpers: assert the physical plan has the shape we
want (the '100 TB posture' checks from the build brief).

Used by tests to guard against plan regressions: pushdown reaching the
scan, broadcast joins staying broadcast, shuffle counts staying at the
designed number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan (AQE
    reuse/local readers excluded by counting unique plan nodes)."""
    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "ReusedExchange" not in line
        and ("hashpartitioning" in line or "rangepartitioning" in line
             or "SinglePartition" in line)
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    return [
        line.strip()
        for line in plan.splitlines()
        if "PushedFilters" in line and "[]" not in line
    ]
