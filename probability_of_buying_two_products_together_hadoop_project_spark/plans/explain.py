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
    """Number of shuffle Exchange operators in the physical plan.

    Counts the numbered detail headers "(N) Exchange" of the formatted
    plan — the partitioning arguments live on a separate line, so
    matching them on the same line (the original implementation) silently
    counted zero for every plan.
    """
    import re

    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    return [
        line.strip()
        for line in plan.splitlines()
        if "PushedFilters" in line and "[]" not in line
    ]
