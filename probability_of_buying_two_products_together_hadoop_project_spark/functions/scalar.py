"""Scalar helpers shared by operators and the query registry.

The one numerics rule of this engine: **aggregated doubles cross an
engine/oracle boundary only after an exact, order-independent reduction.**
Floating-point addition is not associative, so ``SUM(double)`` differs
between any two engines (and between two runs with different partitioning).
We therefore sum in decimal (exact, commutative) and cast the final result
to double. Raw double columns that pass through untouched stay bit-exact
and need no treatment.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dsum(c: Column | str, scale: int = 4) -> Column:
    """Order-independent sum of a double expression: cast each value to
    decimal(18, scale) (exact from there on), sum, cast back to double."""
    return F.sum(_col(c).cast(f"decimal(18,{scale})")).cast("double")


def davg(c: Column | str, scale: int = 4) -> Column:
    """Order-independent average: exact decimal sum / count, in double."""
    x = _col(c)
    return (
        F.sum(x.cast(f"decimal(18,{scale})")).cast("double")
        / F.count(x).cast("double")
    )


def div(a: Column, b: Column) -> Column:
    """IEEE-754 double division (deterministic given deterministic inputs)."""
    return a.cast("double") / b.cast("double")
