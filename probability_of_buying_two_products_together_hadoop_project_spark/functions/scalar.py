"""Scalar helpers shared by operators and the query registry.

The one numerics rule of this engine: **aggregated doubles cross an
engine/oracle boundary only after an exact, order-independent reduction.**
Floating-point addition is not associative, so ``SUM(double)`` differs
between any two engines (and between two runs with different partitioning).
We therefore sum in decimal (exact, commutative) and cast the final result
to double. Raw double columns that pass through untouched stay bit-exact
and need no treatment.

Cost: a decimal sum measures ~3x a plain double sum (1.2 s vs 0.4 s for
TPC-H Q1's four sums over 600k rows at sf0.1) — paid only inside the
aggregate, and bought: results identical under any partitioning,
parallelism, or engine. Pick the scale so the cast is exact: the value's
true decimal places (q1's charge = 2dp price x 2dp discount x 2dp tax
needs scale 6; scale 4 rounds onto ties that engines break differently).
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
