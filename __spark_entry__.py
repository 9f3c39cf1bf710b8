"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship Crystal Ball co-occurrence query at sf0.001;
``queries`` / ``oracle_sql`` expose the full operator registry (see
``probability_of_buying_two_products_together_hadoop_project_spark/registry.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from probability_of_buying_two_products_together_hadoop_project_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    sf_dir = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
    return registry.REGISTRY["cooccurrence_pairs"].fn(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return registry.oracle_sql()
