"""Sources and sinks (reference O1 / O13, generalized).

The reference reads a text dir and writes TAB-separated part files
(/root/reference/src/CrystalBallPair.java:241,253 via TextInput/
TextOutputFormat). Here: Parquet is the native format; text/CSV/JSON are
compatibility sources; TSV sink exists for golden-output parity.

Scale notes: all readers go through Spark's FileSourceScanExec —
splittable files, partition pruning on directory layout, predicate
pushdown and column pruning for Parquet. ``write_parquet`` exposes
``partition_by`` (directory-level pruning) and ``bucket_by``
(co-located joins without a shuffle) because at 100 TB the table layout
IS the query plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def read_text(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.text(path)


def read_csv(
    spark: SparkSession, path: str, schema: str | None = None, sep: str = ",",
    header: bool = True,
) -> DataFrame:
    r = spark.read.option("sep", sep).option("header", header)
    # explicit schema > inference: inference is a full extra pass over data
    return (r.schema(schema) if schema else r.option("inferSchema", True)).csv(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    r = spark.read
    return (r.schema(schema) if schema else r).json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
    max_records_per_file: int | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] = (),
    path: str | None = None,
) -> None:
    """Bucketed managed table: joins/aggregations on ``bucket_cols`` skip
    the shuffle entirely when both sides share the bucketing."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def write_tsv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Golden-parity text sink (reference O13 output shape)."""
    df.write.mode(mode).option("sep", "\t").csv(path)
