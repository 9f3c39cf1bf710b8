"""SparkSession factory tuned for this engine.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the configs
below are chosen so the same code scales to a real cluster:

- AQE on (coalesce + skew-join): runtime re-planning replaces the
  reference's static hand-tuned reducer counts
  (/root/reference/src/CrystalBallPair.java:247 ``setNumReduceTasks(3)``).
- ``spark.sql.shuffle.partitions`` defaults to the local core count; on a
  real cluster AQE coalescing makes the initial number mostly a ceiling.
- UTC session timezone so timestamp semantics match the DuckDB oracle.
- Arrow enabled for any Pandas-UDF path (the slow path; rarely used).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "crystalball-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # events.parquet stores TIMESTAMP(NANOS), which Spark otherwise
        # rejects (PARQUET_TYPE_ILLEGAL); sessions built here carry the
        # legacy conf from the start so readers never mutate a live session
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Load testdata parquet tables and register them as temp views.

    Returns a dict name -> DataFrame. Column pruning / predicate pushdown
    reach the parquet scan because these are plain ``spark.read.parquet``
    relations (verify with ``df.explain``: PushedFilters / ReadSchema).
    """
    if not names:
        names = (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        )
    from pyspark.sql import functions as F

    out = {}
    for n in names:
        df = spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))
        if n == "events":
            # Normalize the ts column across testdata generations (nanos-as-
            # long legacy conf, or micros TIMESTAMP_NTZ) to a session-TZ
            # timestamp; sessions run UTC so the relabel is lossless.
            ts_type = dict(df.dtypes).get("ts")
            if ts_type == "bigint":
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            elif ts_type == "timestamp_ntz":
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        df.createOrReplaceTempView(n)
        out[n] = df
    return out
