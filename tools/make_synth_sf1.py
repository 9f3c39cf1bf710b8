"""Synthesize a ~10x (sf≈1) dataset from sf0.1 for scaling measurements.

The driver provides sf0.001/0.01/0.1 only; SCALING.md's linearity claims
rest on the 0.01→0.1 decade. This tool manufactures the next decade for
the three tables the heavy queries read:

- lineitem: 10 key-shifted copies (l_orderkey += i * (max+1)). Same
  basket-size distribution, 10x the baskets — exactly what a bigger
  TPC-H would give the co-occurrence chain.
- customer: 10 key-shifted copies with c_name REGENERATED from the new
  key (TPC-H's own Customer#%09d scheme), so the name space grows like
  a real sf1 instead of creating 10 exact copies of every name (which
  would measure duplicate-pair output volume, not blocking).
- events: 10 user/event-id-shifted copies with timestamps unchanged —
  10x the users at the same per-user activity, the regime where keyed
  window/SCD2/sessionize costs must scale with users, not blow up.
- documents: 10 id-shifted copies, each passed through a per-copy
  letter permutation (translate over the most frequent letters) so the
  copies are NOT near-duplicates of each other: an appended-suffix
  mutation was tried first and made every copy a ~0.97-Jaccard sibling
  of 9 others, exploding the true near-dup answer ~45x and conflating
  output volume with blocking overhead. The permutation keeps token
  lengths and corpus statistics while rewriting most shingles, so the
  near-dup RATE stays roughly constant as the corpus grows — the regime
  a linear-blocking claim must be measured in.
- orders: 10 key-shifted copies (o_orderkey/o_custkey += i * (max+1))
  with o_totalprice perturbed by copy-dependent cents (+= i/100) so the
  DISTINCT VALUE population grows ~10x like a real sf1 — exact copies
  would collapse in the (group, value) pre-aggregation the drift tests
  (KS/W1/Mann-Whitney) are built on, faking constant shuffle.

Usage: python tools/make_synth_sf1.py [out_dir]  (default .scratch_sf1.0)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from probability_of_buying_two_products_together_hadoop_project_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch_sf1.0",
    )
    spark = get_spark("make-synth-sf1")
    copies = list(range(10))

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    max_ok = li.agg(F.max("l_orderkey")).first()[0] + 1
    li10 = li.crossJoin(
        spark.createDataFrame([(i,) for i in copies], ["_c"])
    ).withColumn(
        "l_orderkey", F.col("l_orderkey") + F.col("_c") * F.lit(max_ok)
    ).drop("_c")
    li10.repartition(32).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    od = spark.read.parquet(f"{SRC}/orders.parquet")
    max_ok2 = od.agg(F.max("o_orderkey")).first()[0] + 1
    max_ck2 = od.agg(F.max("o_custkey")).first()[0] + 1
    od10 = (
        od.crossJoin(spark.createDataFrame([(i,) for i in copies], ["_c"]))
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("_c") * F.lit(max_ok2))
        .withColumn("o_custkey", F.col("o_custkey") + F.col("_c") * F.lit(max_ck2))
        .withColumn(
            "o_totalprice",
            (
                F.col("o_totalprice")
                + (F.col("_c").cast("decimal(4,2)") / F.lit(100))
            ).cast(dict(od.dtypes)["o_totalprice"]),
        )
        .drop("_c")
    )
    od10.repartition(8).write.mode("overwrite").parquet(f"{out}/orders.parquet")

    cu = spark.read.parquet(f"{SRC}/customer.parquet")
    max_ck = cu.agg(F.max("c_custkey")).first()[0] + 1
    cu10 = (
        cu.crossJoin(spark.createDataFrame([(i,) for i in copies], ["_c"]))
        .withColumn("c_custkey", F.col("c_custkey") + F.col("_c") * F.lit(max_ck))
        .withColumn("c_name", F.format_string("Customer#%09d", F.col("c_custkey")))
        .drop("_c")
    )
    cu10.repartition(8).write.mode("overwrite").parquet(f"{out}/customer.parquet")

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    max_d = docs.agg(F.max("doc_id")).first()[0] + 1
    alpha = "etaoinshr"
    perm = F.when(F.col("_c") == 0, F.col("text"))
    for i in copies[1:]:
        rot = alpha[i:] + alpha[:i]
        perm = perm.when(F.col("_c") == i, F.expr(f"translate(text, '{alpha}', '{rot}')"))
    d10 = (
        docs.crossJoin(spark.createDataFrame([(i,) for i in copies], ["_c"]))
        .withColumn("doc_id", F.col("doc_id") + F.col("_c") * F.lit(max_d))
        .withColumn("text", perm)
        .drop("_c")
    )
    d10.repartition(8).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    max_v = emb.agg(F.max("vec_id")).first()[0] + 1
    # per-copy deterministic sign flip on dimensions d where d % 10 == copy:
    # copies keep their norm but land in different SRP buckets, so the
    # ANN measurements see a genuinely larger vector population, not 10
    # co-located clones of every point
    e10 = (
        emb.crossJoin(spark.createDataFrame([(i,) for i in copies], ["_c"]))
        .withColumn("vec_id", F.col("vec_id") + F.col("_c") * F.lit(max_v))
        .withColumn(
            "embedding",
            F.expr(
                "transform(embedding, (x, d) ->"
                " CASE WHEN d % 10 = _c THEN -x ELSE x END)"
            ),
        )
        .drop("_c")
    )
    e10.repartition(8).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    # events.ts physical type varies across testdata generations (see
    # registry._t); normalize before copying so the synth table always
    # carries a plain timestamp column
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    ts_type = dict(ev.dtypes).get("ts")
    if ts_type == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    max_u = ev.agg(F.max("user_id")).first()[0] + 1
    max_e = ev.agg(F.max("event_id")).first()[0] + 1
    # user_id shifts per copy (10x the users, same per-user event count —
    # the regime where per-key window ops must stay flat), event ids stay
    # unique, timestamps unchanged (same time range, 10x the density —
    # what a busier deployment looks like)
    e_ev = (
        ev.crossJoin(spark.createDataFrame([(i,) for i in copies], ["_c"]))
        .withColumn("user_id", F.col("user_id") + F.col("_c") * F.lit(max_u))
        .withColumn("event_id", F.col("event_id") + F.col("_c") * F.lit(max_e))
        .drop("_c")
    )
    e_ev.repartition(8).write.mode("overwrite").parquet(f"{out}/events.parquet")

    for t in ("lineitem", "customer", "documents", "embeddings", "events"):
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
