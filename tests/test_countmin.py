"""Count-Min sketch properties: overcount-only estimates and cell-wise
shard mergeability."""

from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.registry import (
    _CMS_PROBES,
    REGISTRY,
)


def test_countmin_never_undercounts(spark, sf_oracle):
    rows = {r.word: r for r in REGISTRY["countmin_word_freq"].fn(spark, sf_oracle).collect()}
    assert set(rows) == set(_CMS_PROBES)
    for w, r in rows.items():
        assert r.est >= r.exact, w
    assert rows["zzz_absent"].exact == 0  # absent probe floors at collisions


def test_countmin_cells_merge_across_shards(spark, sf_oracle):
    # the sketch is one hash aggregation, so shard sketches add cell-wise:
    # sketch(A ∪ B) == sketch(A) + sketch(B). This is the property that
    # lets 100 TB shards build sketches independently and compose.
    from probability_of_buying_two_products_together_hadoop_project_spark.operators import text

    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    tok = docs.select(
        "doc_id", F.explode(text.normalized_tokens("text")).alias("word")
    )

    def cells(t):
        b = F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.lit("cms0|"), F.col("word"))), 1, 8),
                16,
                10,
            ).cast("long"),
            F.lit(1024),
        )
        return {
            r.bucket: r.c
            for r in t.select(b.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }

    whole = cells(tok)
    a = cells(tok.filter(F.col("doc_id") % 2 == 0))
    b = cells(tok.filter(F.col("doc_id") % 2 == 1))
    merged = {k: a.get(k, 0) + b.get(k, 0) for k in set(a) | set(b)}
    assert merged == whole
