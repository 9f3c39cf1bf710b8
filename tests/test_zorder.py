"""Z-order layout key: python-reference equality and the actual
row-group pruning property measured from written parquet statistics."""

from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import relational


def _morton(a: int, b: int) -> int:
    out = 0
    for i in range(16):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_python_reference(spark):
    vals = [0, 1, 2, 3, 7, 8, 255, 256, 1023, 65535]
    rows = [(a, b) for a in vals for b in vals]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", relational.zorder_key(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _morton(a, b), (a, b)


def _overlap_fraction(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    """(row groups whose [min,max] overlaps [lo,hi], total row groups)
    across every parquet part file — the exact pruning decision a
    min/max-statistics scan makes."""
    import glob
    import pyarrow.parquet as pq

    hit = total = 0
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(names[col]).statistics
            total += 1
            if st.min <= hi and st.max >= lo:
                hit += 1
    return hit, total


def test_zorder_layout_prunes_both_dims(spark, tmp_path):
    """Write the same (a, b) grid sorted by zkey vs sorted by a alone
    (small row groups force many groups): the z-layout must let min/max
    stats prune row groups for a range predicate on EITHER dimension,
    while the single-key layout cannot prune on b."""
    n = 64
    rows = [(a, b) for a in range(n) for b in range(n)]
    df = spark.createDataFrame(rows, "a long, b long").withColumn(
        "z", relational.zorder_key(F.col("a"), F.col("b"))
    )
    zp, ap = str(tmp_path / "bz"), str(tmp_path / "ba")
    opts = {"parquet.block.size": "4096", "parquet.page.size": "1024"}
    df.orderBy("z").coalesce(1).write.options(**opts).parquet(zp)
    df.orderBy("a").coalesce(1).write.options(**opts).parquet(ap)

    lo, hi = 8, 15  # a 1/8th range predicate
    for col in ("a", "b"):
        zh, zt = _overlap_fraction(zp, col, lo, hi)
        assert zt >= 8, "need multiple row groups for the test to mean anything"
        # z-layout prunes a substantial share of groups on BOTH dims
        assert zh / zt <= 0.6, (col, zh, zt)
    ah, at = _overlap_fraction(ap, "a", lo, hi)
    bh, bt = _overlap_fraction(ap, "b", lo, hi)
    assert ah / at <= 0.3   # sort key prunes itself best
    # the other dim cannot meaningfully prune (only a trailing remainder
    # group can ever miss the range)
    assert bh / bt >= 0.9


def test_zorder_key_n_matches_reference_and_2d_fast_path(spark):
    """The general n-dim key: bit i of col j at position i*d + j; the
    2-D case must equal the mask-spread fast path exactly."""

    def morton_n(vals, bits=16):
        out = 0
        for j, v in enumerate(vals):
            for i in range(bits):
                out |= ((v >> i) & 1) << (i * len(vals) + j)
        return out

    rows = [(a, b, c) for a in (0, 3, 255, 65535) for b in (0, 7, 1024)
            for c in (0, 5, 4095)]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    got3 = {
        (r["a"], r["b"], r["c"]): r["z"]
        for r in df.select(
            "a", "b", "c",
            relational.zorder_key_n(F.col("a"), F.col("b"), F.col("c")).alias("z"),
        ).collect()
    }
    for a, b, c in rows:
        assert got3[(a, b, c)] == morton_n([a, b, c]), (a, b, c)
    eq = df.select(
        (relational.zorder_key_n(F.col("a"), F.col("b"))
         == relational.zorder_key(F.col("a"), F.col("b"))).alias("e")
    ).collect()
    assert all(r["e"] for r in eq)


def test_write_zordered_prunes_on_both_dims(spark, tmp_path):
    """The write-path helper must reproduce the layout study's pruning
    asymmetry: a z-ordered table prunes row groups for range predicates
    on EITHER dimension; a single-key sort prunes only its own column."""
    from probability_of_buying_two_products_together_hadoop_project_spark.sources import io as eio

    n = 64
    rows = [(a, b) for a in range(n) for b in range(n)]
    df = spark.createDataFrame(rows, "a long, b long")
    zp = str(tmp_path / "z")
    ap = str(tmp_path / "a")
    eio.write_zordered(df.coalesce(1), zp, ["a", "b"], n_files=1,
                       max_records_per_file=128)
    (df.coalesce(1).sortWithinPartitions("a")
       .write.mode("overwrite").option("maxRecordsPerFile", 128).parquet(ap))
    lo, hi = 8, 15  # 1/8 of the domain
    za = _overlap_fraction(zp, "a", lo, hi)
    zb = _overlap_fraction(zp, "b", lo, hi)
    aa = _overlap_fraction(ap, "a", lo, hi)
    ab = _overlap_fraction(ap, "b", lo, hi)
    # z layout prunes meaningfully on BOTH dims
    assert za[0] < za[1] and zb[0] < zb[1]
    # a-sorted layout prunes hard on a but cannot prune b at all
    assert aa[0] < aa[1]
    assert ab[0] == ab[1]
    # the key column must not be persisted
    import pyarrow.parquet as pq
    import glob
    f = glob.glob(zp + "/*.parquet")[0]
    names = [pq.ParquetFile(f).metadata.schema.column(i).name
             for i in range(pq.ParquetFile(f).metadata.num_columns)]
    assert names == ["a", "b"]
