"""K-Minimum-Values (KMV) distinct sketches and theta-style set
operations — the ORACLE-EXACT approximate-distinct family.

Motivation (and the gap this closes): the engine already exposes
Spark's native ``approx_count_distinct`` / HLL sketch functions, but
their HyperLogLog internals are engine-private, so those registry
entries can only ever be rows-only checks with accuracy bounds.  A KMV
sketch built on the repo's md5 hash contract is just as mergeable and
just as O(k)-sized — and every number it produces is a deterministic
function of the input that an ANSI-SQL oracle recomputes bit-for-bit
(Bar-Yossef et al. 2002, "Counting distinct elements in a data
stream"; Beyer et al. SIGMOD 2007 for the unbiased (k-1)/u_k
estimator; Dasgupta et al. 2016 for the theta-sketch set-op framing).

Hash contract (shared with relational.hash_sample / weighted_sample):
``h = int(md5(key)[:8], 16)`` — a 32-bit value; its unit-interval
image ``u = (h + 0.5) / 2^32`` is a dyadic rational, exact in a
double, so ``(k-1) / u_k`` is ONE correctly-rounded IEEE division and
therefore identical in Spark, DuckDB, and the Python test reference.

Scale posture: the only corpus-sized work is the distinct-(group,key)
aggregation — unavoidable for any exact-hash sketch and identical to
what HLL needs.  The k-smallest selection then runs as a TWO-LEVEL
TOURNAMENT: per (group, h mod 64) bucket ranks bound every window
partition, and the rebuilt per-group top-k window sees at most 64*k
rows per group — no single-partition funnel, no skew cliff (the
bucket key is derived from the hash itself, so buckets are uniform by
construction).  Each level keeps exactly the global k smallest: any
globally-top-k hash is necessarily within its bucket's top-k.

Reference basis: /root/reference/src/CrystalBallPair.java has no
sketching at all (exact counts over a 231-byte corpus); this module is
part of the demanded 100 TB extension surface (SURVEY.md §2.3
aggregation row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TWO32 = float(1 << 32)


def _h32(col) -> F.Column:
    """The repo-wide md5 32-bit hash: first 8 hex chars as a bigint."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )


def kmv_sample(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 32,
    n_buckets: int = 64,
) -> DataFrame:
    """Per-group k smallest distinct key hashes: rows
    ``(*group_cols, h, rk)`` with ``rk`` the 1-based rank of ``h``
    among the group's distinct hashes (rk <= k).

    Two-level tournament (module docstring); both rank windows are
    bounded — level 1 by the distinct count of one hash bucket, level
    2 by ``n_buckets * k`` rows per group.
    """
    hashed = (
        df.select(*group_cols, F.col(key_col).alias("_kmvk"))
        .distinct()
        .select(*group_cols, _h32(F.col("_kmvk")).alias("h"))
        .distinct()
    )
    w1 = Window.partitionBy(*group_cols, F.pmod(F.col("h"), F.lit(n_buckets))).orderBy(
        "h"
    )
    local = hashed.withColumn("_lrk", F.row_number().over(w1)).filter(
        F.col("_lrk") <= k
    )
    w2 = Window.partitionBy(*group_cols).orderBy("h")
    return (
        local.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .drop("_lrk")
    )


def kmv_estimate(
    sample: DataFrame,
    group_cols: list[str],
    k: int,
) -> DataFrame:
    """Distinct-count estimate from a sketch SAMPLE table (rows
    ``(*group_cols, h, rk)`` as produced by :func:`kmv_sample` or
    :func:`kmv_merge_samples`): ``(k-1) / u_k`` when full, the exact
    retained count when the group has fewer than k distinct hashes."""
    agg = sample.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_sample"),
        F.max(F.when(F.col("rk") == k, F.col("h"))).alias("kth_hash"),
    )
    u_k = (F.col("kth_hash") + F.lit(0.5)) / F.lit(_TWO32)
    return agg.select(
        *group_cols,
        "n_sample",
        "kth_hash",
        F.when(F.col("n_sample") < k, F.col("n_sample").cast("double"))
        .otherwise(F.lit(float(k - 1)) / u_k)
        .alias("est_distinct"),
    )


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 32,
) -> DataFrame:
    """Per-group distinct-count estimate from a k-minimum-values
    sketch: ``(*group_cols, n_sample, kth_hash, est_distinct)``.

    ``est_distinct`` is the unbiased KMV estimator ``(k-1) / u_k``
    when the sketch is full, and the EXACT distinct count (the sketch
    holds every hash) when fewer than k distinct keys exist — the
    small-group exact path falls out of the construction for free.
    Assumes no 32-bit hash collisions among the k retained minima
    (k^2/2^33 collision odds; at k=256 that is ~4e-6).
    """
    return kmv_estimate(kmv_sample(df, key_col, group_cols, k=k), group_cols, k)


def kmv_merge_samples(
    a: DataFrame,
    b: DataFrame,
    group_cols: list[str],
    k: int = 32,
) -> DataFrame:
    """Merge two sketch sample tables into the sketch OF THE UNIONED
    DATA — exactly: the k smallest of (k smallest of X) ∪ (k smallest
    of Y) are the k smallest of X ∪ Y, so incremental maintenance is
    lossless, associative, and commutative (the property that makes
    KMV a proper mergeable summary: per-shard / per-batch sketches
    roll up without ever revisiting the raw data).

    The re-rank window sees at most 2k rows per group (both inputs are
    k-bounded), so merging persisted state with a new batch's sketch
    is state-sized work — the incremental-ingest pattern of
    dedup_incremental / minhash_incremental applied to cardinality."""
    u = (
        a.select(*group_cols, "h")
        .unionByName(b.select(*group_cols, "h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    return u.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def kmv_set_ops(
    df: DataFrame,
    key_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    k: int = 32,
) -> DataFrame:
    """Theta-sketch-style union / intersection / Jaccard estimates for
    the key sets of two groups, computed ONLY from their KMV sketches.

    Combined sketch: the k smallest hashes of ``sample(A) ∪
    sample(B)`` with threshold ``theta`` = its largest member (valid
    because theta <= min(theta_A, theta_B) whenever both sketches are
    full — every hash below theta survived in its own sketch, so
    membership tests against the samples are exact below theta).
    Estimators (Dasgupta et al. 2016):

    - ``est_union = (k'-1) / u_{k'}`` over the combined sketch
      (exact-count path when the union sample has < k hashes),
    - ``est_jaccard = |combined ∩ A ∩ B| / k'``,
    - ``est_intersection = est_jaccard * est_union``.

    Everything after the two k-row sketches is array math over <= 2k
    elements — one tiny two-row crunch, broadcast-scale by
    construction, identical in any engine with sorted-list functions.
    """
    s = kmv_sample(
        df.filter(F.col(group_col).isin(group_a, group_b)),
        key_col,
        [group_col],
        k=k,
    )
    packed = s.groupBy(group_col).agg(F.array_sort(F.collect_list("h")).alias("hs"))
    a = packed.filter(F.col(group_col) == group_a).select(
        F.col("hs").alias("ha")
    )
    b = packed.filter(F.col(group_col) == group_b).select(
        F.col("hs").alias("hb")
    )
    both = a.crossJoin(b)  # 1 x 1 rows: the two packed sketches

    comb = F.slice(F.array_sort(F.array_union(F.col("ha"), F.col("hb"))), 1, k)
    n_comb = F.size(comb)
    theta_h = F.element_at(comb, n_comb)
    u = (theta_h.cast("double") + F.lit(0.5)) / F.lit(_TWO32)
    est_union = F.when(
        n_comb < k, n_comb.cast("double")
    ).otherwise((n_comb.cast("double") - 1.0) / u)
    inter_n = F.size(
        F.array_intersect(F.array_intersect(comb, F.col("ha")), F.col("hb"))
    )
    est_jacc = inter_n.cast("double") / n_comb.cast("double")
    return both.select(
        F.lit(group_a).alias("group_a"),
        F.lit(group_b).alias("group_b"),
        F.size("ha").cast("bigint").alias("n_sample_a"),
        F.size("hb").cast("bigint").alias("n_sample_b"),
        n_comb.cast("bigint").alias("n_combined"),
        est_union.alias("est_union"),
        est_jacc.alias("est_jaccard"),
        (est_jacc * est_union).alias("est_intersection"),
    )


def hash_sample_quantiles(
    df: DataFrame,
    id_col: str,
    value_col: str,
    group_cols: list[str],
    k: int = 64,
    quantiles: tuple[tuple[int, int], ...] = ((1, 4), (1, 2), (3, 4)),
    n_buckets: int = 64,
) -> DataFrame:
    """Mergeable O(k) QUANTILE sketch — the KMV idea pointed at order
    statistics instead of distinct counts: keep the k rows whose
    ``md5(id)`` hashes are smallest (a deterministic uniform sample —
    the hash image of the id space is uniform, so min-by-hash is
    coordination-free reservoir sampling with the repo's rerun-stable
    draw), then answer quantiles with DISCRETE picks inside the
    sample. Mergeable the same way KMV is: k-min-by-hash of a union is
    computable from the parts' k-minima, so shard sketches compose
    without re-scans — the O(k) path next to the EXACT
    ``grouped_value_cum`` machinery (distinct-value-sized) when a
    bounded-size answer is worth a sampling error of ~O(1/sqrt(k)).

    Everything is deterministic: the draw is the md5 contract, the
    per-quantile answer is the sample's value at 1-based rank
    ``ceil(q * n_sample)`` under the total order (value, h) — a PICKED
    element, never an interpolated float — so an ANSI-SQL oracle
    regenerates every output bit.

    Plan: one distinct-(group, id) pass (corpus-sized, map-side
    combined), then the bounded two-level hash tournament (module
    docstring); quantile extraction windows see <= k rows per group.

    Output: ``(*group_cols, n_sample, q_<num>_<den>...)``.
    """
    hashed = (
        df.select(
            *group_cols,
            F.col(id_col).alias("_qid"),
            F.col(value_col).alias("_qv"),
        )
        .distinct()
        .select(*group_cols, _h32(F.col("_qid")).alias("h"), "_qv", "_qid")
    )
    w1 = Window.partitionBy(
        *group_cols, F.pmod(F.col("h"), F.lit(n_buckets))
    ).orderBy("h", "_qv", "_qid")
    local = hashed.withColumn("_lrk", F.row_number().over(w1)).filter(
        F.col("_lrk") <= k
    )
    w2 = Window.partitionBy(*group_cols).orderBy("h", "_qv", "_qid")
    sample = (
        local.withColumn("_hrk", F.row_number().over(w2))
        .filter(F.col("_hrk") <= k)
        .drop("_lrk", "_hrk")  # _qid stays: the total-order tiebreak for
        # 32-bit hash collisions (the sample must be a deterministic SET)
    )
    wv = Window.partitionBy(*group_cols).orderBy("_qv", "h", "_qid")
    wg = Window.partitionBy(*group_cols)
    ranked = sample.select(
        *group_cols,
        "_qv",
        F.row_number().over(wv).alias("_vrk"),
        F.count(F.lit(1)).over(wg).alias("_ns"),
    )
    aggs = [F.max("_ns").cast("bigint").alias("n_sample")]
    for num, den in quantiles:
        tgt = F.expr(f"CAST(({num} * _ns + {den - 1}) DIV {den} AS BIGINT)")
        aggs.append(
            F.min(F.when(F.col("_vrk") >= tgt, F.col("_qv"))).alias(
                f"q_{num}_{den}"
            )
        )
    return ranked.groupBy(*group_cols).agg(*aggs)


def countmin_cells(
    keys: DataFrame,
    key_col: str = "word",
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch CELL TABLE for a key stream: ``(d, bucket, c)``
    rows, one per touched cell — the mergeable form (cell-wise addition
    composes shards and micro-batches; `countmin_word_freq` pins
    mergeability and the md5 hash family against the DuckDB oracle).
    ``weight_col`` turns it into a weighted sketch (sums instead of
    counts)."""
    spark = keys.sparkSession
    ds = spark.range(depth).select(F.col("id").cast("int").alias("d"))
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cms"),
                        F.col("d").cast("string"),
                        F.lit("|"),
                        F.col(key_col),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(width),
    )
    w = F.col(weight_col) if weight_col else F.lit(1)
    return (
        keys.crossJoin(F.broadcast(ds))
        .select("d", bucket.alias("bucket"), w.alias("_w"))
        .groupBy("d", "bucket")
        .agg(F.sum("_w").cast("long").alias("c"))
    )


def countmin_lookup(
    cells: DataFrame, probes: DataFrame, key_col: str = "word",
    depth: int = 4, width: int = 1024,
) -> DataFrame:
    """Point estimates from a cell table: min over the key's depth
    cells (absent cell = 0). Output (key_col, est)."""
    spark = probes.sparkSession
    ds = spark.range(depth).select(F.col("id").cast("int").alias("d"))
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cms"),
                        F.col("d").cast("string"),
                        F.lit("|"),
                        F.col(key_col),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(width),
    )
    lk = probes.crossJoin(F.broadcast(ds)).select(
        key_col, "d", bucket.alias("bucket")
    )
    return (
        lk.join(cells, ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("c"), F.lit(0))).cast("bigint").alias("est")
        )
    )
