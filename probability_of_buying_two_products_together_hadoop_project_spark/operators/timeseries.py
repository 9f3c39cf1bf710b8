"""Time-series resampling operators (hypertable-style bucketing).

The reference engine has no time-series surface; this module supplies the
two operations a metrics/feature pipeline needs on top of the relational
core (SURVEY.md §2.3 extension surface):

- ``resample_gapfill``: TimescaleDB-style ``time_bucket`` + gap-filling —
  a dense per-key bucket spine with last-observation-carried-forward and
  linear interpolation for empty buckets.
- ``reaggregate``: continuous-aggregate composition — coarser rollups
  computed FROM finer rollups (mergeable partial aggregates), never from
  the raw table.

Scale posture: everything is keyed by the series key. The bucket
aggregation shuffles once on (key, bucket); the spine is generated
DISTRIBUTED, per key, via ``sequence()`` — a key's spine length is its
own time span, so there is no driver-side loop and no global range
materialization. The gap-fill windows partition by key (same shuffle
key, one exchange under AQE reuse). At 100 TB the dominant cost is the
single bucket aggregation over the raw table; everything after runs on
(keys x buckets) rows, which is the REDUCED cardinality.

Determinism: bucket averages use the exact decimal-sum rule
(``functions.scalar``); LOCF/interpolation are pure double expressions
over those deterministic inputs, written with the same parenthesization
the DuckDB oracle uses, so results are bit-equal cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import davg

# date_trunc units accepted for bucketing (a subset both engines share).
_UNITS = {"minute", "hour", "day", "week", "month"}


def bucket_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    unit: str = "hour",
    scale: int = 4,
) -> DataFrame:
    """Per (key, time bucket) count + deterministic average of value."""
    if unit not in _UNITS:
        raise ValueError(f"unit must be one of {sorted(_UNITS)}, got {unit!r}")
    return (
        df.select(
            F.col(key_col).alias("series_key"),
            F.date_trunc(unit, F.col(ts_col)).alias("bucket_ts"),
            F.col(value_col).alias("_v"),
        )
        .groupBy("series_key", "bucket_ts")
        .agg(
            F.count("_v").alias("n_events"),
            davg("_v", scale).alias("avg_value"),
        )
    )


def resample_gapfill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    unit: str = "hour",
    scale: int = 4,
) -> DataFrame:
    """Dense per-key resample: one row per (key, bucket) from the key's
    first to last observed bucket, empty buckets filled two ways.

    Output columns:
      series_key, bucket_ts, n_events (0 for gaps), avg_value (null for
      gaps), locf_value (last observed average at-or-before the bucket),
      interp_value (linear interpolation between the surrounding observed
      buckets; null before the first / after the last observation),
      is_gap.

    The spine is built per key with ``sequence(min, max, interval)`` —
    distributed, span-proportional, no driver loop. Both the bucket agg
    and the fill windows hash on the series key, so the whole operator
    is: scan -> 1 shuffle (bucket agg) -> 1 shuffle (spine join + two
    windows, same key).
    """
    if unit not in _UNITS:
        raise ValueError(f"unit must be one of {sorted(_UNITS)}, got {unit!r}")
    b = bucket_agg(df, key_col, ts_col, value_col, unit, scale)
    spine = (
        b.groupBy("series_key")
        .agg(F.min("bucket_ts").alias("_lo"), F.max("bucket_ts").alias("_hi"))
        .select(
            "series_key",
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.expr(f"interval 1 {unit}"))
            ).alias("bucket_ts"),
        )
    )
    j = spine.join(b, ["series_key", "bucket_ts"], "left")

    w = Window.partitionBy("series_key").orderBy("bucket_ts")
    w_back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    # (epoch, value) of the nearest OBSERVED bucket at-or-before /
    # at-or-after each row; for observed rows both are the row itself.
    obs = F.when(
        F.col("avg_value").isNotNull(),
        F.struct(
            F.unix_timestamp("bucket_ts").alias("e"),
            F.col("avg_value").alias("v"),
        ),
    )
    prev_s = F.last(obs, ignorenulls=True).over(w_back)
    next_s = F.first(obs, ignorenulls=True).over(w_fwd)
    t = F.unix_timestamp("bucket_ts").cast("double")
    tp = prev_s["e"].cast("double")
    tn = next_s["e"].cast("double")
    interp = F.when(F.col("avg_value").isNotNull(), F.col("avg_value")).otherwise(
        F.when(
            prev_s.isNotNull() & next_s.isNotNull(),
            prev_s["v"] + (next_s["v"] - prev_s["v"]) * ((t - tp) / (tn - tp)),
        )
    )
    return j.select(
        "series_key",
        "bucket_ts",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
        "avg_value",
        F.last(F.col("avg_value"), ignorenulls=True).over(w_back).alias("locf_value"),
        interp.alias("interp_value"),
        F.col("avg_value").isNull().alias("is_gap"),
    )


def reaggregate(
    hourly: DataFrame,
    unit: str = "day",
    sum_col: str = "sum_value",
    cnt_col: str = "n_events",
) -> DataFrame:
    """Roll a finer bucket table up to a coarser unit FROM ITS PARTIALS
    (sum-of-sums, sum-of-counts) — the continuous-aggregate pattern:
    at 100 TB the raw table is scanned once to build the finest rollup,
    and every coarser granularity composes from the previous one without
    touching raw data again. Requires the finer table to carry MERGEABLE
    partials (sum + count, not avg); the average is re-derived at the end.
    """
    if unit not in _UNITS:
        raise ValueError(f"unit must be one of {sorted(_UNITS)}, got {unit!r}")
    return (
        hourly.groupBy(
            "series_key", F.date_trunc(unit, F.col("bucket_ts")).alias("bucket_ts")
        )
        .agg(
            F.sum(cnt_col).cast("bigint").alias("n_events"),
            F.sum(F.col(sum_col).cast("decimal(18,4)")).alias("_s"),
        )
        .select(
            "series_key",
            "bucket_ts",
            "n_events",
            (F.col("_s").cast("double") / F.col("n_events").cast("double")).alias(
                "avg_value"
            ),
        )
    )


def bucket_partials(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    unit: str = "hour",
    scale: int = 4,
) -> DataFrame:
    """Finest-granularity rollup carrying MERGEABLE partials (decimal sum
    + count) for ``reaggregate`` composition."""
    if unit not in _UNITS:
        raise ValueError(f"unit must be one of {sorted(_UNITS)}, got {unit!r}")
    return (
        df.select(
            F.col(key_col).alias("series_key"),
            F.date_trunc(unit, F.col(ts_col)).alias("bucket_ts"),
            F.col(value_col).alias("_v"),
        )
        .groupBy("series_key", "bucket_ts")
        .agg(
            F.count("_v").alias("n_events"),
            F.sum(F.col("_v").cast(f"decimal(18,{scale})"))
            .cast("double")
            .alias("sum_value"),
        )
    )


def ewma_bounded(
    df: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    value_col: str = "value",
    alpha_num: int = 1,
    alpha_den: int = 4,
    lookback: int = 8,
    unit: int = 10**6,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially weighted moving average over each key's event
    sequence, in FIXED-POINT integer arithmetic with a bounded
    lookback — the smoothing primitive behind rate trendlines and
    anomaly baselines.

    Exact EWMA is a recurrence (y_t = a*x_t + (1-a)*y_{t-1}); iterating
    rounded floats across an engine boundary diverges at rounding ties
    (the PageRank lesson, ROADMAP.md round-5 third session), and Spark
    has no linear-recurrence window. Truncating the tail instead gives
    closed-form integer weights: with a = alpha_num/alpha_den and
    r = alpha_den - alpha_num, weight_i = r^i * alpha_den^(L-i) for
    lag i in 0..L — every weight an exact integer, the normalizing sum
    adapting to however many lags actually exist at the head of the
    sequence. The truncated tail's total weight is (r/alpha_den)^(L+1)
    (~7.5% at a=1/4, L=8) and is renormalized away, not dropped.

    ``y_units = (sum_i w_i * q_i) DIV (sum_i present w_i)`` over
    quantized q = floor(value * unit): one integer division, identical
    under Spark's DIV and DuckDB's // for the non-negative values this
    targets. Plan: L+1 lag columns over ONE window spec = a single
    key exchange, all arithmetic in codegen; bigint headroom holds for
    |q| * alpha_den^L * (L+1) < 2^63 (with defaults: values up to
    ~1.5e7, far above any event magnitude here).
    """
    r = alpha_den - alpha_num
    weights = [r**i * alpha_den ** (lookback - i) for i in range(lookback + 1)]
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    q = F.floor(F.col(value_col) * unit).cast("bigint")
    d = df.withColumn("_q", q)
    lags = [F.lag("_q", i).over(w) for i in range(lookback + 1)]
    num = None
    den = None
    for i, (wt, lg) in enumerate(zip(weights, lags)):
        term = F.coalesce(lg, F.lit(0)) * F.lit(wt)
        pres = F.when(lg.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
        num = term if num is None else num + term
        den = pres if den is None else den + pres
    units = F.expr("_num DIV _den")
    return (
        d.withColumn("_num", num)
        .withColumn("_den", den)
        .withColumn(out_col, units.cast("double") / F.lit(float(unit)))
        .drop("_q", "_num", "_den")
    )


def debounce(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_us: int = 300_000_000,
) -> DataFrame:
    """Greedy throttle / debounce: within each group, keep an event iff
    at least ``gap_us`` microseconds have passed since the last KEPT
    event — the telemetry dedup rule ("at most one heartbeat per 5
    minutes") that a window function CANNOT express: whether an event
    survives depends on which earlier events survived, a running state
    machine, not a frame aggregate (lag-vs-previous-RAW under-keeps:
    a steady sub-gap drip would drop everything after the first).

    The state machine runs as a deterministic left fold
    (``F.aggregate``) over each group's time-sorted (t, id) array —
    integer comparisons only, so the greedy chain is engine-exact and
    an oracle can replay it as a recursive CTE. Work per group is one
    array pass; groups are (user, type) event sequences — the same
    per-key cardinality every sessionization here already assumes
    bounded (a hot key holds one group's events, not the corpus).

    Output: the kept events as ``(*group_cols, id_col, ts_col)`` with
    the timestamp reconstructed from its exact micros.
    """
    t = F.unix_micros(F.col(ts_col))
    grouped = df.groupBy(*group_cols).agg(
        F.array_sort(
            F.collect_list(F.struct(t.alias("t"), F.col(id_col).alias("id")))
        ).alias("evs")
    )
    init = F.struct(
        F.lit(-(1 << 62)).cast("long").alias("lk"),
        F.expr("CAST(array() AS ARRAY<STRUCT<t: BIGINT, id: BIGINT>>)").alias(
            "kept"
        ),
    )
    folded = grouped.withColumn(
        "kept",
        F.aggregate(
            F.col("evs"),
            init,
            lambda acc, x: F.when(
                (x["t"] - acc["lk"]) >= F.lit(gap_us),
                F.struct(
                    x["t"].alias("lk"),
                    F.concat(acc["kept"], F.array(x)).alias("kept"),
                ),
            ).otherwise(acc),
        )["kept"],
    ).drop("evs")
    return folded.select(
        *group_cols, F.explode("kept").alias("_e")
    ).select(
        *group_cols,
        F.col("_e.id").alias(id_col),
        F.timestamp_micros(F.col("_e.t")).alias(ts_col),
    )


def hourly_counts(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
) -> DataFrame:
    """Per-group event counts by truncated hour: ``(*group_cols, hr,
    cnt)`` — the shared base of burst detection and autocorrelation."""
    return df.groupBy(
        *group_cols, F.date_trunc("hour", F.col(ts_col)).alias("hr")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def burst_detect(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
    factor: int = 2,
) -> DataFrame:
    """Hour-over-hour burst detection: for each observed hourly bucket,
    the previous CONSECUTIVE hour's count (null across gaps — a burst
    judged against a silent hour would be meaningless), the growth
    ratio, and an integer-compared burst flag ``cnt >= factor *
    prev_cnt`` (the flag never touches the float ratio, so threshold
    semantics are engine-exact). One group-keyed window over
    hourly-bucket rows — input-sized aggregation, bucket-sized
    everything else."""
    hc = hourly_counts(df, group_cols, ts_col)
    w = Window.partitionBy(*group_cols).orderBy("hr")
    prev_cnt = F.lag("cnt").over(w)
    prev_hr = F.lag("hr").over(w)
    consecutive = (
        F.unix_micros(F.col("hr")) - F.unix_micros(prev_hr)
    ) == 3_600_000_000
    pc = F.when(consecutive, prev_cnt)
    return hc.select(
        *group_cols,
        "hr",
        "cnt",
        pc.alias("prev_cnt"),
        (F.col("cnt").cast("double") / pc.cast("double")).alias("ratio"),
        # 1/0/null bigint, not a nullable boolean: tri-state booleans
        # round-trip differently through pandas in different engines
        F.when(pc.isNotNull(), (F.col("cnt") >= factor * pc).cast("bigint"))
        .alias("is_burst"),
    )


def cusum_detect(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
    alarm_mean_mult: int = 4,
) -> DataFrame:
    """Page's CUSUM changepoint screen (Page 1954, Biometrika) over each
    group's hourly count series — WITHOUT the sequential recurrence.
    The textbook chart S_t = max(0, S_{t-1} + (x_t - k)) is a fold no
    window function expresses, but it has a closed form: with prefix
    sums P_t = sum_{j<=t} (x_j - k) and P_0 = 0,

        S_t = P_t - min(0, min_{i<=t} P_i)

    so the "inherently sequential" control chart is one window SUM plus
    one window MIN over the bucket-sized hourly relation — two frames
    sharing a single sort, parallel per group.

    Determinism contract: the reference value k is the group's own mean
    count T/n (detect drift above the series' long-run level). The mean
    is fractional, so EVERY term scales by n: d_t = n*x_t - T, making
    prefix sums, running minima, and the alarm comparison
    ``cusum_scaled >= alarm_mean_mult * T`` (S_scaled = n*S and the
    mean is T/n, so S >= mult*mean ⇔ n*S >= mult*T) exact integers —
    no float recurrence, no rounding (the PageRank lesson applied to
    control charts). Sums run in DECIMAL(38,0) so corpus-scale counts
    cannot overflow an int64 mid-prefix (the roc_auc rank-sum rule).

    Output per observed hourly bucket: the scaled statistic, the same
    statistic in hourly-mean units as one exact double division
    (S/mean = cusum_scaled / T), and the 1/0 bigint alarm flag
    (tri-state-boolean lesson).
    Gaps contribute nothing: the chart runs over observed buckets, the
    documented semantics (a dense spine belongs to resample_gapfill).
    """
    if alarm_mean_mult < 1:
        raise ValueError("alarm_mean_mult must be >= 1")
    return cusum_from_counts(
        hourly_counts(df, group_cols, ts_col), group_cols, alarm_mean_mult
    )


def cusum_from_counts(
    hc: DataFrame,
    group_cols: tuple[str, ...] = ("event_type",),
    alarm_mean_mult: int = 4,
) -> DataFrame:
    """The CUSUM chart math of :func:`cusum_detect` over a PRE-BUILT
    ``(*group_cols, hr, cnt)`` bucket relation — the entry point for
    incrementally-maintained state: a streaming ``agg_state_sink`` keyed
    by (group, hour) keeps the calendar-bounded count table current per
    micro-batch, and the chart recomputes EXACTLY from that state (the
    closed form is bucket-sized work, so per-batch recompute is the
    honest streaming design — no approximate carry)."""
    if alarm_mean_mult < 1:
        raise ValueError("alarm_mean_mult must be >= 1")
    # fail loudly instead of silently clobbering caller columns (the
    # asof _rv lesson): the chart adds these working/output names
    clash = {
        "_d", "_pfx", "_floor", "_ceil", "n_hours", "total_cnt",
        "cusum_scaled", "cusum_means", "is_alarm",
        "cusum_down_scaled", "is_alarm_down",
    } & set(group_cols)
    if clash:
        raise ValueError(f"cusum group_cols clash with working names: {sorted(clash)}")
    wall = Window.partitionBy(*group_cols)
    wrun = (
        Window.partitionBy(*group_cols)
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dec = "decimal(38,0)"
    n = F.count(F.lit(1)).over(wall)
    total = F.sum("cnt").over(wall)
    d = (n * F.col("cnt") - total).cast(dec)
    base = hc.select(
        *group_cols,
        "hr",
        "cnt",
        n.alias("n_hours"),
        total.alias("total_cnt"),
        d.alias("_d"),
    )
    # two projections: window functions cannot nest, so the prefix sum
    # materializes as a column before its running min (same partition +
    # order spec — the sort is shared, one exchange)
    prefixed = base.select(
        *group_cols,
        "hr",
        "cnt",
        "n_hours",
        "total_cnt",
        F.sum("_d").over(wrun).alias("_pfx"),
    )
    # the TWO-SIDED chart shares the single sorted pass: the upward arm
    # is P_t - min(0, min P_i); the downward arm (drop/outage detection,
    # S-_t = max(0, S-_{t-1} + (mean - x_t))) has the symmetric closed
    # form max(0, max_{i<=t} P_i) - P_t — one extra window MAX, no
    # extra exchange
    scored = prefixed.select(
        *group_cols,
        "hr",
        "cnt",
        "n_hours",
        "total_cnt",
        "_pfx",
        F.least(F.lit(0).cast(dec), F.min("_pfx").over(wrun)).alias("_floor"),
        F.greatest(F.lit(0).cast(dec), F.max("_pfx").over(wrun)).alias("_ceil"),
    )
    s = (F.col("_pfx") - F.col("_floor")).cast(dec)
    s_dn = (F.col("_ceil") - F.col("_pfx")).cast(dec)
    thresh = F.lit(alarm_mean_mult).cast(dec) * F.col("total_cnt").cast(dec)
    return scored.select(
        *group_cols,
        "hr",
        "cnt",
        F.col("n_hours").cast("long").alias("n_hours"),
        s.alias("cusum_scaled"),
        (s.cast("double") / F.col("total_cnt").cast("double")).alias(
            "cusum_means"
        ),
        (s >= thresh).cast("bigint").alias("is_alarm"),
        s_dn.alias("cusum_down_scaled"),
        (s_dn >= thresh).cast("bigint").alias("is_alarm_down"),
    )


def cusum_adaptive_from_counts(
    hc: DataFrame,
    group_cols: tuple[str, ...] = ("event_type",),
    alpha_num: int = 1,
    alpha_den: int = 4,
    lookback: int = 8,
    unit: int = 10**6,
    alarm_mean_mult: int = 4,
) -> DataFrame:
    """Two-sided CUSUM with a LEARNED reference — the ROADMAP "EWMA-fed
    k" chart: instead of testing drift against the series' own global
    mean (:func:`cusum_from_counts`), each hour is compared to the
    one-step-behind EWMA prediction of its level, so the chart adapts
    to slow trends and alarms only on breaks FROM the local baseline
    (the self-starting CUSUM of the SPC literature).

    The closed form survives a time-varying reference: for ANY
    innovation sequence d_t = x_t - k_t,
    ``S_t = max(0, S_{t-1} + d_t) = P_t - min(0, min_{i<=t} P_i)``
    (and the downward arm symmetrically with the running max), so the
    adaptive chart is still window SUM + MIN + MAX over the bucket-
    sized hourly relation — no sequential fold.

    Exactness: the reference is :func:`ewma_bounded`'s closed-form
    integer-weight EWMA (w_i = r^i * den^(L-i), one integer DIV — DIV
    and DuckDB's // agree on the non-negative counts), kept in raw
    1e6-fixed-point units; innovations q_t - ewma_{t-1} are exact
    bigints; prefix sums / minima / maxima run in DECIMAL(38,0); the
    alarm ``S >= mult * global_mean`` cross-multiplies to the exact
    integer comparison ``n*S >= mult*T*unit``. The first hour of each
    group has no prediction and contributes d = 0 (the chart starts at
    the baseline, the SPC convention).

    Plan: everything after the hourly aggregation shares ONE
    (group, hr) sort — the L+1 EWMA lags, the prediction lag, and the
    three running frames use the same partition + order spec, a single
    exchange. Works from the same incrementally-maintained (group, hr,
    cnt) state as cusum_from_counts (agg_state_sink feed).

    Output per hour: (*group_cols, hr, cnt, ewma_pred, cusum_units,
    cusum_means, is_alarm, cusum_down_units, is_alarm_down).
    """
    if alarm_mean_mult < 1:
        raise ValueError("alarm_mean_mult must be >= 1")
    if not 0 < alpha_num < alpha_den:
        raise ValueError("need 0 < alpha_num < alpha_den")
    if lookback < 1:
        raise ValueError("lookback must be >= 1")
    clash = {
        "_q", "_num", "_den", "_ew", "_pred", "_d", "_pfx", "_floor",
        "_ceil", "n_hours", "total_cnt", "ewma_pred", "cusum_units",
        "cusum_means", "is_alarm", "cusum_down_units", "is_alarm_down",
    } & set(group_cols)
    if clash:
        raise ValueError(
            f"adaptive cusum group_cols clash with working names: {sorted(clash)}"
        )
    dec = "decimal(38,0)"
    r = alpha_den - alpha_num
    weights = [r**i * alpha_den ** (lookback - i) for i in range(lookback + 1)]
    w = Window.partitionBy(*group_cols).orderBy("hr")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy(*group_cols)
    q = (F.col("cnt").cast("bigint") * F.lit(unit)).alias("_q")
    base = hc.select(
        *group_cols,
        "hr",
        "cnt",
        q,
        F.count(F.lit(1)).over(wall).alias("n_hours"),
        F.sum("cnt").over(wall).alias("total_cnt"),
    )
    num = None
    den = None
    for i, wt in enumerate(weights):
        lg = F.lag("_q", i).over(w)
        term = F.coalesce(lg, F.lit(0)) * F.lit(wt)
        pres = F.when(lg.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
        num = term if num is None else num + term
        den = pres if den is None else den + pres
    ew = base.withColumn("_num", num).withColumn("_den", den).withColumn(
        "_ew", F.expr("_num DIV _den")
    )
    pred = F.lag("_ew").over(w)
    d = F.when(pred.isNull(), F.lit(0).cast(dec)).otherwise(
        (F.col("_q") - pred).cast(dec)
    )
    prefixed = ew.select(
        *group_cols,
        "hr",
        "cnt",
        "n_hours",
        "total_cnt",
        pred.alias("_pred"),
        F.sum(d).over(wrun).alias("_pfx"),
    )
    scored = prefixed.select(
        *group_cols,
        "hr",
        "cnt",
        "n_hours",
        "total_cnt",
        "_pred",
        "_pfx",
        F.least(F.lit(0).cast(dec), F.min("_pfx").over(wrun)).alias("_floor"),
        F.greatest(F.lit(0).cast(dec), F.max("_pfx").over(wrun)).alias("_ceil"),
    )
    s = (F.col("_pfx") - F.col("_floor")).cast(dec)
    s_dn = (F.col("_ceil") - F.col("_pfx")).cast(dec)
    # S >= mult * mean_units  <=>  n*S >= mult*T*unit, exact integers
    lhs_up = F.col("n_hours").cast(dec) * s
    lhs_dn = F.col("n_hours").cast(dec) * s_dn
    rhs = (
        F.lit(alarm_mean_mult).cast(dec)
        * F.col("total_cnt").cast(dec)
        * F.lit(unit).cast(dec)
    )
    means = (
        s.cast("double")
        * F.col("n_hours").cast("double")
        / (F.col("total_cnt").cast("double") * F.lit(float(unit)))
    )
    return scored.select(
        *group_cols,
        "hr",
        "cnt",
        (F.col("_pred").cast("double") / F.lit(float(unit))).alias("ewma_pred"),
        s.alias("cusum_units"),
        means.alias("cusum_means"),
        (lhs_up >= rhs).cast("bigint").alias("is_alarm"),
        s_dn.alias("cusum_down_units"),
        (lhs_dn >= rhs).cast("bigint").alias("is_alarm_down"),
    )


def cusum_adaptive_detect(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
    **kwargs,
) -> DataFrame:
    """EWMA-referenced CUSUM over each group's hourly event counts —
    :func:`cusum_adaptive_from_counts` over :func:`hourly_counts`."""
    return cusum_adaptive_from_counts(
        hourly_counts(df, group_cols, ts_col), group_cols, **kwargs
    )


def autocorr_lag1(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
) -> DataFrame:
    """Lag-1 autocorrelation of each group's hourly count series over
    consecutive-hour pairs, from EXACT integer moment sums: counts are
    bigints, so sx/sy/sxy/sxx/syy are exact integer aggregates (no
    decimal dance needed) and Pearson's r = (n*sxy - sx*sy) /
    sqrt((n*sxx - sx^2) * (n*syy - sy^2)) is a fixed sequence of
    correctly-rounded double ops — deterministic cross-engine (the
    agg_corr_regression construction, integer-simplified). Pairs
    (c_{t-1}, c_t) exist only where hours are consecutive; gaps
    contribute nothing rather than fabricating zeros."""
    hc = hourly_counts(df, group_cols, ts_col)
    w = Window.partitionBy(*group_cols).orderBy("hr")
    paired = (
        hc.withColumn("prev_cnt", F.lag("cnt").over(w))
        .withColumn("prev_hr", F.lag("hr").over(w))
        .filter(
            (
                F.unix_micros(F.col("hr")) - F.unix_micros(F.col("prev_hr"))
            )
            == 3_600_000_000
        )
        .select(*group_cols, F.col("prev_cnt").alias("x"), F.col("cnt").alias("y"))
    )
    m = paired.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n_pairs").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    denom = (n * sxx - sx * sx) * (n * syy - sy * sy)
    return m.select(
        *group_cols,
        "n_pairs",
        F.when(denom > 0.0, (n * sxy - sx * sy) / F.sqrt(denom)).alias(
            "autocorr_lag1"
        ),
    )


def ohlc(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    bucket: str = "hour",
) -> DataFrame:
    """OHLC downsampling — per (group, time bucket) the Open (value at
    the earliest row), High, Low, Close (value at the latest row), and
    volume count: the candlestick rollup every metrics store ships.

    Open/close are rank-1 window picks over the UNIQUE (ts, id) order
    — first_value/last_value under an explicit total order, so ties at
    the same timestamp resolve identically in any engine (min_by on a
    raw timestamp would be nondeterministic at ties). The ranking
    window and the final aggregation share the (group, bucket) hash
    partitioning, so the whole rollup is ONE exchange.
    """
    b = F.date_trunc(bucket, F.col(ts_col))
    d = df.select(
        *group_cols,
        b.alias("bkt"),
        F.unix_micros(F.col(ts_col)).alias("_t"),
        F.col(id_col).alias("_id"),
        F.col(value_col).alias("_v"),
    )
    w_asc = Window.partitionBy(*group_cols, "bkt").orderBy("_t", "_id")
    w_desc = Window.partitionBy(*group_cols, "bkt").orderBy(
        F.col("_t").desc(), F.col("_id").desc()
    )
    ranked = d.withColumn("_ra", F.row_number().over(w_asc)).withColumn(
        "_rd", F.row_number().over(w_desc)
    )
    return ranked.groupBy(*group_cols, "bkt").agg(
        F.max(F.when(F.col("_ra") == 1, F.col("_v"))).alias("open"),
        F.max("_v").alias("high"),
        F.min("_v").alias("low"),
        F.max(F.when(F.col("_rd") == 1, F.col("_v"))).alias("close"),
        F.count(F.lit(1)).alias("volume"),
    )


def seasonal_hourly(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
) -> DataFrame:
    """Hour-of-day seasonal decomposition of each group's hourly count
    series: ``count = seasonal + residual``, where the seasonal term is
    the group's mean count for that clock hour across all OBSERVED
    hourly buckets (the classic "seasonal means" profile — the additive
    baseline every calendar-seasonality monitor subtracts before
    looking for anomalies; :func:`burst_detect` compares neighbors,
    this compares each hour to its own hour-of-day norm).

    Only observed (group, hour) buckets participate — an hour with zero
    events is absent from the series, not a zero sample (the gap-fill
    operator exists for the densified view; both engines see the same
    bucket set, so the contract stays oracle-exact).

    Determinism: the inputs to the seasonal mean are exact int64 sums
    (counts), so ``sum / n`` is ONE correctly-rounded double division —
    identical in both engines — and ``cnt - seasonal`` is one exact
    IEEE subtraction of exactly-representable operands. No iterated
    float arithmetic (the PageRank lesson does not bite single-step
    divisions).

    Plan: one (group, hour) aggregation (map-side partial — raw events
    never shuffle whole), then one window over the REDUCED bucket rows
    keyed (group, hour-of-day). At 100 TB the bucket table is
    groups x hours — analytics-sized regardless of event volume.

    Output: (*group_cols, hr, hod, cnt, seasonal, residual).
    """
    buckets = hourly_counts(df, group_cols, ts_col)
    hod = F.hour("hr").cast("bigint")
    w = Window.partitionBy(*group_cols, hod)
    seasonal = (
        F.sum("cnt").over(w).cast("double")
        / F.count(F.lit(1)).over(w).cast("double")
    )
    return buckets.select(
        *group_cols,
        "hr",
        hod.alias("hod"),
        "cnt",
        seasonal.alias("seasonal"),
        (F.col("cnt").cast("double") - seasonal).alias("residual"),
    )


def activity_streaks(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
) -> DataFrame:
    """Gaps-and-islands: per key, the longest run of CONSECUTIVE active
    calendar days, the total number of runs (islands), and total active
    days — the retention/engagement streak summary (the pattern behind
    "7-day streak" product metrics and burst-of-activity cohorting).

    The classic island key is ``day - row_number`` over the DISTINCT
    active days: consecutive days advance both by one, so the
    difference is constant within a run and unique across runs — pure
    integer date arithmetic, no iterated state, oracle-exact.

    Plan: raw events reduce map-side to distinct (key, day) rows; one
    key-partitioned window assigns row numbers (per-key active-day
    counts are calendar-bounded, never event-volume-bounded); two
    reductions collapse islands then keys, all sharing the key
    exchange. Output: ``(*group_cols, longest_streak, n_streaks,
    active_days)``.
    """
    days = df.select(
        *group_cols, F.to_date(ts_col).alias("_day")
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_day")
    islands = days.select(
        *group_cols,
        "_day",
        F.date_sub("_day", F.row_number().over(w)).alias("_isl"),
    )
    runs = islands.groupBy(*group_cols, "_isl").agg(
        F.count(F.lit(1)).alias("_len")
    )
    return runs.groupBy(*group_cols).agg(
        F.max("_len").cast("bigint").alias("longest_streak"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.sum("_len").cast("bigint").alias("active_days"),
    )


def theilsen_trend(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
) -> DataFrame:
    """Theil-Sen robust trend estimator per group over the hourly count
    series — the median of all pairwise slopes, insensitive to ~29% of
    outliers where least-squares (``agg_corr_regression``'s beta) breaks
    on one bad bucket. The standard robust-trend screen for noisy
    operational series.

    Exactness: x is the integer epoch hour, y the bigint count, so each
    pairwise slope (y2-y1)/(x2-x1) is ONE correctly-rounded division of
    exact integers — engine-identical doubles. The median is the
    DISCRETE lower-middle pick (rank (n+1)//2 under the total order
    (slope, h1, h2)) — a data value, never an interpolated float (the
    quantile_bins discrete-edge rule).

    Scale shape: the pair self-join is quadratic in HOURLY BUCKETS per
    group, which the calendar bounds (a decade of hours is 87k rows;
    bucket² stays analytics-sized at ANY corpus volume — the quadratic
    never touches raw events). One bucket agg, one group-keyed pair
    join, one rank window over pairs.
    """
    clash = {"_x", "_y", "_h1", "_h2", "_slope", "_rk", "n_pairs",
             "trend_per_hour"} & set(group_cols)
    if clash:
        raise ValueError(
            f"theilsen group_cols clash with working names: {sorted(clash)}"
        )
    return theilsen_from_counts(
        hourly_counts(df, group_cols, ts_col), group_cols
    )


def theilsen_from_counts(
    counts: DataFrame,
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """The Theil-Sen math of :func:`theilsen_trend` over a pre-built
    ``(*group_cols, hr, cnt)`` bucket relation — like
    :func:`cusum_from_counts`, the entry point for an incrementally
    maintained hourly state (streaming ``agg_state_sink``): the pair
    quadratic is calendar-bounded, so per-batch recompute from state is
    the honest streaming design."""
    clash = {"_x", "_y", "_h1", "_h2", "_slope", "_rk", "n_pairs",
             "trend_per_hour"} & set(group_cols)
    if clash:
        raise ValueError(
            f"theilsen group_cols clash with working names: {sorted(clash)}"
        )
    hc = counts.select(
        *group_cols,
        (F.unix_micros(F.col("hr")) / F.lit(3_600_000_000)).cast("long").alias("_x"),
        F.col("cnt").alias("_y"),
    )
    a = hc
    b = hc
    for c in [*group_cols, "_x", "_y"]:
        b = b.withColumnRenamed(c, f"{c}__b")
    cond = [F.col(c) == F.col(f"{c}__b") for c in group_cols]
    pairs = a.join(b, [*cond, F.col("_x") < F.col("_x__b")]).select(
        *group_cols,
        F.col("_x").alias("_h1"),
        F.col("_x__b").alias("_h2"),
        (
            (F.col("_y__b") - F.col("_y")).cast("double")
            / (F.col("_x__b") - F.col("_x")).cast("double")
        ).alias("_slope"),
    )
    w = Window.partitionBy(*group_cols).orderBy("_slope", "_h1", "_h2")
    wall = Window.partitionBy(*group_cols)
    ranked = pairs.select(
        *group_cols,
        "_slope",
        F.row_number().over(w).alias("_rk"),
        F.count(F.lit(1)).over(wall).alias("n_pairs"),
    )
    return ranked.filter(
        F.col("_rk") == F.expr("(n_pairs + 1) div 2")
    ).select(
        *group_cols,
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("_slope").alias("trend_per_hour"),
    )
