"""Statistical evaluation operators: exact ROC-AUC, Gini concentration,
Kaplan-Meier survival.

The reference has no evaluation surface at all (its one statistic is the
relative co-occurrence frequency, /root/reference/src/CrystalBallPair.java:132);
a data-curation engine needs to GRADE its own screens — does a quality
score actually separate the classes it claims to? how concentrated is
value across keys? how long do subjects survive? — so these land as
first-class operators.

Numerics posture (the repo's one rule): every statistic here reduces to
exact integer/decimal aggregates combined in ONE final float expression.
ROC-AUC is the rank-sum (Mann-Whitney U) form — pure integer counting,
no trapezoids, no float accumulation; Gini is the sorted-weighted-sum
identity over exact decimal sums; Kaplan-Meier accumulates 6dp-quantized
log terms (exact decimal sums — the iterated-float product the textbook
formula implies is exactly the cross-engine trap the PageRank lesson
forbids).

Scale posture: every rank/cumulative count comes from
:func:`..operators.relational.grouped_value_cum` — the bucketed parallel
prefix-sum — so nothing here ever funnels raw rows through a
single-partition window. The post-reduction tables are distinct-value
sized (scores, spend levels, durations), analytics-sized at any corpus
scale.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .relational import grouped_value_cum


def _join_nullsafe_keys(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    nullsafe: set[str],
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``keys`` with ``eqNullSafe`` applied to the
    ``nullsafe`` subset (group columns): a NULL group key is ONE regular
    group — the window-partition convention psi_drift already follows —
    so the grouped drift/calibration joins must not silently drop it.
    The right side's key copies are dropped, mirroring
    ``join(on=[names])``. Null-safe equality is a supported hash-join
    key, so broadcast hints on ``right`` survive.
    """
    la, ra = left.alias("_jl"), right.alias("_jr")
    cond = None
    for k in keys:
        lc, rc = F.col(f"_jl.{k}"), F.col(f"_jr.{k}")
        c = lc.eqNullSafe(rc) if k in nullsafe else (lc == rc)
        cond = c if cond is None else cond & c
    out = la.join(ra, cond, how)
    for k in keys:
        out = out.drop(F.col(f"_jr.{k}"))
    return out


def roc_auc(
    df: DataFrame,
    label_col: str,
    score_col: str,
    group_cols: tuple[str, ...] = (),
    bucket_expr: Column | None = None,
) -> DataFrame:
    """Exact ROC-AUC per group via the rank-sum (Mann-Whitney U)
    identity: ``AUC = (R_pos - P(P+1)/2) / (P * N)`` where ``R_pos`` is
    the sum of (average, tie-adjusted) ranks of the positive class.
    This IS the probability a random positive outscores a random
    negative (ties count half) — the integral-free, binning-free form.

    Exactness: ranks are integers; tie-averaged ranks are half-integers,
    so everything accumulates in 2x-scaled integers (``decimal(38,0)``
    sums — immune to int64 overflow at 100 TB row counts where
    rank-sums reach n^2). The single division at the end is one
    correctly-rounded IEEE op. No float ever iterates.

    Plan: one (group, score) aggregation, one
    :func:`grouped_value_cum` pass (bucketed parallel prefix — no
    global sort, no single-partition window), one broadcast-sized join
    of two distinct-score tables, one final group agg. Raw rows are
    touched exactly twice, reduced map-side both times.

    Output: ``(*group_cols, n_pos, n_neg, auc)``; ``auc`` is NULL for
    degenerate groups (single-class), which have no ranking to grade.
    ``label_col`` must be 0/1-valued (int or boolean).
    """
    g = list(group_cols)
    lab = F.col(label_col).cast("bigint")
    base = df.select(*g, score_col, lab.alias("_y"))
    cum = grouped_value_cum(
        base.select(*g, score_col), g, score_col, bucket_expr
    )
    per_score = base.groupBy(*g, score_col).agg(
        F.count(F.lit(1)).alias("_m"), F.sum("_y").alias("_p")
    )
    on = [*g, score_col]
    joined = cum.join(per_score, on)
    # rows tied at this score occupy ranks (cc-m+1)..cc; average rank =
    # cc - (m-1)/2; doubled: 2*cc - m + 1 (always an exact integer).
    rank2 = (
        F.col("_p").cast("decimal(38,0)")
        * (F.lit(2) * F.col("cc") - F.col("_m") + F.lit(1)).cast(
            "decimal(38,0)"
        )
    )
    agg = joined.groupBy(*g).agg(
        F.sum("_p").cast("bigint").alias("n_pos"),
        (F.first("n") - F.sum("_p")).cast("bigint").alias("n_neg"),
        F.sum(rank2).alias("_r2"),
    )
    p = F.col("n_pos").cast("decimal(38,0)")
    u2 = F.col("_r2") - p * (p + F.lit(1))  # = 2 * Mann-Whitney U
    den2 = F.lit(2).cast("decimal(38,0)") * p * F.col("n_neg").cast(
        "decimal(38,0)"
    )
    return agg.select(
        *g,
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            u2.cast("double") / den2.cast("double"),
        ).alias("auc"),
    )


def gini_coefficient(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    bucket_expr: Column | None = None,
) -> DataFrame:
    """Gini concentration coefficient per group over a NON-NEGATIVE
    exact-decimal value column: ``G = (2*sum_i(i*x_i) - (n+1)*sum(x))
    / (n*sum(x))`` with ``x`` ascending, 1-based ranks — 0 = perfectly
    even, ->1 = one key holds everything. The inequality summary for
    "how skewed is spend/traffic/token mass across keys" — the
    DIAGNOSTIC twin of the key-skew report (that one finds hot join
    keys; this one grades whole-distribution concentration).

    Tie-invariance makes the sorted form exact: permuting equal values
    cannot change ``sum(i*x_i)``, so the multiset identity
    ``2*sum_i(i*x_i) = sum_v v*m*(2*cc - m + 1)`` (m = multiplicity,
    cc = inclusive cumulative count from :func:`grouped_value_cum`)
    computes it without any per-row rank. ``value_col`` MUST already be
    an exact decimal (aggregate doubles with ``dsum``-style casts
    first); products with the integer rank terms stay exact decimals,
    and the final expression is evaluated once in doubles.

    Output: ``(*group_cols, n, total, gini)``; ``gini`` NULL when the
    group total is 0 (undefined) or n = 1.
    """
    g = list(group_cols)
    base = df.select(*g, value_col)
    cum = grouped_value_cum(base, g, value_col, bucket_expr)
    per_val = base.groupBy(*g, value_col).agg(
        F.count(F.lit(1)).alias("_m")
    )
    joined = cum.join(per_val, [*g, value_col])
    v = F.col(value_col).cast("decimal(38,6)")
    # ranks in the tie block are (cc-m+1)..cc: sum of 2i = m*(2cc-m+1)
    rank_term = (
        F.col("_m") * (F.lit(2) * F.col("cc") - F.col("_m") + F.lit(1))
    ).cast("decimal(38,0)")
    agg = joined.groupBy(*g).agg(
        F.first("n").cast("bigint").alias("n"),
        F.sum(v * F.col("_m").cast("decimal(38,0)")).alias("_tot"),
        F.sum(v * rank_term).alias("_num2"),
    )
    n = F.col("n").cast("double")
    tot = F.col("_tot").cast("double")
    num2 = F.col("_num2").cast("double")
    return agg.select(
        *g,
        "n",
        tot.alias("total"),
        F.when(
            (F.col("_tot") > 0) & (F.col("n") > 1),
            (num2 - (n + F.lit(1.0)) * tot) / (n * tot),
        ).alias("gini"),
    )


def kaplan_meier(
    subjects: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    bucket_expr: Column | None = None,
) -> DataFrame:
    """Kaplan-Meier survival over right-censored integer durations —
    one row per subject in, one row per distinct exit time out:
    ``(duration, n_risk, n_events, n_censored, log_survival)``.

    ``log_survival`` is the LOG of the product-limit estimator,
    ``sum_{t' <= t} ln(1 - d_t'/r_t')`` with each term quantized to a
    6dp decimal before the (exact, order-independent) sum — the BM25 /
    bigram-LM rounding rule. The textbook running PRODUCT of floats is
    engine-divergent (the PageRank lesson); a sum of quantized decimals
    is not, and survival probabilities are recovered as ``exp()`` at
    display time. Once the risk set is absorbed (d = r: survival hits
    exactly 0) the log is undefined — that row and everything after it
    carries NULL.

    ``n_risk`` at time t (subjects with duration >= t) comes from the
    group total minus the EXCLUSIVE cumulative exit count — one
    :func:`grouped_value_cum` pass over durations (bucketed parallel
    prefix, no global sort of subjects). The cumulative log runs over
    the DISTINCT-duration table (calendar-bounded: days/weeks, not
    subjects), where a plain ordered window is analytics-sized at any
    corpus scale.

    ``event_col``: 1 = observed event (e.g. churn), 0 = right-censored
    at that duration. Censored subjects leave the risk set but
    contribute no hazard term — the entire point of KM.
    """
    base = subjects.select(
        F.col(duration_col).alias("_d"),
        F.col(event_col).cast("bigint").alias("_e"),
    )
    cum = grouped_value_cum(base.select("_d"), [], "_d", bucket_expr)
    per_t = base.groupBy("_d").agg(
        F.count(F.lit(1)).alias("_m"), F.sum("_e").alias("_dd")
    )
    j = cum.join(per_t, "_d").select(
        F.col("_d"),
        (F.col("n") - F.col("cc") + F.col("_m")).alias("_r"),
        "_m",
        "_dd",
    )
    term = F.when(
        F.col("_dd") < F.col("_r"),
        F.round(
            F.log(
                F.lit(1.0)
                - F.col("_dd").cast("double") / F.col("_r").cast("double")
            ),
            6,
        ).cast("decimal(18,6)"),
    )  # NULL when d == r (absorption: survival = 0, log undefined)
    w = Window.orderBy("_d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    scored = j.select(
        "_d",
        "_r",
        "_dd",
        (F.col("_m") - F.col("_dd")).alias("_cens"),
        F.sum(term).over(w).alias("_ls"),
        F.max((F.col("_dd") >= F.col("_r")).cast("int")).over(w).alias("_abs"),
    )
    return scored.select(
        F.col("_d").alias(duration_col),
        F.col("_r").cast("bigint").alias("n_risk"),
        F.col("_dd").cast("bigint").alias("n_events"),
        F.col("_cens").cast("bigint").alias("n_censored"),
        F.when(F.col("_abs") == 0, F.col("_ls").cast("double")).alias(
            "log_survival"
        ),
    )


def _benford_p6() -> dict[int, str]:
    """Benford digit probabilities log10(1 + 1/d) as exact 6dp decimal
    string literals, quantized ONCE half-up (the fs_weights rule)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal("0.000001")
    return {
        d: str(
            Decimal(repr(math.log10(1 + 1 / d))).quantize(
                q, rounding=ROUND_HALF_UP
            )
        )
        for d in range(1, 10)
    }


BENFORD_P6 = _benford_p6()


def benford_screen(
    df: DataFrame, value_col: str, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Benford's-law conformance screen — the classic fraud /
    synthetic-data detector: the first significant digits of naturally
    occurring magnitudes follow P(d) = log10(1 + 1/d); fabricated or
    mechanically generated values don't. Reports per-digit observed vs
    expected shares and the chi-square distance (all 9 digits in every
    group row via a window total).

    Every group with >= 1 eligible row emits EXACTLY 9 rows: observed
    counts left-join a 1..9 digit spine, so a digit that never occurs
    still contributes its full (0 - E)^2 / E = E term to chi-square —
    a wholly absent digit is the STRONGEST fabrication signal and must
    not silently vanish from the statistic. Groups with zero eligible
    rows produce no output (chi-square is undefined there). A NULL
    group key is ONE regular group (the window-partition convention) —
    the spine join is null-safe on group columns so a NULL group's
    observed counts aggregate like any other's.

    Exactness: the first digit comes from the INTEGER part's string
    form (integers print identically in every engine — no log10, no
    float formatting; rows with value < 1 or NULL are excluded from
    the digit law and counted in ``n_skipped``). The Benford
    expectations are 6dp decimal literals quantized ONCE in Python
    (the fs_weights rule). Each chi-square term is a fixed float
    expression over exact decimal inputs, quantized to 9dp before the
    associative decimal total (the chi2_source_lang rule — a float
    window-sum over 9 terms would be order-dependent).

    One scan, one (group, digit-or-skipped) aggregation — <= 10 rows
    per group shuffle — and bucket-sized windows after (the digit
    spine is a 9-row broadcast).
    """
    clash = {"digit", "n_obs", "_nt", "_nsk", "_exp", "_tq", "n_total",
             "n_skipped", "obs_share", "exp_share", "chi2"} & set(group_cols)
    if clash:
        raise ValueError(
            f"benford group_cols clash with working names: {sorted(clash)}"
        )
    d9 = "decimal(28,9)"
    x = F.col(value_col)
    # NULL digit = skipped row (value < 1 or NULL) — kept in the same
    # aggregate so one scan yields both the digit law and n_skipped
    digit = F.when(
        x >= 1,
        F.substring(F.floor(x).cast("bigint").cast("string"), 1, 1).cast("int"),
    )
    # counts feeds three branches (spine derivation, the left join,
    # the skipped-row union); Catalyst dedupes NO common subplans (the
    # DSIR lesson), so checkpoint the <= 10-rows-per-group aggregate or
    # the corpus would scan three times
    counts = (
        df.groupBy(*group_cols, digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n_obs"))
        .localCheckpoint(eager=True)
    )
    obs = counts.filter(F.col("digit").isNotNull())
    digits_df = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    if group_cols:
        spine = obs.select(*group_cols).distinct().crossJoin(
            F.broadcast(digits_df)
        )
    else:
        spine = (
            obs.select(F.lit(1).alias("_spine"))
            .distinct()
            .crossJoin(F.broadcast(digits_df))
            .drop("_spine")
        )
    # null-SAFE equality on group columns: the spine's distinct() and the
    # final window both treat a NULL group key as one regular group, so
    # the join must too — a null-unsafe key would emit the NULL group's
    # 9 spine rows with n_obs=0 while its real digit counts vanish
    if group_cols:
        sp, ob = spine.alias("_sp"), obs.alias("_ob")
        cond = F.col("_sp.digit") == F.col("_ob.digit")
        for c in group_cols:
            cond = cond & F.col(f"_sp.{c}").eqNullSafe(F.col(f"_ob.{c}"))
        full = sp.join(ob, cond, "left").select(
            *[F.col(f"_sp.{c}").alias(c) for c in group_cols],
            F.col("_sp.digit").alias("digit"),
            F.coalesce(F.col("_ob.n_obs"), F.lit(0)).alias("n_obs"),
        )
    else:
        full = spine.join(obs, ["digit"], "left").select(
            "digit",
            F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
        )
    # skipped rows ride along as digit-NULL rows so the window sees
    # them; groups with ONLY skipped rows vanish at the final filter
    allrows = full.unionByName(counts.filter(F.col("digit").isNull()))
    wall = Window.partitionBy(*group_cols) if group_cols else Window.partitionBy()
    n_total = F.sum(
        F.when(F.col("digit").isNotNull(), F.col("n_obs")).otherwise(0)
    ).over(wall)
    n_skipped = F.sum(
        F.when(F.col("digit").isNull(), F.col("n_obs")).otherwise(0)
    ).over(wall)
    exp_share = F.when(
        F.col("digit") == 1, F.lit(BENFORD_P6[1]).cast("decimal(18,6)")
    )
    for d in range(2, 10):
        exp_share = exp_share.when(
            F.col("digit") == d, F.lit(BENFORD_P6[d]).cast("decimal(18,6)")
        )
    e = exp_share * n_total  # decimal expected count
    diff = F.col("n_obs").cast("decimal(28,6)") - e
    term = (
        diff.cast("double") * diff.cast("double") / e.cast("double")
    )
    term_q = F.round(term, 9).cast(d9)
    scored = allrows.select(
        *group_cols,
        "digit",
        "n_obs",
        n_total.alias("_nt"),
        n_skipped.alias("_nsk"),
        exp_share.alias("_exp"),
        term_q.alias("_tq"),
    )
    chi2 = F.sum("_tq").over(wall)  # null terms (the skipped row) drop out
    return scored.filter(F.col("digit").isNotNull()).select(
        *group_cols,
        "digit",
        "n_obs",
        F.col("_nt").cast("long").alias("n_total"),
        F.col("_nsk").cast("long").alias("n_skipped"),
        (F.col("n_obs").cast("double") / F.col("_nt").cast("double")).alias(
            "obs_share"
        ),
        F.col("_exp").cast("double").alias("exp_share"),
        chi2.cast("double").alias("chi2"),
    )


def psi_drift(
    df: DataFrame,
    value_col: str,
    side_col: Column,
    lo: int,
    hi: int,
    n_bins: int = 10,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Population Stability Index between two cohorts of one relation —
    the industry-standard binned drift monitor (PSI < 0.1 stable,
    0.1-0.25 moderate, > 0.25 shifted), completing the drift trio: KS
    (exact distributional sup-gap), Welch (means), PSI (binned shares,
    the score-monitoring convention).

    Contract: ``n_bins`` fixed-width bins over the CLOSED range
    [lo, hi] (integer literals — reference bin edges are part of a PSI
    definition and must not drift with the data; values clamp into the
    edge bins, the monitoring convention). NULL values are filtered
    BEFORE binning and excluded from the totals — floor(NULL) would
    otherwise mint an 11th NULL bin that violates the fixed-n_bins
    contract and skews every share. Counts take add-one smoothing
    (zero-count bins otherwise make PSI infinite — the standard fix,
    stated loudly). Shares quantize to integer 1e-9
    units by floor division; each log-ratio term quantizes as
    round(ln((c1·n2)/(c2·n1)), 6) with the count products cast to
    double BEFORE multiplying (LESSONS 11); the per-bin contribution
    (p9 - q9) × lnq6 is exact decimal arithmetic and the PSI total an
    exact decimal sum — engine-deterministic end to end.

    One scan → one (bin, c1, c2) aggregation (<= n_bins + 2 rows
    shuffle at ANY corpus size); everything after is bin-table-sized.
    Output per bin plus the repeated totals: (bin, c1, c2, share1,
    share2, term, psi, n1, n2).
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if not lo < hi:
        raise ValueError(f"need lo < hi, got [{lo}, {hi}]")
    clash = {"bin", "c1", "c2", "n1", "n2", "share1", "share2", "term",
             "psi", "_tq", "_c1", "_c2", "_n1", "_n2"} & set(group_cols)
    if clash:
        raise ValueError(f"psi group_cols clash with working names: {sorted(clash)}")
    d6 = "decimal(18,6)"
    x = F.col(value_col)
    width_num, width_den = hi - lo, n_bins
    raw_bin = F.floor(
        ((x - F.lit(lo)) * F.lit(width_den)) / F.lit(float(width_num))
    ).cast("int")
    bin_ = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), raw_bin))
    one = F.when(side_col, 1).otherwise(0)
    # NULL values out before binning: only the n_bins clamped bins may
    # participate in the totals and the PSI sum (documented contract)
    df = df.filter(x.isNotNull())
    cells = df.groupBy(*group_cols, bin_.alias("bin")).agg(
        F.sum(one).alias("_c1raw"),
        F.sum(1 - one).alias("_c2raw"),
    )
    # add-one smoothing; totals computed over the smoothed counts so
    # shares still sum to 1
    c1 = F.col("_c1raw") + 1
    c2 = F.col("_c2raw") + 1
    wall = Window.partitionBy(*group_cols)
    base = cells.select(
        *group_cols,
        "bin",
        c1.alias("_c1"),
        c2.alias("_c2"),
        F.sum(c1).over(wall).alias("_n1"),
        F.sum(c2).over(wall).alias("_n2"),
    )
    # decimal product BEFORE the floor division: long*1e9 overflows
    # int64 at corpus-scale counts
    d38 = "decimal(38,0)"
    p9 = F.expr(
        f"(CAST(_c1 AS {d38}) * CAST(1000000000 AS {d38})) div _n1"
    ).cast(d38)
    q9 = F.expr(
        f"(CAST(_c2 AS {d38}) * CAST(1000000000 AS {d38})) div _n2"
    ).cast(d38)
    lnr = F.round(
        F.log(
            (F.col("_c1").cast("double") * F.col("_n2").cast("double"))
            / (F.col("_c2").cast("double") * F.col("_n1").cast("double"))
        ),
        6,
    ).cast(d6)
    term = (p9 - q9) * lnr  # 1e-9-share units x 6dp nats
    scored = base.select(
        *group_cols,
        "bin",
        F.col("_c1").cast("long").alias("c1"),
        F.col("_c2").cast("long").alias("c2"),
        F.col("_n1").cast("long").alias("n1"),
        F.col("_n2").cast("long").alias("n2"),
        (p9.cast("double") / F.lit(1e9)).alias("share1"),
        (q9.cast("double") / F.lit(1e9)).alias("share2"),
        (term.cast("double") / F.lit(1e9)).alias("term"),
        term.alias("_tq"),
    )
    psi = F.sum("_tq").over(Window.partitionBy(*group_cols))
    return scored.select(
        *group_cols,
        F.col("bin").cast("long").alias("bin"),
        "c1",
        "c2",
        "n1",
        "n2",
        "share1",
        "share2",
        "term",
        (psi.cast("double") / F.lit(1e9)).alias("psi"),
    )


def mutual_information(
    df: DataFrame, x_col: Column, y_col: Column
) -> DataFrame:
    """Mutual information between two discrete columns — the standard
    dependence / feature-relevance statistic (how many nats does
    knowing X tell you about Y?), with both marginal entropies and the
    normalized coefficient MI / sqrt(Hx·Hy) for comparability across
    column pairs.

    Exactness: one (x, y) cell aggregation is the only corpus-sized
    pass; every log term quantizes as ``count × round(ln(·), 6)`` into
    DECIMAL (the PMI/bigram-LM rule), count products cast to double
    BEFORE multiplying (c_xy·N overflows int64 at corpus scale —
    LESSONS 11), and the final nats are one VARCHAR-transported decimal
    division. Cells, marginals, and totals are all derived from the
    cell table (window/agg over <= |X|·|Y| rows — no second scan).

    Output (one row): n_rows, n_cells, mi_nats, hx_nats, hy_nats,
    nmi (null when either entropy is 0 — a constant column carries no
    information to normalize by).
    """
    d6 = "decimal(18,6)"
    # the MI sum, Hx, and Hy all derive from the cell table; Catalyst
    # dedupes NO common subplans (the DSIR lesson), so without this
    # checkpoint the corpus would be scanned three times
    cells = (
        df.groupBy(x_col.alias("_x"), y_col.alias("_y"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=True)
    )
    wx = Window.partitionBy("_x")
    wy = Window.partitionBy("_y")
    # grand total via agg + broadcast join-back, NOT an unpartitioned
    # window: the cell table is bounded by |X|·|Y| but that bound is
    # data-cardinality-dependent (groupBy over high-NDV columns), so a
    # Window.partitionBy() here would be the one single-partition sort
    # whose input can grow with the data — the 1-row broadcast is the
    # same value with no such exchange
    tot = cells.agg(F.sum("_c").alias("_n"))
    base = cells.select(
        "_x",
        "_y",
        "_c",
        F.sum("_c").over(wx).alias("_cx"),
        F.sum("_c").over(wy).alias("_cy"),
    ).crossJoin(F.broadcast(tot))
    ln_ratio = F.log(
        (F.col("_c").cast("double") * F.col("_n").cast("double"))
        / (F.col("_cx").cast("double") * F.col("_cy").cast("double"))
    )
    mi_term = F.col("_c").cast(d6) * F.round(ln_ratio, 6).cast(d6)
    mi = base.agg(
        F.max("_n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(mi_term).alias("_mi_sum"),
    )

    def marginal_entropy(key: str) -> DataFrame:
        m = cells.groupBy(key).agg(F.sum("_c").alias("_cm"))
        mt = m.agg(F.sum("_cm").alias("_tm"))
        term = F.col("_cm").cast(d6) * F.round(
            -F.log(F.col("_cm").cast("double") / F.col("_tm").cast("double")),
            6,
        ).cast(d6)
        return (
            m.crossJoin(F.broadcast(mt))
            .select(term.alias("_t"))
            .agg(F.sum("_t").alias(f"_h{key}"))
        )

    hx = marginal_entropy("_x")
    hy = marginal_entropy("_y")
    j = mi.crossJoin(F.broadcast(hx)).crossJoin(F.broadcast(hy))
    n = F.col("n_rows").cast("double")
    mi_nats = F.col("_mi_sum").cast("double") / n
    hx_nats = F.col("_h_x").cast("double") / n
    hy_nats = F.col("_h_y").cast("double") / n
    return j.select(
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_cells").cast("long").alias("n_cells"),
        mi_nats.alias("mi_nats"),
        hx_nats.alias("hx_nats"),
        hy_nats.alias("hy_nats"),
        F.when(
            (hx_nats > 0) & (hy_nats > 0),
            mi_nats / F.sqrt(hx_nats * hy_nats),
        ).alias("nmi"),
    )


def welch_ttest(
    df: DataFrame,
    value_col: str,
    side_col: Column,
    group_cols: tuple[str, ...] = (),
    scale: int = 4,
) -> DataFrame:
    """Welch's unequal-variance t-test between two cohorts of one
    relation (``side_col`` boolean: True = sample 1) — the parametric
    drift/uplift companion to :func:`ks_two_sample` (KS asks "same
    distribution?", Welch asks "same MEAN, and how many standard errors
    apart?").

    Numerics: the six moments (n, Σx, Σx² per side) accumulate as exact
    decimal sums in ONE scan (conditional decimal aggregates — the
    agg_corr_regression construction split by cohort); t and the
    Welch-Satterthwaite degrees of freedom are then a fixed sequence of
    correctly-rounded double ops over those pinned moments. Variances
    need n >= 2 per side and a positive standard error; otherwise the
    statistics are null, never a 0/0.

    Output per group: n1, n2, mean1, mean2, t_stat, df_welch.
    """
    clash = {
        "n1", "n2", "_s1", "_s2", "_ss1", "_ss2",
        "mean1", "mean2", "t_stat", "df_welch",
    } & set(group_cols)
    if clash:
        raise ValueError(f"welch group_cols clash with output names: {sorted(clash)}")
    d4, d19 = f"decimal(18,{scale})", f"decimal(19,{scale})"
    x = F.col(value_col)
    one = F.when(side_col, 1).otherwise(0)
    m = df.groupBy(*group_cols).agg(
        F.sum(one).cast("long").alias("n1"),
        F.sum(1 - one).cast("long").alias("n2"),
        F.sum(F.when(side_col, x.cast(d4)).otherwise(F.lit(0).cast(d4)))
        .cast("double")
        .alias("_s1"),
        F.sum(F.when(~side_col, x.cast(d4)).otherwise(F.lit(0).cast(d4)))
        .cast("double")
        .alias("_s2"),
        F.sum(
            F.when(side_col, x.cast(d19) * x.cast(d19)).otherwise(
                F.lit(0).cast("decimal(38,8)")
            )
        )
        .cast("double")
        .alias("_ss1"),
        F.sum(
            F.when(~side_col, x.cast(d19) * x.cast(d19)).otherwise(
                F.lit(0).cast("decimal(38,8)")
            )
        )
        .cast("double")
        .alias("_ss2"),
    )
    n1, n2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    s1, s2 = F.col("_s1"), F.col("_s2")
    ss1, ss2 = F.col("_ss1"), F.col("_ss2")
    mean1, mean2 = s1 / n1, s2 / n2
    v1 = (n1 * ss1 - s1 * s1) / (n1 * (n1 - 1))
    v2 = (n2 * ss2 - s2 * s2) / (n2 * (n2 - 1))
    a, b = v1 / n1, v2 / n2
    se2 = a + b
    ok = (F.col("n1") >= 2) & (F.col("n2") >= 2)
    t = F.when(ok & (se2 > 0), (mean1 - mean2) / F.sqrt(se2))
    dfw = F.when(
        ok & (se2 > 0),
        (se2 * se2) / (a * a / (n1 - 1) + b * b / (n2 - 1)),
    )
    return m.select(
        *group_cols,
        "n1",
        "n2",
        F.when(F.col("n1") > 0, mean1).alias("mean1"),
        F.when(F.col("n2") > 0, mean2).alias("mean2"),
        t.alias("t_stat"),
        dfw.alias("df_welch"),
    )


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    side_col: Column,
    bucket_expr: Column | None = None,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic — the standard
    distribution-drift test between two cohorts of one relation
    (``side_col`` boolean: True = sample 1): D = sup_x |F1(x) - F2(x)|,
    evaluated at every pooled distinct value (where the sup of step
    ECDFs is attained). With ``group_cols`` it is the per-segment drift
    DASHBOARD: one independent KS per group from ONE scan.

    Exactness: at each distinct value the ECDF gap is the RATIONAL
    |c1*n2 - c2*n1| / (n1*n2); the numerator is an exact DECIMAL(38,0)
    integer (c*n products reach n² — the roc_auc overflow rule), so the
    argmax over values is pure integer comparison, engine-independent.
    The reported ``ks_d`` is two correctly-rounded casts and one
    division over pinned integers. A NULL group key is ONE regular
    group (null-safe joins — the window-partition convention psi_drift
    follows).

    Plan: one (group, value, c1, c2) aggregation (map-side combined),
    then the :func:`..operators.relational.global_prefix_sum` shape
    generalized to two parallel running sums over one bucketed window
    (partitioned per group) — no single-partition funnel. Ungrouped,
    the argmax is a 1-row TakeOrderedAndProject; grouped, it is a
    per-group max-gap aggregate joined back and tie-broken by the
    smallest attaining value — never a per-group global sort of the
    distinct-value relation.

    Output (one row per group): (*group_cols,) n1, n2, at_value (where
    the sup is attained), d_num (the exact scaled numerator, VARCHAR —
    the dataset_fingerprints decimal-transport rule), ks_d (double;
    null if either sample is empty — KS is undefined, not 0/0). NULL
    values are excluded from both samples before anything is counted.
    """
    clash = {
        "_c1", "_c2", "_vb", "_lc1", "_lc2", "_t1", "_t2", "_o1", "_o2",
        "_n1", "_n2", "_gap", "n1", "n2", "at_value", "d_num", "ks_d",
        value_col,
    } & set(group_cols)
    if clash:
        raise ValueError(f"ks group_cols clash with working names: {sorted(clash)}")
    if value_col in {"_c1", "_c2", "_vb", "_lc1", "_lc2"}:
        raise ValueError(f"ks value_col clashes with a working name: {value_col}")
    b = bucket_expr if bucket_expr is not None else F.floor(F.col(value_col))
    # KS is computed over NON-NULL values only: a NULL value has no
    # position on the real line, so it must not enter n1/n2 or the
    # ECDF (a NULL _vb bucket would also order differently across
    # engines — Spark nulls-first, DuckDB nulls-last)
    dv = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, value_col)
        .agg(
            F.sum(F.when(side_col, 1).otherwise(0)).alias("_c1"),
            F.sum(F.when(side_col, 0).otherwise(1)).alias("_c2"),
        )
        .withColumn("_vb", b)
    )
    w_local = (
        Window.partitionBy(*group_cols, "_vb")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = dv.select(
        *group_cols,
        value_col,
        "_vb",
        F.sum("_c1").over(w_local).alias("_lc1"),
        F.sum("_c2").over(w_local).alias("_lc2"),
    )
    totals = dv.groupBy(*group_cols, "_vb").agg(
        F.sum("_c1").alias("_t1"), F.sum("_c2").alias("_t2")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("_vb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy(*group_cols)
    offsets = totals.select(
        *group_cols,
        "_vb",
        F.coalesce(F.sum("_t1").over(w_off), F.lit(0)).alias("_o1"),
        F.coalesce(F.sum("_t2").over(w_off), F.lit(0)).alias("_o2"),
        F.sum("_t1").over(w_all).alias("_n1"),
        F.sum("_t2").over(w_all).alias("_n2"),
    )
    dec = "decimal(38,0)"
    cc1 = (F.col("_lc1") + F.col("_o1")).cast(dec)
    cc2 = (F.col("_lc2") + F.col("_o2")).cast(dec)
    gap = F.abs(
        cc1 * F.col("_n2").cast(dec) - cc2 * F.col("_n1").cast(dec)
    )
    scored = _join_nullsafe_keys(
        local, F.broadcast(offsets), [*group_cols, "_vb"], set(group_cols)
    ).select(
        *group_cols,
        F.col(value_col).alias("at_value"),
        F.col("_n1").cast("long").alias("n1"),
        F.col("_n2").cast("long").alias("n2"),
        gap.alias("_gap"),
    )
    if group_cols:
        # gm is groups-sized (one row per group) — broadcast it
        # explicitly so the max-gap join-back never SMJ-exchanges the
        # distinct-value relation (the r09 bench caught the null-safe
        # keys defeating AQE's runtime broadcast conversion here)
        gm = scored.groupBy(*group_cols).agg(F.max("_gap").alias("_gap"))
        top = (
            _join_nullsafe_keys(
                scored, F.broadcast(gm), [*group_cols, "_gap"], set(group_cols)
            )
            .groupBy(*group_cols)
            .agg(
                F.max("n1").alias("n1"),  # constant within a group
                F.max("n2").alias("n2"),
                F.min("at_value").alias("at_value"),  # deterministic tie
                F.max("_gap").alias("_gap"),
            )
        )
    else:
        top = scored.orderBy(
            F.col("_gap").desc(), F.col("at_value").asc()
        ).limit(1)
    ks = F.when(
        (F.col("n1") > 0) & (F.col("n2") > 0),
        F.col("_gap").cast("double")
        / (F.col("n1").cast("double") * F.col("n2").cast("double")),
    )
    return top.select(
        *group_cols,
        "n1",
        "n2",
        "at_value",
        F.col("_gap").cast("string").alias("d_num"),
        ks.alias("ks_d"),
    )


def wasserstein_two_sample(
    df: DataFrame,
    value_col: str,
    side_col: Column,
    bucket_expr: Column | None = None,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact two-sample Wasserstein-1 (earth-mover) distance between two
    cohorts of one relation over an INTEGER-valued column — the
    magnitude-aware companion to :func:`ks_two_sample`: KS reports the
    worst POINT gap between the ECDFs, W1 the AREA between them
    (``∫ |F1 - F2| dx``), so a small-but-everywhere shift that KS
    underweights shows up in full. With ``group_cols`` it is the
    per-segment drift DASHBOARD: one independent W1 per group from ONE
    scan (the psi_drift_by_* monitoring shape).

    Exactness: for step ECDFs over integer values the integral is the
    exact sum over consecutive pooled distinct values of
    ``|cc1·n2 - cc2·n1| · Δv``, every factor a DECIMAL(38,0) integer
    (cc·n reaches n² — the roc_auc overflow rule), so ``w1_num`` is an
    exact integer and W1 one correctly-rounded division by ``n1·n2``.
    The integer-type requirement is enforced loudly: on a float column
    the caller must choose the grid (e.g. ``floor(x)``) — silently
    differencing doubles would not be cross-engine exact.

    Plan: one (group, value, c1, c2) aggregation, then the bucketed
    parallel prefix (the ks_two_sample shape) extended with a
    previous-value carry: lag(v) inside each (group, bucket), and the
    first row of a bucket takes the previous non-empty bucket's max(v)
    from the broadcast per-group offsets table — no single-partition
    window anywhere corpus-sized. NULL values are excluded from both
    samples (no position on the line), matching KS; a NULL GROUP key is
    one regular group (null-safe joins, the window-partition
    convention).

    Output (one row per group): (*group_cols, n1, n2, w1_num — exact
    integer numerator, VARCHAR, the dataset_fingerprints
    decimal-transport rule — and w1 = w1_num / (n1·n2); null if either
    sample is empty — the distance is undefined, not 0).
    """
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    clash = {
        "_c1", "_c2", "_vb", "_lc1", "_lc2", "_pv", "_pvb", "_o1", "_o2",
        "_n1", "_n2", "_t1", "_t2", "_vmax", "_w", "n1", "n2", "w1_num",
        "w1", value_col,
    } & set(group_cols)
    if clash:
        raise ValueError(f"w1 group_cols clash with working names: {sorted(clash)}")
    if value_col in {"_c1", "_c2", "_vb", "_lc1", "_lc2", "_pv", "_pvb"}:
        raise ValueError(f"w1 value_col clashes with a working name: {value_col}")
    dt = df.schema[value_col].dataType
    if not isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        raise ValueError(
            f"wasserstein_two_sample needs an integer-typed value column "
            f"(got {dt.simpleString()}): pick the grid explicitly, e.g. "
            f"floor(x) cast to bigint"
        )
    b = (
        bucket_expr
        if bucket_expr is not None
        else F.floor(F.col(value_col) / F.lit(4096))
    )
    dv = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, value_col)
        .agg(
            F.sum(F.when(side_col, 1).otherwise(0)).alias("_c1"),
            F.sum(F.when(side_col, 0).otherwise(1)).alias("_c2"),
        )
        .withColumn("_vb", b)
    )
    w_local = (
        Window.partitionBy(*group_cols, "_vb")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_lag = Window.partitionBy(*group_cols, "_vb").orderBy(value_col)
    local = dv.select(
        *group_cols,
        value_col,
        "_vb",
        "_c1",
        "_c2",
        F.sum("_c1").over(w_local).alias("_lc1"),
        F.sum("_c2").over(w_local).alias("_lc2"),
        F.lag(value_col).over(w_lag).alias("_pv"),
    )
    totals = dv.groupBy(*group_cols, "_vb").agg(
        F.sum("_c1").alias("_t1"),
        F.sum("_c2").alias("_t2"),
        F.max(value_col).alias("_vmax"),
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("_vb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_prev = Window.partitionBy(*group_cols).orderBy("_vb")
    w_all = Window.partitionBy(*group_cols)
    offsets = totals.select(
        *group_cols,
        "_vb",
        F.coalesce(F.sum("_t1").over(w_off), F.lit(0)).alias("_o1"),
        F.coalesce(F.sum("_t2").over(w_off), F.lit(0)).alias("_o2"),
        F.lag("_vmax").over(w_prev).alias("_pvb"),
        F.sum("_t1").over(w_all).alias("_n1"),
        F.sum("_t2").over(w_all).alias("_n2"),
    )
    dec = "decimal(38,0)"
    joined = _join_nullsafe_keys(
        local, F.broadcast(offsets), [*group_cols, "_vb"], set(group_cols)
    )
    prev_v = F.coalesce(F.col("_pv"), F.col("_pvb"))
    # ECDF level on the half-open segment (prev_v, v): the cumulative
    # counts just BEFORE this value
    pc1 = (F.col("_lc1") + F.col("_o1") - F.col("_c1")).cast(dec)
    pc2 = (F.col("_lc2") + F.col("_o2") - F.col("_c2")).cast(dec)
    contrib = F.when(prev_v.isNull(), F.lit(0).cast(dec)).otherwise(
        F.abs(pc1 * F.col("_n2").cast(dec) - pc2 * F.col("_n1").cast(dec))
        * (F.col(value_col).cast(dec) - prev_v.cast(dec))
    )
    scored = joined.select(
        *group_cols, F.col("_c1"), F.col("_c2"), contrib.alias("_w")
    )
    agg = scored.groupBy(*group_cols).agg(
        F.coalesce(F.sum("_c1"), F.lit(0)).cast("long").alias("n1"),
        F.coalesce(F.sum("_c2"), F.lit(0)).cast("long").alias("n2"),
        F.coalesce(F.sum("_w"), F.lit(0).cast(dec)).cast(dec).alias("_num"),
    )
    w1 = F.when(
        (F.col("n1") > 0) & (F.col("n2") > 0),
        F.col("_num").cast("double")
        / (F.col("n1").cast("double") * F.col("n2").cast("double")),
    )
    return agg.select(
        *group_cols,
        "n1",
        "n2",
        F.col("_num").cast("string").alias("w1_num"),
        w1.alias("w1"),
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    side_col: Column,
    bucket_expr: Column | None = None,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Mann-Whitney / Wilcoxon rank-sum test between two cohorts of one
    relation — the NONPARAMETRIC location test completing the drift
    battery: Welch compares means (assumes rough normality), KS/W1
    compare whole distributions, Mann-Whitney asks "do draws from one
    cohort stochastically dominate the other?" robustly to outliers and
    any monotone transform. With ``group_cols`` it is the per-segment
    dashboard: one independent test per group from ONE scan.

    Exactness: ranks are midranks over the distinct-value table — for a
    value with t tied rows after ``cumbefore`` smaller rows, each tied
    row's midrank is ``cumbefore + (t+1)/2``, so DOUBLED rank sums are
    exact integers: ``2·R1 = Σ c1·(2·cumbefore + t + 1)`` accumulates in
    DECIMAL(38,0) (terms reach 3·N² — the roc_auc overflow rule), as
    does the tie-correction term ``Σ (t³ - t)`` (t³ caps at N³). U, R
    and the tie term cross engines as VARCHAR integers; the normal
    z-score (no continuity correction; ties-corrected variance
    ``n1·n2·(N³-N-T)/(12·N·(N-1))``) is a fixed sequence of
    correctly-rounded double ops (+,×,/,sqrt — never transcendental)
    over those pinned integers, the welch_ttest precedent.

    Plan: one (group, value, c1, c2) aggregation, the bucketed parallel
    prefix (ks_two_sample shape, partitioned per group) for cumbefore,
    one final per-group aggregate. NULL values are excluded from both
    samples; a NULL GROUP key is one regular group (null-safe joins,
    the window-partition convention).

    Output (one row per group): (*group_cols, n1, n2, r1_x2, u1_x2,
    u2_x2, tie_cubes — VARCHAR exact integers — and z: double; null if
    either sample is empty or every value is tied).
    """
    clash = {
        "_c1", "_c2", "_t", "_vb", "_lct", "_cb", "_tt", "_off", "_r",
        "_k", "n1", "n2", "r1_x2", "u1_x2", "u2_x2", "tie_cubes", "z",
        value_col,
    } & set(group_cols)
    if clash:
        raise ValueError(f"mw group_cols clash with working names: {sorted(clash)}")
    if value_col in {"_c1", "_c2", "_t", "_vb", "_lct", "_cb"}:
        raise ValueError(f"mw value_col clashes with a working name: {value_col}")
    b = bucket_expr if bucket_expr is not None else F.floor(F.col(value_col))
    dv = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, value_col)
        .agg(
            F.sum(F.when(side_col, 1).otherwise(0)).alias("_c1"),
            F.sum(F.when(side_col, 0).otherwise(1)).alias("_c2"),
        )
        .withColumn("_vb", b)
    )
    w_local = (
        Window.partitionBy(*group_cols, "_vb")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = F.col("_c1") + F.col("_c2")
    local = dv.select(
        *group_cols,
        value_col,
        "_vb",
        "_c1",
        "_c2",
        t.alias("_t"),
        F.sum(t).over(w_local).alias("_lct"),
    )
    totals = dv.groupBy(*group_cols, "_vb").agg(F.sum(t).alias("_tt"))
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("_vb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *group_cols,
        "_vb",
        F.coalesce(F.sum("_tt").over(w_off), F.lit(0)).alias("_off"),
    )
    dec = "decimal(38,0)"
    joined = _join_nullsafe_keys(
        local, F.broadcast(offsets), [*group_cols, "_vb"], set(group_cols)
    )
    cumbefore = (F.col("_lct") + F.col("_off") - F.col("_t")).cast(dec)
    r1x2_term = F.col("_c1").cast(dec) * (
        F.lit(2).cast(dec) * cumbefore + F.col("_t").cast(dec) + F.lit(1).cast(dec)
    )
    tie_term = (
        F.col("_t").cast(dec) * F.col("_t").cast(dec) * F.col("_t").cast(dec)
        - F.col("_t").cast(dec)
    )
    agg = joined.select(
        *group_cols,
        F.col("_c1"),
        F.col("_c2"),
        r1x2_term.alias("_r"),
        tie_term.alias("_k"),
    ).groupBy(*group_cols).agg(
        F.coalesce(F.sum("_c1"), F.lit(0)).cast("long").alias("n1"),
        F.coalesce(F.sum("_c2"), F.lit(0)).cast("long").alias("n2"),
        F.coalesce(F.sum("_r"), F.lit(0).cast(dec)).cast(dec).alias("_r1x2"),
        F.coalesce(F.sum("_k"), F.lit(0).cast(dec)).cast(dec).alias("_ties"),
    )
    n1d, n2d = F.col("n1").cast(dec), F.col("n2").cast(dec)
    nd = n1d + n2d
    u1x2 = F.col("_r1x2") - n1d * (n1d + F.lit(1).cast(dec))
    u2x2 = F.lit(2).cast(dec) * n1d * n2d - u1x2
    var_num = nd * nd * nd - nd - F.col("_ties")  # N^3 - N - T, exact
    scored = agg.select(
        *group_cols,
        "n1",
        "n2",
        F.col("_r1x2").alias("_r1x2"),
        u1x2.alias("_u1x2"),
        u2x2.alias("_u2x2"),
        F.col("_ties").alias("_tiec"),
        var_num.alias("_vn"),
    )
    n1f, n2f = F.col("n1").cast("double"), F.col("n2").cast("double")
    nf = n1f + n2f
    sigma2 = (
        n1f * n2f * F.col("_vn").cast("double") / (F.lit(12.0) * nf * (nf - 1))
    )
    num2 = (F.col("_u1x2") - n1d * n2d).cast("double")  # 2(U1 - mu)
    z = F.when(
        (F.col("n1") > 0) & (F.col("n2") > 0) & (F.col("_vn") > 0),
        num2 / (F.lit(2.0) * F.sqrt(sigma2)),
    )
    return scored.select(
        *group_cols,
        "n1",
        "n2",
        F.col("_r1x2").cast("string").alias("r1_x2"),
        F.col("_u1x2").cast("string").alias("u1_x2"),
        F.col("_u2x2").cast("string").alias("u2_x2"),
        F.col("_tiec").cast("string").alias("tie_cubes"),
        z.alias("z"),
    )


def isotonic_fit_bins(
    df: DataFrame,
    bin_col: Column,
    y_col: Column,
    group_cols: tuple[str, ...] = (),
    decreasing: bool = False,
) -> DataFrame:
    """Isotonic (monotone non-decreasing) regression over binned data —
    pool-adjacent-violators calibration, the standard way to turn a
    monotone-ish score into calibrated probabilities without assuming
    a parametric shape (Platt scaling's nonparametric rival). With
    ``group_cols`` it is the per-segment calibration DASHBOARD: one
    independent PAV fit per group from ONE scan (the psi_drift_by_*
    monitoring shape). ``decreasing=True`` fits the ANTITONIC
    (non-increasing) regression instead — the right shape when the
    score is inversely related to the label (e.g. an error score vs a
    pass label); same plan, min/max swapped per the dual
    characterization below.

    PAV is textbook-sequential, but over BINS it has an exact parallel
    formulation — the max-min characterization of the isotonic fit:
    ``fit(i) = max_{j<=i} min_{k>=i} avg(y over bins j..k)`` with
    ``avg(j,k) = (S_k - S_{j-1}) / (N_k - N_{j-1})`` from prefix sums;
    the antitonic dual is ``fit(i) = min_{j<=i} max_{k>=i} avg(j..k)``
    (apply the max-min form to -y and negate: min/max swap).
    Engine plan: one corpus scan to the <= groups x B row (group, bin,
    n, s) table, per-group prefix sums, the per-group B² (j,k) pair
    grid, a per-(group, j) running min from the right, and a
    per-(group, i) max — every post-scan stage is bin-table-sized,
    never corpus-sized.

    Cross-engine exactness: n and s accumulate as exact integers
    (``y_col`` must be integer-valued — 0/1 labels in the calibration
    use); every candidate average is ONE correctly-rounded IEEE
    division of exact integers, and min/max over such doubles picks
    identical values in every engine (ties in the double domain pick
    equal doubles — the selected VALUE is unambiguous even if the
    attaining (j,k) is not). No transcendentals anywhere.

    Output per non-empty (group, bin): (*group_cols, bin, n, s,
    mean_raw, fitted) — ``fitted`` non-decreasing (``decreasing=True``:
    non-increasing) in bin within each group and matching
    pool-adjacent-violators exactly (the max-min form is the PAV
    solution). A NULL group key is ONE regular group (null-safe join
    keys, the window-partition convention).
    """
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    clash = {
        "bin", "n", "s", "_cn", "_cs", "_j", "_k", "_nj", "_sj", "_nk",
        "_sk", "_avg", "_i", "_m", "mean_raw", "fitted",
    } & set(group_cols)
    if clash:
        raise ValueError(
            f"isotonic group_cols clash with working names: {sorted(clash)}"
        )
    ydt = df.select(y_col.alias("_y")).schema["_y"].dataType
    if not isinstance(ydt, (ByteType, ShortType, IntegerType, LongType)):
        raise ValueError(
            f"isotonic_fit_bins needs an integer-valued y (0/1 labels or "
            f"integer targets), got {ydt.simpleString()} — quantize first"
        )
    binned = df.groupBy(*group_cols, bin_col.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"), F.sum(y_col).cast("long").alias("s")
    )
    # prefix sums over the tiny bin table: a per-group (or, ungrouped,
    # single-partition) window is fine HERE (<= B rows per group),
    # never on the corpus
    w_pfx = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pfx = binned.select(
        *group_cols,
        "bin",
        "n",
        "s",
        F.sum("n").over(w_pfx).alias("_cn"),
        F.sum("s").over(w_pfx).alias("_cs"),
    )
    lo = pfx.select(
        *group_cols,
        F.col("bin").alias("_j"),
        (F.col("_cn") - F.col("n")).alias("_nj"),  # N_{j-1}
        (F.col("_cs") - F.col("s")).alias("_sj"),  # S_{j-1}
    )
    hi = pfx.select(
        *[F.col(g).alias(f"_rg_{g}") for g in group_cols],
        F.col("bin").alias("_k"),
        F.col("_cn").alias("_nk"),
        F.col("_cs").alias("_sk"),
    )
    cond = F.col("_j") <= F.col("_k")
    for g in group_cols:
        # null-safe: a NULL group key is one regular group (the
        # window-partition convention — see _join_nullsafe_keys)
        cond = F.col(g).eqNullSafe(F.col(f"_rg_{g}")) & cond
    grid = lo.join(hi, cond).select(
        *group_cols,
        "_j",
        "_k",
        (
            (F.col("_sk") - F.col("_sj")).cast("double")
            / (F.col("_nk") - F.col("_nj")).cast("double")
        ).alias("_avg"),
    )
    # m(j, i) = min over k >= i of avg(j, k): running min from the right
    # (decreasing fit: the dual — running MAX from the right, then min)
    inner, outer = (F.max, F.min) if decreasing else (F.min, F.max)
    w_right = (
        Window.partitionBy(*group_cols, "_j")
        .orderBy(F.col("_k").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    m = grid.select(
        *group_cols,
        "_j",
        F.col("_k").alias("_i"),
        inner("_avg").over(w_right).alias("_m"),
    )
    fit = m.groupBy(*group_cols, "_i").agg(outer("_m").alias("fitted"))
    fit2 = fit.select(
        *[F.col(g).alias(f"_fg_{g}") for g in group_cols], "_i", "fitted"
    )
    cond2 = binned["bin"] == fit2["_i"]
    for g in group_cols:
        cond2 = binned[g].eqNullSafe(fit2[f"_fg_{g}"]) & cond2
    return (
        binned.join(F.broadcast(fit2), cond2)
        .select(
            *group_cols,
            F.col("bin").cast("long").alias("bin"),
            "n",
            "s",
            (F.col("s").cast("double") / F.col("n").cast("double")).alias(
                "mean_raw"
            ),
            "fitted",
        )
    )


def target_encode(
    df: DataFrame,
    category_col: str,
    target_col: str,
    smoothing: int = 10,
    scale: int = 4,
) -> DataFrame:
    """Smoothed target (mean) encoding of a categorical column — the
    feature-engineering standby for high-cardinality categories:
    ``enc = (sum_cat + m * global_mean) / (n_cat + m)`` — a rare
    category shrinks toward the global mean (an empirical-Bayes prior
    with pseudo-count ``m = smoothing``), a frequent one keeps its own
    mean; m = 0 degenerates to the raw per-category mean.

    Determinism: both sums are exact decimal reductions; the global
    mean is ONE correctly-rounded division, the encoding ONE fixed
    float expression over exactly-derived operands — no iterated float
    arithmetic anywhere (the category and global aggregates the
    encoding mixes are the same numbers in any engine, partitioning,
    or run).

    Plan: one map-side-combined aggregation per level (category /
    global), the one-row global broadcast onto the category table.
    Never a join back to raw rows — at 100 TB the output is
    category-cardinality-sized. Output: ``(category_col, n, cat_mean,
    encoded)``.
    """
    if smoothing < 0:
        raise ValueError(f"smoothing must be >= 0, got {smoothing}")
    dec = F.col(target_col).cast(f"decimal(18,{scale})")
    per_cat = df.groupBy(category_col).agg(
        F.count(F.lit(1)).alias("_nc"), F.sum(dec).alias("_sc")
    )
    glob = df.agg(
        F.count(F.lit(1)).alias("_n"), F.sum(dec).alias("_s")
    )
    gm = F.col("_s").cast("double") / F.col("_n").cast("double")
    return per_cat.crossJoin(F.broadcast(glob)).select(
        category_col,
        F.col("_nc").cast("bigint").alias("n"),
        (F.col("_sc").cast("double") / F.col("_nc").cast("double")).alias(
            "cat_mean"
        ),
        (
            (F.col("_sc").cast("double") + F.lit(float(smoothing)) * gm)
            / (F.col("_nc").cast("double") + F.lit(float(smoothing)))
        ).alias("encoded"),
    )


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: tuple[str, ...] = (),
    x_bucket: Column | None = None,
    y_bucket: Column | None = None,
) -> DataFrame:
    """Spearman rank correlation per group — Pearson over tie-averaged
    ranks, the monotone-association metric for comparing two scores or
    rankers without assuming linearity. Builtin ``corr()`` over raw
    values is BOTH the wrong statistic (Pearson) and partitioning-
    dependent (double accumulation); this is neither.

    Exactness: tie-averaged ranks are half-integers, carried as
    2x-scaled integers (the ROC-AUC trick); all five moments are exact
    ``decimal(38,0)`` sums of integer products (2x scaling cancels in
    the correlation — it is scale/shift invariant); the final
    expression is one fixed float formula whose sqrt is correctly
    rounded. Bit-identical in any engine.

    Plan: two :func:`grouped_value_cum` passes (one per variable,
    distinct-value sized), two joins of rank tables back onto the rows
    by value, one moment aggregation. No global sort, no per-row
    window.

    Output: ``(*group_cols, n, spearman)``; NULL when either variable
    is constant (zero rank variance).
    """
    g = list(group_cols)

    def rank2(col: str, bucket: Column | None, out: str) -> DataFrame:
        cum = grouped_value_cum(df.select(*g, col), g, col, bucket)
        m = df.groupBy(*g, col).agg(F.count(F.lit(1)).alias("_m"))
        return cum.join(m, [*g, col]).select(
            *g,
            col,
            (F.lit(2) * F.col("cc") - F.col("_m") + F.lit(1)).alias(out),
        )
    rx = rank2(x_col, x_bucket, "_rx2")
    ry = rank2(y_col, y_bucket, "_ry2")
    rows = (
        df.select(*g, x_col, y_col)
        .join(rx, [*g, x_col])
        .join(ry, [*g, y_col])
    )
    d38 = "decimal(38,0)"
    x2, y2 = F.col("_rx2").cast(d38), F.col("_ry2").cast(d38)
    agg = rows.groupBy(*g).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x2).alias("_sx"),
        F.sum(y2).alias("_sy"),
        F.sum(x2 * x2).alias("_sxx"),
        F.sum(y2 * y2).alias("_syy"),
        F.sum(x2 * y2).alias("_sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    return agg.select(
        *g,
        "n",
        F.when(
            (varx > 0) & (vary > 0),
            (n * sxy - sx * sy) / F.sqrt(varx * vary),
        ).alias("spearman"),
    )


def classification_report(
    df: DataFrame, true_col: str, pred_col: str
) -> DataFrame:
    """Per-class precision / recall / F1 plus support from a (truth,
    prediction) table — the metric sheet for grading any categorical
    screen (language ID, quality tiers, nearest-centroid labels).
    Classes are the union of truth and prediction labels, so a class
    the model never predicts (or invents) still reports.

    Exactness: tp / fp / fn are integer counts from ONE two-column
    aggregation; each metric is a single correctly-rounded division
    (F1 from the exact integer identity ``2tp / (2tp + fp + fn)`` —
    never the float harmonic mean of two already-rounded rates).
    Degenerate denominators yield NULL, not 0.0 (a class with no
    predictions has UNDEFINED precision — collapsing it to 0 poisons
    macro averages).

    Plan: one (truth, prediction) pair aggregation (map-side combined;
    the pair table is |classes|^2-bounded), then class-level sums over
    that tiny table. Output: ``(label, support, tp, fp, fn, precision,
    recall, f1)``.
    """
    pairs = df.groupBy(
        F.col(true_col).alias("_t"), F.col(pred_col).alias("_p")
    ).agg(F.count(F.lit(1)).alias("_n"))
    tp = pairs.filter(F.col("_t") == F.col("_p")).select(
        F.col("_t").alias("label"), F.col("_n").alias("tp")
    )
    truth = pairs.groupBy(F.col("_t").alias("label")).agg(
        F.sum("_n").alias("support")
    )
    preds = pairs.groupBy(F.col("_p").alias("label")).agg(
        F.sum("_n").alias("n_pred")
    )
    rep = (
        truth.join(preds, "label", "full_outer")
        .join(tp, "label", "left")
        .select(
            "label",
            F.coalesce("support", F.lit(0)).cast("bigint").alias("support"),
            F.coalesce("tp", F.lit(0)).cast("bigint").alias("tp"),
            (F.coalesce("n_pred", F.lit(0)) - F.coalesce("tp", F.lit(0)))
            .cast("bigint")
            .alias("fp"),
            (F.coalesce("support", F.lit(0)) - F.coalesce("tp", F.lit(0)))
            .cast("bigint")
            .alias("fn"),
        )
    )
    tpn = F.col("tp").cast("double")
    return rep.select(
        "label",
        "support",
        "tp",
        "fp",
        "fn",
        F.when(
            F.col("tp") + F.col("fp") > 0,
            tpn / (F.col("tp") + F.col("fp")).cast("double"),
        ).alias("precision"),
        F.when(
            F.col("support") > 0, tpn / F.col("support").cast("double")
        ).alias("recall"),
        F.when(
            F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn") > 0,
            (F.lit(2.0) * tpn)
            / (F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn")).cast(
                "double"
            ),
        ).alias("f1"),
    )


def classification_summary(
    df: DataFrame, true_col: str, pred_col: str
) -> DataFrame:
    """One-row roll-up of :func:`classification_report`: overall
    accuracy (= micro-F1 for single-label classification) plus
    MACRO-averaged precision / recall / F1 — averaged over classes
    with DEFINED metrics only (classes whose denominator is zero are
    excluded, not imputed as 0 — the NULL-handling contract of the
    per-class report carried through the mean; both engines then
    average the identical value set).

    Determinism: accuracy is one division of exact integers; each
    macro mean is an exact decimal sum of per-class single-division
    doubles divided by the defined-class count. Output: (n_rows,
    n_classes, accuracy, macro_precision, macro_recall, macro_f1).
    """
    rep = classification_report(df, true_col, pred_col)
    dec = "decimal(18,6)"
    return rep.agg(
        F.sum("support").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        (
            F.sum("tp").cast("double") / F.sum("support").cast("double")
        ).alias("accuracy"),
        (
            F.sum(F.round(F.col("precision"), 6).cast(dec)).cast("double")
            / F.count("precision").cast("double")
        ).alias("macro_precision"),
        (
            F.sum(F.round(F.col("recall"), 6).cast(dec)).cast("double")
            / F.count("recall").cast("double")
        ).alias("macro_recall"),
        (
            F.sum(F.round(F.col("f1"), 6).cast(dec)).cast("double")
            / F.count("f1").cast("double")
        ).alias("macro_f1"),
    )


def brier_decomposition(
    df: DataFrame,
    p_num: Column,
    p_den: Column,
    label: Column,
    n_bins: int = 10,
) -> DataFrame:
    """Murphy decomposition of the Brier score — the forecast-quality
    triad behind every reliability diagram: ``BS = REL − RES + UNC``
    (+ a within-bin residual when forecasts vary inside a bin), where
    reliability is the calibration error (lower better), resolution is
    how far bin outcome rates sit from the base rate (higher better),
    and uncertainty ``ō(1−ō)`` is the data's intrinsic difficulty.
    Completes the evaluation family: roc_auc ranks, calibration_curve
    plots, this SCORES the probabilities themselves.

    Exactness contract: the forecast enters as an exact RATIONAL —
    integer numerator ``p_num`` over a constant integer denominator
    ``p_den`` (e.g. rank_score's (rk−1)/(N−1)) — so the bin index is
    pure integer arithmetic (``(n_bins·p_num) div p_den``, clamped),
    the Brier sum-of-squared-errors is an exact DECIMAL(38,0) integer
    ``Σ (p_num − p_den·y)²`` (VARCHAR-transported), and the per-bin
    REL/RES terms are fixed sequences of correctly-rounded double ops
    over pinned integer aggregates, quantized to 9dp decimals before
    the ≤ n_bins-row sum (the chi-square order-independence rule).
    ``label`` must be 0/1 non-null; ``0 <= p_num <= p_den`` with
    ``p_den`` constant across rows and >= 1 — the caller's contract.

    One (bin) hash aggregation over the corpus; everything after runs
    on ≤ n_bins rows. Output (one row): n, base_rate, sse_units
    (exact, VARCHAR), brier, reliability, resolution, uncertainty,
    residual (= brier − reliability + resolution − uncertainty, the
    within-bin variance the binned decomposition cannot see).
    """
    if n_bins < 1:
        raise ValueError(f"brier_decomposition: n_bins must be >= 1 ({n_bins=})")
    dec0 = "decimal(38,0)"
    d9 = "decimal(38,9)"
    y = label.cast("bigint")
    base = df.select(
        p_num.cast("bigint").alias("_pn"),
        p_den.cast("bigint").alias("_pd"),
        y.alias("_y"),
    )
    err = (F.col("_pn") - F.col("_pd") * F.col("_y")).cast(dec0)
    per = base.select(
        F.least(
            F.expr(f"({n_bins} * _pn) div _pd"), F.lit(n_bins - 1)
        ).alias("_b"),
        "_pn",
        "_pd",
        "_y",
        (err * err).alias("_e2"),
    ).groupBy("_b").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_y").cast("long").alias("_yk"),
        F.sum(F.col("_pn").cast(dec0)).cast(dec0).alias("_pk"),
        F.sum("_e2").cast(dec0).alias("_sk"),
        F.max("_pd").alias("_d"),
    )
    g = per.agg(
        F.sum("_n").cast("long").alias("_nn"),
        F.sum("_yk").cast("long").alias("_yy"),
        F.sum("_sk").cast(dec0).alias("_sse"),
        F.max("_d").alias("_dd"),
    )
    j = per.crossJoin(F.broadcast(g))
    nf = F.col("_n").cast("double")
    pbar = F.col("_pk").cast("double") / (nf * F.col("_dd").cast("double"))
    obark = F.col("_yk").cast("double") / nf
    obar = F.col("_yy").cast("double") / F.col("_nn").cast("double")
    rel_t = nf * (pbar - obark) * (pbar - obark)
    res_t = nf * (obark - obar) * (obark - obar)
    terms = j.select(
        "_nn",
        "_yy",
        "_sse",
        "_dd",
        F.round(rel_t, 9).cast(d9).alias("_rt"),
        F.round(res_t, 9).cast(d9).alias("_st"),
    )
    out = terms.groupBy().agg(
        F.max("_nn").alias("n"),
        F.max("_yy").alias("_y_tot"),
        F.max("_sse").alias("_sse1"),
        F.max("_dd").alias("_d1"),
        F.sum("_rt").cast(d9).alias("_rel"),
        F.sum("_st").cast(d9).alias("_res"),
    )
    nn = F.col("n").cast("double")
    dd = F.col("_d1").cast("double")
    ob = F.col("_y_tot").cast("double") / nn
    brier = F.col("_sse1").cast("double") / nn / dd / dd
    rel = F.col("_rel").cast("double") / nn
    res = F.col("_res").cast("double") / nn
    unc = ob * (F.lit(1.0) - ob)
    return out.select(
        F.col("n"),
        ob.alias("base_rate"),
        F.col("_sse1").cast("string").alias("sse_units"),
        brier.alias("brier"),
        rel.alias("reliability"),
        res.alias("resolution"),
        unc.alias("uncertainty"),
        (brier - (rel - res + unc)).alias("residual"),
    )


def calibration_curve(
    df: DataFrame,
    score: Column,
    label: Column,
    n_bins: int = 10,
    tiebreak: str | None = None,
) -> DataFrame:
    """Reliability diagram + expected calibration error (ECE) — the
    evaluation companion to ``roc_auc`` (ranking quality) and
    ``classification_report`` (thresholded quality): does a score of
    0.8 actually mean 80% positives? ``score`` must already lie in
    [0, 1] (use ``rank_score`` to turn any monotone signal into one).

    Numerics (engine-exact end to end): the bin index is integer
    ``floor(score * n_bins)`` clamped to the top bin; per-bin mean
    predicted score is the exact decimal sum of 6dp-rounded scores
    over the count (the BM25 rule — a double sum would be
    order-dependent); observed positive rate is one integer/integer
    division; the |gap| and the ECE (bin-weight x gap, summed over
    <= n_bins rows in a single-partition window, bounded by n_bins)
    are shared double expressions over those pinned values.

    One hash aggregation on the bin index; everything after runs on
    <= n_bins rows.
    """
    if n_bins < 1:
        raise ValueError(f"calibration_curve: n_bins must be >= 1 ({n_bins=})")
    s6 = F.round(score.cast("double"), 6).cast("decimal(18,6)")
    b = F.least(
        F.floor(score.cast("double") * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    per = (
        df.select(
            b.alias("bin"),
            s6.alias("_s6"),
            label.cast("boolean").alias("_y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_y").cast("bigint")).alias("n_pos"),
            F.sum("_s6").alias("_ssum"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            (F.col("_ssum").cast("double") / F.col("n")).alias("mean_score"),
            (F.col("n_pos").cast("double") / F.col("n")).alias("pos_rate"),
        )
    )
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    gap = F.abs(F.col("pos_rate") - F.col("mean_score"))
    # the ECE sum runs in the DECIMAL domain: a double window-sum
    # accumulates in engine-specific order and diverged in the last bit
    # (0.2684810039999999 vs 0.268481004 — caught by the oracle); the
    # per-bin gap doubles are engine-identical, so their 12dp decimal
    # quantization is too, and decimal addition is order-free
    term = F.round(gap, 12).cast("decimal(28,12)") * F.col("n")
    total = F.sum("n").over(w)
    return per.select(
        F.col("bin").cast("long").alias("bin"),
        "n",
        "n_pos",
        "mean_score",
        "pos_rate",
        gap.alias("abs_gap"),
        F.sum(term).over(w).alias("_wg"),
        total.alias("_tot"),
    ).select(
        "bin",
        "n",
        "n_pos",
        "mean_score",
        "pos_rate",
        "abs_gap",
        (F.col("_wg").cast("double") / F.col("_tot")).alias("ece"),
    )


def rank_score(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    out_col: str = "score",
    bucket_fn: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Normalize any monotone signal into a [0, 1] score by global rank:
    score = (rank - 1) / (N - 1) with a deterministic (value, tiebreak)
    total order (1 row -> score 0).

    The rank is the bucketed parallel prefix-sum
    (relational.global_prefix_sum over a running count of ones keyed by
    the composite (value, tiebreak) struct) — never a bare
    Window.orderBy row_number funneling the corpus through one task —
    and N - 1 broadcasts as a 1-row cross join. ``bucket_fn`` maps the
    VALUE column to its order-consistent prefix bucket; the default
    ``floor(value/64)`` suits integer-ish signals (doc lengths, counts)
    — pass one matched to the value range otherwise (a [0, 1] signal
    would otherwise degrade to one bucket: still correct, not
    parallel).
    """
    from .relational import global_prefix_sum

    b = (
        bucket_fn(F.col(value_col))
        if bucket_fn is not None
        else F.floor(F.col(value_col).cast("double") / F.lit(64.0))
    )
    ranked = global_prefix_sum(
        df.withColumn("_one", F.lit(1)).withColumn(
            "_ok", F.struct(F.col(value_col), F.col(tiebreak_col))
        ),
        "_ok",
        "_one",
        out_col="_r",
        bucket_expr=b,
    )
    tot = df.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn(
            out_col,
            F.when(F.col("_n") == 1, F.lit(0.0)).otherwise(
                (F.col("_r") - 1).cast("double")
                / (F.col("_n") - 1).cast("double")
            ),
        )
        .drop("_one", "_ok", "_r", "_n")
    )


def weight_ess(
    df: DataFrame,
    weight_col: str,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Effective sample size of importance weights — the health check
    every importance-sampling pipeline (DSIR selection, temperature
    mixing, A-ES draws) needs before trusting its weights:
    ``ESS = (Σw)² / Σw²`` collapses toward 1 when a few documents
    dominate the weight mass (the selection degenerates to those few)
    and approaches n for uniform weights.

    Contract: ``weight_col`` must already be 6dp-QUANTIZED non-negative
    doubles (the dsir round(exp(lw), 6) convention — raw exp is
    engine-divergent). Weights convert to exact 1e-6 integer units
    (recovering the quantized integer each engine shares), both sums
    accumulate in DECIMAL(38,0), and the ratio is a fixed
    correctly-rounded double expression over the two pinned sums (the
    unit scale cancels in (Σw)²/Σw²). Headroom: Σw_units < ~1e19 —
    far above any real weight mass at 6dp.

    One aggregation; output per group: n, sum_w_units, sum_w2_units
    (VARCHAR exact), ess (double; null on empty/zero mass), ess_ratio
    (= ess / n).
    """
    clash = {
        "n", "sum_w_units", "sum_w2_units", "ess", "ess_ratio", "_wu",
    } & set(group_cols)
    if clash:
        raise ValueError(f"ess group_cols clash with working names: {sorted(clash)}")
    dec = "decimal(38,0)"
    wu = F.round(F.col(weight_col) * F.lit(1e6), 0).cast("long")
    base = df.select(*group_cols, wu.alias("_wu"))
    g = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.col("_wu").cast(dec)), F.lit(0).cast(dec))
        .cast(dec)
        .alias("_s"),
        F.coalesce(
            F.sum(F.col("_wu").cast(dec) * F.col("_wu").cast(dec)),
            F.lit(0).cast(dec),
        )
        .cast(dec)
        .alias("_q"),
    )
    sd, qd = F.col("_s").cast("double"), F.col("_q").cast("double")
    ess = F.when(F.col("_q") > 0, sd * sd / qd)
    return g.select(
        *group_cols,
        "n",
        F.col("_s").cast("string").alias("sum_w_units"),
        F.col("_q").cast("string").alias("sum_w2_units"),
        ess.alias("ess"),
        (ess / F.col("n").cast("double")).alias("ess_ratio"),
    )


def blocking_quality(
    candidates: DataFrame,
    true_pairs: DataFrame,
    n_records: int,
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """Blocking-strategy evaluation — the measurement step that closes
    the linkage pipeline (block → score → EM → fit → assign →
    EVALUATE): pair completeness (recall of true duplicate pairs inside
    the candidate set) versus reduction ratio (fraction of the n·(n-1)/2
    all-pairs space the blocker pruned). A blocker is only as good as
    this trade-off; window/band knobs should be tuned against it.

    Pairs are canonicalized to (min, max) id order on BOTH inputs, and
    deduplicated, so any blocker's output shape qualifies. All counts
    are exact integers (the pair-space total in DECIMAL(38,0) — n²
    passes int64 at corpus scale); the two rates are single
    correctly-rounded divisions.

    Output (one row): n_records, n_candidates, n_true, n_found,
    pair_completeness, reduction_ratio.
    """
    if n_records < 2:
        raise ValueError(f"n_records must be >= 2, got {n_records}")

    def canon(df: DataFrame) -> DataFrame:
        a, b = F.col(a_col), F.col(b_col)
        return df.select(
            F.least(a, b).alias("_pa"), F.greatest(a, b).alias("_pb")
        ).distinct()

    cand = canon(candidates)
    true = canon(true_pairs)
    found = true.join(cand, ["_pa", "_pb"], "left_semi")
    counts = (
        cand.agg(F.count(F.lit(1)).alias("n_candidates"))
        .crossJoin(true.agg(F.count(F.lit(1)).alias("n_true")))
        .crossJoin(found.agg(F.count(F.lit(1)).alias("n_found")))
    )
    dec = "decimal(38,0)"
    # exact in Python (n*(n-1) is even), transported as a string literal
    # so the pair-space total survives past int64
    total_pairs = F.lit(str(n_records * (n_records - 1) // 2)).cast(dec)
    return counts.select(
        F.lit(n_records).cast("long").alias("n_records"),
        F.col("n_candidates").cast("long").alias("n_candidates"),
        F.col("n_true").cast("long").alias("n_true"),
        F.col("n_found").cast("long").alias("n_found"),
        F.when(
            F.col("n_true") > 0,
            F.col("n_found").cast("double") / F.col("n_true").cast("double"),
        ).alias("pair_completeness"),
        (
            F.lit(1.0)
            - F.col("n_candidates").cast("double") / total_pairs.cast("double")
        ).alias("reduction_ratio"),
    )


def kendall_tau_sampled(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    k: int = 1500,
    assume_unique_key: bool = False,
) -> DataFrame:
    """Kendall's tau-b rank correlation over a FIXED-SIZE deterministic
    sample — completing the correlation family (Pearson via exact
    moments, Spearman via midranks, Kendall via pair concordance, the
    outlier-robust ordinal measure). Exact tau needs all n(n-1)/2 pairs
    — quadratic and impossible at corpus scale — so the established
    sampled-exact pattern (triangle_count_sampled) applies: the k rows
    with the SMALLEST md5(key) form a uniform, rerun-stable,
    coordination-free sample (top-k via per-partition heaps —
    TakeOrderedAndProject, never a global sort), and the pair stage is
    k²/2 — CONSTANT in corpus size, exact within the sample.

    Exactness: concordant/discordant/tie counts are exact integers from
    sign comparisons (x/y compared natively — decimals exact); tau-b =
    (C - D) / sqrt((n0 - n1)(n0 - n2)) with n0 = k(k-1)/2, n1/n2 the
    x/y tie-pair counts, is a fixed correctly-rounded double sequence
    over those pinned integers (sqrt, never transcendental). The
    identity C + D + tx + ty + txy = n0 holds by construction.

    Key contract (LOUD): the sample law and the ``_ha < _hb`` pair
    predicate both assume ``key_col`` is unique — duplicate keys share
    one md5, which would make the top-k boundary nondeterministic (and
    the two references to the limited plan could disagree within one
    run). Duplicates are therefore COLLAPSED deterministically before
    the top-k: each key keeps its lexicographically smallest (x, y)
    pair (min over struct — engine-independent), so the sampled
    multiset is unique whatever the input duplication. On a unique key
    the collapse is the identity; the one extra map-side-combined
    exchange it costs is the price of a rerun-stable sample. A caller
    whose key is unique BY CONSTRUCTION (e.g. the output of a groupBy
    on that key) passes ``assume_unique_key=True`` to skip the
    collapse and keep the zero-exchange TakeOrderedAndProject sample —
    asserting uniqueness is then the caller's contract.

    Output (one row): n, n_pairs, concordant, discordant, ties_x,
    ties_y, ties_xy, tau_b (null when either margin is all-ties).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    proj = df.select(
        F.md5(F.col(key_col).cast("string")).alias("_h"),
        F.struct(
            F.col(x_col).alias("_x"), F.col(y_col).alias("_y")
        ).alias("_s"),
    )
    if not assume_unique_key:
        proj = proj.groupBy("_h").agg(F.min("_s").alias("_s"))
    s = (
        proj.select(
            "_h", F.col("_s._x").alias("_x"), F.col("_s._y").alias("_y")
        )
        .orderBy("_h")
        .limit(k)
    )
    a = s.select(
        F.col("_h").alias("_ha"), F.col("_x").alias("_xa"), F.col("_y").alias("_ya")
    )
    b = s.select(
        F.col("_h").alias("_hb"), F.col("_x").alias("_xb"), F.col("_y").alias("_yb")
    )
    pairs = a.join(F.broadcast(b), F.col("_ha") < F.col("_hb"))
    # native-type comparisons (decimal/int exact) — a double-difference
    # signum could collapse sub-ulp-distinct decimals into false ties
    dx = (
        F.when(F.col("_xa") > F.col("_xb"), 1)
        .when(F.col("_xa") < F.col("_xb"), -1)
        .otherwise(0)
    )
    dy = (
        F.when(F.col("_ya") > F.col("_yb"), 1)
        .when(F.col("_ya") < F.col("_yb"), -1)
        .otherwise(0)
    )
    agg = pairs.agg(
        F.coalesce(F.sum(F.when(dx * dy > 0, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("concordant"),
        F.coalesce(F.sum(F.when(dx * dy < 0, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("discordant"),
        F.coalesce(
            F.sum(F.when((dx == 0) & (dy != 0), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("ties_x"),
        F.coalesce(
            F.sum(F.when((dy == 0) & (dx != 0), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("ties_y"),
        F.coalesce(
            F.sum(F.when((dx == 0) & (dy == 0), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("ties_xy"),
    )
    scored = agg.crossJoin(F.broadcast(s.agg(F.count(F.lit(1)).alias("n"))))
    n0 = F.col("concordant") + F.col("discordant") + F.col("ties_x") + F.col(
        "ties_y"
    ) + F.col("ties_xy")
    n1 = F.col("ties_x") + F.col("ties_xy")
    n2 = F.col("ties_y") + F.col("ties_xy")
    den = (
        (n0 - n1).cast("double") * (n0 - n2).cast("double")
    )
    tau = F.when(
        den > 0,
        (F.col("concordant") - F.col("discordant")).cast("double")
        / F.sqrt(den),
    )
    return scored.select(
        "n",
        n0.cast("long").alias("n_pairs"),
        "concordant",
        "discordant",
        "ties_x",
        "ties_y",
        "ties_xy",
        tau.alias("tau_b"),
    )


def cuped_adjusted_means(
    df: DataFrame,
    split_pred: Column,
    cohort_col: Column,
    value_col: str = "value",
    user_col: str = "user_id",
    scale: int = 6,
) -> DataFrame:
    """CUPED variance-reduced A/B readout (Deng, Xu, Kohavi & Walker,
    WSDM 2013): per-user pre-period activity is the covariate, the
    post-period metric is adjusted by ``y' = y - theta * (x - mean(x))``
    with ``theta = cov(x, y) / var(x)`` fitted POOLED across cohorts —
    the standard trick that removes the between-user variance a raw
    mean comparison wastes power on. ``split_pred`` marks PRE-period
    rows; users missing a period contribute 0 for it (documented
    imputation — the zero-activity reading, not mean-imputation).
    ``cohort_col`` must be an expression over the USER key only (the
    assignment unit — it is evaluated after the per-user reduction,
    where only ``user_col`` survives; a row-level cohort would not be
    a valid randomization unit anyway).

    Exactness (the agg_corr rule): per-user pre/post sums are exact
    ``decimal(18, scale)``; the five pooled moments accumulate as exact
    decimal(38,12) sums of (19,scale) x (19,scale) products; theta,
    the cohort means, and the adjusted means are fixed double
    expressions over those pinned sums — order-independent in any
    engine. rho2 (the fraction of metric variance the covariate
    explains = the variance reduction CUPED delivers) rides along.

    Plan: one corpus scan to the per-user (x, y) table (map-side
    combined), one pooled 1-row moment aggregate (broadcast back), one
    per-cohort aggregate — nothing corpus-sized shuffles twice.

    Output: one row per cohort — (cohort, n_users, mean_y, mean_y_adj,
    theta, rho2); theta/rho2 constant across rows, NULL degenerate.
    """
    d = f"decimal(18,{scale})"
    d19 = f"decimal(19,{scale})"
    d38 = "decimal(38,12)"
    vdec = F.col(value_col).cast(d)
    zero = F.lit(0).cast(d)
    per_user = (
        df.groupBy(user_col)
        .agg(
            F.coalesce(F.sum(F.when(split_pred, vdec)), zero)
            .cast(d)
            .alias("_x"),
            F.coalesce(F.sum(F.when(~split_pred, vdec)), zero)
            .cast(d)
            .alias("_y"),
        )
        # cohort is a pure function of the group key, applied post-agg
        .withColumn("_cohort", cohort_col)
        .localCheckpoint(eager=True)  # three aggregates read it
    )
    pooled = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(F.col("_x").cast(d38)).cast(d38).alias("_sx"),
        F.sum(F.col("_y").cast(d38)).cast(d38).alias("_sy"),
        F.sum((F.col("_x").cast(d19) * F.col("_y").cast(d19)).cast(d38))
        .cast(d38)
        .alias("_sxy"),
        F.sum((F.col("_x").cast(d19) * F.col("_x").cast(d19)).cast(d38))
        .cast(d38)
        .alias("_sxx"),
        F.sum((F.col("_y").cast(d19) * F.col("_y").cast(d19)).cast(d38))
        .cast(d38)
        .alias("_syy"),
    )
    by_cohort = per_user.groupBy("_cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.col("_x").cast(d38)).cast(d38).alias("_sxc"),
        F.sum(F.col("_y").cast(d38)).cast(d38).alias("_syc"),
    )
    nf = F.col("_n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx, syy = F.col("_sxx").cast("double"), F.col("_syy").cast("double")
    cov_n = nf * sxy - sx * sy
    varx_n = nf * sxx - sx * sx
    vary_n = nf * syy - sy * sy
    theta = F.when(varx_n > 0, cov_n / varx_n)
    mean_y_c = F.col("_syc").cast("double") / F.col("n_users").cast("double")
    mean_x_c = F.col("_sxc").cast("double") / F.col("n_users").cast("double")
    return by_cohort.crossJoin(F.broadcast(pooled)).select(
        F.col("_cohort").alias("cohort"),
        "n_users",
        mean_y_c.alias("mean_y"),
        (mean_y_c - theta * (mean_x_c - sx / nf)).alias("mean_y_adj"),
        theta.alias("theta"),
        F.when((varx_n > 0) & (vary_n > 0), cov_n * cov_n / (varx_n * vary_n))
        .alias("rho2"),
    )


def shapley_attribution(
    df: DataFrame,
    channels: tuple[str, ...],
    conversion_value: str,
    channel_col: str = "event_type",
    user_col: str = "user_id",
) -> DataFrame:
    """Exact Shapley-value channel attribution (Shapley 1953, the
    data-driven formulation of Zhao, Mahboobi & Moosavi 2018): each
    channel's credit is the factorial-weighted average of its marginal
    conversion-rate contribution over every channel SUBSET —
    ``phi_i = sum_{S not containing i} |S|!(C-|S|-1)!/C! *
    (v(S u i) - v(S))`` with ``v(S)`` the conversion rate of users
    whose touched-channel set is EXACTLY S (unobserved subsets
    contribute v = 0 — the standard data-driven convention, stated
    loudly rather than imputed). The order-free counterpart to
    graph.markov_removal_attribution's path model.

    Exactness: the factorial weights are exact integer rationals
    (denominator C!); each v is ONE correctly-rounded division of
    exact counts; each Shapley term quantizes to a 6dp decimal before
    the EXACT decimal sum (the zipf rule — a float sum over subset
    terms would be order-dependent), so phi is bit-identical in any
    engine. ``C`` must stay small (<= 8): the subset lattice is 2^C.

    Plan: ONE corpus scan to the per-user (mask, converted) table
    (map-side combined), then a <= 2^C-row mask aggregate; the subset
    lattice, the v table, and the per-channel marginal pairs are all
    <= 2^C-row broadcast-side constructs. Output: one row per channel
    — (channel, phi, touched_users, touched_conversions).
    """
    import math

    c = len(channels)
    if not 1 <= c <= 8:
        raise ValueError(f"need 1..8 channels, got {c}")
    if conversion_value in channels:
        raise ValueError("conversion_value must not be a channel")
    spark = df.sparkSession
    ch = F.col(channel_col)
    mask_expr = sum(
        (
            F.max(F.when(ch == name, F.lit(1)).otherwise(F.lit(0))) * (1 << i)
            for i, name in enumerate(channels)
        ),
        F.lit(0),
    )
    per_user = df.groupBy(user_col).agg(
        mask_expr.cast("int").alias("_mask"),
        F.max((ch == conversion_value).cast("int")).alias("_conv"),
    )
    by_mask = (
        per_user.groupBy("_mask")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum("_conv").cast("long").alias("_c"),
        )
        .localCheckpoint(eager=True)  # <= 2^C rows; every stage reads it
    )
    lattice = spark.range(1 << c).select(F.col("id").cast("int").alias("_s"))
    v = F.broadcast(
        lattice.join(by_mask, F.col("_s") == F.col("_mask"), "left").select(
            "_s",
            F.coalesce(
                F.col("_c").cast("double") / F.col("_n").cast("double"),
                F.lit(0.0),
            ).alias("_v"),
        )
    )
    # factorial weights a(|S|) = |S|! (C-|S|-1)!, denominator C!
    fact = [math.factorial(k) for k in range(c + 1)]
    a_by_size = {k: fact[k] * fact[c - 1 - k] for k in range(c)}
    a_expr = F.lit(None).cast("long")
    for k, a in a_by_size.items():
        a_expr = F.when(F.expr("bit_count(_s)") == k, F.lit(a)).otherwise(a_expr)
    chan = spark.createDataFrame(
        [(name, 1 << i) for i, name in enumerate(channels)],
        "channel string, _bit int",
    )
    pairs = (
        chan.crossJoin(lattice)
        .filter(F.expr("(_s & _bit) = 0"))
        .join(v, "_s")
        .join(
            v.select(
                F.col("_s").alias("_su"), F.col("_v").alias("_vu")
            ),
            F.expr("_su = _s + _bit"),
        )
        .withColumn("_a", a_expr)
    )
    term6 = F.round(
        F.col("_a").cast("double")
        * (F.col("_vu") - F.col("_v"))
        / F.lit(float(fact[c])),
        6,
    ).cast("decimal(18,6)")
    phi = pairs.groupBy("channel").agg(
        F.sum(term6).cast("decimal(38,6)").alias("_phi")
    )
    touched = (
        chan.crossJoin(by_mask)
        .filter(F.expr("(_mask & _bit) != 0"))
        .groupBy("channel")
        .agg(
            F.sum("_n").cast("long").alias("touched_users"),
            F.sum("_c").cast("long").alias("touched_conversions"),
        )
    )
    return (
        phi.join(touched, "channel", "left")
        .select(
            "channel",
            F.col("_phi").cast("double").alias("phi"),
            F.coalesce(F.col("touched_users"), F.lit(0).cast("long")).alias(
                "touched_users"
            ),
            F.coalesce(
                F.col("touched_conversions"), F.lit(0).cast("long")
            ).alias("touched_conversions"),
        )
    )


def qq_quantile_table(
    df: DataFrame,
    value_col: str,
    side_col: Column,
    q_den: int = 10,
    bucket_fn: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Two-sample QQ table — the quantile-quantile comparison behind a
    QQ plot: for each interior quantile ``q/q_den`` the EXACT picked
    order statistic of both cohorts side by side, plus the gap. Where
    KS reports the worst vertical ECDF gap and W1 the area, the QQ
    table shows WHERE on the distribution the two samples diverge —
    the diagnostic a drift dashboard links to.

    Exactness: the grouped_discrete_quantile rule — per cohort the
    element at 1-based rank ``ceil(q*n/q_den)`` of the sorted multiset
    (integer ceiling ``(q*n + q_den - 1) div q_den``), a PICKED value
    that exists in the data, never an interpolated float; identical in
    any engine. NULL values are excluded (no position on the line, the
    KS rule).

    Plan: one (cohort, value) distinct-multiplicity aggregation, the
    bucketed parallel prefix (relational.grouped_value_cum — never a
    single-partition sort), then a <= (distinct values x q_den-1)
    filter-and-min against the broadcast quantile list.

    ``bucket_fn``: optional ``Column -> Column`` mapping the VALUE
    column to its order-consistent prefix bucket (e.g.
    ``lambda v: F.floor(v / 50)``); it is applied to the internal
    value alias here, so callers never touch private column names.

    Output: one row per interior quantile — (q, rank_a, rank_b,
    value_a, value_b, qq_gap = value_b - value_a).
    """
    from .relational import grouped_value_cum

    if q_den < 2:
        raise ValueError(f"q_den must be >= 2, got {q_den}")
    spark = df.sparkSession
    d = df.filter(F.col(value_col).isNotNull()).select(
        F.when(side_col, F.lit("a")).otherwise(F.lit("b")).alias("_side"),
        F.col(value_col).alias("_v"),
    )
    cum = grouped_value_cum(
        d,
        ["_side"],
        "_v",
        bucket_expr=bucket_fn(F.col("_v")) if bucket_fn is not None else None,
    )
    qs = F.broadcast(
        spark.range(1, q_den).select(F.col("id").cast("long").alias("q"))
    )
    rank = F.expr(f"(q * n + {q_den} - 1) div {q_den}")
    picked = (
        cum.crossJoin(qs)
        .filter(F.col("cc") >= rank)
        .groupBy("_side", "q")
        .agg(F.min("_v").alias("_qv"), F.min(rank).alias("_rank"))
    )
    return (
        picked.groupBy("q")
        .agg(
            F.max(F.when(F.col("_side") == "a", F.col("_rank"))).alias("rank_a"),
            F.max(F.when(F.col("_side") == "b", F.col("_rank"))).alias("rank_b"),
            F.max(F.when(F.col("_side") == "a", F.col("_qv"))).alias("value_a"),
            F.max(F.when(F.col("_side") == "b", F.col("_qv"))).alias("value_b"),
        )
        .select(
            "q",
            "rank_a",
            "rank_b",
            "value_a",
            "value_b",
            (F.col("value_b") - F.col("value_a")).alias("qq_gap"),
        )
    )
