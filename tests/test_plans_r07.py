"""Physical-plan shape guards for the r07 operators: the FIR audio
resample stays map-only, CUSUM's prefix-min closed form keeps its
two-exchange budget (bucket agg + one shared group sort), the KS
cumulative counts never funnel through a single data-sized partition
(bucketed prefix shape), and the screens keep their audited exchange
budgets. Counts measured at authoring time on sf0.001 with
shuffle_partitions=4; a regression here means a structural plan change,
not noise."""

from probability_of_buying_two_products_together_hadoop_project_spark import registry
from probability_of_buying_two_products_together_hadoop_project_spark.plans import explain


def _q(spark, sf_smoke, name):
    return registry.REGISTRY[name].fn(spark, sf_smoke)


def test_audio_fir_zero_exchanges(spark, sf_smoke):
    df = _q(spark, sf_smoke, "audio_resample_fir")
    n = explain.count_exchanges(df)
    assert n == 0, f"FIR resample must be map-only, got {n} exchanges"


def test_cusum_two_exchanges(spark, sf_smoke):
    """Hourly agg exchange + ONE group exchange shared by the prefix sum
    and its running min (same partition + order spec)."""
    df = _q(spark, sf_smoke, "cusum_changepoint_events")
    n = explain.count_exchanges(df)
    assert n == 2, f"CUSUM budget is 2 exchanges, got {n}"


def test_ks_bucketed_prefix_no_global_window(spark, sf_smoke):
    """The cumulative ECDF counts run per value-bucket; only
    bucket-COUNT-sized relations may pass through single-partition
    windows. Budget: value agg + bucket window (data-sized) + three
    bucket-list exchanges."""
    df = _q(spark, sf_smoke, "ks_drift_totalprice")
    n = explain.count_exchanges(df)
    assert n <= 5, f"KS exchange budget is 5, got {n}"
    assert explain.has_broadcast_join(df), "offsets must broadcast"
    plan = explain.formatted_plan(df)
    # the data-sized running sums must be partitioned by the bucket key
    assert "_vb" in plan


def test_entropy_screen_one_exchange(spark, sf_smoke):
    """The Arrow-batched histogram emits exact per-doc (byte, cnt)
    rows in-map (a document is one input row), so only the per-doc
    entropy agg exchanges; the join back onto the full doc list
    broadcasts."""
    df = _q(spark, sf_smoke, "entropy_screen_docs")
    n = explain.count_exchanges(df)
    assert n == 1, f"entropy budget is 1 exchange, got {n}"
    assert explain.has_broadcast_join(df)
    assert "MapInPandas" in explain.formatted_plan(df)


def test_hashing_trick_two_exchanges(spark, sf_smoke):
    """(doc, bucket) component agg + per-doc vector agg — the token
    explode collapses map-side to <= dim rows per doc before either."""
    df = _q(spark, sf_smoke, "hashing_trick_features")
    n = explain.count_exchanges(df)
    assert n == 2, f"hashing-trick budget is 2 exchanges, got {n}"
    assert explain.has_broadcast_join(df)


def test_dp_and_welch_single_aggregation(spark, sf_smoke):
    for name in ("dp_noisy_counts_priority", "welch_ttest_urgent"):
        df = _q(spark, sf_smoke, name)
        n = explain.count_exchanges(df)
        assert n == 1, f"{name} must be one aggregation pass, got {n}"


def test_benford_two_exchanges(spark, sf_smoke):
    """The corpus scan + digit agg live inside the eager checkpoint
    (counts feeds three branches — the DSIR no-subplan-dedup lesson),
    so the visible plan is exchanges over <= 10-row tables only: the
    spine distinct + the window total. Zero parquet rescans."""
    df = _q(spark, sf_smoke, "benford_screen_totalprice")
    n = explain.count_exchanges(df)
    assert n == 2, f"benford budget is 2 post-checkpoint exchanges, got {n}"
    assert explain.formatted_plan(df).count("Scan parquet") == 0


def test_ahash_single_window_exchange(spark, sf_smoke):
    """Decode is map-only; the only exchange keys the collision window."""
    df = _q(spark, sf_smoke, "multimodal_ahash_dedup")
    n = explain.count_exchanges(df)
    assert n == 1, f"ahash budget is 1 exchange, got {n}"


def test_dsir_select_budget(spark, sf_smoke):
    """The selection stage adds NO exchange over the importance model:
    the A-ES priority is a projection and top-k is
    TakeOrderedAndProject (per-partition heaps)."""
    df = _q(spark, sf_smoke, "dsir_select_gumbel100")
    n = explain.count_exchanges(df)
    assert n <= 4, f"dsir selection budget is dsir's own 4, got {n}"
    plan = explain.formatted_plan(df)
    assert "TakeOrderedAndProject" in plan


def test_rational_resample_zero_exchanges(spark, sf_smoke):
    df = _q(spark, sf_smoke, "audio_resample_rational")
    n = explain.count_exchanges(df)
    assert n == 0, f"polyphase resample must be map-only, got {n} exchanges"


def test_theilsen_budget(spark, sf_smoke):
    """Hourly agg (the only data-sized exchange) + the calendar-bounded
    pair join (hc broadcasts) + one rank window over pairs."""
    df = _q(spark, sf_smoke, "theilsen_trend_events")
    n = explain.count_exchanges(df)
    assert n <= 3, f"theil-sen budget is 3 exchanges, got {n}"
    assert explain.has_broadcast_join(df)


def test_sorted_neighborhood_budget(spark, sf_smoke):
    """Rank = bucketed prefix (bucket window + tiny offset list,
    broadcast back); neighborhood = one band join on the rank group."""
    df = _q(spark, sf_smoke, "linkage_sorted_neighborhood")
    n = explain.count_exchanges(df)
    assert n <= 6, f"sorted-neighborhood budget is 6 exchanges, got {n}"
    assert explain.has_broadcast_join(df)


def test_mutual_info_single_corpus_pass(spark, sf_smoke):
    """The cell table checkpoints after ONE corpus aggregation (the MI
    sum, Hx, and Hy all derive from it — Catalyst dedupes no common
    subplans, the DSIR lesson, so without the checkpoint the corpus
    would scan three times); every later exchange moves <= |X|*|Y|
    cell rows."""
    import re

    df = _q(spark, sf_smoke, "mutual_info_type_hour")
    plan = explain.formatted_plan(df)
    scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
    assert scans == 0, f"MI must not rescan the corpus, got {scans} scans"
    # r11: the grand totals moved from Window.partitionBy() sums to
    # agg + broadcast join-backs — two extra (1-row) exchange pairs,
    # zero single-partition sorts whose input grows with |X|*|Y|
    n = explain.count_exchanges(df)
    assert n <= 12, f"MI exchange budget is 12 (all cell-sized), got {n}"
    assert explain.unbounded_single_partition_exchanges(df) == []
