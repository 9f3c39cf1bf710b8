"""Physical-plan shape guards for the r08 operators. Counts measured at
authoring time on sf0.001 with shuffle_partitions=4; a regression here
means a structural plan change, not noise."""

from probability_of_buying_two_products_together_hadoop_project_spark import registry
from probability_of_buying_two_products_together_hadoop_project_spark.plans import explain


def _q(spark, sf_smoke, name):
    return registry.REGISTRY[name].fn(spark, sf_smoke)


def test_wasserstein_ks_shape_with_prev_value_carry(spark, sf_smoke):
    """W1 rides the KS bucketed-prefix shape plus the previous-value
    carry on the broadcast offsets — one extra exchange over KS's
    budget (the final 1-row aggregate), never a single-partition
    corpus window, never a cartesian."""
    df = _q(spark, sf_smoke, "wasserstein_drift_totalprice")
    n = explain.count_exchanges(df)
    assert n <= 6, f"W1 exchange budget is 6, got {n}"
    p = explain.formatted_plan(df)
    assert explain.has_broadcast_join(df), "offsets must broadcast"
    assert "Cartesian" not in p


def test_mannwhitney_ks_shape(spark, sf_smoke):
    """Mann-Whitney uses the same distinct-value + bucketed-prefix
    machinery; cumbefore is one combined running sum."""
    df = _q(spark, sf_smoke, "mannwhitney_urgent_totalprice")
    n = explain.count_exchanges(df)
    assert n <= 6, f"MW exchange budget is 6, got {n}"
    assert explain.has_broadcast_join(df), "offsets must broadcast"


def test_isotonic_post_scan_is_bin_table_sized(spark, sf_smoke):
    """One corpus aggregation; the B^2 grid, both windows and the fit
    join all run over bin-table-sized relations (B <= 50 here). The
    fit side of the final join must broadcast."""
    df = _q(spark, sf_smoke, "isotonic_calibration_doclen")
    n = explain.count_exchanges(df)
    assert n <= 5, f"isotonic exchange budget is 5, got {n}"
    assert explain.has_broadcast_join(df), "fit table must broadcast"
    assert "Cartesian" not in explain.formatted_plan(df)


def test_substring_spans_two_exchanges(spark, sf_smoke):
    """Gram-count aggregation (map-side combined) + the per-document
    island window; the duplicated-hash semi side broadcasts at smoke
    scale. Shuffle rows after the count filter are proportional to
    duplicated content only."""
    df = _q(spark, sf_smoke, "dedup_substring_spans")
    n = explain.count_exchanges(df)
    assert n <= 3, f"substring-spans exchange budget is 3, got {n}"
    assert "Cartesian" not in explain.formatted_plan(df)


def test_adaptive_cusum_two_exchanges(spark, sf_smoke):
    """Hourly agg exchange + ONE group sort shared by the EWMA lags,
    the prediction lag, and the three running frames — the plain
    CUSUM budget, unchanged by the learned reference."""
    df = _q(spark, sf_smoke, "cusum_adaptive_events")
    n = explain.count_exchanges(df)
    assert n == 2, f"adaptive CUSUM budget is 2 exchanges, got {n}"


def test_decontaminate_spans_broadcast_bench(spark, sf_smoke):
    """The benchmark digest set must broadcast; post-join shuffle is
    contaminated positions only (the island window)."""
    df = _q(spark, sf_smoke, "decontaminate_span_report")
    assert explain.has_broadcast_join(df), "bench digests must broadcast"
    assert "Cartesian" not in explain.formatted_plan(df)


def test_audio_dft_single_aggregation_after_decode(spark, sf_smoke):
    """One (media, window) hash aggregation after the Arrow decode:
    shuffle rows = windows, never samples."""
    df = _q(spark, sf_smoke, "audio_dft_energy")
    n = explain.count_exchanges(df)
    assert n == 1, f"audio DFT budget is 1 exchange, got {n}"


def test_normalize_text_map_only(spark, sf_smoke):
    """The cleaning pass is a map-only Arrow-batched projection."""
    df = _q(spark, sf_smoke, "normalize_text_nfc")
    n = explain.count_exchanges(df)
    assert n == 0, f"normalize_text must be map-only, got {n} exchanges"


def test_join_size_report_no_cartesian_blowup(spark, sf_smoke):
    """Two key aggs + key join + broadcast 1-row totals + TakeOrdered;
    the only cross joins are against the broadcast single-row totals."""
    df = _q(spark, sf_smoke, "join_size_report_partkey")
    p = explain.formatted_plan(df)
    assert explain.has_broadcast_join(df)
    assert "TakeOrdered" in p


def test_cut_spans_no_per_token_shuffle(spark, sf_smoke):
    """Span collapse + join are the only exchanges beyond the span
    extractor's own; the cut itself is one indexed HOF filter."""
    df = _q(spark, sf_smoke, "dedup_cut_spans")
    n = explain.count_exchanges(df)
    assert n <= 3, f"cut-spans exchange budget is 3, got {n}"
