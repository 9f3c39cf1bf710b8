"""Physical-plan shape guards for the r06 operators: the audio codec
pipelines must stay exchange-free (map-only mapInPandas over one scan),
DSIR must keep its single-corpus-pass broadcast-model shape (the
window-sum formulation double-scanned the corpus — pinned here so it
cannot regress), and the privacy/fingerprint/semantic-dedup queries keep
their audited exchange budgets."""

from probability_of_buying_two_products_together_hadoop_project_spark import registry
from probability_of_buying_two_products_together_hadoop_project_spark.plans import explain


def _q(spark, sf_smoke, name):
    return registry.REGISTRY[name].fn(spark, sf_smoke)


def test_audio_features_zero_exchanges(spark, sf_smoke):
    df = _q(spark, sf_smoke, "audio_features_verified")
    n = explain.count_exchanges(df)
    assert n == 0, f"audio feature extraction must be map-only, got {n} exchanges"


def test_audio_resample_zero_exchanges(spark, sf_smoke):
    df = _q(spark, sf_smoke, "audio_resample_decimate")
    n = explain.count_exchanges(df)
    assert n == 0, f"audio resample must be map-only, got {n} exchanges"


def test_dsir_single_scan_broadcast_model(spark, sf_smoke):
    """After the (doc, bucket, cnt) checkpoint, the remaining plan must
    contain NO parquet scan (one corpus pass total) and must broadcast
    the 512-row model table back.

    Built via the OPERATOR, not the registry entry: since r12 the
    registry returns the shared localCheckpoint-pinned relation
    (_dsir_lw), whose visible plan is just Scan ExistingRDD (LESSONS
    39) — the plan contract below guards the relation the pin
    materializes."""
    import re

    from pyspark.sql import functions as F

    from probability_of_buying_two_products_together_hadoop_project_spark.operators import (
        text,
    )

    df = text.dsir_importance(
        registry._t(spark, sf_smoke, "documents"), F.col("lang") == "en"
    )
    plan = explain.formatted_plan(df)
    scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
    assert scans == 0, f"dsir must not rescan the corpus, got {scans} scans"
    assert explain.has_broadcast_join(df)
    n = explain.count_exchanges(df)
    assert n <= 4, f"dsir exchange budget is 4 (model/totals/final), got {n}"


def test_privacy_audit_two_exchanges(spark, sf_smoke):
    """count(DISTINCT sensitive) expands to the standard two-phase
    shape: one exchange on (quasi, sensitive), one on quasi."""
    df = _q(spark, sf_smoke, "privacy_k_anonymity_orders")
    n = explain.count_exchanges(df)
    assert n == 2, f"k-anonymity audit must be 2 exchanges, got {n}"


def test_privacy_suppress_broadcast_semi(spark, sf_smoke):
    df = _q(spark, sf_smoke, "privacy_suppress_orders")
    assert explain.has_broadcast_join(df), "passing-class semi join must broadcast"
    n = explain.count_exchanges(df)
    assert n == 3, f"suppress budget is 3 (audit 2 + final agg), got {n}"


def test_fingerprints_no_data_shuffle(spark, sf_smoke):
    """Three 1-row global aggregates — the only exchanges ship per-task
    partials, never rows."""
    df = _q(spark, sf_smoke, "dataset_fingerprints")
    n = explain.count_exchanges(df)
    assert n == 3, f"fingerprints must be 3 single-row-agg exchanges, got {n}"


def test_semantic_dedup_exchange_budget(spark, sf_smoke):
    """Post-checkpoint: the cid pair join (both sides), the prior-max
    agg, and the final id join — raw vectors shuffle only inside the
    checkpointed k-means, never in the pair stage."""
    df = _q(spark, sf_smoke, "semantic_dedup_embeddings")
    n = explain.count_exchanges(df)
    assert n <= 5, f"semantic dedup exchange budget is 5, got {n}"
