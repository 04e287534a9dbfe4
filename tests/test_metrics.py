"""Single-pass funnel metrics (operators/metrics.PipelineMetrics):
observe() points must report the same counts as separate count()
passes, from ONE action, without perturbing the observed result.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conversation_analysis_tools_spark.catalog import table
from conversation_analysis_tools_spark.functions.text import raw_tokens_expr
from conversation_analysis_tools_spark.operators.metrics import PipelineMetrics

SF_DIR = "/root/testdata/sf0.001"


def test_funnel_counts_from_one_action(spark):
    docs = table(spark, "documents", SF_DIR)
    obs = PipelineMetrics()

    scanned = obs.observed(
        docs, "scanned", F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("chars"),
    )
    gated = scanned.where(F.size(raw_tokens_expr("text")) >= 20)
    gated = obs.observed(gated, "post_quality", F.count(F.lit(1)).alias("n"))
    result = gated.groupBy("lang").agg(F.count("*").alias("n"))

    rows = result.collect()  # the single action

    n_scanned = docs.count()
    n_gated = docs.where(F.size(raw_tokens_expr("text")) >= 20).count()
    assert obs.get("scanned")["n"] == n_scanned
    assert obs.get("scanned")["chars"] == docs.agg(F.sum("n_chars")).first()[0]
    assert obs.get("post_quality")["n"] == n_gated
    # observation is transparent: grouped result matches the unobserved plan
    want = {
        r["lang"]: r["n"]
        for r in docs.where(F.size(raw_tokens_expr("text")) >= 20)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {r["lang"]: r["n"] for r in rows} == want


def test_duplicate_point_rejected(spark):
    docs = table(spark, "documents", SF_DIR)
    obs = PipelineMetrics()
    obs.observed(docs, "p", F.count(F.lit(1)))
    with pytest.raises(ValueError, match="duplicate"):
        obs.observed(docs, "p", F.count(F.lit(1)))


def test_observation_then_cached_ml_plan(spark):
    """Session-hygiene regression: a registered Observation makes the
    session's ObservationManager non-serializable; if a later plan
    embeds an ml model UDF (whose training summary pins the session),
    cache().count() dies with Task-not-serializable. The classifier's
    scoring plan must stay model-free so this never happens."""
    from conversation_analysis_tools_spark.queries import REGISTRY

    obs = PipelineMetrics()
    pt = obs.observed(
        table(spark, "documents", SF_DIR), "scan", F.count(F.lit(1)).alias("n")
    )
    pt.groupBy("lang").count().collect()
    assert obs.get("scan")["n"] > 0

    scored = REGISTRY["quality_classifier_scores"].fn(spark, SF_DIR).cache()
    try:
        assert scored.count() == table(spark, "documents", SF_DIR).count()
    finally:
        scored.unpersist()
