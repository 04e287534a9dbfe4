"""Behavioral-analytics anchors: funnel ordering invariants, transition
conservation, cohort completeness (queries/behavior.py). The strict
cross-engine check is the DuckDB oracle gate; these pin the invariants
that must hold regardless of data."""

from __future__ import annotations

from pyspark.sql import functions as F

from conversation_analysis_tools_spark.catalog import table as catalog_table
from conversation_analysis_tools_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def test_funnel_monotone(spark):
    rows = {
        r["step"]: r["n_users"]
        for r in REGISTRY["funnel_view_click_purchase"].fn(spark, SF_DIR).collect()
    }
    assert set(rows) == {"view", "view>click", "view>click>purchase"}
    assert rows["view"] >= rows["view>click"] >= rows["view>click>purchase"]
    assert rows["view"] >= 1


def test_transitions_conserve_events(spark):
    ev = catalog_table(spark, "events", SF_DIR)
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    total = (
        REGISTRY["event_transitions"].fn(spark, SF_DIR)
        .agg(F.sum("n").alias("s")).collect()[0]["s"]
    )
    # each user with k events contributes exactly k-1 transitions
    assert total == n_events - n_users


def test_retention_week0_has_full_cohort(spark):
    ret = REGISTRY["retention_cohorts"].fn(spark, SF_DIR).collect()
    by_cohort: dict = {}
    for r in ret:
        by_cohort.setdefault(r["cohort_week"], {})[r["week_offset"]] = r["n_users"]
    for cohort, offsets in by_cohort.items():
        assert 0 in offsets, f"cohort {cohort} missing week 0"
        # week 0 contains every cohort member -> it is the max row
        assert offsets[0] == max(offsets.values())
