"""Anchors for incremental rollup maintenance and the DQ audit
(operators/rollup.py, queries/audit.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conversation_analysis_tools_spark.catalog import table as catalog_table
from conversation_analysis_tools_spark.operators.rollup import (
    build_rollup,
    finalize_rollup,
    merge_rollup,
)
from conversation_analysis_tools_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _as_map(df):
    return {
        (r["d"], r["event_type"]): (r["n"], r["total"])
        for r in finalize_rollup(df).collect()
    }


def test_merge_equals_recompute_any_split(spark):
    ev = catalog_table(spark, "events", SF_DIR)
    full = build_rollup(ev, "event_type")
    for cut in ("2024-01-08", "2024-01-22"):
        b = F.lit(cut).cast("date")
        merged = merge_rollup(
            build_rollup(ev.filter(F.col("ts").cast("date") < b), "event_type"),
            build_rollup(ev.filter(F.col("ts").cast("date") >= b), "event_type"),
        )
        assert _as_map(merged) == _as_map(full)


def test_dq_audit_clean_tables(spark):
    rows = {
        r["check_name"]: r["n_violations"]
        for r in REGISTRY["dq_audit"].fn(spark, SF_DIR).collect()
    }
    # synthetic TPC-H-ish data is referentially clean
    assert set(rows) == {
        "customer_dup_pk",
        "documents_empty_text",
        "events_value_invalid",
        "lineitem_orphan_orderkey",
        "orders_orphan_custkey",
    }
    assert all(v == 0 for v in rows.values()), rows


def test_verification_window_auto_ranking():
    """ordered_registry: manual VERIFY_PRIORITY first, then oracled
    never-checked, then oldest-green ascending, rows-only last among
    the rest -- future rounds rotate with no manual edits."""
    from conversation_analysis_tools_spark.queries import (
        REGISTRY,
        VERIFY_PRIORITY,
        _driver_history,
        ordered_registry,
    )

    history = _driver_history()
    order = list(ordered_registry())
    manual = [n for n in VERIFY_PRIORITY if n in REGISTRY]
    assert order[: len(manual)] == manual
    rest = order[len(manual) :]
    keys = [
        (0 if REGISTRY[n].oracle is not None else 1, history.get(n, 0)) for n in rest
    ]
    assert keys == sorted(keys), "auto-ranked tail is not age-ordered"
    assert set(order) == set(REGISTRY), "ordering must be a permutation"
