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


def test_rotation_staleness_bound():
    """Cadence guarantee, enforced mechanically: simulate the driver
    marking the first 50 of the age-ranked registry green each round
    (the ordered_registry() policy) and assert every oracled query's
    refresh gap stays within ceil(O / window) rounds.

    Pins are PER-ROUND by the documented discipline (VERIFY_PRIORITY
    holds only the current round's changed-plan re-certifications and
    every past round's list was cleared once its green rows landed),
    so the simulation applies the manual list in round 1 only -- the
    round it exists for -- and lets the pure auto-ranking fill later
    windows. The old model charged the pins against EVERY simulated
    round, which wrongly forbade a one-round changed-plan list larger
    than 2 even when no query was anywhere near the staleness bound;
    a transient fat round only delays the tail by its own length and
    the assertion below still catches a list fat enough to break the
    steady-state bound. A hard cap keeps the window from degenerating
    (a 50-pin list would starve rotation entirely)."""
    import math

    from conversation_analysis_tools_spark.queries import (
        REGISTRY,
        VERIFY_PRIORITY,
        ordered_registry,
    )

    window = 50
    oracled = [n for n in ordered_registry() if REGISTRY[n].oracle is not None]
    manual = [n for n in VERIFY_PRIORITY if n in REGISTRY]
    assert len(manual) <= window // 4, (
        f"manual list too fat: {len(manual)} pinned slots leave too "
        "little rotation room -- keep VERIFY_PRIORITY to this round's "
        "genuinely-changed plans"
    )
    bound = math.ceil(len(oracled) / window)
    assert bound <= 4, (
        f"registry too large for the 50-row window: {len(oracled)} "
        f"oracled queries push the rotation period to {bound} rounds"
    )

    # simulation of the auto-ranking (never-checked rank first, then
    # oldest-green; registration order breaks ties); manual pins
    # occupy slots in round 1 only (see docstring)
    last_green = {n: 0 for n in oracled}  # 0 = never checked
    worst_gap = 0
    for rnd in range(1, 4 * bound + 2):
        pins = manual if rnd == 1 else []
        free = window - len(pins)
        ranked = sorted(last_green, key=lambda n: last_green[n])
        for name in pins + ranked[:free]:
            if name in last_green:
                prev = last_green[name]
                if prev:
                    worst_gap = max(worst_gap, rnd - prev)
                last_green[name] = rnd
    assert worst_gap <= bound + 1, (
        f"simulated refresh gap {worst_gap} exceeds the transient "
        f"{bound}+1 bound -- the pin list is fat enough to break rotation"
    )
    # and nothing is left unchecked once the simulation warms up
    assert min(last_green.values()) > 0, "some oracled query never enters the window"
