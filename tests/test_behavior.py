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


def test_gapfill_planted_gaps(spark):
    # two keys, planted holes: 'a' misses day 3-4 (carries 7 forward),
    # 'b' misses day 2 (carries 5); no fill may cross the key boundary
    from datetime import date

    from conversation_analysis_tools_spark.operators.temporal import gapfill_forward

    daily = spark.createDataFrame(
        [
            ("a", date(2024, 1, 1), 3),
            ("a", date(2024, 1, 2), 7),
            ("a", date(2024, 1, 5), 2),
            ("b", date(2024, 1, 1), 5),
            ("b", date(2024, 1, 3), 9),
        ],
        "event_type string, day date, n long",
    )
    out = {
        (r["event_type"], r["day"].isoformat()): (r["filled"], r["n_fill"])
        for r in gapfill_forward(daily).collect()
    }
    assert out[("a", "2024-01-03")] == (True, 7)
    assert out[("a", "2024-01-04")] == (True, 7)
    assert out[("a", "2024-01-05")] == (False, 2)
    assert out[("b", "2024-01-02")] == (True, 5)
    assert out[("b", "2024-01-03")] == (False, 9)
    assert len(out) == 5 + 3  # a: 5 calendar days, b: 3


def test_gapfill_query_invariants(spark):
    # registry query at sf0.001 (sparse slice -> real gaps): n_fill
    # never null, first day per key observed, calendar is contiguous
    rows = REGISTRY["timeseries_gapfill"].fn(spark, SF_DIR).collect()
    assert rows
    by_key: dict = {}
    for r in rows:
        assert r["n_fill"] is not None
        by_key.setdefault(r["event_type"], []).append(r)
    for key, rs in by_key.items():
        rs.sort(key=lambda r: r["day"])
        assert rs[0]["filled"] is False, f"{key} first day must be observed"
        span = (rs[-1]["day"] - rs[0]["day"]).days + 1
        assert len(rs) == span, f"{key} calendar not contiguous"


def test_distributed_cumsum_cross_year(spark):
    # planted multi-year series: per-year cumsum + broadcast offsets
    # must equal the plain global running sum, including across the
    # year boundaries and with a gap year
    from datetime import date

    from conversation_analysis_tools_spark.operators.temporal import (
        distributed_cumsum,
    )

    rows = [
        (date(2021, 3, 1), 5),
        (date(2021, 12, 31), 7),
        (date(2022, 1, 1), 11),
        (date(2022, 6, 15), 2),
        (date(2024, 2, 2), 3),  # 2023 absent entirely
    ]
    daily = spark.createDataFrame(rows, "day date, new_users long")
    got = {
        r["day"].isoformat(): r["cumulative"]
        for r in distributed_cumsum(daily).collect()
    }
    running, expect = 0, {}
    for d, n in rows:
        running += n
        expect[d.isoformat()] = running
    assert got == expect


def test_cumsum_null_day_and_duplicate_day(spark):
    # null-day rows are excluded by contract (no calendar position, no
    # row -- and crucially their value must NOT leak into offsets);
    # duplicate days are peers under the RANGE frame: identical
    # cumulative on both rows, deterministic at any partition order
    from datetime import date

    from conversation_analysis_tools_spark.operators.temporal import (
        distributed_cumsum,
    )

    daily = spark.createDataFrame(
        [
            (None, 100),
            (date(2021, 5, 1), 3),
            (date(2022, 5, 1), 4),
            (date(2022, 5, 1), 6),
            (date(2022, 6, 1), 1),
        ],
        "day date, new_users long",
    )
    rows = distributed_cumsum(daily).collect()
    assert len(rows) == 4  # null-day row excluded
    got = sorted((r["day"].isoformat(), r["cumulative"]) for r in rows)
    assert got == [
        ("2021-05-01", 3),
        ("2022-05-01", 13),  # both duplicate-day rows: all ties included
        ("2022-05-01", 13),
        ("2022-06-01", 14),  # 100 from the null row never leaked in
    ]


def test_gapfill_null_rows_excluded(spark):
    from datetime import date

    from conversation_analysis_tools_spark.operators.temporal import (
        gapfill_forward,
    )

    daily = spark.createDataFrame(
        [
            ("a", date(2024, 1, 1), 3),
            ("a", None, 99),
            (None, date(2024, 1, 2), 7),
            ("a", date(2024, 1, 3), 5),
        ],
        "event_type string, day date, n long",
    )
    out = {
        (r["event_type"], r["day"].isoformat()): (r["filled"], r["n_fill"])
        for r in gapfill_forward(daily).collect()
    }
    assert out == {
        ("a", "2024-01-01"): (False, 3),
        ("a", "2024-01-02"): (True, 3),
        ("a", "2024-01-03"): (False, 5),
    }
