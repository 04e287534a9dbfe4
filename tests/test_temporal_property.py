"""Randomized parity tests for the temporal join operators: the
union-tag as-of join and the bucketed range join are compared against
naive per-row Python references on seeded random data, and the as-of
tie case is pinned for partitioning invariance (ADVICE round-1: the
determinism tiebreak must make every run/partitioning agree).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from conversation_analysis_tools_spark.operators.temporal import asof_join, range_join

BASE = datetime(2024, 1, 1)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _random_case(seed, dup_right_ts=False):
    rng = random.Random(seed)
    keys = ["a", "b", "c"]
    left = [
        (rng.choice(keys), BASE + timedelta(seconds=rng.randrange(0, 3600)), i)
        for i in range(40)
    ]
    tick = (lambda r: r.randrange(0, 36) * 100) if dup_right_ts else (
        lambda r: r.randrange(0, 3600)
    )
    right = [
        (rng.choice(keys), BASE + timedelta(seconds=tick(rng)), 100 + j)
        for j in range(25)
    ]
    return left, right


def _naive_asof(left, right):
    out = {}
    for k, lt, lid in left:
        best = None
        for rk, rt, rv in right:
            if rk == k and rt <= lt and (best is None or rt > best[0]):
                best = (rt, rv)
        out[lid] = best[1] if best else None
    return out


def test_asof_matches_naive_unique_ts(spark):
    for seed in (7, 19, 23):
        left, right = _random_case(seed)
        # drop duplicate (key, ts) right rows so the match is unique
        seen, uniq = set(), []
        for rk, rt, rv in right:
            if (rk, rt) not in seen:
                seen.add((rk, rt))
                uniq.append((rk, rt, rv))
        l_df = _mk(spark, left, "k string, lt timestamp, lid long")
        r_df = _mk(spark, uniq, "k string, rt timestamp, rv long")
        got = {
            r["lid"]: r["asof_rv"]
            for r in asof_join(l_df, r_df, "k", "lt", "rt", ["rv"]).collect()
        }
        assert got == _naive_asof(left, uniq), f"seed={seed}"


def test_asof_duplicate_ts_partitioning_invariant(spark):
    left, right = _random_case(42, dup_right_ts=True)
    l_df = _mk(spark, left, "k string, lt timestamp, lid long")
    r_df = _mk(spark, right, "k string, rt timestamp, rv long")

    a = {
        r["lid"]: r["asof_rv"]
        for r in asof_join(l_df, r_df, "k", "lt", "rt", ["rv"]).collect()
    }
    b = {
        r["lid"]: r["asof_rv"]
        for r in asof_join(
            l_df.repartition(7, "lid"), r_df.repartition(3, "rv"), "k", "lt", "rt", ["rv"]
        ).collect()
    }
    assert a == b

    # whichever duplicate won, it must carry the max eligible timestamp
    by_key = {}
    for rk, rt, rv in right:
        by_key.setdefault(rk, []).append((rt, rv))
    for k, lt, lid in left:
        elig = [(rt, rv) for rt, rv in by_key.get(k, []) if rt <= lt]
        if not elig:
            assert a[lid] is None
        else:
            max_t = max(rt for rt, _ in elig)
            assert a[lid] in {rv for rt, rv in elig if rt == max_t}, lid


def test_range_join_matches_naive(spark):
    for seed in (3, 11):
        left, right = _random_case(seed)
        l_df = _mk(spark, left, "k string, lt timestamp, lid long")
        r_df = _mk(spark, right, "k string, rt timestamp, rv long")
        delta = 300.0
        got = {
            (r["lid"], r["rv"])
            for r in range_join(l_df, r_df, "k", "lt", "rt", delta).collect()
        }
        want = {
            (lid, rv)
            for (k, lt, lid) in left
            for (rk, rt, rv) in right
            if rk == k and abs((lt - rt).total_seconds()) <= delta
        }
        assert got == want, f"seed={seed}"


def test_yearly_windowed_matches_global_window(spark):
    """yearly_windowed must equal the single-partition global window
    on a multi-year daily series WITH GAPS (the frame is row-grain, so
    a calendar-cutoff tail would break exactly here), including rows
    whose trailing frame spans the year boundary; and the sparse-year
    probe must fall back (still exact) when a non-final year has fewer
    rows than the frame depth or the year sequence has a hole."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from conversation_analysis_tools_spark.operators.temporal import (
        yearly_windowed,
    )

    def series(days):
        return spark.createDataFrame(
            [(d, i * 7 % 13 + 1) for i, d in enumerate(days)],
            "day date, n int",
        )

    aggs = {
        "s7": lambda wb: F.sum("n").over(wb.rowsBetween(-7, -1)),
        "c7": lambda wb: F.count("n").over(wb.rowsBetween(-7, -1)),
        "lag1": lambda wb: F.lag("n").over(wb),
    }

    def global_ref(daily):
        wb = Window.orderBy("day")
        return daily.select(
            "day", "n", *[fn(wb).alias(name) for name, fn in aggs.items()]
        )

    # dense-ish two-year span with gaps (skip every 5th day), boundary
    # rows land within 7 ROWS of the prior year's tail
    days = [
        dt.date(2023, 12, 1) + dt.timedelta(days=i)
        for i in range(0, 90)
        if i % 5 != 0
    ]
    daily = series(days)
    got = {tuple(r) for r in yearly_windowed(daily, 7, aggs).collect()}
    want = {tuple(r) for r in global_ref(daily).collect()}
    assert got == want and len(want) == len(days)

    # sparse: 2022 holds only 3 rows (< 7) before a present 2023 ->
    # probe must take the global fallback and stay exact
    sparse_days = [dt.date(2022, 6, 1) + dt.timedelta(days=i) for i in range(3)] + [
        dt.date(2023, 1, 1) + dt.timedelta(days=i) for i in range(20)
    ]
    daily_sparse = series(sparse_days)
    got = {tuple(r) for r in yearly_windowed(daily_sparse, 7, aggs).collect()}
    want = {tuple(r) for r in global_ref(daily_sparse).collect()}
    assert got == want

    # hole in the year sequence (2021 then 2023): fallback, exact
    hole_days = [dt.date(2021, 12, 20) + dt.timedelta(days=i) for i in range(10)] + [
        dt.date(2023, 1, 1) + dt.timedelta(days=i) for i in range(10)
    ]
    daily_hole = series(hole_days)
    got = {tuple(r) for r in yearly_windowed(daily_hole, 7, aggs).collect()}
    want = {tuple(r) for r in global_ref(daily_hole).collect()}
    assert got == want
