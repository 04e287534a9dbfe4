"""Streaming HLL sketch maintenance (streaming/sketches.py):
batching-invariance and replay idempotency by ALGEBRA."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conversation_analysis_tools_spark.streaming.sketches import (
    build_day_sketches,
    fold_sketch_batch,
    merge_day_sketches,
)


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(
        [
            (i, f"2024-01-{(i % 3) + 1:02d} 0{i % 9}:00:00", i % 17)
            for i in range(200)
        ],
        "event_id long, ts_s string, user_id long",
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "user_id")


def _estimates(state):
    return {
        r["d"].isoformat(): r["est"]
        for r in state.selectExpr("d", "hll_sketch_estimate(sk) AS est").collect()
    }


def test_merge_equals_oneshot_at_any_split(spark, events):
    """Union of per-split sketches == one-shot sketch, for several
    split points -- the property that makes ANY micro-batching give
    the same maintained state."""
    oneshot = _estimates(build_day_sketches(events))
    for cut in (1, 67, 133):
        a = build_day_sketches(events.where(F.col("event_id") < cut))
        b = build_day_sketches(events.where(F.col("event_id") >= cut))
        assert _estimates(merge_day_sketches(a, b)) == oneshot


def test_union_idempotent_replay(spark, events, tmp_path):
    """Re-folding the same batch (marker removed to force the apply
    path) leaves the estimates unchanged: HLL registers are maxima."""
    import os

    state = str(tmp_path / "state")
    fold_sketch_batch(events, 0, state)
    before = _estimates(spark.read.parquet(state))
    os.remove(os.path.join(state, "_applied_batch.json"))
    applied = fold_sketch_batch(events, 0, state)  # replay, re-applied
    assert applied is True
    after = _estimates(spark.read.parquet(state))
    assert after == before


def test_marker_skips_replay(spark, events, tmp_path):
    state = str(tmp_path / "state")
    assert fold_sketch_batch(events, 0, state) is True
    assert fold_sketch_batch(events, 0, state) is False  # marker skip
