"""Engine-wide plan invariant: no registered query may plan a
CartesianProduct, and BroadcastNestedLoopJoin is allowed only where a
deliberately-broadcast bounded side is documented.

A CartesianProduct is the O(n^2) shuffle disaster that cannot survive
a 100x scale-up; every pair-shaped operator in this engine is supposed
to generate candidates via bucketed/banded/inverted joins instead
(SURVEY §4 item 1). This test freezes that property for EVERY query in
the registry, so a future "quick fix" that degrades a join into a
cross product fails CI instead of failing at the terabyte.
"""

from __future__ import annotations

import pytest

from conversation_analysis_tools_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"

#: Queries whose construction EXECUTES a streaming drain (their result
#: is a memory-sink table, not a lazy plan). Stream-stream cartesian
#: isn't plannable in Spark, and their batch-side finishers are
#: covered by the oracle gate; re-draining every stream here would
#: only slow the suite.
STREAM_DRAINS = {
    "streaming_tumbling",
    "stateful_sessionize",
    "streaming_static_enrich",
    "streaming_dedup_first",
    "streaming_stream_join",
    "streaming_rollup_maintenance",
    "session_windows_30m",
    "window_tumbling_hourly",
    "window_sliding_2h1h",
    "streaming_neardup_dedup",
    "streaming_hll_maintenance",
    "streaming_curation_funnel",
}

#: Queries allowed to plan BroadcastNestedLoopJoin: each broadcasts a
#: PROVABLY BOUNDED side (a 1-row stats frame, a fixed <=25-row query
#: set, a codebook) -- the documented exact/bounded baselines.
BNLJ_ALLOWED = {
    "ann_bruteforce_knn",  # exact baseline: broadcast 25 queries (ann.py:81)
    "ann_recall_frontier",  # composes the exact baseline
    "ann_int8_knn",  # broadcast quantized query table (ann.py:328)
    "ann_pq_knn",  # broadcast PQ codebook/query table (ann.py:475)
    "quantile_filter",  # broadcast 1-row p95 scalar (relational.py:310)
    "bm25_topk",  # broadcast 1-row (N, avgdl) stats (bm25.py:46-60)
    "hybrid_rrf",  # composes bm25
    "semantic_search_topk",  # broadcast single query vector
    "temperature_mixture",  # broadcast 1-row totals (sampling.py:390)
    "data_recipe_epochs",  # broadcast the same 1-row totals frame
    "source_mixing_sample",  # broadcast per-source quota frame
    "dsir_importance",  # broadcast hashed-bucket LM tables
    "classifier_accuracy_cert",  # broadcast eval split stats
    "decontamination_check",  # broadcast eval-set fingerprints
    "decontamination_minhash",  # broadcast eval band table
    "decontamination_bloom",  # broadcast 1-row 32 KiB Bloom bitset (bloom.py)
    "audience_overlap_theta",  # broadcast per-type sketch table (one
    # KB-sized row per event type) under the type_a < type_b pair
    # predicate -- bounded by type cardinality, never by events
    "rollup_heavy_hitters_cms",  # broadcast 1-row total-N frame
    "zorder_clustered_scan",  # broadcast 1-row min/max stats frame
    "corpus_drift_kl",  # broadcast 1-row (n_new, n_old, V) totals frame
}


@pytest.fixture(scope="module")
def plans(spark):
    """Build every (non-drain) query's plan once; explain only."""
    out = {}
    for name, q in REGISTRY.items():
        if name in STREAM_DRAINS:
            continue
        df = q.fn(spark, SF_DIR)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_cartesian_product_anywhere(plans):
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not offenders, f"CartesianProduct planned by: {offenders}"


def test_bnlj_only_on_documented_bounded_broadcasts(plans):
    offenders = [
        n
        for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in BNLJ_ALLOWED
    ]
    assert not offenders, (
        "BroadcastNestedLoopJoin outside the documented bounded-side "
        f"allowlist: {offenders}"
    )


def test_allowlist_entries_exist():
    unknown = (BNLJ_ALLOWED | STREAM_DRAINS) - set(REGISTRY)
    assert not unknown, f"stale allowlist names: {unknown}"
