"""Hybrid-retrieval anchors (queries/retrieval.py). Cross-engine
exactness is the oracle gate's job; these pin ranking invariants."""

from __future__ import annotations

from conversation_analysis_tools_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def test_bm25_ranking_invariants(spark):
    rows = REGISTRY["bm25_topk"].fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 10
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_rrf_fuses_both_lists(spark):
    rows = REGISTRY["hybrid_rrf"].fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 10
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    # max possible rrf = rank 1 in both lists = 2/61
    assert all(0 < r["rrf"] <= round(2 / 61, 6) for r in rows)
    # the top fused doc should beat a single-list-only contribution
    assert rows[0]["rrf"] > round(1 / 61, 6) or len(rows) < 10
