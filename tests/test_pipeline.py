"""End-to-end pipeline orchestration tests (mirrors the reference's
tests/test_pipeline.py invariants: result shape, dedup on/off, stats
math, empty input)."""

from pyspark.sql import functions as F

from conversation_analysis_tools_spark.pipeline import run_content_pipeline, store_results


CFG = {
    "keywords": ["machine", "learning", "network"],
    "critical_keywords": ["urgent"],
    "high_keywords": ["neural"],
    "duplicate_threshold": 0.8,
}


def test_pipeline_shapes_and_dup_flag(spark, sample_docs):
    out = run_content_pipeline(sample_docs, CFG)
    res = {r["message_id"]: r for r in out["analysis_results"].collect()}
    assert len(res) == 6
    assert res[5]["is_duplicate"] and not res[0]["is_duplicate"]
    assert set(res[0].asDict()) == {
        "message_id",
        "relevance_score",
        "summary",
        "priority_score",
        "priority_level",
        "is_duplicate",
    }
    assert all(0.0 <= r["relevance_score"] <= 1.0 for r in res.values())


def test_pipeline_remove_duplicates(spark, sample_docs):
    out = run_content_pipeline(sample_docs, {**CFG, "remove_duplicates": True})
    ids = [r["message_id"] for r in out["analysis_results"].collect()]
    assert sorted(ids) == [0, 1, 2, 3, 4]  # duplicate 5 dropped, rep 0 kept


def test_pipeline_stats(spark, sample_docs):
    out = run_content_pipeline(sample_docs, CFG)
    s = out["stats"].collect()[0]
    assert s["n_docs"] == 6 and s["n_duplicates"] == 1
    assert s["min_relevance"] <= s["avg_relevance"] <= s["max_relevance"]


def test_pipeline_store_roundtrip(spark, sample_docs, tmp_path):
    out = run_content_pipeline(sample_docs, CFG)
    path = str(tmp_path / "analysis_results.parquet")
    store_results(out["analysis_results"], path)
    assert spark.read.parquet(path).count() == 6


def test_pipeline_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    out = run_content_pipeline(empty, CFG)
    assert out["analysis_results"].count() == 0
    assert out["stats"].collect()[0]["n_docs"] == 0
