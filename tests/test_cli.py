"""run_pipeline CLI: reference-shape YAML maps onto the pipeline
config, and the end-to-end invocation writes results + prints stats."""

from __future__ import annotations

import os

from conversation_analysis_tools_spark.run_pipeline import (
    load_reference_config,
    main,
)


def test_reference_yaml_mapping():
    raw = {
        "keywords": ["ml", "ai"],
        "relevance": {"weights": {"density": 0.5, "coverage": 0.3, "tfidf": 0.2}},
        "summarizer": {"damping": 0.9, "summary_sentences": 5},
        "duplicate_threshold": 0.75,
        "priority": {
            "weights": {"relevance": 1.0},
            "keyword_thresholds": {
                "critical_keywords": ["urgent"],
                "high_keywords": ["soon"],
            },
        },
        "processing": {"skip_duplicates": True},
    }
    cfg = load_reference_config(raw)
    assert cfg == {
        "keywords": ["ml", "ai"],
        "relevance_weights": {"density": 0.5, "coverage": 0.3, "tfidf": 0.2},
        "textrank_damping": 0.9,
        "summary_top_k": 5,
        "duplicate_threshold": 0.75,
        "priority_weights": {"relevance": 1.0},
        "critical_keywords": ["urgent"],
        "high_keywords": ["soon"],
        "remove_duplicates": True,
    }
    assert load_reference_config({}) == {}


def test_cli_end_to_end(spark, tmp_path):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "keywords: [data, model]\nduplicate_threshold: 0.9\n"
        "processing: {skip_duplicates: false}\n"
    )
    out = str(tmp_path / "results")
    stats = main(
        [
            "--config",
            str(cfg),
            "--data",
            "/root/testdata/sf0.001",
            "--limit",
            "100",
            "--output",
            out,
        ]
    )
    assert stats["n_docs"] == 100
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    back = spark.read.parquet(out)
    assert back.count() == 100
    assert "summary" in back.columns and "priority_level" in back.columns
