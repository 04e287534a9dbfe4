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


# ---------------------------------------------------------------------------
# search CLI (sql_search.py counterpart)
# ---------------------------------------------------------------------------


def test_snippet_search_highlight(spark):
    from conversation_analysis_tools_spark.search import snippet_search

    docs = spark.createDataFrame(
        [
            (1, "x" * 100 + " the Spark engine rocks " + "y" * 100, "s"),
            (2, "no match here", "s"),
            (3, "spark at the start", "s"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {r["doc_id"]: r["snippet"] for r in snippet_search(docs, "Spark").collect()}
    assert set(rows) == {1, 3}
    # clipped both sides, case-insensitive highlight of every match
    assert rows[1].startswith("...") and rows[1].endswith("...")
    assert "[spark]" in rows[1].lower()
    # match at position 0: no leading ellipsis
    assert rows[3].startswith("[spark]")


def test_boolean_predicate_parsing(spark):
    from conversation_analysis_tools_spark.search import boolean_predicate

    docs = spark.createDataFrame(
        [
            (1, "alpha beta"),
            (2, "alpha gamma"),
            (3, "delta"),
            (4, "alpha beta gamma"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        r[0]
        for r in docs.where(
            boolean_predicate("alpha AND beta NOT gamma OR delta")
        ).select("doc_id").collect()
    )
    # (alpha & beta & !gamma) | delta -> docs 1 and 3
    assert got == [1, 3]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        boolean_predicate("alpha OR")
    with _pytest.raises(ValueError):
        boolean_predicate("")


def test_boolean_operator_words_searchable_lowercase(spark):
    """Lowercase and/or/not are literal terms, not operators -- the
    operator words themselves stay searchable (ADVICE r3)."""
    from conversation_analysis_tools_spark.search import boolean_predicate

    docs = spark.createDataFrame(
        [
            (1, "salt and pepper"),
            (2, "salt pepper"),
            (3, "to be or not to be"),
        ],
        "doc_id long, text string",
    )

    def ids(expr):
        return sorted(
            r[0] for r in docs.where(boolean_predicate(expr)).select("doc_id").collect()
        )

    # lowercase 'and' is a term: only doc 1 contains "and"
    assert ids("and") == [1]
    assert ids("salt AND and") == [1]
    # a single lowercase operator word must not raise
    assert ids("not") == [3]


def test_search_cli_end_to_end(tmp_path, capsys):
    from conversation_analysis_tools_spark.search import main as search_main

    rc = search_main(
        ["spark", "--data", "/root/testdata/sf0.001", "--limit", "2",
         "--export", str(tmp_path / "hits.csv"), "--master", "local[4]"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "[spark]" in out and "exported" in out
    assert any(f.endswith(".csv") for f in os.listdir(tmp_path / "hits.csv"))


def test_snippet_metachar_query_and_casing(spark):
    """$/\\ in the query must not hit Java replacement metacharacters,
    and the highlight echoes the ORIGINAL casing via $0."""
    from conversation_analysis_tools_spark.search import snippet_search

    docs = spark.createDataFrame(
        [(1, "price is 100$ total", "s"), (2, "CamelCase Spark here", "s")],
        "doc_id long, text string, source string",
    )
    rows = {r["doc_id"]: r["snippet"] for r in snippet_search(docs, "100$").collect()}
    assert rows == {1: "price is [100$] total"}
    rows = {r["doc_id"]: r["snippet"] for r in snippet_search(docs, "spark").collect()}
    assert "[Spark]" in rows[2]  # original casing kept


def test_boolean_and_not(spark):
    from conversation_analysis_tools_spark.search import boolean_predicate

    docs = spark.createDataFrame(
        [(1, "error timeout"), (2, "error ok"), (3, "not an error here")],
        "doc_id long, text string",
    )
    got = sorted(
        r[0]
        for r in docs.where(boolean_predicate("error AND NOT timeout"))
        .select("doc_id").collect()
    )
    assert got == [2, 3]  # doc 1 excluded; 'not' is an operator, not a term
