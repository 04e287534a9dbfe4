"""Embedding generation properties and the five conversation views
over ingested export data."""

import json

import pytest
from pyspark.sql import functions as F

from conversation_analysis_tools_spark import views as V
from conversation_analysis_tools_spark.operators.embed import tfidf_embeddings
from tests.test_ingest import CLAUDE_EXPORT


@pytest.fixture(scope="module")
def conv_tables(spark, tmp_path_factory):
    from conversation_analysis_tools_spark.sources import ingest_claude

    d = tmp_path_factory.mktemp("viewdata")
    p = d / "claude.json"
    p.write_text(json.dumps(CLAUDE_EXPORT))
    return ingest_claude(spark, str(p))


def test_embedding_dimensions_and_zero_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "machine learning machine"),
            (2, "deep learning networks"),
            (3, ""),  # zero tokens -> zero vector
        ],
        "doc_id long, text string",
    )
    emb = tfidf_embeddings(docs, vocab_size=10)
    rows = {r["doc_id"]: r["embedding"] for r in emb.collect()}
    assert len(rows) == 3
    dims = {len(v) for v in rows.values()}
    assert len(dims) == 1  # vocab-aligned, equal dimension
    assert all(x == 0.0 for x in rows[3])  # empty doc -> zero vector
    assert any(x != 0.0 for x in rows[1])


def test_message_pairs_and_response_time(spark, conv_tables):
    convs, msgs = conv_tables
    pairs = V.message_pairs(msgs).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert p["human_message_id"] == "m1" and p["assistant_message_id"] == "m2"
    assert p["response_sec"] == 5.0


def test_conversation_summary(spark, conv_tables):
    convs, msgs = conv_tables
    s = V.conversation_summary(convs, msgs).collect()[0]
    assert s["message_count"] == 2
    assert s["human_messages"] == 1 and s["assistant_messages"] == 1
    assert s["duration_minutes"] == round(5 / 60, 4)  # view rounds to 4 places


def test_model_usage_and_sql_endpoint(spark, conv_tables):
    convs, msgs = conv_tables
    V.register_conversation_views(spark, convs, msgs)
    mu = {r["model"]: r for r in spark.table("model_usage").collect()}
    assert mu["claude"]["message_count"] == 2
    # S6 raw SQL over the registered views
    out = V.run_sql(
        spark,
        "SELECT platform, count(*) AS n FROM messages m "
        "JOIN conversations c ON m.conversation_id = c.id GROUP BY platform",
    ).collect()
    assert out[0]["platform"] == "claude" and out[0]["n"] == 2


def test_time_activity_and_length_stats(spark, conv_tables):
    convs, msgs = conv_tables
    ta = V.time_activity(convs, msgs).collect()
    assert ta[0]["message_count"] == 2 and ta[0]["active_conversations"] == 1
    ls = {r["sender"]: r for r in V.message_length_stats(msgs).collect()}
    assert ls["human"]["message_count"] == 1
    assert ls["human"]["total_length"] == len("hello there")
