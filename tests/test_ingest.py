"""Ingest tests: Claude posexplode path, ChatGPT BFS tree flatten,
upsert semantics -- against tiny synthetic export files."""

import json
import os

import pytest
from pyspark.sql import functions as F

from conversation_analysis_tools_spark.sources import (
    detect_platform,
    ingest_chatgpt,
    ingest_claude,
    upsert_parquet,
)
from conversation_analysis_tools_spark.catalog import table
from tests.conftest import SF_DIR

CLAUDE_EXPORT = [
    {
        "uuid": "conv-1",
        "name": "Test chat",
        "created_at": "2024-01-01T10:00:00Z",
        "updated_at": "2024-01-01T11:00:00Z",
        "account": {"uuid": "acct-9"},
        "summary": "",
        "chat_messages": [
            {
                "uuid": "m1",
                "sender": "human",
                "text": "hello there",
                "created_at": "2024-01-01T10:00:00Z",
                "attachments": [],
            },
            {
                "uuid": "m2",
                "sender": "assistant",
                "text": "hi! how can I help?",
                "created_at": "2024-01-01T10:00:05Z",
                "attachments": [],
            },
        ],
    }
]

CHATGPT_EXPORT = [
    {
        "conversation_id": "g-1",
        "title": "Tree chat",
        "create_time": 1704103200.0,
        "update_time": 1704106800.0,
        "mapping": {
            "root": {"parent": None, "children": ["n1"], "message": None},
            "n1": {
                "parent": "root",
                "children": ["n2"],
                "message": {
                    "id": "gm1",
                    "author": {"role": "user"},
                    "content": {"parts": ["question?"]},
                    "create_time": 1704103200.0,
                    "metadata": {},
                },
            },
            "n2": {
                "parent": "n1",
                "children": [],
                "message": {
                    "id": "gm2",
                    "author": {"role": "assistant"},
                    "content": {"parts": ["answer."]},
                    "create_time": 1704103260.0,
                    "metadata": {"model_slug": "gpt-4"},
                },
            },
        },
    }
]


@pytest.fixture(scope="module")
def export_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("exports")
    claude = d / "claude.json"
    claude.write_text(json.dumps(CLAUDE_EXPORT))
    chatgpt = d / "chatgpt.json"
    chatgpt.write_text(json.dumps(CHATGPT_EXPORT))
    return str(claude), str(chatgpt)


def test_detect_platform(spark, export_files):
    claude, chatgpt = export_files
    assert detect_platform(spark, claude) == "claude"
    assert detect_platform(spark, chatgpt) == "chatgpt"


def test_claude_ingest(spark, export_files):
    claude, _ = export_files
    convs, msgs = ingest_claude(spark, claude)
    c = convs.collect()
    assert len(c) == 1 and c[0]["platform"] == "claude"
    assert c[0]["account_id"] == "acct-9"
    m = sorted(msgs.collect(), key=lambda r: r["order_index"])
    assert [r["id"] for r in m] == ["m1", "m2"]
    assert [r["order_index"] for r in m] == [0, 1]
    assert m[0]["role"] == m[0]["sender"] == "human"
    assert m[0]["parent_id"] is None
    assert m[1]["model"] == "claude"


def test_chatgpt_bfs_flatten(spark, export_files):
    _, chatgpt = export_files
    convs, msgs = ingest_chatgpt(spark, chatgpt)
    assert convs.collect()[0]["account_id"] is None
    m = sorted(msgs.collect(), key=lambda r: r["order_index"])
    assert [r["id"] for r in m] == ["gm1", "gm2"]
    assert m[0]["parent_id"] == "root" and m[1]["parent_id"] == "n1"
    assert m[0]["sender"] == "human" and m[0]["role"] == "user"
    assert m[1]["model"] == "gpt-4"


def test_upsert_keeps_latest(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    df1 = spark.createDataFrame([("a", 1), ("b", 1)], "id string, v int")
    upsert_parquet(df1, path)
    df2 = spark.createDataFrame([("b", 2), ("c", 2)], "id string, v int")
    upsert_parquet(df2, path)
    rows = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert rows == {"a": 1, "b": 2, "c": 2}


def test_upsert_latest_by_within_batch(spark, tmp_path):
    """Round 11: INSERT OR REPLACE precedence is explicit -- the new
    batch beats the store per key, and within a batch the row with
    the greatest latest_by wins (the reference's sequential last-row-
    wins, uni_parse.py:547-569, made deterministic distributed)."""
    path = str(tmp_path / "t.parquet")
    df1 = spark.createDataFrame(
        [("a", 0, "first"), ("a", 1, "second"), ("b", 0, "only")],
        "id string, oi int, v string",
    )
    upsert_parquet(df1, path, latest_by="oi")
    df2 = spark.createDataFrame(
        [("a", 0, "replaced")], "id string, oi int, v string"
    )
    upsert_parquet(df2, path, latest_by="oi")
    rows = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    # in-batch dup resolved by oi ('second'), then batch 2 replaces it
    # despite its LOWER oi -- batch precedence outranks latest_by
    assert rows == {"a": "replaced", "b": "only"}


def test_compact_parquet_reduces_files(spark, tmp_path):
    import os

    from conversation_analysis_tools_spark.sources.sinks import compact_parquet

    out = str(tmp_path / "frag")
    events = table(spark, "events", SF_DIR)
    # fragment: one file per partition x 16
    events.repartition(16).write.mode("overwrite").parquet(out)
    before = sum(
        1 for f in os.listdir(out) if f.endswith(".parquet") and not f.startswith("_")
    )
    n = compact_parquet(spark, out, target_file_mb=128)
    after = sum(
        1 for f in os.listdir(out) if f.endswith(".parquet") and not f.startswith("_")
    )
    assert after <= before and after == n
    assert spark.read.parquet(out).count() == events.count()


def test_orc_roundtrip(spark, tmp_path):
    from conversation_analysis_tools_spark.sources.sinks import read_orc, write_orc

    out = str(tmp_path / "events_orc")
    events = table(spark, "events", SF_DIR)
    write_orc(events, out)
    back = read_orc(spark, out)
    assert back.count() == events.count()
    assert set(back.columns) == set(events.columns)
