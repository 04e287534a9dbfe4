"""Conversation-export ingest and sinks (SURVEY §2.1)."""

from conversation_analysis_tools_spark.sources.conversations import (
    detect_platform,
    ingest_claude,
    ingest_chatgpt,
    ingest_file,
    read_json_with_repair,
    upsert_parquet,
)
from conversation_analysis_tools_spark.sources.sinks import (
    write_csv,
    write_json_nested,
    render_markdown,
)

__all__ = [
    "detect_platform",
    "ingest_claude",
    "ingest_chatgpt",
    "ingest_file",
    "read_json_with_repair",
    "upsert_parquet",
    "write_csv",
    "write_json_nested",
    "render_markdown",
]
