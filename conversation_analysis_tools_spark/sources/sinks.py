"""Export sinks (SURVEY §2.1 S7-S10).

CSV/JSON are distributed writes; markdown/HTML rendering is
presentation (driver-side after a bounded collect), mirroring the
reference's per-conversation file renderers (sql_search.py:1843-1968)
without pretending they are engine operators.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_csv(df: DataFrame, path: str) -> None:
    """S7 CSV sink (sql_search.py:1970-2006)."""
    df.write.mode("overwrite").option("header", "true").csv(path)


def write_json_nested(messages: DataFrame, conversations: DataFrame, path: str) -> None:
    """S8 nested conversation+messages JSON export
    (sql_search.py:1832-1841): one JSON doc per conversation with its
    messages collected in order."""
    nested = (
        messages.orderBy("order_index")
        .groupBy("conversation_id")
        .agg(
            F.collect_list(
                F.struct("id", "sender", "content", "created_at", "order_index")
            ).alias("messages")
        )
        .join(conversations, conversations.id == F.col("conversation_id"))
        .select("id", "title", "platform", "created_at", "messages")
    )
    nested.write.mode("overwrite").json(path)


_SAFE_NAME = re.compile(r"[^A-Za-z0-9_-]+")


def render_markdown(conversation_row, message_rows) -> str:
    """S9 per-conversation markdown render (sql_search.py:1843-1884)
    -- driver-side formatting of an already-collected conversation."""
    lines = [f"# {conversation_row['title'] or conversation_row['id']}", ""]
    for m in message_rows:
        lines.append(f"## {m['sender']}")
        lines.append("")
        lines.append(m["content"] or "")
        lines.append("")
    return "\n".join(lines)


def safe_filename(title: str) -> str:
    """Filename sanitizer (sql_search.py:1851 regex idiom)."""
    return _SAFE_NAME.sub("_", title or "untitled")[:80]
