"""Deterministic two-platform conversation-export fixture for the
ingest driver certificates (VERDICT r10 item 3).

Writes tests/fixtures/ingest/{claude_export.json, claude_export_v2.json,
chatgpt_export.json} -- COMMITTED files; re-running must be
byte-identical (sorted keys, fixed content, no timestamps-of-now).

Hostile cases packed in (reference anchors: uni_parse.py:260-335
Claude normalize, :337-508 ChatGPT BFS, :510-544 timestamp forms,
:547-569 INSERT OR REPLACE):

* Z-suffixed, offset (+02:00), fractional-second, and NULL timestamps
* content longer than the 100,000-char ingest truncation
* duplicate message PK within one export (m-dup x2 -- INSERT OR
  REPLACE keeps the LAST file-order occurrence = max order_index)
* a v2 re-export that edits one message and adds another (cross-batch
  upsert: new batch beats store)
* ChatGPT: branched tree (two children), two roots, dangling child
  pointer, message=None nodes, missing message id (node_id fallback),
  non-string content part (json.dumps), empty parts, missing
  model_slug, missing author role, unix float create_time,
  conversation keyed by `id` instead of `conversation_id`
* a conversation with zero messages
"""

import json
import os

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "ingest",
)

LONG_TEXT = "".join(f"chunk{i:07d} " for i in range(7705))[:100_050]
assert len(LONG_TEXT) == 100_050

CLAUDE_EXPORT = [
    {
        "uuid": "c-alpha",
        "name": "Alpha chat",
        "created_at": "2024-01-01T10:00:00Z",
        "updated_at": "2024-01-02T09:30:00.250Z",
        "account": {"uuid": "acct-1"},
        "summary": "alpha summary",
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
                "text": LONG_TEXT,
                "created_at": "2024-01-01T12:00:05+02:00",
                "attachments": [{"file_name": "a.txt"}],
            },
            {
                "uuid": "m3",
                "sender": "human",
                "text": "final words",
                "created_at": None,
                "attachments": [],
            },
        ],
    },
    {
        "uuid": "c-beta",
        "name": None,
        "created_at": "2024-02-01T00:00:00Z",
        "updated_at": "2024-02-01T00:00:00Z",
        "account": None,
        "summary": "",
        "chat_messages": [
            {
                "uuid": "m-dup",
                "sender": "human",
                "text": "first occurrence",
                "created_at": "2024-02-01T00:00:01Z",
                "attachments": [],
            },
            {
                "uuid": "m-dup",
                "sender": "human",
                "text": "second occurrence wins",
                "created_at": "2024-02-01T00:00:02Z",
                "attachments": [],
            },
        ],
    },
    {
        "uuid": "c-gamma",
        "name": "Empty chat",
        "created_at": "2024-03-05T08:15:30Z",
        "updated_at": "2024-03-05T08:15:30Z",
        "account": {"uuid": "acct-2"},
        "summary": None,
        "chat_messages": [],
    },
]

# v2 re-export: c-alpha only, m1 edited + m9 appended (m2/m3 absent --
# the store must keep them; upsert is INSERT OR REPLACE, not sync)
CLAUDE_EXPORT_V2 = [
    {
        "uuid": "c-alpha",
        "name": "Alpha chat (renamed)",
        "created_at": "2024-01-01T10:00:00Z",
        "updated_at": "2024-01-03T18:00:00Z",
        "account": {"uuid": "acct-1"},
        "summary": "alpha summary v2",
        "chat_messages": [
            {
                "uuid": "m1",
                "sender": "human",
                "text": "hello there (edited)",
                "created_at": "2024-01-01T10:00:00Z",
                "attachments": [],
            },
            {
                "uuid": "m9",
                "sender": "assistant",
                "text": "appended in v2",
                "created_at": "2024-01-03T17:59:00Z",
                "attachments": [],
            },
        ],
    },
]

CHATGPT_EXPORT = [
    {
        "conversation_id": "g-1",
        "title": "Branched tree",
        "create_time": 1704103200,
        "update_time": 1704106800,
        "mapping": {
            "root": {"parent": None, "children": ["n1"], "message": None},
            "n1": {
                "parent": "root",
                "children": ["n2", "n3"],
                "message": {
                    "id": "gm1",
                    "author": {"role": "user"},
                    "content": {"parts": ["question?"]},
                    "create_time": 1704103200.5,
                    "metadata": {},
                },
            },
            "n2": {
                "parent": "n1",
                "children": ["n4"],
                "message": {
                    "id": "gm2",
                    "author": {"role": "assistant"},
                    "content": {"parts": ["answer A"]},
                    "create_time": 1704103260,
                    "metadata": {"model_slug": "gpt-4"},
                },
            },
            "n3": {
                "parent": "n1",
                "children": [],
                "message": {
                    "author": {"role": "assistant"},
                    "content": {"parts": ["answer B (regenerated)"]},
                    "create_time": 1704103261,
                    "metadata": {},
                },
            },
            "n4": {
                "parent": "n2",
                "children": ["n-dangling"],
                "message": {
                    "id": "gm4",
                    "author": {"role": "user"},
                    "content": {"parts": ["text part", {"image": "ptr-1"}]},
                    "create_time": None,
                    "metadata": {},
                },
            },
        },
    },
    {
        "id": "g-2",
        "create_time": None,
        "update_time": 1710000000,
        "mapping": {
            "ra": {
                "parent": None,
                "children": ["z1"],
                "message": {
                    "id": "gma",
                    "author": {"role": "user"},
                    "content": {"parts": ["root a says"]},
                    "create_time": 1709999000,
                    "metadata": {},
                },
            },
            "rb": {
                "parent": None,
                "children": [],
                "message": {
                    "id": "gmb",
                    "author": {},
                    "content": {"parts": []},
                    "create_time": 1709999100,
                    "metadata": {},
                },
            },
            "z1": {
                "parent": "ra",
                "children": [],
                "message": {
                    "id": "gmz",
                    "author": {"role": "tool"},
                    "content": {"parts": ["tool output"]},
                    "create_time": 1709999200,
                    "metadata": {"model_slug": "gpt-4o"},
                },
            },
        },
    },
]


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    for name, data in (
        ("claude_export.json", CLAUDE_EXPORT),
        ("claude_export_v2.json", CLAUDE_EXPORT_V2),
        ("chatgpt_export.json", CHATGPT_EXPORT),
    ):
        path = os.path.join(OUT_DIR, name)
        with open(path, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
