"""S12 repair-pass parity: recover complete objects from corrupted
JSON-array exports (json_clean.py:105-224 semantics)."""

from __future__ import annotations

import json

import pytest

from conversation_analysis_tools_spark.sources.json_repair import (
    extract_array_objects,
    repair_json_array_text,
    repaired_objects,
    validate_json_files,
)

GOOD = [{"id": 1, "msg": 'say "hi" {ok}'}, {"id": 2, "nested": {"a": [1, 2]}}]

#: trailing comma after last object + truncated third object (the two
#: breakages the reference's fixer targets) + inter-object garbage
CORRUPT = (
    "[\n"
    + json.dumps(GOOD[0])
    + ", ,,\n"
    + json.dumps(GOOD[1])
    + ',\n{"id": 3, "msg": "half-written exp'
)


def test_extract_recovers_complete_objects():
    objs, diag = extract_array_objects(CORRUPT)
    assert [json.loads(o) for o in objs] == GOOD
    assert diag["n_recovered"] == 2
    assert diag["truncated_tail"] is True
    assert diag["ends_with_bracket"] is False


def test_repair_emits_valid_json():
    fixed, diag = repair_json_array_text(CORRUPT)
    assert json.loads(fixed) == GOOD
    # idempotent on already-valid input
    fixed2, diag2 = repair_json_array_text(fixed)
    assert json.loads(fixed2) == GOOD
    assert diag2["truncated_tail"] is False


def test_invalid_objects_dropped_and_counted():
    text = '[{"ok": 1}, {"bad": 01}, {"ok": 2}]'  # leading zero: invalid
    objs, diag = extract_array_objects(text)
    assert [json.loads(o) for o in objs] == [{"ok": 1}, {"ok": 2}]
    assert diag["n_invalid"] == 1


def test_braces_inside_strings_do_not_split():
    text = '[{"a": "}{"}, {"b": "{{{"}]'
    objs, _ = extract_array_objects(text)
    assert [json.loads(o) for o in objs] == [{"a": "}{"}, {"b": "{{{"}]


@pytest.fixture()
def corrupt_file(tmp_path):
    p = tmp_path / "export.json"
    p.write_text(CORRUPT, encoding="utf-8")
    return str(p)


def test_distributed_repair(spark, corrupt_file):
    rows = repaired_objects(spark, corrupt_file).collect()
    assert [json.loads(r["obj"]) for r in rows] == GOOD

    diag = validate_json_files(spark, corrupt_file).collect()[0]
    assert diag["n_recovered"] == 2
    assert diag["truncated_tail"] is True
    assert diag["starts_with_bracket"] is True


def test_salvage_read(spark, corrupt_file):
    from conversation_analysis_tools_spark.sources.conversations import (
        read_json_with_repair,
    )

    df = read_json_with_repair(spark, corrupt_file, salvage=True)
    got = sorted(r["id"] for r in df.select("id").collect())
    assert got == [1, 2]
