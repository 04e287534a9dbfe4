"""S12: JSON-array validation + repair (json_clean.py:14-231).

The reference validates an export file, diagnoses common breakages,
and rewrites a fixed copy by scanning characters and keeping only the
complete top-level objects (json_clean.py:105-224: brace balance +
string/escape state, commas regenerated, truncated trailing objects
dropped). This module reproduces those observable semantics:

* trailing commas between objects -> removed,
* truncated final object (half-written export) -> dropped,
* garbage between objects -> skipped,
* every recovered object must itself parse (json.loads) or it is
  dropped and counted.

Spark-first shape: repair is a FILE-grain operation (the corruption
unit is one export file), so the distributed form reads whole files
(``spark.read.text(wholetext)``) and repairs each inside one Arrow
batch via ``mapInPandas`` -- thousands of export files repair in
parallel, and the recovered objects flow on as ordinary rows. Nothing
touches the driver.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def extract_array_objects(text: str) -> tuple[list[str], dict]:
    """Scan a (possibly corrupted) JSON-array string and return the
    complete top-level ``{...}`` objects plus a diagnosis dict.

    Single pass, quote/escape-aware brace balancing; an object left
    open at EOF (truncated export) is simply never emitted. Objects
    that fail ``json.loads`` are dropped and counted.
    """
    diag = {
        "starts_with_bracket": text.lstrip()[:1] == "[",
        "ends_with_bracket": text.rstrip()[-1:] == "]",
        "n_recovered": 0,
        "n_invalid": 0,
        "truncated_tail": False,
    }
    objs: list[str] = []
    depth = 0
    in_str = False
    esc = False
    start = None
    for i, c in enumerate(text):
        if esc:
            esc = False
        elif c == "\\":
            esc = True
        elif c == '"':
            in_str = not in_str
        elif not in_str:
            if c == "{":
                if depth == 0:
                    start = i
                depth += 1
            elif c == "}":
                depth -= 1
                if depth == 0 and start is not None:
                    cand = text[start : i + 1]
                    try:
                        json.loads(cand)
                        objs.append(cand)
                    except ValueError:
                        diag["n_invalid"] += 1
                    start = None
                elif depth < 0:
                    depth = 0  # stray close brace: resynchronize
    diag["truncated_tail"] = depth > 0 or in_str
    diag["n_recovered"] = len(objs)
    return objs, diag


def repair_json_array_text(text: str) -> tuple[str, dict]:
    """Rewrite a corrupted JSON-array string into a valid one
    (json_clean.py:105-224 equivalent): recovered objects re-joined
    with ',\\n' inside '[...]'. Always emits valid JSON (possibly
    ``[]``)."""
    objs, diag = extract_array_objects(text)
    return "[\n" + ",\n".join(objs) + "\n]", diag


def repaired_objects(spark: SparkSession, path: str) -> DataFrame:
    """Distributed repair: (file, obj) rows -- one row per salvaged
    top-level object across every matched export file.

    Callers parse ``obj`` with ``F.from_json`` against their platform
    schema (see sources/conversations.py) or hand it to
    ``spark.read.json`` for inference.
    """
    import pandas as pd

    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), "value"
    )

    def fix(batches):
        for pdf in batches:
            for file, value in zip(pdf["file"], pdf["value"]):
                objs, _ = extract_array_objects(value or "")
                if objs:
                    yield pd.DataFrame({"file": file, "obj": objs})

    return raw.mapInPandas(fix, schema="file string, obj string")


def validate_json_files(spark: SparkSession, path: str) -> DataFrame:
    """Per-file diagnosis (json_clean.py:14-103 info dict): bracket
    sanity, recovered/invalid object counts, truncation flag."""
    import pandas as pd

    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), "value"
    )

    def diagnose(batches):
        for pdf in batches:
            rows = []
            for file, value in zip(pdf["file"], pdf["value"]):
                _, d = extract_array_objects(value or "")
                rows.append(
                    {
                        "file": file,
                        "starts_with_bracket": d["starts_with_bracket"],
                        "ends_with_bracket": d["ends_with_bracket"],
                        "n_recovered": d["n_recovered"],
                        "n_invalid": d["n_invalid"],
                        "truncated_tail": d["truncated_tail"],
                    }
                )
            yield pd.DataFrame(rows)

    return raw.mapInPandas(
        diagnose,
        schema=(
            "file string, starts_with_bracket boolean, "
            "ends_with_bracket boolean, n_recovered long, "
            "n_invalid long, truncated_tail boolean"
        ),
    )
