"""Anchors for the round-2 curation additions: Gopher quality rules
(pinned on constructed docs with known rule outcomes) and near-dup
canonical selection (quality-argmax semantics). Strict value parity
lives in the DuckDB oracle gate; these pin the rule logic itself.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _flags(spark, sf_dir):
    from conversation_analysis_tools_spark.queries.textstats import (
        gopher_quality_flags,
    )

    return gopher_quality_flags(spark, sf_dir)


def test_gopher_rules_pinned(spark, tmp_path):
    # build a parquet 'documents' table with one doc per rule outcome
    good = "the quick brown fox jumps over that lazy dog and we have " + (
        "word " * 45
    )
    rows = [
        (1, good),                           # passes everything
        (2, "short of the and that"),        # < 50 words
        (3, ("supercalifragilistic " * 60) + "the of and that be"),  # mean len > 10
        (4, " ".join(["123"] * 60) + " the of"),  # alpha frac < 0.8
        (5, "word " * 60),                   # < 2 distinct stop words
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in _flags(spark, str(tmp_path)).collect()}
    assert out[1]["passes_gopher"] is True
    assert out[2]["passes_gopher"] is False and out[2]["n_words"] < 50
    assert out[3]["passes_gopher"] is False and out[3]["mean_word_len"] > 10
    assert out[4]["passes_gopher"] is False and out[4]["alpha_frac"] < 0.8
    assert out[5]["passes_gopher"] is False and out[5]["n_stops"] < 2


def test_canonical_is_longest_then_lowest_id(spark):
    # two clusters with known longest members; component = min id
    from conversation_analysis_tools_spark.operators import components as C
    from pyspark.sql.window import Window

    docs = spark.createDataFrame(
        [(1, 100), (2, 300), (3, 300), (7, 50), (8, 90)],
        "id long, n_chars long",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "id1 long, id2 long")
    comp = C.connected_components(pairs)
    members = comp.join(docs, "id")
    w = Window.partitionBy("component").orderBy(F.desc("n_chars"), F.asc("id"))
    out = {
        r["id"]: (r["component"], r["canon"])
        for r in members.withColumn(
            "canon", F.row_number().over(w) == 1
        ).collect()
    }
    # cluster {1,2,3}: 2 and 3 tie at 300 chars -> lower id 2 wins
    assert out[1] == (1, False)
    assert out[2] == (1, True)
    assert out[3] == (1, False)
    # cluster {7,8}: 8 is longer
    assert out[8] == (7, True) and out[7] == (7, False)


def test_pii_redaction_fixed_hand_pinned(spark):
    """Hand-written expected strings for the full-pattern redaction
    chain: the driver oracle recomputes via DuckDB (dialect parity),
    so these literals are the independent anchor that catches both
    dialects drifting together."""
    from conversation_analysis_tools_spark.queries.textstats import (
        pii_redaction_fixed,
    )

    from tests.conftest import SF_DIR

    # case_id >= 1000 is the corpus-grain scrub absorbed from the
    # retired pii_scrub (round 10); the hand-pinned anchors are the
    # ten fixed hostile literals below it
    got = {
        r["case_id"]: r["redacted"]
        for r in pii_redaction_fixed(spark, SF_DIR).collect()
        if r["case_id"] < 1000
    }
    assert got == {
        1: "reach me at <EMAIL> today",
        2: "card <CC> expires soon",
        3: "card <CC> expires soon",
        4: "ssn <SSN> on file",
        5: "call <PHONE> or <PHONE> or <PHONE>",
        6: "server <IP> and <IP> up",
        # both digit runs survive: the bare 10-digit id (no separator)
        # and the 13-digit separated run whose 3-3-4 SUFFIX the old
        # boundary-less phone pattern used to eat ('12<PHONE>')
        7: "order 1234567890 and ref 12345-678-9012 shipped",
        8: "fake <SSN> vs <PHONE> mixed",
        9: "ip <IP> via <EMAIL> build",
        10: "no personal data in this sentence.",
    }


def test_redact_pii_replaces_all_occurrences_and_composes(spark):
    """Spark replaces every match (no 'g' flag needed) and the chain
    leaves non-PII text byte-identical."""
    from conversation_analysis_tools_spark.functions.redact import redact_pii

    df = spark.createDataFrame(
        [("a@b.co then c@d.org and 1.1.1.1 plus plain text",)], "s string"
    )
    out = df.select(redact_pii("s").alias("r")).first()["r"]
    assert out == "<EMAIL> then <EMAIL> and <IP> plus plain text"


def test_gopher_repetition_hand_computed(spark, monkeypatch):
    """Planted pages with hand-computable repetition stats: a
    six-fold repeated word saturates both gram rules (clamped 1.0),
    and an all-distinct doc's top-2-gram fraction is exactly
    len(first 2-gram)/len(text)."""
    from conversation_analysis_tools_spark.queries import textstats as TS

    docs = spark.createDataFrame(
        [
            (0, "spam spam spam spam spam spam"),
            (1, "alpha bravo charlie delta echo foxtrot golf hotel india"),
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(TS, "_docs", lambda spark, sf_dir: docs)
    got = {
        r["doc_id"]: r.asDict()
        for r in TS.gopher_repetition_flags(spark, "unused").collect()
    }
    # doc 0: 2-gram 'spam spam' occurs 5x, len 9 -> 45 chars over a
    # 29-char text -> clamped 1.0; 5-gram dup 2*24=48 -> 1.0. The
    # planted page duplicates line 1 for doc_id%4==0: 5 lines, 4
    # distinct -> dup_line_frac 0.2.
    assert got[0]["top_2gram_char_frac"] == 1.0
    assert got[0]["dup_5gram_char_frac"] == 1.0
    assert got[0]["dup_line_frac"] == 0.2
    assert got[0]["passes_repetition"] is False
    # doc 1: all 2-grams distinct -> top2 = len('alpha bravo')=11 over
    # len(text)=55 -> 0.2 exactly; no duplicate 5-grams; no dup lines.
    assert got[1]["top_2gram_char_frac"] == 0.2
    assert got[1]["dup_5gram_char_frac"] == 0.0
    assert got[1]["dup_line_frac"] == 0.0
    assert got[1]["passes_repetition"] is True
