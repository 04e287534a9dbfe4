"""Anchors for the corpus sampling / splitting / packing family
(queries/sampling.py): determinism, ratio sanity, packing math, PII
masking completeness. The strict value checks live in the DuckDB
oracle gate; these pin the invariants on sf0.001."""

from __future__ import annotations

from conversation_analysis_tools_spark.queries import REGISTRY
from conversation_analysis_tools_spark.queries.sampling import (
    SEQ_BUDGET,
    corpus_ngram_top20,
    hash_split,
    source_mixing_sample,
    token_budget_pack,
    unigram_logprob,
)

from tests.conftest import SF_DIR


def test_hash_split_deterministic_and_partitions(spark):
    a = {r["doc_id"]: r["split"] for r in hash_split(spark, SF_DIR).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(spark, SF_DIR).collect()}
    assert a == b  # no RNG anywhere
    assert set(a.values()) <= {"train", "eval"}
    frac_eval = sum(v == "eval" for v in a.values()) / len(a)
    assert 0.02 < frac_eval < 0.25  # ~10% nominal, wide tolerance at tiny sf


def test_source_mixing_rates(spark):
    rows = source_mixing_sample(spark, SF_DIR).collect()
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_total"]
    # pooled even- vs odd-source keep rates must straddle their targets
    even = [r for r in rows if int(r["source"][3:]) % 2 == 0]
    odd = [r for r in rows if int(r["source"][3:]) % 2 == 1]
    if even and odd:
        ke = sum(r["n_kept"] for r in even) / sum(r["n_total"] for r in even)
        ko = sum(r["n_kept"] for r in odd) / sum(r["n_total"] for r in odd)
        assert ke < ko  # 25% vs 75% targets


def test_token_budget_pack_monotone(spark):
    rows = token_budget_pack(spark, SF_DIR).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, docs in by_src.items():
        docs.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in docs:
            assert r["seq_id"] == cum // SEQ_BUDGET
            cum += r["n_tokens"]


def test_unigram_logprob_negative_and_weighted(spark):
    rows = unigram_logprob(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["avg_logprob"] < 0  # probabilities < 1
        assert r["n_tokens"] > 0


def test_corpus_ngram_top20_sorted(spark):
    rows = corpus_ngram_top20(spark, SF_DIR).collect()
    assert len(rows) <= 20
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)


def test_pii_corpus_rows_mask_everything(spark):
    # the retired pii_scrub certificate's masking-completeness anchor,
    # now over the corpus-grain rows (case_id >= 1000) of the merged
    # pii_redaction_fixed: every planted email and phone is masked
    from conversation_analysis_tools_spark.queries.textstats import (
        pii_redaction_fixed,
    )

    rows = [
        r
        for r in pii_redaction_fixed(spark, SF_DIR).collect()
        if r["case_id"] >= 1000
    ]
    assert rows
    for r in rows:
        assert "@" not in r["redacted"]
        assert "<EMAIL>" in r["redacted"] and "<PHONE>" in r["redacted"]


def test_doc_chunks_reassemble_and_stride(spark):
    """Chunks cover the full text: stride-prefix concatenation of all
    chunks except the last, plus the last chunk, reassembles the doc;
    every doc (even empty) yields a chunk 0."""
    from conversation_analysis_tools_spark.catalog import table

    chunks = REGISTRY["doc_chunks"].fn(spark, SF_DIR)
    docs = {r["doc_id"]: r["text"] for r in table(spark, "documents", SF_DIR).collect()}
    by_doc = {}
    for r in chunks.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
        text = docs[doc_id]
        rebuilt = "".join(r["chunk_text"][:150] for r in rows[:-1]) + rows[-1]["chunk_text"]
        assert rebuilt == text
        for r in rows:
            assert r["chunk_len"] == len(r["chunk_text"]) <= 200


def test_dsir_importance_separates_target_domain(spark):
    """The importance log-ratio must rank target-source docs above the
    rest on average -- the whole point of the DSIR signal."""
    from pyspark.sql import functions as F

    from conversation_analysis_tools_spark.catalog import table
    from conversation_analysis_tools_spark.queries.sampling import (
        _DSIR_TARGET_SOURCE,
    )

    w = REGISTRY["dsir_importance"].fn(spark, SF_DIR)
    docs = table(spark, "documents", SF_DIR).select("doc_id", "source")
    m = (
        w.join(docs, "doc_id")
        .groupBy(F.col("source") == _DSIR_TARGET_SOURCE)
        .agg(F.avg("dsir_logratio").alias("mean_lr"))
        .collect()
    )
    means = {r[0]: r["mean_lr"] for r in m}
    assert means[True] > means[False], means
