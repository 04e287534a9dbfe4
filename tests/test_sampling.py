"""Anchors for the corpus sampling / splitting / packing family
(queries/sampling.py): determinism, ratio sanity, packing math, PII
masking completeness. The strict value checks live in the DuckDB
oracle gate; these pin the invariants on sf0.001."""

from __future__ import annotations

from conversation_analysis_tools_spark.queries.sampling import (
    SEQ_BUDGET,
    corpus_ngram_top20,
    hash_split,
    pii_scrub,
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


def test_pii_scrub_masks_everything(spark):
    rows = pii_scrub(spark, SF_DIR).collect()
    for r in rows:
        assert r["n_emails"] >= 1 and r["n_phones"] >= 1
        assert "@" not in r["scrubbed"]
        assert "<EMAIL>" in r["scrubbed"] and "<PHONE>" in r["scrubbed"]
