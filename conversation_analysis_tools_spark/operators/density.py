"""Exact-duplicate density probe shared by the collapse-capable pair
operators (similarity.duplicate_pairs, dedup.minhash_dedup_pairs,
dedup.ngram_jaccard_pairs, dedup.edit_distance_pairs,
dedup.cross_corpus_minhash_pairs).

Those operators each have two OUTPUT-IDENTICAL physical plans: a
direct plan (candidates over every doc) and a representative-collapse
plan (identical-content groups collapsed to one representative before
the candidate join, member pairs re-expanded after verify). The
collapse turns a dup cluster's quadratic candidate blowup into a
linear output expansion -- mandatory on dup-dense corpora (mirrors,
re-crawls, replica bursts) -- but its extra fingerprint groupBy,
rep semi-join, and expansion joins are pure fixed overhead on a
dup-light corpus (~+30-70% measured at sf0.1's 8 dups / 5k docs,
where the stage count dominates the tiny data).

The probe is ONE eager map-side job: approx_count_distinct over
md5(text) estimates the exact-dup count, and the collapse engages
above DUP_COLLAPSE_MIN_FRAC. Byte-identical text implies an
identical shingle set, so text-dup density lower-bounds every
operator's group density; a set-dup-dense but text-dup-light corpus
(e.g. mass word reorderings) conservatively keeps the direct plan --
the probe only ever picks between output-identical plans, so a miss
costs wall clock, never rows.

The DECISION (never data) is memoized per semantic plan of the doc
relation, so the bench / pipeline steady state pays the probe scan
once per process. A stale hit -- same plan hash over regenerated
files -- can only pick the other output-identical plan, which is why
parameterizations that break the plan equivalence (similarity's
max_df) must force the direct plan BEFORE probing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Minimum exact-dup fraction for the collapse plan to pay for the
#: extra stages it adds around the pair join (approx_count_distinct
#: probe, so an absolute floor of 16 also absorbs HLL estimation
#: error on dup-free corpora).
DUP_COLLAPSE_MIN_FRAC = 0.05

#: Memoized decisions keyed by the doc plan's semantic hash
#: (bounded; evicts oldest).
_DECISION_CACHE: dict[int, bool] = {}
_DECISION_CACHE_MAX = 64


def dup_density_decision(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    member: DataFrame | None = None,
) -> bool:
    """True when the exact-dup density of ``docs`` warrants the
    representative-collapse plan. One map-side probe job, memoized per
    semantic plan (internal semanticHash via py4j; on any failure the
    probe simply runs uncached). ``member`` optionally supplies a
    prebuilt (id, _tsig=md5(text)) relation so a caller that already
    tracks one (similarity.duplicate_pairs) shares its scan."""
    key = None
    try:
        key = docs._jdf.queryExecution().analyzed().semanticHash()
    except Exception:  # noqa: BLE001 -- internal API; probe uncached
        key = None
    if key is not None and key in _DECISION_CACHE:
        return _DECISION_CACHE[key]
    if member is None:
        member = docs.select(
            F.md5(F.col(text_col).cast("binary")).alias("_tsig")
        )
    stats = member.agg(
        F.count("*").alias("n"),
        # rsd 0.01: keeps the HLL's 1-sigma error ~5x below the 5%
        # decision threshold, so a dup-free corpus never trips it
        F.approx_count_distinct("_tsig", 0.01).alias("nd"),
    ).first()
    decision = stats["n"] - stats["nd"] > max(
        16, DUP_COLLAPSE_MIN_FRAC * stats["n"]
    )
    if key is not None:
        if len(_DECISION_CACHE) >= _DECISION_CACHE_MAX:
            _DECISION_CACHE.pop(next(iter(_DECISION_CACHE)))
        _DECISION_CACHE[key] = decision
    return decision
