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

The probe is ONE eager map-side job: approx_count_distinct over the
operator's OWN grouping key estimates its group-collapse yield, and
the collapse engages above DUP_COLLAPSE_MIN_FRAC. The key must be
the one the operator actually collapses on: the Jaccard-family
operators group by the shingle-set fingerprint, and probing a proxy
(md5 of the raw text) misses every corpus whose duplication is
invisible at byte grain but total at token grain -- version markers,
whitespace/punctuation drift, case changes. Measured on the 10x
word-perturbed probe corpus (replica markers that the tokenizer
drops): the text-keyed probe chose the direct plan and
ngram_jaccard_pairs paid 17.5 s where the set-keyed collapse runs
1.5 s. Callers therefore pass the ``member`` relation carrying their
own key; only the character-grain edit-distance verify (whose
collapse key genuinely is the full text) uses the md5(text) default.

The DECISION (never data) is memoized per semantic plan of the
probed member relation, so the bench / pipeline steady state pays
the probe scan once per process. A stale hit -- same plan hash over
regenerated files -- can only pick the other output-identical plan,
which is why parameterizations that break the plan equivalence
(similarity's max_df) must force the direct plan BEFORE probing.
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
    docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    member: DataFrame | None = None,
    sig_col: str = "_tsig",
) -> bool:
    """True when the duplicate-group density warrants the
    representative-collapse plan. One map-side probe job, memoized per
    semantic plan OF THE PROBED RELATION (internal semanticHash via
    py4j; on any failure the probe simply runs uncached). ``member``
    supplies the (.., sig_col) relation carrying the operator's own
    collapse key -- the shingle-set fingerprint for the Jaccard
    family, md5(text) for similarity/edit-distance; when omitted it
    is built as md5(text) over ``docs``. Keying the memo on the
    member plan keeps text-grain and set-grain decisions over the
    same corpus distinct."""
    if member is None:
        member = docs.select(
            F.md5(F.col(text_col).cast("binary")).alias("_tsig")
        )
        sig_col = "_tsig"
    key = None
    try:
        key = member._jdf.queryExecution().analyzed().semanticHash()
    except Exception:  # noqa: BLE001 -- internal API; probe uncached
        key = None
    if key is not None and key in _DECISION_CACHE:
        return _DECISION_CACHE[key]
    stats = member.agg(
        F.count("*").alias("n"),
        # rsd 0.01: keeps the HLL's 1-sigma error ~5x below the 5%
        # decision threshold, so a dup-free corpus never trips it
        F.approx_count_distinct(sig_col, 0.01).alias("nd"),
    ).first()
    decision = stats["n"] - stats["nd"] > max(
        16, DUP_COLLAPSE_MIN_FRAC * stats["n"]
    )
    if key is not None:
        if len(_DECISION_CACHE) >= _DECISION_CACHE_MAX:
            _DECISION_CACHE.pop(next(iter(_DECISION_CACHE)))
        _DECISION_CACHE[key] = decision
    return decision
