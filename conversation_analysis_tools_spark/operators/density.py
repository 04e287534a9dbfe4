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

The DECISION (never data) is memoized per (semantic plan, leaf-file
fingerprint) of the probed member relation, so the bench / pipeline
steady state pays the probe scan once per process. The plan hash
alone is not content-safe -- a reader re-created over the same path
after the files are regenerated hashes identically -- so the leaf
files' (path, size, mtime_ns) triples pin the decision to the bytes
actually probed. File-backed decisions also persist to the fitcache
disk store: a COLD process (the driver's bench and correctness runs
included) skips the probe job entirely. Plans with no file leaves
(in-memory test frames) key on the plan hash alone and stay
process-local. Even a stale hit can only pick the other
output-identical plan, which is why parameterizations that break the
plan equivalence (similarity's max_df) must force the direct plan
BEFORE probing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Minimum exact-dup fraction for the collapse plan to pay for the
#: extra stages it adds around the pair join (approx_count_distinct
#: probe, so an absolute floor of 16 also absorbs HLL estimation
#: error on dup-free corpora).
DUP_COLLAPSE_MIN_FRAC = 0.05

#: Memoized decisions keyed by (plan semantic hash, leaf-file
#: fingerprint) (bounded; evicts oldest).
_DECISION_CACHE: dict[tuple, bool] = {}
_DECISION_CACHE_MAX = 64


def _memo_key(member: DataFrame) -> tuple[tuple | None, bool]:
    """(memo key, file-backed?) for the probed relation.

    The key pairs the analyzed plan's semanticHash (internal API; on
    failure the probe runs uncached) with a fingerprint of the plan's
    leaf files -- ``inputFiles()`` is public API and resolves to the
    concrete scan file set, so regenerated data under an identical
    path/plan produces a different key instead of a stale hit. A plan
    with no file leaves (local test frames) keys on the hash alone;
    its inputs cannot be swapped behind the cache within a process,
    but the decision must never be disk-persisted (second element
    False)."""
    try:
        plan_hash = member._jdf.queryExecution().analyzed().semanticHash()
    except Exception:  # noqa: BLE001 -- internal API; probe uncached
        return None, False
    files_fp = None
    try:
        uris = sorted(member.inputFiles())
        if uris:
            import os

            fp = []
            for uri in uris:
                p = uri[len("file:"):] if uri.startswith("file:") else uri
                st = os.stat(p)
                fp.append((uri, st.st_size, st.st_mtime_ns))
            files_fp = tuple(fp)
    except Exception:  # noqa: BLE001 -- non-local fs: plan-hash key only
        files_fp = None
    return (plan_hash, files_fp), files_fp is not None


def dup_density_decision(
    docs: DataFrame | None = None,
    text_col: str = "text",
    member: DataFrame | None = None,
    sig_col: str = "_tsig",
) -> bool:
    """True when the duplicate-group density warrants the
    representative-collapse plan. One map-side probe job, memoized per
    (semantic plan, leaf-file fingerprint) OF THE PROBED RELATION (see
    ``_memo_key``; on hash failure the probe simply runs uncached, and
    file-backed decisions persist to the fitcache disk store so cold
    processes skip the job). ``member``
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
    key, file_backed = _memo_key(member)
    if key is not None and key in _DECISION_CACHE:
        return _DECISION_CACHE[key]
    key_repr = repr(("dup_density", key)) if file_backed else None
    if key_repr is not None:
        from conversation_analysis_tools_spark import fitcache

        hit = fitcache._disk_load(key_repr)
        if isinstance(hit, bool):
            _DECISION_CACHE[key] = hit
            return hit
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
    if key_repr is not None:
        from conversation_analysis_tools_spark import fitcache

        fitcache._disk_store(key_repr, decision)
    return decision
