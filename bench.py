"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "total_headline_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1,
     "pipeline_docs_per_sec": N}

``pipeline_docs_per_sec`` is the comparable number for BASELINE.md's
full-pipeline throughput (~55-83 docs/s on 1000 docs, single process).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from conversation_analysis_tools_spark.operators.cache import (
    release_all as release_cached,
)
from conversation_analysis_tools_spark.session import get_spark

#: Representative coverage: scan+window, 3-table join, time agg,
#: window rank, tokenize+tfidf, inverted-index similarity, LSH dedup,
#: ANN, sessionization, full NLP pipeline, cohort/funnel analytics,
#: incremental rollup maintenance.
HEADLINE = [
    "event_response_time",
    "join_workhorse",
    "time_bucketed_agg",
    "top_n_per_group",
    "word_frequency_top5",
    "nlp_tfidf",
    "nlp_relevance",
    "nlp_duplicate_pairs",
    "dedup_minhash_lsh",
    "ann_bruteforce_knn",
    "session_windows_30m",
    "asof_last_signup",
    "curation_pipeline",
    "unigram_logprob",
    "streaming_static_enrich",
    "retention_cohorts",
    "funnel_view_click_purchase",
    "incremental_rollup",
    "pipeline_analysis_results",
    # round-2 additions: span-grain dedup, multi-table LSH ANN,
    # stream-stream interval join, Gopher quality gate
    "dedup_substring_spans",
    "ann_lsh_knn",
    "streaming_stream_join",
    "gopher_quality_flags",
    # round-2 tail: map-only chunking, hashed-feature DSIR selection
    "doc_chunks",
    "dsir_importance",
    # round-3 additions: 60-bit simhash banding, VARIANT metadata
    # path, transformWithState-shaped cumulative totals
    "dedup_simhash",
    "variant_props_extract",
    "stateful_user_totals",
    # Bloom-prefiltered contamination scan: broadcast bitset, map-side
    # candidate cut, exact verify join
    "decontamination_bloom",
    # span-level exact-substring dedup transformation (Lee et al. 2022)
    "dedup_span_removal",
    # round-3 sketch/rollup family: mergeable HLL distinct rollup,
    # Theta intersection audience overlap (certificate-checked),
    # binned-histogram quantile rollup (strict merge-equals-direct)
    "rollup_distinct_hll",
    "audience_overlap_theta",
    "rollup_quantiles_binned",
    # Count-Min heavy-hitters rollup (bounded-cell frequency state)
    # and Morton z-order layout footprints (2-D prune demo)
    "rollup_heavy_hitters_cms",
    "zorder_clustered_scan",
    # round-4 additions: the production ANN index shapes (train-once
    # artifacts via fitcache; best-of-5 therefore reports steady-state
    # query latency, trial 1 carries the one-time index build) and the
    # cluster-then-pairs semantic dedup
    "ann_ivf_knn",
    "ann_pq_knn",
    "semdedup_prune",
    # round-5 additions: the remaining slow pair-family operators,
    # tracked per-round now that their candidate stages carry the
    # identical-content representative-collapse
    "dedup_ngram_jaccard",
    "dedup_edit_distance",
    "near_dup_canonicalize",
    # round-6: the two-phase skyline over the sf-scaled part table
    # (the only new query whose corpus grows with sf; the media /
    # frontier certificates run fixed corpora and belong to the
    # probe tools, not the sf-scaled headline)
    "skyline_parts",
    # round-7: query-BATCH IVF search with dynamic partition pruning
    # against the centroid-partitioned list store (sf-scaled emb
    # corpus). Round 8 swapped the benched query from the
    # ann_ivf_batch_dpp CERTIFICATE (which runs the pruned search
    # AND an inline re-search AND two exceptAll parity passes every
    # execution -- proof cost, not serving cost) to the serving-only
    # plan; the certificate stays a driver correctness row and the
    # parity lives on in tests/test_layout.py.
    # shard_media_roundtrip stays out per the fixed-corpus rule.
    "ann_ivf_batch_serve",
    # round-7 late additions: time-series + stats + drift analytics
    "timeseries_gapfill",
    "cumulative_new_users",
    "corr_matrix_by_flag",
    "corpus_drift_kl",
    # round-8: the CSV sink round trip (sf-scaled corpus write +
    # FAILFAST read-back; the routed-dedup / planted-dup / PII
    # certificates run fixed corpora and stay out per the rule) and
    # the v2 curation capstone (domain gate -> PII redact -> Gopher
    # gate -> fingerprint dedup in one DAG, per-source funnel)
    "csv_roundtrip",
    "curation_pipeline_v2",
    # round-9: the v3 capstone adds the line-grain stages (C4 rules +
    # CCNet cross-doc boilerplate cut) to the v2 funnel -- sf-scaled
    "curation_pipeline_v3",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(master=f"local[{cpus}]")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # JVM/codegen warmup so per-query timings measure the plan, not JIT
    qs["group_counts"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    jobs: dict[str, int] = {}
    stages: dict[str, int] = {}
    n_docs = None
    sc = spark.sparkContext
    for name in HEADLINE:
        # best of 5 + median: the box is shared and iowait-noisy (a
        # single run can absorb a co-tenant CPU burst, observed +-2x);
        # the min is the plan's real cost, the median shows whether a
        # best-vs-best delta between rounds is signal or noise.
        runs = []
        for i in range(5):
            if i == 4:
                # steady-state job/stage census on the LAST trial only
                # (trial 1 may carry one-time fitcache index builds):
                # a driver-bench wall regression with UNCHANGED counts
                # is box noise; changed counts are a plan change
                # (VERDICT r6 item 4). Job-group tags are
                # thread-local, so streaming queries' micro-batch jobs
                # (stream-execution threads) stay uncounted -- their
                # rows record driver-thread jobs only.
                sc.setJobGroup(f"bench:{name}", "steady-state census")
            t0 = time.time()
            rows = qs[name](spark, sf_dir).collect()
            runs.append(time.time() - t0)
            if i == 4:
                # setJobGroup sets group id AND description (and
                # interruptOnCancel); clear all three or every later
                # job in the session inherits the census description
                sc.setLocalProperty("spark.jobGroup.id", None)
                sc.setLocalProperty("spark.job.description", None)
                sc.setLocalProperty("spark.job.interruptOnCancel", None)
                tracker = sc.statusTracker()
                ids = tracker.getJobIdsForGroup(f"bench:{name}")
                infos = [tracker.getJobInfo(j) for j in ids]
                jobs[name] = len(ids)
                stages[name] = sum(
                    len(info.stageIds) for info in infos if info is not None
                )
            release_cached()
        runs.sort()
        timings[name] = round(runs[0], 3)
        medians[name] = round(runs[len(runs) // 2], 3)
        if name == "pipeline_analysis_results":
            n_docs = len(rows)

    line, detail = emit_line(timings, medians, sf, n_docs, jobs, stages)
    detail["queries_jobs"] = jobs
    detail["queries_stages"] = stages
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    print(line)


def emit_line(
    timings: dict,
    medians: dict,
    sf,
    n_docs,
    jobs: dict | None = None,
    stages: dict | None = None,
) -> tuple[str, dict]:
    """(final stdout line, detail document). The driver captures only
    the last ~2000 bytes of stdout and json-parses the final line, so
    the line must stay under that budget at ANY headline size --
    degrading gracefully: first the census drops (it stays in
    BENCH_DETAIL.json), then the per-query map itself gives way to a
    pointer. Pinned by tests/test_metrics.py.

    ``census`` (VERDICT r8 item 3): the steady-state jobs/stages
    counts ride the PARSED line so the driver artifact itself can
    adjudicate noise-vs-plan -- a wall move with unchanged counts is
    box noise, changed counts are a plan change. Encoding is
    positional ("jobs/stages" comma-joined, one entry per key of
    ``queries`` in order) because a second name-keyed map would not
    fit the tail budget."""
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total_headline_sec",
        "value": total,
        "unit": "sec",
        # both statistics ride the parsed line (VERDICT r5 item 8):
        # value = best-of-5 sum (the plans' real cost on a noisy box),
        # total_median = median-of-5 sum (whether a best-vs-best delta
        # between rounds is signal or shared-box noise)
        "total_median": round(sum(medians.values()), 3),
        "queries": timings,
        "sf": sf,
    }
    if n_docs:
        out["pipeline_docs_per_sec"] = round(
            n_docs / timings["pipeline_analysis_results"], 1
        )
    if jobs is not None and stages is not None:
        out["census"] = ",".join(
            f"{jobs.get(q, 0)}/{stages.get(q, 0)}" for q in timings
        )
    detail = dict(out, queries_median=medians)
    detail.pop("census", None)  # detail carries the name-keyed maps
    line = json.dumps(out)
    if len(line) > 1950:
        out.pop("census", None)
        line = json.dumps(out)
    if len(line) > 1950:
        out.pop("queries")
        out["queries_detail"] = "BENCH_DETAIL.json"
        line = json.dumps(out)
    return line, detail


if __name__ == "__main__":
    main()
