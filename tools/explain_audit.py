"""Plan audit: print formatted physical plans for the headline queries
and flag the properties that matter at 100 TB:

* PushedFilters / partition pruning on parquet scans
* ReadSchema column pruning (no full-width scans)
* broadcast joins on dimension sides (no shuffle of the fact table)
* WholeStageCodegen coverage (JVM hot path, no interpreted islands)

Usage: python tools/explain_audit.py [query ...]   (writes PLANS.md)
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from conversation_analysis_tools_spark.session import get_spark

AUDIT = [
    "event_response_time",
    "join_workhorse",
    "substring_search",
    "date_range_filter",
    "time_bucketed_agg",
    "top_k_orders",
    "nlp_tfidf",
    "nlp_relevance",
    "session_windows_30m",
    "asof_last_signup",
    "range_join_5min",
    "curation_pipeline",
    "dedup_minhash_lsh",
    "unigram_logprob",
    "token_budget_pack",
    "retention_cohorts",
    "funnel_view_click_purchase",
    "event_transitions",
    "dq_audit",
    "incremental_rollup",
    # round-2 scale fixes: these plans must show TakeOrderedAndProject /
    # no global unpartitioned window / no driver-collected matrix
    "ordered_id_join",
    "quality_decile_bins",
    "nlp_duplicate_pairs",
    "snippet_highlight",
    "pipeline_analysis_results",
    # round-2 additions: span-grain dedup (two narrow-payload shuffles),
    # multi-table LSH (posexplode index, (table,bucket) equi-join)
    "dedup_substring_spans",
    "ann_lsh_knn",
    # chunking is map-only (no Exchange anywhere); DSIR's two 256-row
    # LMs must broadcast back onto the feature shuffle
    "doc_chunks",
    "dsir_importance",
    # physical-layout evidence: PartitionFilters directory pruning;
    # salted join spreads one hot key over 8 reducers
    "partition_pruned_scan",
    "salted_skew_join",
    # trailing-window anomaly score: date-grain rollup then a tiny window
    "anomaly_daily_zscore",
    # round-3: the inverted-cosine plan must show NO BroadcastExchange
    # of a per-doc relation (norms pre-divided via window over id);
    # the samplers must plan as TakeOrderedAndProject, not a global sort
    "nlp_near_duplicates",
    "random_sample",
    "limit_sample",
    "approx_stats",
    # round-3 additions: VARIANT single-parse extraction (filter before
    # the agg shuffle); 60-bit simhash banding (block join, no
    # cartesian); TWS batch-identical totals (one agg shuffle)
    "variant_props_extract",
    "dedup_simhash",
    "stateful_user_totals",
    # round-3 late additions: the Bloom probe must show the bitset as a
    # BroadcastNestedLoopJoin of ONE row (no shuffle of train shingles
    # before the filter); span removal = one span_hash shuffle, then
    # row-local rebuild
    "decontamination_bloom",
    "dedup_span_removal",
    "data_recipe_epochs",
    # round-3 sketch/rollup family: daily HLL sketches + weekly union
    # (two tiny aggs, state is bucket-grain not user-grain); Theta
    # pairwise intersection over a broadcast sketch table (bounded
    # BNLJ); binned-quantile rollup (one (week,bin) agg + window);
    # perceptual dHash dedup (one mapInPandas stage, block join)
    "rollup_distinct_hll",
    "audience_overlap_theta",
    "rollup_quantiles_binned",
    "image_phash_dedup",
    # Count-Min cells are bounded D*W state; z-order footprint math is
    # two tiny aggs over quantized coords
    "rollup_heavy_hitters_cms",
    "zorder_clustered_scan",
    # importance sampling: map-only hash threshold + one source agg
    "weighted_bernoulli_sample",
    # round-4 plan-build fixes: IVF distances are ONE transform over a
    # folded centroid-matrix literal (no per-centroid re-inline);
    # embedding dedup hoists norms to per-row projections so the pair
    # select folds only the dot product
    "ann_ivf_knn",
    "dedup_embedding_cosine",
    # round-5: the MinHash-candidate consumers after the adaptive
    # representative-collapse -- on the dup-light sf0.1 corpus the
    # probe must pick the DIRECT plan (no collapse stages inlined),
    # and edit-distance must show the persisted verify projection
    # (one levenshtein site, not one per pushed-down reference)
    "dedup_ngram_jaccard",
    "dedup_edit_distance",
    "near_dup_canonicalize",
    # round-6: skyline must show the count-probed single final task on
    # realistic frontiers (no unbounded repartition(1) on adversarial
    # ones -- that path is test-pinned instead); IVF top-k must show
    # ONE exchange feeding the lag-filter + row_number window stack
    # (the replica-dedup rides the window's own sort, no pair-grain
    # distinct); the manifest read is one map-only Arrow stage over
    # the manifest scan
    "skyline_parts",
    "audio_manifest_metadata",
    # round-6 media additions: resize + frame sample are map-only
    # Arrow stages; the audio fingerprint is one feature stage + one
    # map-combined groupBy + a KB-row digest self-join
    "image_resize_pool",
    "video_frame_sample",
    "audio_dedup_fingerprint",
    # round-8: the serving-only DPP batch search (must show the
    # dynamicpruning subquery and NO exceptAll/inline branches); the
    # CSV round trip (one write job + a scan-side agg over the
    # read-back -- header/schema options never become a shuffle);
    # the PII chain (pure whole-stage-codegen projection, no shuffle)
    "ann_ivf_batch_serve",
    "csv_roundtrip",
    "pii_redaction_fixed",
    # round-9: the v2/v3 curation funnels (v3 adds exactly one
    # line-hash exchange reused by the anti join + the per-doc
    # rebuild; everything else stays map-only before the fingerprint
    # window); the routed-cosine and recall-grid certificates (their
    # plans must show the bucket explosion + exact verify, no
    # cartesian anywhere)
    "curation_pipeline_v2",
    "curation_pipeline_v3",
    "nlp_dup_routed_fixed",
    "dedup_jaccard_recall_grid_fixed",
    # round-10: the merged certificates (the collapse union must show
    # three independent fixed-corpus branches, the ANN frontier ONE
    # persisted exact baseline feeding every family's broadcast join);
    # the recall-vs-threshold frontier (four routed branches at
    # adaptive band lengths, planted-pairs broadcast left join, no
    # cartesian); pipeline_analysis_results now rides route='auto'
    # (already audited above -- its plan gains the linear probe job)
    "dedup_collapse_fixed",
    "ann_recall_frontier",
    "simhash_recall_frontier_fixed",
]


def plan_of(df) -> str:
    # materialize so AQE finalizes the plan (codegen ids + actual join
    # strategies only appear on the executed plan)
    df.collect()
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(name: str, plan: str) -> list[str]:
    notes = []
    scans = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    if scans:
        pushed = [s for s in scans if s.strip()]
        notes.append(f"pushed filters on {len(pushed)}/{len(scans)} scans")
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
        if len(cols) > 8:
            notes.append(f"WIDE SCAN ({len(cols)} cols): {cols[:10]}")
    if "BroadcastHashJoin" in plan:
        notes.append("broadcast hash join present")
    if "SortMergeJoin" in plan:
        notes.append("sort-merge join present (check if the side should broadcast)")
    ids = set(re.findall(r"\[codegen id : (\d+)\]", plan))
    notes.append(f"{len(ids)} codegen spans")
    if "InMemoryTableScan" in plan:
        notes.append("uses cached relation")
    return notes


def main() -> None:
    names = sys.argv[1:] or AUDIT
    spark = get_spark(master="local[4]", shuffle_partitions=8)
    qs = entrymod.queries()
    out = ["# Physical plan audit (sf0.01)\n"]
    for name in names:
        df = qs[name](spark, "/root/testdata/sf0.01")
        plan = plan_of(df)
        notes = audit(name, plan)
        print(f"== {name}")
        for n in notes:
            print(f"   - {n}")
        out.append(f"## {name}\n")
        out.extend(f"- {n}\n" for n in notes)
        out.append("\n```\n" + plan.strip()[:4000] + "\n```\n")
    with open("/root/repo/PLANS.md", "w") as f:
        f.writelines(out)
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
