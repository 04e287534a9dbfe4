"""Named-query registry: the driver-facing catalog of every implemented
operator (SURVEY.md §2), each with its DuckDB oracle SQL.

Importing this package loads every query module, which registers its
queries into ``REGISTRY``; ``__spark_entry__.py`` exposes them.
"""

from conversation_analysis_tools_spark.queries.registry import REGISTRY, register, Query

# Import for registration side effects -- order matters only for
# readability of the registry listing.
from conversation_analysis_tools_spark.queries import relational  # noqa: F401
from conversation_analysis_tools_spark.queries import nlp  # noqa: F401
from conversation_analysis_tools_spark.queries import dedup  # noqa: F401
from conversation_analysis_tools_spark.queries import textstats  # noqa: F401
from conversation_analysis_tools_spark.queries import similarity  # noqa: F401
from conversation_analysis_tools_spark.queries import iterative  # noqa: F401
from conversation_analysis_tools_spark.queries import streaming  # noqa: F401
from conversation_analysis_tools_spark.queries import multimodal  # noqa: F401
from conversation_analysis_tools_spark.queries import sampling  # noqa: F401
from conversation_analysis_tools_spark.queries import behavior  # noqa: F401
from conversation_analysis_tools_spark.queries import audit  # noqa: F401
from conversation_analysis_tools_spark.queries import retrieval  # noqa: F401
from conversation_analysis_tools_spark.queries import mlfilter  # noqa: F401

# ---------------------------------------------------------------------------
# Verification-priority ordering.
#
# The external driver records correctness rows for only the FIRST 50
# entries of ``__spark_entry__.queries()`` per round, so registration
# order is a scarce verification window. This list pins which queries
# occupy that window this round; everything not listed follows in
# module-registration order. Rotation policy: queries that already
# have a green driver row from a prior round fall to the back; never-
# checked and just-fixed queries come first.
#
# Rotation cadence rule (VERDICT r2 item 9): every oracled query must
# have a driver row at most 2 rounds old. Each round: (a) promote every
# never-checked oracled query, (b) then the queries fixed/changed this
# round, (c) backfill with the OLDEST-green queries so nothing ages
# past 2 rounds. Queries green in the immediately-preceding round go to
# the back.
#
# Round-3 window: the 33 oracled queries that had never had a driver
# row through round 2 (verified locally green at sf0.01 AND sf0.1
# against this round's regenerated testdata), then this round's
# fixed/new queries (norms-broadcast fix re-verification, hash-based
# samplers, ANN recall certificate, strict TextRank), then the six
# round-1-fixed + flagship for regression cover.
#
# Round-4 must-rotate (green only in r1 => 2 rounds old after r3; the
# cadence rule says promote ALL of these): boolean_search,
# context_window, count_distinct, cube_rollup_counts,
# date_range_filter, group_concat_sorted, group_counts, having_filter,
# histogram_buckets, in_list_filter, join_enrich_pct, join_workhorse,
# json_group_export, lag_day_over_day, left_join_keep_empty,
# length_filter, nlp_idf, nlp_tf_max, nlp_tf_sum, nlp_token_stats,
# ordered_id_join, pair_join_unconstrained, per_group_share,
# quantile_filter, ratio_of_aggregates, rolling_avg_daily,
# row_number_order, semi_join_exists, set_except_users,
# sql_endpoint_rollup, stats_summary, stddev_agg, substring_search,
# time_bucketed_agg, top_k_orders, top_n_per_group, top_values,
# topic_cooccurrence_filter (38 -- fills 38 of 50 slots). The
# remaining slots: the 8 oracled queries added late in round 3 that
# never fit the r3 window (audience_overlap_theta,
# rollup_quantiles_binned, streaming_hll_maintenance,
# image_phash_dedup, semdedup_fixed, rollup_heavy_hitters_cms,
# zorder_clustered_scan, weighted_bernoulli_sample -- the age
# ranking auto-promotes all never-checked names first), plus
# nlp_near_duplicates /
# pipeline_analysis_results (displaced from the r3 window; their
# shared similarity path was re-verified via nlp_duplicate_pairs and
# the full sf0.1 sweep). Round 4 should REPLACE this manual list with
# only its own new/changed names -- ordered_registry() handles the
# rest from CORRECTNESS history.
# ---------------------------------------------------------------------------

VERIFY_PRIORITY: list[str] = [
    # --- never driver-checked through round 2 (33) ---
    # text analytics A15-A20
    "word_frequency_top5",
    "vocab_common_terms",
    "topic_cooccurrence_matrix",
    "topic_case_agg",
    "sentiment_wordcount",
    "complexity_stats",
    # NLP tail N11, N19-N20, N25-N26, N29
    "nlp_sentence_stats",
    "nlp_connected_components",
    "nlp_unique_docs",
    "nlp_priority_distribution",
    "nlp_topic_search",
    "embedding_generation",
    # corpus-construction tail
    "bigram_logprob",
    "doc_chunks",
    "dsir_importance",
    "stratified_cap",
    "corpus_length_percentiles",
    # dedup tail
    "dedup_substring_spans",
    # NEW round-3: the transformation half of Lee et al. span dedup
    "dedup_span_removal",
    "near_dup_canonicalize",
    "dedup_edit_distance",
    "decontamination_minhash",
    # quality gates
    "gopher_quality_flags",
    "c4_line_clean",
    # streaming tail
    "window_tumbling_hourly",
    "window_sliding_2h1h",
    "session_windows_30m",
    "streaming_dedup_first",
    "streaming_rollup_maintenance",
    # behavior + layout
    "anomaly_daily_zscore",
    "salted_skew_join",
    "partition_pruned_scan",
    "asof_last_signup",
    "range_join_5min",
    # --- changed/new this round ---
    # norms-broadcast + single-digest-minhash re-verification
    # (operators/similarity.py, operators/dedup.py); nlp_near_duplicates
    # shares the same inverted-cosine path and was verified at sf0.1
    # this round, so duplicate_pairs alone covers the window slot --
    # freeing one for the new HLL rollup certificate
    "nlp_duplicate_pairs",
    # NEW round-3: mergeable distinct-count rollup (DataSketches HLL)
    "rollup_distinct_hll",
    # samplers made oracle-able via deterministic hash sampling
    "random_sample",
    "limit_sample",
    "approx_stats",
    # ANN approximate-index recall certificate
    "ann_recall_eval",
    # strict-oracle TextRank (N13/N14)
    "textrank_scores",
    "doc_summaries_fixed",
    # fixed-corpus certificates for iterative/ML paths (PageRank, N28,
    # distilled-classifier accuracy, PCA projection)
    "pagerank_fixed",
    "kmeans_fixed_clusters",
    "classifier_accuracy_cert",
    # NEW round-3: planted-replica detection-recall certificate for
    # the near-dup family (displaces pca_fixed_projection, which the
    # age ranking auto-promotes in round 4)
    "dedup_recall_eval",
    # NEW round-3: ingest-time streaming near-dup admission with the
    # sequential-greedy strict oracle (displaces the flagship
    # pipeline_analysis_results, r2-green: its duplicate_pairs path is
    # already re-verified in-window by nlp_duplicate_pairs /
    # nlp_near_duplicates, and the age ranking re-promotes it next
    # round)
    "streaming_neardup_dedup",
    # new this round: VARIANT-typed metadata extraction, and the
    # transformWithState cumulative-totals operator (batch-identical
    # semantics; TWS path import-gated on protobuf)
    "variant_props_extract",
    "stateful_user_totals",
    # Bloom-prefiltered contamination scan (operators/bloom.py) --
    # exact result (verify join removes FPs), strict oracle
    "decontamination_bloom",
    # Slots beyond this list are AUTO-RANKED by ordered_registry():
    # never-checked oracled queries first, then oldest-green by the
    # CORRECTNESS_r*.json ages, so future rounds need no manual
    # rotation edits here -- only this round's NEW/CHANGED queries
    # belong in this list. (event_response_time r1-green and
    # semdedup_fixed never-checked were manual entries through r3;
    # the age ranking now places them.)
]


def _driver_history() -> dict[str, int]:
    """query name -> latest round with a green driver row, parsed from
    the CORRECTNESS_r*.json files the driver leaves in the repo root.
    Empty dict when none exist (round 1) or on any parse problem."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except Exception:  # noqa: BLE001 -- a malformed file must not break import
            continue
        for name, row in rows.items():
            ok = (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
                and not row.get("err")
            )
            if ok:
                latest[name] = max(rnd, latest.get(name, 0))
    return latest


def ordered_registry() -> dict[str, Query]:
    """REGISTRY reordered so the driver's 50-row correctness window
    always holds the highest-value queries, with NO manual rotation
    needed in future rounds:

    1. VERIFY_PRIORITY (manual override: this round's new/changed
       queries and curated promotions), in order;
    2. oracled queries with NO green driver row in any recorded round
       (never-checked);
    3. oracled queries by ASCENDING last-green round (the cadence
       rule: a row must never age past 2 rounds);
    4. everything else (rows-only queries, freshest-green last).

    Ages come from the CORRECTNESS_r*.json files the driver writes
    into the repo root, so each new round's results automatically
    re-rank the next round's window.
    """
    history = _driver_history()
    out: dict[str, Query] = {}
    for name in VERIFY_PRIORITY:
        if name in REGISTRY:
            out[name] = REGISTRY[name]
    rest = [n for n in REGISTRY if n not in out]
    # stable sort: never-checked oracled first (age 0), then oldest
    # green, then rows-only; registration order breaks ties
    def age_key(name: str) -> tuple[int, int]:
        has_oracle = REGISTRY[name].oracle is not None
        last = history.get(name, 0)
        return (0 if has_oracle else 1, last)

    for name in sorted(rest, key=age_key):
        out[name] = REGISTRY[name]
    return out


__all__ = ["REGISTRY", "register", "Query", "VERIFY_PRIORITY", "ordered_registry"]
