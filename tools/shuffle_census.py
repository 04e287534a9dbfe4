"""MEASURED shuffle census: run each headline query at sf0.1 and sum
the actual shuffle bytes/records written by every Exchange in its
executed plan (plus broadcast dataSize), then write the table into
SCALE.md between the census markers.

This turns the "minimize shuffles" design claims into numbers: a
query whose aggregate is map-side-combined shuffles KB, not GB; a
pair operator whose candidates are banded shuffles candidate-volume,
not corpus-volume.

Caveats (documented in the output): operators that run extra probe
jobs (strategy probes, CC's bounded edge collect) report only the
FINAL DAG's exchanges; streaming queries execute through a memory
sink whose plan is not reachable this way and are skipped.

Usage: python tools/shuffle_census.py (writes SCALE.md)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from conversation_analysis_tools_spark.operators.cache import release_all
from conversation_analysis_tools_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"

#: Batch queries whose executed plan is the whole computation.
CENSUS = [
    "event_response_time",
    "join_workhorse",
    "time_bucketed_agg",
    "top_n_per_group",
    "word_frequency_top5",
    "nlp_tfidf",
    "nlp_relevance",
    "nlp_duplicate_pairs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_bruteforce_knn",
    "ann_lsh_knn",
    "curation_pipeline",
    "unigram_logprob",
    "dsir_importance",
    "doc_chunks",
    "retention_cohorts",
    "incremental_rollup",
    "variant_props_extract",
    "stateful_user_totals",
    "quality_decile_bins",
    "dedup_substring_spans",
    # sketch/rollup family + versioning: bucket-grain state, never
    # user-grain
    "rollup_distinct_hll",
    "audience_overlap_theta",
    "rollup_quantiles_binned",
    "corpus_version_diff",
    "rollup_heavy_hitters_cms",
    "zorder_clustered_scan",
    "weighted_bernoulli_sample",
    # round-4 bench additions: IVF probe join, PQ ADC scan, and the
    # per-cluster SemDeDup pair space -- candidate-bounded exchanges
    "ann_ivf_knn",
    "ann_pq_knn",
    "semdedup_prune",
    # round-5 bench additions: the collapse-gated pair family on the
    # dup-light corpus (direct plans; exchanges stay candidate-bounded)
    "dedup_ngram_jaccard",
    "dedup_edit_distance",
    "near_dup_canonicalize",
    # round-6: skyline (cached local phase + bounded final), the
    # manifest byte path (map-only, zero exchanges), IVF top-k after
    # the lag-dedup (still exactly one candidate exchange)
    "skyline_parts",
    "audio_manifest_metadata",
    "image_resize_pool",
    "video_frame_sample",
    "audio_dedup_fingerprint",
    # round-7: the full-pipeline DAG joins the measured census so a
    # driver-bench wall regression can be attributed (plan change vs
    # box noise) from the exchange row alone -- VERDICT r6 item 4;
    # note the census walks the FINAL collected DataFrame's executed
    # plan, so the pipeline's persisted token-table feeder stages
    # appear as InMemoryTableScan, not as their own exchanges
    "pipeline_analysis_results",
    # round-8: the serving-only DPP batch search, the CSV round trip,
    # the repetition/url curation gates, and the v2 funnel pipeline
    "ann_ivf_batch_serve",
    "csv_roundtrip",
    "gopher_repetition_flags",
    "url_domain_filter",
    "curation_pipeline_v2",
]


def _metrics_of(node) -> dict:
    out = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = kv._2().value()
    return out


def walk(node, acc) -> None:
    name = node.nodeName()
    acc.append((name, _metrics_of(node)))
    if name == "AdaptiveSparkPlan":
        walk(node.executedPlan(), acc)
        return
    if "QueryStage" in name:
        walk(node.plan(), acc)
        return
    it = node.children().iterator()
    while it.hasNext():
        walk(it.next(), acc)


def census(df) -> dict:
    df.collect()
    acc: list = []
    walk(df._jdf.queryExecution().executedPlan(), acc)
    sh_bytes = sh_recs = n_ex = bc_bytes = n_bc = 0
    for name, m in acc:
        if name == "Exchange":
            n_ex += 1
            sh_bytes += m.get("shuffleBytesWritten", 0)
            sh_recs += m.get("shuffleRecordsWritten", 0)
        elif name == "BroadcastExchange":
            n_bc += 1
            bc_bytes += m.get("dataSize", 0)
    return {
        "exchanges": n_ex,
        "shuffle_mb": round(sh_bytes / 1e6, 3),
        "shuffle_rows": sh_recs,
        "broadcasts": n_bc,
        "broadcast_mb": round(bc_bytes / 1e6, 3),
    }


def main() -> None:
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    qs = entrymod.queries()
    qs["group_counts"](spark, SF_DIR).collect()

    lines = [
        "",
        "| query | exchanges | shuffle rows | shuffle MB | broadcasts | broadcast MB |",
        "|---|---|---|---|---|---|",
    ]
    for name in CENSUS:
        c = census(qs[name](spark, SF_DIR))
        release_all()
        lines.append(
            f"| {name} | {c['exchanges']} | {c['shuffle_rows']:,} | "
            f"{c['shuffle_mb']} | {c['broadcasts']} | {c['broadcast_mb']} |"
        )
        print(lines[-1], flush=True)

    from tools.md_block import write_md_block

    body = (
        "## Measured shuffle census (tools/shuffle_census.py, sf0.1)\n"
        "\n"
        "Actual Exchange shuffleBytesWritten / shuffleRecordsWritten and\n"
        "BroadcastExchange dataSize from each query's executed plan\n"
        "(final DAG only -- bounded probe jobs not included; streaming\n"
        "queries run through a sink and are covered by the static census\n"
        "above instead). Rows in = ~1M events / 600k lineitem / 5k docs:\n"
        "a map-combined aggregate shuffles KB; banded/bucketed pair\n"
        "operators shuffle candidate volume, not corpus^2.\n"
        "\n"
        "Broadcast columns record AQE's RUNTIME choices under the 64MB\n"
        "autoBroadcastJoinThreshold, not forced hints: e.g.\n"
        "dedup_minhash_lsh shows 0 exchanges because AQE broadcast its\n"
        "26MB of band/size tables at this sf -- at 100 TB the same\n"
        "declarative plans re-plan to shuffle joins automatically. The\n"
        "only F.broadcast() hints in the codebase are provably bounded\n"
        "sides (dims, stats rows, query sets, codebooks -- enforced by\n"
        "tests/test_no_cartesian.py's allowlist).\n"
        + "\n".join(lines)
    )
    write_md_block("/root/repo/SCALE.md", "shuffle-census", body)
    print("SCALE.md updated")


if __name__ == "__main__":
    main()
