"""sf10 scale probe (VERDICT r8 item 1): push the dedup/pipeline scale
evidence one more decade beyond the sf1 corpus the round-8 saturation
router was tuned on.

Two corpus pairs, because the 31-word driver-profiled vocabulary is
itself a scale adversary:

* **saturated** (testdata_sf1 -> testdata_sf10docs, 31-word vocab):
  long docs' tf vectors converge to the vocabulary distribution, so
  the TRUE near-dup pair set grows ~quadratically by construction
  (measured: simhash output 7k -> 726k pairs, 103x per decade). This
  pair stress-tests the DEDUP family's candidate generation and the
  saturation router -- operators whose contract bounds candidates, not
  output.
* **rich** (testdata_sf1rich -> testdata_sf10rich, 4096-word vocab):
  similarity structure matches real text (near-dups rare), so the
  content pipelines' walls measure PLAN scaling instead of an output
  that is quadratic no matter the plan. The all-pairs queries run
  here; on the saturated corpus their output alone exhausts any
  engine (the round-9 first probe run filled the 126 GiB tmpfs
  scratch from nlp_duplicate_pairs' true pair set and killed the JVM
  -- that is the corpus's answer being huge, not the plan's shuffle
  being wrong).

Excluded deliberately: ``dedup_embedding_cosine`` -- the documented
brute-force BASELINE (label-blocked exact pairs, fixed 10-label
cardinality -> pair volume ~n^2/10 by contract; its scale path IS
probed via semdedup_prune and the ANN family).

Every probe query reports best wall AND output rows at both scales: a
super-linear wall with matching super-linear output is the pair-set
contract doing its job on an adversarial corpus; a super-linear wall
over ~linear output is a plan defect (that distinction closed two
real defects in round 9: semdedup's single-core assignment matmul and
its full-corpus quantizer fit).

Results merge into tools/sf10_results.json across runs (so a probe
set can be re-run alone), and the full table is rewritten into
SCALE.md between the ``sf10-probe`` markers (tools/scale_probe.py
owns the separate ``scale-probe`` block).

Usage: python tools/sf10_probe.py [--only saturated|rich]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from conversation_analysis_tools_spark.operators import dedup as D
from conversation_analysis_tools_spark.operators.cache import release_all
from conversation_analysis_tools_spark.session import get_spark

RESULTS = "/root/repo/tools/sf10_results.json"

#: corpus pair name -> ((sf1 dir, sf10 dir), gen args for the sf10 dir)
PAIRS = {
    "saturated": ("/root/repo/testdata_sf1", "/root/repo/testdata_sf10docs",
                  ["--sf", "10", "--docs-only"]),
    "rich": ("/root/repo/testdata_sf1rich", "/root/repo/testdata_sf10rich",
             ["--sf", "10", "--docs-only", "--vocab", "4096"]),
    # round 10 (VERDICT r9 item 4): the events family's second decade.
    # 1M -> 10M events (events-only draws -- no 61M-row lineitem). The
    # distribution is the driver-profiled one: 30-day span, Exp(50)
    # values, 10x-scaling user count (150k users at sf10), so
    # sessionize state and window partition counts scale the way a
    # year of real activity data would.
    "events": ("/root/repo/testdata_sf1events",
               "/root/repo/testdata_sf10events",
               ["--sf", "10", "--events-only"]),
    # round 10 (late): the RELATIONAL family's second decade -- the
    # full TPC-H-ish corpus at sf10 (15M orders / ~61M lineitem / 10M
    # events / 1.5M customers), so the join/agg/window workhorses get
    # the same wall-vs-output adjudication as the dedup and events
    # families instead of stopping at sf1's 6M lineitem.
    "relational": ("/root/repo/testdata_sf1",
                   "/root/repo/testdata_sf10full",
                   ["--sf", "10"]),
}

#: (query, corpus pair, why it's in the sf10 set)
PROBES = [
    ("dedup_exact", "saturated", "hash-groupBy; the linear floor"),
    ("dedup_minhash_lsh", "saturated", "banded LSH bucket join"),
    ("dedup_simhash", "saturated", "bit-block banding + rep collapse"),
    ("dedup_ngram_jaccard", "saturated", "saturation router: probe -> tuned LSH"),
    ("dedup_edit_distance", "saturated", "length-blocked verify"),
    ("near_dup_canonicalize", "saturated", "greedy canonical set over pair graph"),
    ("dedup_substring_spans", "saturated", "span-hash expansion"),
    ("dedup_span_removal", "saturated", "pairwise span cut"),
    ("decontamination_bloom", "saturated", "broadcast Bloom + exact verify"),
    ("semdedup_prune", "saturated", "cluster-bucketed semantic dedup"),
    ("nlp_duplicate_pairs_routed", "rich", "cosine pairs, route=auto (tuned simhash-LSH)"),
    ("pipeline_analysis_results_routed", "rich", "full NLP pipeline, routed dup stage"),
    ("curation_pipeline_v2", "rich", "curation funnel (word rules)"),
    ("curation_pipeline_v3", "rich", "curation funnel + line rules"),
    # events family, round 10 (VERDICT r9 item 4): the window/stateful
    # operators' second decade -- the r9 probe proved defects can hide
    # below sf10 (semdedup), so the sessionize/window designs get the
    # same wall-vs-output scrutiny
    ("session_windows_30m", "events", "batch sessionize (gap window over user)"),
    ("stateful_sessionize", "events", "TWS streaming sessionize, finite drain"),
    ("streaming_stream_join", "events", "stream-stream interval join, finite drain"),
    ("anomaly_daily_zscore", "events", "year-partitioned trailing window rollup"),
    ("cumulative_new_users", "events", "distributed cumsum (year partitions + offsets)"),
    ("retention_cohorts", "events", "cohort matrix (first-day x activity-day)"),
    ("event_transitions", "events", "per-user lead() transition counts"),
    # relational workhorses, round 10 (late): joins, groupBys, windows,
    # and top-k over the 61M-row lineitem decade
    ("join_workhorse", "relational", "multi-table equi join, broadcast dims"),
    ("time_bucketed_agg", "relational", "multi-dim time-bucket aggregate"),
    ("top_k_orders", "relational", "TakeOrderedAndProject top-k"),
    ("group_concat_sorted", "relational", "sorted group_concat"),
    ("corr_matrix_by_flag", "relational", "per-group correlation matrix"),
    ("cube_rollup_counts", "relational", "cube/rollup grouping sets"),
    ("event_response_time", "relational", "per-user lead() response gaps"),
    ("join_enrich_pct", "relational", "merge/enrich percentage join"),
    ("histogram_buckets", "relational", "width-bucket histogram"),
    ("per_group_share", "relational", "per-group normalization window"),
]


def _runners(spark, qs):
    """Probe-only runners for the two all-pairs consumers: their
    REGISTERED queries keep route='exact' (the certified plan; the
    driver gate re-certifies it every window), but exact all-pairs
    cosine has no feasible plan at 500k docs on ANY corpus (~52% of
    pairs share a term on the rich vocabulary), so the sf10 evidence
    runs the 100-TB configuration -- route='auto', certified by
    nlp_dup_routed_fixed under the driver's oracle gate."""
    from conversation_analysis_tools_spark.catalog import table
    from conversation_analysis_tools_spark.operators import similarity as S
    from conversation_analysis_tools_spark.pipeline import run_content_pipeline

    def dup_routed(d):
        docs = table(spark, "documents", d).select("doc_id", "text")
        return S.duplicate_pairs(docs, threshold=0.9, route="auto").count()

    def pipeline_routed(d):
        docs = table(spark, "documents", d).select("doc_id", "text")
        out = run_content_pipeline(
            docs,
            {"keywords": ["data", "query", "stream"],
             "duplicate_threshold": 0.9, "duplicate_route": "auto"},
        )
        return out["analysis_results"].count()

    return {
        "nlp_duplicate_pairs_routed": dup_routed,
        "pipeline_analysis_results_routed": pipeline_routed,
    }


def best_of(fn, n: int = 2) -> tuple[float, int]:
    """(best wall, result rows). Row counts ride the table because a
    super-linear WALL with a matching super-linear OUTPUT is the
    pair-set contract doing its job on a saturated corpus, while a
    super-linear wall over a ~linear output is a plan defect -- the
    distinction the r8 verdict asks this probe to draw."""
    best, rows = None, 0
    for _ in range(n):
        t0 = time.time()
        rows = fn()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
        release_all()
    return round(best, 2), int(rows)


def main() -> None:
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
    state: dict = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            state = json.load(f)

    for pair, (d1, d10, gen_args) in PAIRS.items():
        if only and pair != only:
            continue
        for d, extra in ((d1, ["--sf", "1"]), (d10, None)):
            if not os.path.isdir(d):
                import subprocess

                args = gen_args if extra is None else extra + gen_args[2:]
                subprocess.run(
                    [sys.executable, "/root/repo/tools/gen_testdata.py"]
                    + args + ["--out", d],
                    check=True,
                )

    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    qs = entrymod.queries()
    runners = _runners(spark, qs)
    qs["dedup_exact"](spark, "/root/testdata/sf0.01").count()  # JIT warmup

    for name, pair, note in PROBES:
        if only and pair != only:
            continue
        d1, d10, _ = PAIRS[pair]
        rec = {"pair": pair, "note": note}
        for key, d, trials in (("sf1", d1, 2), ("sf10", d10, 1)):
            # sf10 runs once: fitcache artifacts are disk-memoized and
            # the signals read here are 2x-30x, not 5% deltas
            run = runners.get(name) or (
                lambda d, q=qs[name]: q(spark, d).count()
            )
            try:
                t, nrows = best_of(lambda d=d: run(d), n=trials)
            except Exception as e:  # noqa: BLE001 - record, keep probing
                rec[key] = {"err": type(e).__name__}
            else:
                rec[key] = {"sec": t, "rows": nrows}
            if name == "dedup_ngram_jaccard" and "err" not in rec[key]:
                rec[key]["route"] = (
                    f"route={getattr(D, 'LAST_JACCARD_ROUTE', None)} "
                    f"probe={getattr(D._ROUTE_STATE, 'probe_rows', None):.3g} "
                    f"bands={getattr(D, 'LAST_TUNED_BANDS', None)}"
                )
        state[name] = rec
        print(name, json.dumps(rec), flush=True)
        with open(RESULTS, "w") as f:
            json.dump(state, f, indent=1)

    _write_block(state)
    print("SCALE.md sf10-probe block updated")


def _write_block(state: dict) -> None:
    lines = [
        "",
        "| query | corpus | sf1 (50k docs) | sf10 (500k docs) "
        "| x10 rows -> x wall | out rows sf1 -> sf10 |",
        "|---|---|---|---|---|---|",
    ]
    routes = []
    for name, pair, note in PROBES:
        rec = state.get(name)
        if not rec:
            continue
        cells = [name, rec["pair"]]
        ts, ns = [], []
        for key in ("sf1", "sf10"):
            r = rec.get(key, {})
            if "err" in r:
                cells.append(f"ERR {r['err']}")
                ts.append(None)
                ns.append(None)
            else:
                cells.append(f"{r.get('sec')} s")
                ts.append(r.get("sec"))
                ns.append(r.get("rows"))
            if r.get("route"):
                routes.append(f"- `{name}` @ {key}: {r['route']}")
        ratio = (
            f"{round(ts[1] / max(ts[0], 0.01), 1)}x ({note})"
            if ts[0] is not None and ts[1] is not None
            else f"- ({note})"
        )
        out = (
            f"{ns[0]} -> {ns[1]} ({round(ns[1] / max(ns[0], 1), 1)}x)"
            if ns[0] is not None and ns[1] is not None
            else "-"
        )
        lines.append("| " + " | ".join(cells + [ratio, out]) + " |")

    from tools.md_block import write_md_block

    body = (
        "## sf10 scale probe (tools/sf10_probe.py)\n"
        "\n"
        "Wall seconds, best-of-2 at sf1 / single steady-state trial at\n"
        "sf10 (fitcache artifacts disk-memoized), local[32], .count()\n"
        "actions. Corpus pairs: `saturated` = the driver-profiled\n"
        "31-word vocabulary (true near-dup volume grows ~quadratically\n"
        "by construction -- the candidate-generation stress test);\n"
        "`rich` = 4096-word vocabulary (real-text similarity structure\n"
        "-- the plan-scaling test for the content pipelines; the\n"
        "all-pairs queries' true answer on the saturated corpus is\n"
        "output-quadratic and exhausts any engine). The wall-vs-output\n"
        "columns adjudicate every super-linear wall: output-bound =\n"
        "contract, output-flat = plan defect.\n"
        + "\n".join(lines)
        + "\n\nRouter decision record (dedup_ngram_jaccard, budget 32M rows):\n\n"
        + "\n".join(routes)
        + "\n"
        + """
Round-9 adjudications from this table:

- **dedup_simhash 25x wall / 103x output**: output-bound -- on the
  saturated vocabulary the TRUE hamming<=3 pair set grows
  quadratically (7k -> 726k pairs per decade); wall grows 4x SLOWER
  than output. Contract, not plan.
- **dedup_ngram_jaccard 9.2x at 10x rows**: the routed tuned-LSH plan
  is ~linear one decade past where its budget was tuned; the probe
  measured the exact plan at 1.21e10 candidate rows (100x sf1 --
  quadratic as constructed) and routed, as designed.
- **semdedup_prune**: the first probe pass caught two real defects --
  the dense-path assignment matmul ran on the scan's 1-2 parquet
  splits (single-core; fixed with _spread) and the quantizer fit was
  full-corpus k-means at C ~ n/128 (~n^2, hidden by fitcache on
  re-runs; fixed with ~20-per-centroid sampled fit). Steady state
  moved 90.9 s -> 22.1 s at sf10 (3.7x per decade).
- **all-pairs cosine** (nlp_duplicate_pairs / the pipeline's dup
  stage): NO exact plan is feasible at 500k docs -- the first probe
  pass measured the inverted index filling the 126 GiB tmpfs scratch
  and killing the JVM on BOTH corpus pairs (saturated: output
  quadratic; rich: ~52% of pairs share a term). Round 9 routes it:
  duplicate_pairs(route='auto') probes candidate volume and swaps in
  tuned simhash-LSH + exact-cosine verify (nlp_dup_routed_fixed
  certifies the routed plan under the driver gate). Routed: 7.0x per
  decade for the pair stage, 6.7x for the full pipeline -- and the
  registered exact queries keep their certified plans at driver sfs.
- **curation funnels** (v2 7.9x, v3 2.8x): map+window shapes, wall
  dominated by scan+fingerprint window; the v3 line stages add one
  hash-keyed exchange and stay well inside the decade budget.

Round-10 adjudications (the events family's second decade, VERDICT r9
item 4 -- 1M -> 10M events, 15k -> 150k users, same 30-day span):

- **no plan defects found**: every events probe lands at 1.1x-4.9x
  wall for 10x rows; nothing needed the semdedup treatment.
- **session_windows_30m 1.5x at 10x rows AND 10x output** (954k ->
  9.5M sessions): the gap-sessionize window partitions by user_id, so
  10x users = 10x partitions of constant size -- WindowExec stays
  flat-per-partition, the shape that survives any history length.
- **stateful_sessionize 4.9x**: the TWS drain pays per-batch state
  store churn on top of the same 10x output; wall is HALF the output
  growth, and the finite-drain overhead (micro-batch scheduling) is
  the fixed cost the streaming-throughput probe measures separately.
- **streaming_stream_join 2.1x at 10x output**: the interval join's
  watermark-bounded state holds only the 10-minute band per side
  regardless of corpus length -- wall tracks input scan, not state.
- **anomaly_daily_zscore 1.1x / cumulative_new_users 1.5x**: the
  year-partitioned trailing-window and distributed-cumsum designs are
  date-grain after the first reduce; event volume only changes the
  map-side partial aggregation, exactly as designed.
- **retention_cohorts 1.8x / event_transitions 1.9x**: one user_id
  shuffle each at 10x rows; map-side partials absorb the rest.

Round-10 adjudications (late: the RELATIONAL family's second decade,
full sf10 corpus -- 61M lineitem / 15M orders / 10M events):

- **no plan defects**: every probe lands at 1.0x-4.2x wall for 10x
  rows. The reduction-only shapes (top-k, histogram, group_concat,
  grouping sets, correlation) are FLAT at 1.0x-1.4x -- map-side
  partial aggregation absorbs the whole decade, scan time included.
- **join_workhorse 4.2x (5.4 -> 22.4 s)**: the one genuinely
  shuffle-bound probe -- at 15M orders the fact-fact side stops
  fitting broadcast thresholds, so the decade pays a real 61M-row
  exchange; wall stays well under the 10x row growth, and the
  dimension sides (customer/nation/region) remain broadcast in the
  audited plan (PLANS.md). At 100 TB this is the join the bucketed
  layout (catalog.write_partitioned_layout: lineitem/orders bucketed
  by orderkey -> shuffle-free SMJ) exists for.
- **window family (event_response_time 2.1x, per_group_share 1.4x)**:
  user_id/group-partitioned windows -- 10x partitions of constant
  size, the same shape the events-family and history-length probes
  certified.
"""
    )
    write_md_block("/root/repo/SCALE.md", "sf10-probe", body)


if __name__ == "__main__":
    main()
