"""sf10 scale probe (VERDICT r8 item 1): push the dedup/pipeline scale
evidence one more decade beyond the sf1 corpus the round-8 saturation
router was tuned on.

The corpus is 500k documents + 200k embeddings from
``tools/gen_testdata.py --sf 10 --docs-only`` (the relational tables
stay at sf1 per the verdict -- nothing here reads them). Every probe
query runs at sf1 AND sf10 (best-of-2, .count() so the pair sets stay
distributed), and the router's decision record (route, measured
candidate volume vs budget, solved banding) is captured at both scales
for ``dedup_ngram_jaccard`` -- the query whose exact plan is
super-linear by construction on this saturated-vocabulary corpus and
whose routed plan must hold ~linear for the 100-TB posture to stand.

Writes the results table into SCALE.md between the ``sf10-probe``
markers (its own block -- tools/scale_probe.py owns the ``scale-probe``
block and rewrites it wholesale).

Usage: python tools/sf10_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from conversation_analysis_tools_spark.operators import dedup as D
from conversation_analysis_tools_spark.operators.cache import release_all
from conversation_analysis_tools_spark.session import get_spark

SF1_DIR = "/root/repo/testdata_sf1"
SF10_DIR = "/root/repo/testdata_sf10docs"

#: (query, why it's in the sf10 set)
PROBES = [
    ("dedup_exact", "hash-groupBy; the linear floor"),
    ("dedup_minhash_lsh", "banded LSH bucket join"),
    ("dedup_simhash", "bit-block banding + rep collapse"),
    ("dedup_ngram_jaccard", "saturation router: probe -> tuned LSH"),
    ("dedup_edit_distance", "length-blocked verify"),
    ("near_dup_canonicalize", "greedy canonical set over pair graph"),
    ("dedup_substring_spans", "span-hash expansion"),
    ("dedup_span_removal", "pairwise span cut"),
    ("decontamination_bloom", "broadcast Bloom + exact verify"),
    ("semdedup_prune", "cluster-bucketed semantic dedup"),
    # dedup_embedding_cosine is EXCLUDED deliberately: it is the
    # documented brute-force BASELINE (label-blocked exact pairs with
    # a fixed 10-label cardinality -> pair volume ~n^2/10 by
    # contract; its docstring points at the ANN/semdedup bucketing as
    # the scale path, which IS probed here via semdedup_prune).
    ("nlp_duplicate_pairs", "grid-blocked BLAS cosine pairs"),
    ("pipeline_analysis_results", "full NLP pipeline, one DAG"),
    ("curation_pipeline_v2", "curation funnel (word rules)"),
    ("curation_pipeline_v3", "curation funnel + line rules"),
]


def best_of(fn, n: int = 2) -> tuple[float, int]:
    """(best wall, result rows). Row counts ride the table because a
    super-linear WALL with a matching super-linear OUTPUT is the
    pair-set contract doing its job on a saturated corpus (every pair
    >= threshold must be emitted), while a super-linear wall over a
    ~linear output is a plan defect -- the distinction the r8 verdict
    asks this probe to draw."""
    best, rows = None, 0
    for _ in range(n):
        t0 = time.time()
        rows = fn()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
        release_all()
    return round(best, 2), int(rows)


def main() -> None:
    if not os.path.isdir(SF10_DIR):
        import subprocess

        subprocess.run(
            [
                sys.executable,
                "/root/repo/tools/gen_testdata.py",
                "--sf", "10", "--docs-only", "--out", SF10_DIR,
            ],
            check=True,
        )
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    qs = entrymod.queries()
    qs["dedup_exact"](spark, "/root/testdata/sf0.01").count()  # JIT warmup

    lines = [
        "",
        "| query | sf1 (50k docs) | sf10 (500k docs) | x10 rows -> x wall | out rows sf1 -> sf10 |",
        "|---|---|---|---|---|",
    ]
    routes: dict[str, str] = {}
    for name, note in PROBES:
        row = [name]
        ts, ns = [], []
        for d, trials in ((SF1_DIR, 2), (SF10_DIR, 1)):
            # sf10 runs once: fitcache artifacts are disk-memoized and
            # the signals read here are 2x-30x, not 5% deltas
            try:
                t, nrows = best_of(
                    lambda d=d: qs[name](spark, d).count(), n=trials
                )
            except Exception as e:  # noqa: BLE001 - record, keep probing
                t, nrows = None, None
                row.append(f"ERR {type(e).__name__}")
            else:
                row.append(f"{t} s")
            ts.append(t)
            ns.append(nrows)
            if name == "dedup_ngram_jaccard" and t is not None:
                routes[d] = (
                    f"route={getattr(D, 'LAST_JACCARD_ROUTE', None)} "
                    f"probe={getattr(D._ROUTE_STATE, 'probe_rows', None):.3g} "
                    f"bands={getattr(D, 'LAST_TUNED_BANDS', None)}"
                )
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
        lines.append("| " + " | ".join(row + [ratio, out]) + " |")
        print(lines[-1], flush=True)

    route_lines = [
        "",
        "Router decision record (dedup_ngram_jaccard, budget 32M rows):",
        "",
    ] + [f"- `{os.path.basename(d)}`: {r}" for d, r in routes.items()]

    from tools.md_block import write_md_block

    body = (
        "## sf10 scale probe (tools/sf10_probe.py)\n"
        "\n"
        "Wall seconds, best-of-2, local[32], .count() actions. sf10 is\n"
        "the docs-only gen_testdata corpus (500k docs / 200k embeddings,\n"
        "same distributions as sf1; relational tables intentionally\n"
        "absent). The sf1->sf10 decade is the one the round-8 router's\n"
        "32M-row budget and tuned-LSH bucket handling were NOT tuned on\n"
        "-- ~linear growth here is the evidence the 100-TB posture\n"
        "rests on; the fixed ~0.3-1 s job overhead means ratios well\n"
        "under 10x are scan/shuffle-bound plans leaving the overhead\n"
        "floor.\n"
        + "\n".join(lines + route_lines)
    )
    write_md_block("/root/repo/SCALE.md", "sf10-probe", body)
    print("SCALE.md sf10-probe block updated")


if __name__ == "__main__":
    main()
