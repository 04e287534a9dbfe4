"""Empirical scaling probe: measure headline operators across scale
factors and against a replicated outsized corpus, then write the
results table into SCALE.md.

Two experiments:

1. **SF sweep** -- run each probe query at sf0.001 / sf0.01 / sf0.1
   (100x data spread) and report wall seconds. With ~0.3-1 s of fixed
   job overhead per query at every SF, a scale-safe plan shows
   far-sub-linear wall growth across the sweep; a quadratic plan
   shows a >=100x blowup between the ends.

2. **10x documents replication** -- materialize a 50k-doc corpus
   (documents at sf0.1, replicated 10x with distinct doc_ids and a
   word-level perturbation so replicas are near- but not exact
   duplicates), then run the pair-generating operators (the ones with
   a quadratic failure mode) on it. The point is the *shape*: MinHash
   LSH and the banded/inverted similarity paths must grow roughly
   linearly in rows, never in pairs.

Usage: python tools/scale_probe.py [--skip-10x] (writes MEASURED
scaling section into SCALE.md between the marker comments).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from conversation_analysis_tools_spark.catalog import staging_dir, table
from conversation_analysis_tools_spark.operators.cache import release_all
from conversation_analysis_tools_spark.session import get_spark

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

#: sf1 (10x the largest driver-provided sf; ~6M lineitem / 1M events /
#: 50k docs) is generated IN-REPO by tools/gen_testdata.py because
#: /root/testdata is read-only -- schema- and distribution-matched
#: (see that module's docstring), perf evidence only, never oracled.
#: Including it stretches the sweep from a 100x span to 1000x.
SF1_DIR = "/root/repo/testdata_sf1"

#: (query, what its scaling demonstrates)
SWEEP = [
    ("event_response_time", "window + agg, one shuffle on user_id"),
    ("join_workhorse", "3-table join, broadcast dims"),
    ("word_frequency_top5", "tokenize + explode + count"),
    ("nlp_tfidf", "token shuffle + broadcast IDF"),
    ("nlp_duplicate_pairs", "all-pairs cosine (adaptive strategy)"),
    ("dedup_minhash_lsh", "banded LSH bucket join"),
    ("ann_lsh_knn", "multi-table LSH bucket equi-join"),
    ("curation_pipeline", "chained quality gates, map-heavy"),
    ("decontamination_bloom", "broadcast Bloom bitset + exact verify join"),
    ("dedup_substring_spans", "span-hash expansion, persisted 3-consumer reuse"),
    ("rollup_heavy_hitters_cms", "CMS cells: bounded day*D*W state after map-combine"),
    ("zorder_clustered_scan", "two tiny aggs over quantized coords, 512-row result"),
    # round-7 additions: the two queries the first sf1 sweep caught
    # super-linear, tracked per-round after their fixes
    ("semdedup_prune", "cluster-bucketed semantic dedup, C scales ~n/128 + BLAS stages"),
    ("dedup_ngram_jaccard", "exact inverted index <= sf0.1; sf1 auto-routes to tuned LSH (probe 121M > 32M budget)"),
    # round-8 additions: the serving-only IVF batch search and the
    # CSV sink round trip
    ("ann_ivf_batch_serve", "DPP-pruned batch search over the partitioned list store (serving plan alone)"),
    ("csv_roundtrip", "distributed CSV write + FAILFAST schema read-back + agg"),
]

#: Pair-generating operators run on the replicated corpus; these are
#: the ones whose naive plan is O(n^2).
BIG = [
    "nlp_duplicate_pairs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "decontamination_bloom",
    "dedup_span_removal",
    "dedup_ngram_jaccard",
    "dedup_edit_distance",
    "near_dup_canonicalize",
]

#: Byte-exact replication probes: the representative-collapse target
#: case. Every operator with an identical-content collapse stage must
#: hold near-flat here (candidates run on ~n/10 reps; wall tracks the
#: linear output expansion).
BIG_EXACT = [
    "dedup_simhash",
    "nlp_duplicate_pairs",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_edit_distance",
]


def best_of(fn, n: int = 3) -> float:
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
        release_all()
    return round(best, 2)


def build_10x(spark, sf_dir: str) -> str:
    """Replicate documents 10x with distinct ids. Replica 0 is the
    original; replicas 1-9 prepend a per-replica marker token
    ("v{rep} ") and keep only the last 200 words -- near- but not
    exact duplicates (exact-hash shortcuts can't collapse them), with
    long docs materially shortened."""
    out = staging_dir("docs10x", sf_dir)
    marker = os.path.join(out, "_SUCCESS_10x")
    if not os.path.exists(marker):
        docs = table(spark, "documents", sf_dir)
        n = docs.count()
        reps = (
            docs.select(
                "doc_id",
                "text",
                F.explode(F.sequence(F.lit(0), F.lit(9))).alias("rep"),
            )
            .select(
                (F.col("doc_id") + F.col("rep") * F.lit(n * 10)).alias("doc_id"),
                F.when(
                    F.col("rep") == 0, F.col("text")
                ).otherwise(
                    F.concat(
                        F.lit("v"),
                        F.col("rep").cast("string"),
                        F.lit(" "),
                        F.substring_index(F.col("text"), " ", -200),
                    )
                ).alias("text"),
            )
            .withColumn("source", F.lit("replica"))
            .withColumn("lang", F.lit("en"))
            .withColumn("n_chars", F.length("text"))
        )
        reps.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
        open(marker, "w").close()
    return out


def build_10x_exact(spark, sf_dir: str) -> str:
    """Replicate documents 10x with distinct ids and IDENTICAL text --
    the byte-exact replication mode (mirrors, re-crawls, boilerplate
    pages) that dominates real-corpus duplication. This is the case the
    representative-collapse in simhash_pairs / duplicate_pairs targets:
    candidate generation must run on ~n/10 distinct texts, with output
    pairs re-expanded linearly."""
    out = staging_dir("docs10xex", sf_dir)
    marker = os.path.join(out, "_SUCCESS_10xex")
    if not os.path.exists(marker):
        docs = table(spark, "documents", sf_dir)
        n = docs.count()
        reps = (
            docs.select(
                "doc_id",
                "text",
                F.explode(F.sequence(F.lit(0), F.lit(9))).alias("rep"),
            )
            .select(
                (F.col("doc_id") + F.col("rep") * F.lit(n * 10)).alias("doc_id"),
                F.col("text"),
            )
            .withColumn("source", F.lit("replica"))
            .withColumn("lang", F.lit("en"))
            .withColumn("n_chars", F.length("text"))
        )
        reps.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
        open(marker, "w").close()
    return out


def build_100x_exact(spark, sf_dir: str) -> str:
    """500k-doc byte-exact replication (documents sf0.1 x100): the
    dup-cluster stress level above build_10x_exact. Groups of 100
    identical texts mean ~4950 true pairs per group (~25M output
    pairs corpus-wide); any operator whose candidate stage is NOT
    representative-collapsed would generate 100^2-scale join rows per
    shared term/band and fall over here, so near-flat candidate time
    plus output-linear expansion is the pass criterion."""
    out = staging_dir("docs100xex", sf_dir)
    marker = os.path.join(out, "_SUCCESS_100xex")
    if not os.path.exists(marker):
        docs = table(spark, "documents", sf_dir)
        n = docs.count()
        reps = (
            docs.select(
                "doc_id",
                "text",
                F.explode(F.sequence(F.lit(0), F.lit(99))).alias("rep"),
            )
            .select(
                (F.col("doc_id") + F.col("rep") * F.lit(n * 100)).alias("doc_id"),
                F.col("text"),
            )
            .withColumn("source", F.lit("replica"))
            .withColumn("lang", F.lit("en"))
            .withColumn("n_chars", F.length("text"))
        )
        reps.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out, "documents.parquet")
        )
        open(marker, "w").close()
    return out


def main() -> None:
    skip_10x = "--skip-10x" in sys.argv
    skip_100x = "--skip-100x" in sys.argv
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    qs = entrymod.queries()
    qs["group_counts"](spark, SF_DIRS[1]).collect()  # warmup

    if not os.path.isdir(SF1_DIR):
        import subprocess

        subprocess.run(
            [sys.executable, "/root/repo/tools/gen_testdata.py"], check=True
        )
    dirs = SF_DIRS + [SF1_DIR]

    lines = [
        "",
        "| query | sf0.001 | sf0.01 | sf0.1 | sf1 | x1000 data -> x wall |",
        "|---|---|---|---|---|---|",
    ]
    for name, note in SWEEP:
        ts = [best_of(lambda d=d: qs[name](spark, d).collect()) for d in dirs]
        ratio = round(ts[3] / max(ts[0], 0.01), 1)
        lines.append(
            f"| {name} | {ts[0]} s | {ts[1]} s | {ts[2]} s | {ts[3]} s "
            f"| {ratio}x ({note}) |"
        )
        print(lines[-1], flush=True)

    if not skip_10x:
        big_dir = build_10x(spark, SF_DIRS[2])
        n_docs = spark.read.parquet(os.path.join(big_dir, "documents.parquet")).count()
        lines += [
            "",
            f"Replicated corpus: {n_docs} near-duplicate-heavy docs "
            "(documents sf0.1 x10, word-perturbed replicas):",
            "",
            "| query | sf0.1 (5k docs) | 10x (50k docs) | x10 rows -> x wall |",
            "|---|---|---|---|",
        ]
        for name in BIG:
            if name not in qs:
                continue
            # count(), not collect(): on this adversarial corpus the
            # PAIR SET itself is GBs -- materializing it distributed is
            # the operator's job; pulling it to the driver is not.
            t_small = best_of(lambda: qs[name](spark, SF_DIRS[2]).count())
            t_big = best_of(lambda: qs[name](spark, big_dir).count())
            lines.append(
                f"| {name} | {t_small} s | {t_big} s | {round(t_big / max(t_small, 0.01), 1)}x |"
            )
            print(lines[-1], flush=True)

        ex_dir = build_10x_exact(spark, SF_DIRS[2])
        lines += [
            "",
            "Byte-exact replication (documents sf0.1 x10, identical "
            "text, distinct ids) -- the representative-collapse target "
            "case; pair output is ~45 pairs/doc so wall growth tracks "
            "output size, not candidate volume:",
            "",
            "| query | sf0.1 (5k docs) | 10x exact (50k docs) | x10 rows -> x wall |",
            "|---|---|---|---|",
        ]
        for name in BIG_EXACT:
            t_small = best_of(lambda: qs[name](spark, SF_DIRS[2]).count())
            t_big = best_of(lambda: qs[name](spark, ex_dir).count())
            lines.append(
                f"| {name} | {t_small} s | {t_big} s | {round(t_big / max(t_small, 0.01), 1)}x |"
            )
            print(lines[-1], flush=True)

    if not (skip_10x or skip_100x):
        ex100 = build_100x_exact(spark, SF_DIRS[2])
        lines += [
            "",
            "Byte-exact replication x100 (documents sf0.1 x100, 500k "
            "docs, dup clusters of 100): ~25M true pairs corpus-wide. "
            "Candidate stages run on the ~5k collapsed representatives; "
            "wall is the linear output expansion (best-of-2):",
            "",
            "| query | sf0.1 (5k docs) | 100x exact (500k docs) | x100 rows -> x wall |",
            "|---|---|---|---|",
        ]
        for name in BIG_EXACT:
            t_small = best_of(lambda: qs[name](spark, SF_DIRS[2]).count(), n=2)
            t_big = best_of(lambda: qs[name](spark, ex100).count(), n=2)
            lines.append(
                f"| {name} | {t_small} s | {t_big} s | {round(t_big / max(t_small, 0.01), 1)}x |"
            )
            print(lines[-1], flush=True)

    from tools.md_block import write_md_block

    body = (
        "## Measured scaling (tools/scale_probe.py)\n"
        "\n"
        "Wall seconds, best-of-3, local[32]; every query carries\n"
        "~0.3-1 s fixed job overhead. The sweep spans 1000x (sf0.001\n"
        "-> sf1; sf1 is the in-repo tools/gen_testdata.py corpus, 6M\n"
        "lineitem / 1M events / 50k docs, distribution-matched to the\n"
        "driver data) -- at sf1 the headline queries finally leave the\n"
        "fixed-overhead floor, so the x1000 wall ratio is the real\n"
        "scan/shuffle growth signature: far-sub-linear = scan-bound\n"
        "plan. The pair-generating operators are additionally run on a\n"
        "10x replicated near-duplicate corpus (the quadratic failure\n"
        "mode): linear-ish growth there means the candidate generation\n"
        "is bucketed/banded, not all-pairs.\n"
        + "\n".join(lines)
    )
    write_md_block("/root/repo/SCALE.md", "scale-probe", body)
    print("SCALE.md updated")


if __name__ == "__main__":
    main()
