"""Round-count probe: star contraction vs min-label on a path graph.

A path is the adversarial topology for min-label propagation (rounds =
diameter); large-star/small-star must stay logarithmic. Usage:

    python tools/cc_probe.py [n_nodes ...]

Prints one line per topology/strategy with rounds + wall seconds; the
measured table lives in SCALE.md ("Connected components on
high-diameter graphs").
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from conversation_analysis_tools_spark.operators import components as C
from conversation_analysis_tools_spark.session import get_spark


def path_edges(spark, n: int):
    return spark.range(0, n - 1).select(
        F.col("id").alias("id1"), (F.col("id") + 1).alias("id2")
    )


def clique_batch_edges(spark, n_cliques: int, k: int):
    """n_cliques disjoint k-cliques -- the dup-graph (near-clique) shape."""
    base = spark.range(0, n_cliques).select(F.col("id").alias("g"))
    members = base.select(
        "g", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i")
    ).select("g", (F.col("g") * k + F.col("i")).alias("node"), "i")
    a = members.select("g", F.col("node").alias("id1"), F.col("i").alias("ia"))
    b = members.select("g", F.col("node").alias("id2"), F.col("i").alias("ib"))
    return (
        a.join(b, "g")
        .where(F.col("ia") < F.col("ib"))
        .select("id1", "id2")
    )


def run(edges, n_label: str, strategy: str, max_iter: int = 40) -> None:
    t0 = time.time()
    out = C.connected_components(edges, strategy=strategy, max_iter=max_iter)
    n_comp = out.select("component").distinct().count()
    wall = time.time() - t0
    rounds = C.LAST_STAR_ROUNDS if strategy == "star" else "-"
    print(
        f"{n_label:>28} strategy={strategy:<11} rounds={rounds!s:>3} "
        f"components={n_comp:>6} wall={wall:6.2f}s"
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [4096, 65536]
    spark = get_spark()
    for n in sizes:
        edges = path_edges(spark, n)
        run(edges, f"path n={n}", "star")
        # min-label on the same path, capped: rounds = diameter, so
        # hitting the cap now RAISES (round 8: silent partial labels
        # were the failure mode the loud contract closed) -- the probe
        # documents the wall by catching the loud failure
        if n <= 4096:
            t0 = time.time()
            try:
                C.connected_components(
                    edges, strategy="distributed", max_iter=40
                ).count()
                outcome = (
                    "converged within the cap"
                    if n <= 41
                    else "converged (unexpected on a path this long)"
                )
            except RuntimeError as e:
                outcome = f"raised as designed: {e}"
            print(
                f"{'path n=' + str(n):>28} strategy=distributed rounds=40cap "
                f"{outcome} wall={time.time() - t0:6.2f}s"
            )
    edges = clique_batch_edges(spark, 2000, 8)
    run(edges, "cliques 2000x8", "star")
    run(edges, "cliques 2000x8", "distributed")


if __name__ == "__main__":
    main()
