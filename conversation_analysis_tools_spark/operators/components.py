"""Connected components (N19-N20) without a graph library.

Reference: duplicate-pair edges -> DFS single-linkage clusters
(pipeline/duplicate_detector.py:216-264). DFS doesn't distribute;
the Spark-first equivalent is iterative min-label propagation
(SURVEY §4 item 2):

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated until fixpoint. Convergence is detected with the (monotone
non-increasing) global sum of labels; ``localCheckpoint`` every
iteration cuts the lineage so plan size stays O(1) per round instead
of growing with iterations -- at 100 TB the checkpoint also bounds
recovery cost. Iteration count is O(graph diameter); duplicate
clusters are near-cliques, so 2-4 rounds in practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from conversation_analysis_tools_spark.operators.cache import track


#: Edge count below which the graph is collected and solved with
#: driver-side union-find: a duplicate graph's edge list is almost
#: always tiny relative to the corpus (it IS the point of dedup), and
#: a local union-find on 10^5 edges is milliseconds, vs several
#: distributed join rounds. Above the limit the iterative min-label
#: loop runs (scales to any size).
SMALL_GRAPH_LIMIT = 500_000


def connected_components(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iter: int = 25,
    strategy: str = "auto",
) -> DataFrame:
    """(src, dst) undirected edges -> (id, component) with component =
    min node id reachable (matches the reference's min-representative
    selection, duplicate_detector.py:266-299).
    """
    # persist first: the probe, the collect/loop, and any downstream
    # join would otherwise re-materialize the (often expensive)
    # edge-producing plan -- e.g. the all-pairs similarity join
    edges = track(edges)
    if strategy == "auto":
        probe = edges.limit(SMALL_GRAPH_LIMIT + 1).count()
        strategy = "local" if probe <= SMALL_GRAPH_LIMIT else "distributed"
    if strategy == "local":
        return _cc_local(edges, src, dst)
    return _cc_distributed(edges, src, dst, max_iter)


def _cc_local(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Driver-side union-find over a collected (small) edge list."""
    rows = edges.select(src, dst).collect()
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        a, b = r[0], r[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id so the representative IS the component label
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    out = [(n, find(n)) for n in parent]
    spark = edges.sparkSession
    return spark.createDataFrame(out, schema=f"id {_id_type(edges, src)}, component {_id_type(edges, src)}")


def _id_type(edges: DataFrame, col: str) -> str:
    return edges.schema[col].dataType.simpleString()


def _cc_distributed(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iter: int = 25,
) -> DataFrame:
    """Iterative min-label propagation (the at-scale path)."""
    nodes = (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
    )
    labels = nodes.select("id", F.col("id").alias("component")).localCheckpoint()
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .localCheckpoint()
    )

    prev_sum = labels.agg(F.sum("component")).first()[0]
    for _ in range(max_iter):
        # neighbor labels flowing over edges + own label, min per node
        msgs = (
            sym.join(labels, sym.a == labels.id)
            .select(F.col("b").alias("id"), "component")
        )
        labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("component")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def clusters(components: DataFrame, min_size: int = 2) -> DataFrame:
    """Keep components with >= min_size members (reference keeps
    size>1, duplicate_detector.py:254-263)."""
    sizes = components.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return components.join(
        sizes.where(F.col("cluster_size") >= min_size), "component"
    )


def unique_representatives(all_ids: DataFrame, components: DataFrame) -> DataFrame:
    """N20 unique-doc selection: min(id) per cluster + every standalone
    id (duplicate_detector.py:266-299). ``all_ids`` must have column
    ``id``."""
    reps = components.groupBy("component").agg(F.min("id").alias("id"))
    standalone = all_ids.join(components, "id", "left_anti")
    return reps.select("id").unionByName(standalone.select("id"))
