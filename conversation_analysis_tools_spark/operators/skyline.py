"""Skyline (Pareto-frontier) operator.

Pattern from the retrieved-papers corpus ("Integration of Skyline
Queries into Spark SQL", EDBT 2023): the classic two-phase
distributed skyline. A row p is in the skyline iff no other row q
dominates it -- q <= p in every skyline dimension and q < p in at
least one (ties/duplicates survive: neither dominates). The naive
relational form is a quadratic NOT EXISTS self-join; the distributed
form exploits that dominance is transitive-free to prune locally:

1. **Local phase** (map-only): each partition computes its own
   skyline -- a point dominated within a partition is dominated
   globally, so survivors are a superset of the global skyline.
   Arrow-batched mapInPandas with a sort-then-scan Pareto filter
   (sorted by the first dimension, a candidate can only be dominated
   by already-kept points; the kept set is the partition skyline,
   typically orders of magnitude smaller than the partition).
2. **Global phase**: survivors (bounded by |skyline| x n_partitions,
   KB-scale for realistic frontiers) shuffle to one task and the same
   filter runs once more.

At 100 TB the local phase does the heavy lifting on every executor
and only frontier candidates move. If a pathological frontier (~all
rows on the skyline) overwhelms the single global task, the standard
fix is recursive halving (re-run phase 1 on the survivors at lower
parallelism) or grid partitioning by quantiles of the first
dimension; the output itself is the bottleneck in that regime, same
as the dedup mega-cluster argument in SCALE.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _pareto_filter(cols: list[str]):
    """mapInPandas batch filter: keep the Pareto-minimal rows of each
    batch (schema passthrough). Sort by the first dimension so each
    candidate needs checking only against already-kept rows."""

    def batches(it):
        import numpy as np

        for pdf in it:
            if len(pdf) == 0:
                yield pdf
                continue
            pdf = pdf.sort_values(cols, kind="mergesort").reset_index(drop=True)
            a = pdf[cols].to_numpy(dtype="float64")
            kept_idx: list[int] = []
            kept = np.empty((0, a.shape[1]))
            for i in range(len(a)):
                p = a[i]
                if len(kept_idx):
                    le = (kept <= p).all(axis=1)
                    lt = (kept < p).any(axis=1)
                    if bool((le & lt).any()):
                        continue
                kept_idx.append(i)
                kept = a[kept_idx]
            yield pdf.iloc[kept_idx]

    return batches


def skyline(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pareto-minimal rows of ``df`` over ``cols`` (minimize every
    dimension; to maximize a column, pass its negation as a derived
    column). Two mapInPandas phases with one bounded exchange between
    them; ``repartition(1)`` (not coalesce) forces the stage boundary
    so the local phase keeps its full parallelism."""
    filt = _pareto_filter(cols)
    local = df.mapInPandas(filt, df.schema)
    return local.repartition(1).mapInPandas(filt, df.schema)
