"""Approximate nearest-neighbor search over embedding columns.

Two paths (the pattern every vector store uses):
* brute-force cosine top-k -- exact baseline; fine when the query set
  is small (broadcast queries, one scan of the corpus).
* hyperplane-LSH buckets -- scale path: 2^H buckets from sign bits of
  dot(v, h_i) against H fixed hyperplanes; candidates come from the
  query's bucket (optionally multi-probe neighbors at 1 bit flip),
  then exact cosine re-rank. Recall tunes with H and probes.

The hyperplanes are deterministic (seeded numpy) and inlined as
literal arrays -> broadcast to executors, dot products stay in
whole-stage codegen (zip_with/aggregate), no Python in the scan path.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from conversation_analysis_tools_spark.functions.vector import cosine_expr, dot_expr

DEFAULT_N_PLANES = 8
_SEED = 42


def _hyperplanes(dim: int, n_planes: int = DEFAULT_N_PLANES) -> np.ndarray:
    rng = np.random.RandomState(_SEED)
    return rng.standard_normal((n_planes, dim))


def hyperplane_bucket_expr(vec_col: str, dim: int, n_planes: int = DEFAULT_N_PLANES):
    """Bucket id column: sum_i (dot(v, h_i) > 0) << i."""
    planes = _hyperplanes(dim, n_planes)
    bucket = F.lit(0)
    for i in range(n_planes):
        h = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = F.when(dot_expr(F.col(vec_col), h) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket.cast("int")


def with_buckets(
    emb: DataFrame, dim: int, vec_col: str = "embedding", n_planes: int = DEFAULT_N_PLANES
) -> DataFrame:
    return emb.withColumn("bucket", hyperplane_bucket_expr(vec_col, dim, n_planes))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    ``queries``: (query_id, embedding). Broadcast x scan; per-query
    top-k via window rank (TakeOrdered per partition would be better
    for one query; the window form generalizes to query batches).
    """
    pairs = emb.crossJoin(F.broadcast(queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qv")
    ))).where(F.col(id_col) != F.col(query_id_col))
    sims = pairs.select(
        query_id_col,
        id_col,
        F.round(cosine_expr(vec_col, "_qv"), 6).alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(query_id_col, id_col, "sim", "rnk")
    )


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = DEFAULT_N_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    multiprobe: bool = True,
) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates from the query's
    bucket (plus 1-bit-flip neighbor buckets when ``multiprobe``),
    exact cosine re-rank within candidates."""
    bucketed = with_buckets(emb, dim, vec_col, n_planes)
    qb = with_buckets(queries, dim, vec_col, n_planes).select(
        F.col(query_id_col), F.col(vec_col).alias("_qv"), F.col("bucket").alias("qbucket")
    )
    if multiprobe:
        probes = F.array(
            F.col("qbucket"),
            *[
                F.col("qbucket").bitwiseXOR(F.lit(1 << i))
                for i in range(n_planes)
            ],
        )
        qb = qb.withColumn("bucket", F.explode(probes))
    else:
        qb = qb.withColumn("bucket", F.col("qbucket"))
    cands = bucketed.join(F.broadcast(qb.drop("qbucket")), "bucket").where(
        F.col(id_col) != F.col(query_id_col)
    )
    sims = cands.select(
        query_id_col, id_col, F.round(cosine_expr(vec_col, "_qv"), 6).alias("sim")
    ).dropDuplicates([query_id_col, id_col])
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(query_id_col, id_col, "sim", "rnk")
    )
