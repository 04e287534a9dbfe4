"""Sparse-vector document similarity (N16-N18, J8) -- inverted-index
join, never a blind crossJoin.

Reference semantics (pipeline/duplicate_detector.py:74-167): cosine
over sum-normalized TF dicts; pairs i<j kept when sim >= threshold.
Pairs with no shared term have cosine 0, so generating candidates from
an inverted-index self-join on ``term`` is *exact* (SURVEY §4 item 1):
only pairs that share at least one term are ever materialized.

Scale path: at 100 TB the frequent-term blowup (a term shared by k
docs contributes k^2 candidate rows) is the wall; ``max_df`` drops
terms present in more than a fraction of docs (stopword-like terms
contribute almost nothing to cosine ordering but dominate the join),
and the MinHash-LSH variant in dedup.py replaces the exact join
entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from conversation_analysis_tools_spark.operators import tfidf as T


def tf_vectors(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, term, tf) sum-normalized -- the duplicate-detector vector."""
    tokens = T.explode_tokens(docs, id_col, text_col)
    return T.tf_sum(T.term_counts(tokens, id_col), id_col)


def pairwise_cosine(
    tf: DataFrame,
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """All-pairs cosine via inverted-index self-join -> (id1, id2, sim).

    ``tf`` is (id, term, tf). Norms are per-doc aggregates; the dot
    product groups the term-join by pair. Only pairs sharing a term
    appear (exact w.r.t. any threshold > 0).
    """
    if max_df is not None:
        doc_freq = tf.groupBy("term").agg(F.count("*").alias("df"))
        tf = tf.join(
            F.broadcast(doc_freq.where(F.col("df") <= max_df)), "term", "left_semi"
        )

    norms = tf.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("tf") * F.col("tf"))).alias("norm")
    )

    a = tf.select(
        F.col(id_col).alias("id1"), F.col("term"), F.col("tf").alias("tf1")
    )
    b = tf.select(
        F.col(id_col).alias("id2"), F.col("term"), F.col("tf").alias("tf2")
    )
    dots = (
        a.join(b, "term")
        .where(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.sum(F.col("tf1") * F.col("tf2")).alias("dot"))
    )
    n1 = norms.select(F.col(id_col).alias("id1"), F.col("norm").alias("norm1"))
    n2 = norms.select(F.col(id_col).alias("id2"), F.col("norm").alias("norm2"))
    return (
        dots.join(F.broadcast(n1), "id1")
        .join(F.broadcast(n2), "id2")
        .select(
            "id1",
            "id2",
            (F.col("dot") / (F.col("norm1") * F.col("norm2"))).alias("sim"),
        )
    )


def duplicate_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """N17: pairs with cosine >= threshold (default 0.8,
    pipeline/duplicate_detector.py:127-167)."""
    sims = pairwise_cosine(tf_vectors(docs, id_col, text_col), id_col, max_df)
    return sims.where(F.col("sim") >= threshold)


def near_duplicates_of(
    docs: DataFrame,
    target_id,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """N18: one-vs-all cosine for a single target document.

    The target's TF vector is a handful of rows -> broadcast; the scan
    side never shuffles on pairs, only the per-candidate dot-product
    aggregation runs.
    """
    tf = tf_vectors(docs, id_col, text_col)
    target = tf.where(F.col(id_col) == target_id).select(
        F.col("term"), F.col("tf").alias("tf_t")
    )
    t_norm = tf.where(F.col(id_col) == target_id).agg(
        F.sqrt(F.sum(F.col("tf") * F.col("tf"))).alias("norm_t")
    )
    norms = tf.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("tf") * F.col("tf"))).alias("norm")
    )
    dots = (
        tf.where(F.col(id_col) != target_id)
        .join(F.broadcast(target), "term")
        .groupBy(id_col)
        .agg(F.sum(F.col("tf") * F.col("tf_t")).alias("dot"))
    )
    return (
        dots.join(F.broadcast(norms), id_col)
        .crossJoin(F.broadcast(t_norm))
        .select(
            F.col(id_col).alias("dup_id"),
            (F.col("dot") / (F.col("norm") * F.col("norm_t"))).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )
