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


def tf_vectors(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    counts: DataFrame | None = None,
) -> DataFrame:
    """(id, term, tf) sum-normalized -- the duplicate-detector vector.

    Pass a precomputed (persisted) ``counts`` table to share the
    tokenize+count shuffle with other branches of a pipeline."""
    if counts is None:
        counts = T.term_counts(T.explode_tokens(docs, id_col, text_col), id_col)
    return T.tf_sum(counts, id_col)


#: Vocabulary size below which the dense-vector plan beats the
#: inverted index: with v distinct terms shared by nearly all docs the
#: term join materializes O(v * n^2) rows, while the dense plan is a
#: broadcast nested-loop over n^2 pairs with a v-wide codegen dot.
SMALL_VOCAB_LIMIT = 256


def pairwise_cosine(
    tf: DataFrame,
    id_col: str = "doc_id",
    max_df: int | None = None,
    strategy: str = "auto",
    threshold: float = 0.0,
) -> DataFrame:
    """All-pairs cosine -> (id1, id2, sim). Physical strategy chosen
    from corpus statistics (a deliberate optimizer decision, SURVEY §4):

    * ``inverted``: self-join on term -- optimal for large sparse
      vocabularies (real text), where few pairs share terms.
    * ``dense``: vocab-aligned normalized dense vectors, broadcast
      nested-loop pair scan with an unrolled dot product -- optimal
      when the vocabulary is tiny and shared (every pair overlaps, so
      the inverted index degenerates to O(vocab * n^2) join rows).
    * ``auto``: count distinct terms, pick accordingly.
    """
    vocab = None
    if strategy == "auto":
        # one tiny job decides the strategy AND yields the vocabulary
        probe = (
            tf.select("term").distinct().limit(SMALL_VOCAB_LIMIT + 1).collect()
        )
        if len(probe) <= SMALL_VOCAB_LIMIT:
            strategy, vocab = "dense", sorted(r["term"] for r in probe)
        else:
            strategy = "inverted"
    if strategy == "dense":
        return _pairwise_cosine_dense(tf, id_col, threshold, vocab)
    return _pairwise_cosine_inverted(tf, id_col, max_df)


def _pairwise_cosine_dense(
    tf: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.0,
    vocab: list | None = None,
) -> DataFrame:
    """Dense plan: block matrix product.

    One row per doc with a vocab-aligned L2-normalized vector; the
    full (n x v) matrix is tiny when v is small (n=10^6, v=256 ->
    ~2 GB; here ~1 MB) and is broadcast; each Arrow batch of the
    SAME relation streams through ``mapInPandas`` and computes
    ``batch @ M.T`` with BLAS -- ~10^9 FLOPs/s/core instead of a
    per-pair join. Only pairs >= threshold cross back out of Python,
    so the output stays sparse. At larger n, block BOTH sides
    (grid of batch x batch products) -- same operator, different
    broadcast granularity.
    """
    import numpy as np
    import pandas as pd

    spark = tf.sparkSession

    if vocab is None:
        vocab = sorted(r["term"] for r in tf.select("term").distinct().collect())

    # Vocab-aligned dense vector built JVM-side (map lookup per slot in
    # codegen): both the driver collect and the Arrow batches then hold
    # ready-made float arrays -- no per-cell Python dict fills.
    ent = F.map_from_entries(F.collect_list(F.struct("term", "tf")))
    vkeys = F.array(*[F.lit(t) for t in vocab])
    # persist: this relation is both the broadcast-matrix source (one
    # collect) and the streamed side (mapInPandas) -- without the
    # persist the tokenize+groupBy lineage would run twice
    per_doc = (
        tf.groupBy(id_col)
        .agg(ent.alias("m"))
        .select(
            F.col(id_col).alias("_id"),
            F.transform(
                vkeys, lambda t: F.coalesce(F.element_at(F.col("m"), t), F.lit(0.0))
            ).alias("v"),
        )
        .persist()
    )

    compact = per_doc.collect()
    ids = np.array([r["_id"] for r in compact], dtype=np.int64)
    # explicit reshape keeps 2-D on an empty corpus / empty vocab
    mat = np.array([r["v"] for r in compact], dtype=float).reshape(
        len(compact), len(vocab)
    )
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat = mat / norms[:, None]
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    thr = threshold

    def block(batches):
        M = b_mat.value
        all_ids = b_ids.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["v"].to_numpy())
            n = np.linalg.norm(V, axis=1)
            n[n == 0] = 1.0
            V = V / n[:, None]
            sims = V @ M.T
            batch_ids = pdf["_id"].to_numpy()
            # vectorized pair extraction over the whole batch
            mask = (sims >= thr) & (all_ids[None, :] > batch_ids[:, None])
            ii, jj = np.nonzero(mask)
            yield pd.DataFrame(
                {"id1": batch_ids[ii], "id2": all_ids[jj], "sim": sims[ii, jj]}
            )

    return per_doc.mapInPandas(block, schema="id1 long, id2 long, sim double")


def _pairwise_cosine_inverted(
    tf: DataFrame,
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """Inverted-index plan: self-join on term -> groupBy pair.

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
    strategy: str = "auto",
    counts: DataFrame | None = None,
) -> DataFrame:
    """N17: pairs with cosine >= threshold (default 0.8,
    pipeline/duplicate_detector.py:127-167)."""
    sims = pairwise_cosine(
        tf_vectors(docs, id_col, text_col, counts), id_col, max_df, strategy, threshold
    )
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
