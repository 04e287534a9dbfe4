"""Keyword relevance scoring (N6-N10), reference-exact.

Semantics (pipeline/relevance_scorer.py:127-224):
* density  = |tokens that are keywords| / |tokens|   (multiset count)
* coverage = |keywords present in token set| / |keywords|
* tfidf_kw = sum(tfidf[kw] for matched kw) / |keywords| (0 if none)
* combined = normalized weights {density .3, coverage .4, tfidf .3}

Everything is a column expression over the documents DataFrame plus
one broadcast join against the per-doc keyword-tfidf sums -- no UDFs,
one shuffle (the tfidf aggregation), scales linearly in corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from conversation_analysis_tools_spark.functions.text import tokens_with_dupes_expr
from conversation_analysis_tools_spark.operators import tfidf as T
from conversation_analysis_tools_spark.functions.lits import array_lit

DEFAULT_WEIGHTS = {"density": 0.3, "coverage": 0.4, "tfidf": 0.3}


def with_keyword_scores(
    docs: DataFrame,
    keywords: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Add density/coverage columns (pure expressions, no shuffle)."""
    kw_arr = array_lit([k.lower() for k in keywords])
    toks = tokens_with_dupes_expr(text_col)
    docs = docs.withColumn("_toks", toks)
    density = F.when(
        F.size("_toks") > 0,
        F.size(F.filter("_toks", lambda t: F.array_contains(kw_arr, t)))
        / F.size("_toks"),
    ).otherwise(0.0)
    coverage = F.size(F.array_intersect(F.array_distinct("_toks"), kw_arr)) / F.lit(
        len(keywords)
    )
    return docs.withColumn("density", density).withColumn("coverage", coverage)


def keyword_tfidf_scores(
    docs: DataFrame,
    keywords: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Per-doc tfidf keyword score: sum of matched keyword tfidf / |kws|.

    Uses the max-normalized TF and reference IDF (tfidf.py). The
    keyword filter happens *before* the aggregation so only keyword
    rows shuffle. Pass a (possibly persisted) ``counts`` table to share
    the tokenize+count work with other pipeline branches; IDF is then
    derived from it too (idf_from_counts), so the raw token stream is
    shuffled exactly once.
    """
    n_docs = docs.count()  # corpus size N; cheap metadata-only count on parquet
    if counts is None:
        # counts feeds both the tf_max branch and idf_from_counts, but
        # in ONE plan -- recomputing the cheap tokenize+count beats
        # persist materialization here (callers with genuinely shared
        # multi-job consumption pass a persisted ``counts``)
        counts = T.term_counts(T.explode_tokens(docs, id_col, text_col), id_col)
    tf = T.tf_max(counts, id_col)
    idf_df = T.idf_from_counts(counts, n_docs, id_col)
    tfidf_df = T.tfidf(tf, idf_df, id_col)
    kw = [k.lower() for k in keywords]
    per_doc = (
        tfidf_df.where(F.col("term").isin(kw) & (F.col("tfidf") > 0))
        .groupBy(id_col)
        .agg((F.sum("tfidf") / F.lit(len(keywords))).alias("tfidf_score"))
    )
    return per_doc


def score_documents(
    docs: DataFrame,
    keywords: list[str],
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    counts: DataFrame | None = None,
) -> DataFrame:
    """N9/N10: combined relevance score per document."""
    w = dict(weights or DEFAULT_WEIGHTS)
    total = sum(w.values())
    # Same ulp-drift guard as priority.combined_score_expr: 0.3+0.4+0.3
    # sums to 0.9999999999999999 in floats; normalizing by that would
    # shift each weight off its literal value.
    if abs(total - 1.0) > 1e-12:
        w = {k: v / total for k, v in w.items()}

    # drop the token array BEFORE the join: if kw_tfidf outgrows the
    # broadcast threshold (corpus-scale keyword lists), the scored side
    # shuffles on id -- it must shuffle narrow score rows, not the full
    # per-doc token arrays
    scored = with_keyword_scores(docs, keywords, id_col, text_col).drop("_toks")
    kw_tfidf = keyword_tfidf_scores(docs, keywords, id_col, text_col, counts)
    return (
        scored.join(kw_tfidf, id_col, "left")
        .withColumn("tfidf_score", F.coalesce(F.col("tfidf_score"), F.lit(0.0)))
        .withColumn(
            "relevance",
            F.lit(w["density"]) * F.col("density")
            + F.lit(w["coverage"]) * F.col("coverage")
            + F.lit(w["tfidf"]) * F.col("tfidf_score"),
        )
    )
