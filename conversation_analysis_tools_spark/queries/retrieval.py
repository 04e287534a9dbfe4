"""Hybrid retrieval queries: BM25 lexical ranking and reciprocal-rank
fusion with embedding cosine (the production successor of the
reference's keyword relevance + embedding search, sql_search.py
semantic search path).

Scale shape: candidate lists are cut to top-K with
``orderBy().limit()`` (Spark plans TakeOrderedAndProject -- a
per-partition top-K plus a K-sized driver merge, never a global
sort), and row_number ranking runs only on those K rows. Fusion is a
K x K outer join. The corpus-wide work is one tokenize shuffle and
one embedding scan regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from conversation_analysis_tools_spark.catalog import table as _catalog_table
from conversation_analysis_tools_spark.operators import ann as A
from conversation_analysis_tools_spark.operators.bm25 import bm25_scores
from conversation_analysis_tools_spark.queries.nlp import KEYWORDS, TOK_CTE
from conversation_analysis_tools_spark.queries.registry import register

KW_IN = ", ".join(f"'{k}'" for k in KEYWORDS)

#: BM25 oracle CTEs (k1=1.2, b=0.75). Numeric literals are cast to
#: DOUBLE explicitly -- DuckDB types bare decimals as DECIMAL and its
#: fixed-point division would diverge from Spark's double math.
_BM25_CTES = f"""
    {TOK_CTE},
    counts AS (SELECT doc_id, term, count(*) AS cnt FROM tok GROUP BY 1, 2),
    dl AS (SELECT doc_id, sum(cnt) AS dl FROM counts GROUP BY 1),
    stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                     (SELECT avg(dl) FROM dl) AS avgdl),
    dft AS (SELECT term, count(*) AS df FROM counts
            WHERE term IN ({KW_IN}) GROUP BY 1),
    scored AS (
        SELECT c.doc_id,
               round(sum(
                   ln(1 + ((s.n_docs - d.df)::DOUBLE + 0.5) / (d.df::DOUBLE + 0.5))
                   * c.cnt * (2.2::DOUBLE)
                   / (c.cnt + (1.2::DOUBLE) * (0.25::DOUBLE + (0.75::DOUBLE) * l.dl / s.avgdl))
               ), 6) AS bm25
        FROM counts c
        JOIN dft d USING (term)
        JOIN dl l USING (doc_id)
        CROSS JOIN stats s
        GROUP BY 1
    )
"""


@register(
    "bm25_topk",
    oracle=f"""
    WITH {_BM25_CTES}
    SELECT doc_id, bm25, rnk FROM (
        SELECT doc_id, bm25,
               row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
        FROM scored
    ) WHERE rnk <= 10
    """,
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 for the keyword query (k1=1.2, b=0.75).
    Ranks are assigned on the ROUNDED score with doc_id tiebreak so
    rank boundaries cannot flip between engines."""
    docs = _catalog_table(spark, "documents", sf_dir)
    scored = bm25_scores(docs, KEYWORDS)
    top = scored.orderBy(F.desc("bm25"), "doc_id").limit(10)
    w = Window.orderBy(F.desc("bm25"), "doc_id")
    return top.withColumn("rnk", F.row_number().over(w))


@register(
    "hybrid_rrf",
    oracle=f"""
    WITH {_BM25_CTES},
    bm_ranked AS (
        SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_bm
        FROM scored QUALIFY r_bm <= 60
    ),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    cos AS (
        SELECT e.vec_id,
               round(list_dot_product(e.v, q.qv)
                     / (sqrt(list_dot_product(e.v, e.v))
                        * sqrt(list_dot_product(q.qv, q.qv))), 6) AS sim
        FROM e, q WHERE e.vec_id <> 0
    ),
    cos_ranked AS (
        SELECT vec_id, row_number() OVER (ORDER BY sim DESC, vec_id) AS r_cos
        FROM cos QUALIFY r_cos <= 60
    ),
    fused AS (
        SELECT COALESCE(b.doc_id, c.vec_id) AS doc_id,
               round(COALESCE((1::DOUBLE) / (60 + b.r_bm), 0)
                     + COALESCE((1::DOUBLE) / (60 + c.r_cos), 0), 6) AS rrf
        FROM bm_ranked b FULL OUTER JOIN cos_ranked c ON b.doc_id = c.vec_id
    )
    SELECT doc_id, rrf, rnk FROM (
        SELECT doc_id, rrf,
               row_number() OVER (ORDER BY rrf DESC, doc_id) AS rnk
        FROM fused
    ) WHERE rnk <= 10
    """,
)
def hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse the BM25 keyword ranking with the
    embedding-cosine ranking (query by example: vec 0) via reciprocal
    rank fusion, rrf = sum over lists of 1/(60 + rank), top-10.

    Both candidate lists are cut to 60 with TakeOrderedAndProject
    before any windowing, so the single-partition row_number touches
    60 rows regardless of corpus size; a doc missing from one list
    contributes 0 for it (COALESCE over the full outer join).
    """
    docs = _catalog_table(spark, "documents", sf_dir)
    emb = _catalog_table(spark, "embeddings", sf_dir)

    bm_top = (
        bm25_scores(docs, KEYWORDS).orderBy(F.desc("bm25"), "doc_id").limit(60)
    )
    bm_ranked = bm_top.withColumn(
        "r_bm", F.row_number().over(Window.orderBy(F.desc("bm25"), "doc_id"))
    ).select("doc_id", "r_bm")

    qv = emb.where(F.col("vec_id") == 0).select(
        F.lit(0).cast("long").alias("query_id"), "embedding"
    )
    # query-by-example with a corpus vector: self-exclusion applies
    cos = A.brute_force_topk(emb, qv, k=60, exclude_self=True).select(
        F.col("vec_id").alias("doc_id"), F.col("rnk").alias("r_cos")
    )

    fused = (
        bm_ranked.join(cos, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(F.lit(1.0) / (F.col("r_bm") + 60), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (F.col("r_cos") + 60), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    top = fused.orderBy(F.desc("rrf"), "doc_id").limit(10)
    return top.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("rrf"), "doc_id"))
    )
