"""Exact-value anchors for tokenize/TF/IDF (FIXTURES.md §A5, ported
from the reference's test_relevance_scorer / test_duplicate_detector).
"""

import math

from pyspark.sql import functions as F

from conversation_analysis_tools_spark.functions.text import tokens_with_dupes_expr
from conversation_analysis_tools_spark.operators import tfidf as T


def _tokens_df(spark, tokens):
    text = " ".join(tokens)
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_tokenizer_removes_stopwords_and_short_words(spark):
    df = spark.createDataFrame(
        [(1, "The cat is on the mat with machine learning")],
        "doc_id long, text string",
    )
    toks = df.select(tokens_with_dupes_expr("text").alias("t")).head()["t"]
    # 'the'/'is'/'on'/'with' are stopwords; 'cat'/'mat' are 3-char keeps
    assert toks == ["cat", "mat", "machine", "learning"]


def test_tf_max_normalized_exact(spark):
    # reference test_relevance_scorer.py:34-42: machine=1.0, learning=0.5
    df = _tokens_df(spark, ["machine", "learning", "machine", "data"])
    tf = T.tf_max(T.term_counts(T.explode_tokens(df)))
    vals = {r["term"]: r["tf"] for r in tf.collect()}
    assert vals == {"machine": 1.0, "learning": 0.5, "data": 0.5}


def test_tf_sum_normalized_exact(spark):
    # reference test_duplicate_detector.py:26-34: sum == 1.0
    df = _tokens_df(spark, ["machine", "learning", "machine", "data"])
    tf = T.tf_sum(T.term_counts(T.explode_tokens(df)))
    vals = {r["term"]: r["tf"] for r in tf.collect()}
    assert vals == {"machine": 0.5, "learning": 0.25, "data": 0.25}
    assert abs(sum(vals.values()) - 1.0) < 1e-12


def test_idf_reference_formula(spark, sample_docs):
    # idf = ln(N / (1 + df)), N = 6 docs
    tokens = T.explode_tokens(sample_docs)
    idf = {r["term"]: r["idf"] for r in T.idf(tokens, 6).collect()}
    # 'machine' appears in docs 0 and 5 -> df=2
    assert abs(idf["machine"] - math.log(6 / 3)) < 1e-12
    # 'weather' appears once -> ln(6/2)
    assert abs(idf["weather"] - math.log(3)) < 1e-12
