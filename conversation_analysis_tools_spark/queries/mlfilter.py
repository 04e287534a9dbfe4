"""Model-based quality filtering: a distributed classifier distilled
from heuristic weak labels (beyond-reference extension).

The modern curation stack (e.g. FineWeb-Edu, Llama-3 data work) runs a
cheap learned classifier over the whole corpus, trained to imitate an
expensive teacher (LLM ratings, curated domains). Here the teacher is
the Gopher heuristic gate (queries/textstats.py): hashed bag-of-words
features -> LogisticRegression -> per-doc quality probability. The
shape is what matters at 100 TB:

* featurize = map-only (HashingTF is a stateless hash, no vocabulary
  shuffle, fixed width regardless of corpus size),
* train = one pass over the ~90% train split per L-BFGS iteration,
  driver holds only the 1024-dim coefficient vector,
* score = map-only model.transform broadcast to every executor.

Rows-only for the driver (iterative L-BFGS floats are not
SQL-expressible); tests/test_mlfilter.py pins held-out accuracy well
above the majority-class rate and train/score determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from conversation_analysis_tools_spark.catalog import table as _catalog_table
from conversation_analysis_tools_spark.functions.text import raw_tokens_expr
from conversation_analysis_tools_spark.queries.registry import REGISTRY, register

#: md5-prefix eval split, same family as sampling.hash_split ('1a' ~ 10%).
_EVAL_HEX = "1a"


def _labeled_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id, toks, label (Gopher gate), split -- the training frame."""
    docs = _catalog_table(spark, "documents", sf_dir)
    flags = (
        REGISTRY["gopher_quality_flags"]
        .fn(spark, sf_dir)
        .select("doc_id", F.col("passes_gopher").cast("double").alias("label"))
    )
    toks = docs.select("doc_id", raw_tokens_expr("text").alias("toks"))
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
        < _EVAL_HEX,
        F.lit("eval"),
    ).otherwise(F.lit("train"))
    return toks.join(flags, "doc_id").withColumn("split", split)


def train_quality_model(data: DataFrame, num_features: int = 1024):
    """Fit HashingTF + LogisticRegression on the train split; returns
    (hashing_tf, model). Deterministic: L-BFGS from a zero init on a
    fixed dataset has no RNG."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    tf = HashingTF(inputCol="toks", outputCol="features", numFeatures=num_features)
    feat = tf.transform(data)
    lr = LogisticRegression(
        maxIter=25, regParam=0.01, labelCol="label", featuresCol="features"
    )
    model = lr.fit(feat.where(F.col("split") == "train"))
    return tf, model


@register(
    "classifier_accuracy_cert",
    oracle="""
    SELECT CAST(count(*) FILTER (WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a') AS BIGINT) AS n_eval,
           80 AS floor_x100, TRUE AS acc_ok
    FROM documents
    """,
)
def classifier_accuracy_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver certificate for the distilled quality classifier: one
    row (n_eval, floor_x100, acc_ok) asserting held-out accuracy >=
    0.80 on the md5 eval slice (the pytest floor; majority-class rate
    is far lower). The oracle recomputes the eval-slice size exactly
    (same md5-prefix split expression) and pins the accuracy bound --
    an L-BFGS regression turning this row red is a real model
    regression, not float noise. The raw per-doc scores stay in the
    rows-only quality_classifier_scores."""
    scored = REGISTRY["quality_classifier_scores"].fn(spark, sf_dir)
    ev = scored.where(F.col("split") == "eval")
    return ev.agg(
        F.count("*").alias("n_eval"),
        F.lit(80).alias("floor_x100"),
        (
            F.avg((F.col("pred") == F.col("weak_label")).cast("double")) >= 0.80
        ).alias("acc_ok"),
    )


@register("quality_classifier_scores", oracle=None)
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distilled quality classifier scored over every document:
    doc_id, split, weak label, p_good, pred.

    Train on the ~90% md5 split, score all docs (the held-out rows are
    the accuracy evidence). Output is flat scalars only -- the
    probability vector is unpacked before the driver surface.
    """
    from pyspark.ml.functions import vector_to_array

    data = _labeled_features(spark, sf_dir)
    tf, model = train_quality_model(data)
    scored = model.transform(tf.transform(data))
    return scored.select(
        "doc_id",
        "split",
        F.col("label").cast("bigint").alias("weak_label"),
        F.round(vector_to_array("probability")[1], 4).alias("p_good"),
        F.col("prediction").cast("bigint").alias("pred"),
    )
