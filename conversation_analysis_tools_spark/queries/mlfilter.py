"""Model-based quality filtering: a distributed classifier distilled
from heuristic weak labels (beyond-reference extension).

The modern curation stack (e.g. FineWeb-Edu, Llama-3 data work) runs a
cheap learned classifier over the whole corpus, trained to imitate an
expensive teacher (LLM ratings, curated domains). Here the teacher is
the Gopher heuristic gate (queries/textstats.py): hashed bag-of-words
features -> LogisticRegression -> per-doc quality probability. The
shape is what matters at 100 TB:

* featurize = map-only (``pmod(hash(tok), 1024)`` is a stateless hash,
  no vocabulary shuffle, fixed width regardless of corpus size),
* train = one pass over the ~90% train split per L-BFGS iteration,
  driver holds only the 1024-dim coefficient vector,
* score = map-only closed-form sigmoid over the collected
  coefficients, embedded as literals -- whole-stage codegen, zero
  shuffle, and NO ml-model UDF in the scoring plan.

Featurization is deliberately our own ``F.hash`` bucketing rather than
ml's HashingTF: (a) one definition shared bit-exactly by the training
and scoring paths, (b) HashingTF's murmur3 variant (hashUnsafeBytes2)
has no SQL builtin so a HashingTF-trained model could never be scored
JVM-side, and (c) keeping ``model.transform`` out of the returned plan
matters for session hygiene -- the transform UDF pins the model, whose
training summary pins the training Dataset and thus the SparkSession;
caching such a plan serializes that chain and dies on any
non-serializable session state (observed live: a registered
``Observation`` makes ObservationManager unserializable, failing
``scored.cache().count()`` with Task-not-serializable; pinned by
tests/test_metrics.py::test_observation_then_cached_ml_plan).

Rows-only for the driver (iterative L-BFGS floats are not
SQL-expressible); tests/test_mlfilter.py pins held-out accuracy well
above the majority-class rate and train/score determinism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from conversation_analysis_tools_spark.catalog import table as _catalog_table
from conversation_analysis_tools_spark.functions.text import raw_tokens_expr
from conversation_analysis_tools_spark.queries.registry import REGISTRY, register
from conversation_analysis_tools_spark.functions.lits import array_lit
from conversation_analysis_tools_spark.fitcache import cached_fit

#: md5-prefix eval split, same family as sampling.hash_split ('1a' ~ 10%).
_EVAL_HEX = "1a"

#: Fixed hashed-feature width. 1024 floats collect to the driver and
#: re-broadcast as plan literals regardless of corpus size.
NUM_FEATURES = 1024


def _bucket(tok: Column) -> Column:
    """Hashed-feature bucket of one token: murmur3 (SQL ``hash``,
    seed 42) mod the fixed width. The single featurization definition
    shared by training and scoring."""
    return F.pmod(F.hash(tok), F.lit(NUM_FEATURES))


def _labeled_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id, toks, label, split -- the training frame.

    Teacher label = Gopher-rule COUNT >= corpus median (the
    FineWeb-Edu shape: a continuous teacher score thresholded into a
    binary label), not the raw all-rules gate. The gate conjunction is
    brittle as a training signal: one corpus-wide-false rule (e.g. a
    corpus with no English stop words, like the synthetic testdata)
    makes every label identical and L-BFGS degenerates to the base
    rate. The rule-count over ALL SIX rules stays ~balanced whenever
    any rule has variance, on any corpus. The median is one
    driver-side scalar (exact percentile over the bounded, persisted
    score frame -- the regex-heavy Gopher metrics run once, not once
    per consumer).
    """
    from conversation_analysis_tools_spark.operators.cache import track
    from conversation_analysis_tools_spark.queries.textstats import gopher_metrics

    docs = _catalog_table(spark, "documents", sf_dir)
    g = gopher_metrics(docs)
    score = (
        F.col("n_words").between(50, 100000).cast("int")
        + F.col("mean_word_len").between(3, 10).cast("int")
        + (F.col("alpha_frac") >= 0.8).cast("int")
        + (F.col("n_stops") >= 2).cast("int")
        + (F.col("bullet_frac") <= 0.9).cast("int")
        + (F.col("ellipsis_frac") <= 0.3).cast("int")
    )
    scores = track(g.select("doc_id", score.alias("score")))
    med = scores.agg(F.expr("percentile(score, 0.5)")).first()[0]
    flags = scores.select(
        "doc_id", (F.col("score") >= F.lit(med)).cast("double").alias("label")
    )
    toks = docs.select("doc_id", raw_tokens_expr("text").alias("toks"))
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
        < _EVAL_HEX,
        F.lit("eval"),
    ).otherwise(F.lit("train"))
    return toks.join(flags, "doc_id").withColumn("split", split)


def _dense_features(data: DataFrame) -> DataFrame:
    """Attach a NUM_FEATURES-dim dense count vector per doc (training
    only -- the scoring path never materializes vectors).

    Linear: explode -> (doc,bucket) count -> per-doc bucket map ->
    dense array via a sequence/map-lookup transform. Two bounded
    shuffles on the train split, not the corpus hot path.
    """
    from pyspark.ml.functions import array_to_vector

    ex = data.select("doc_id", F.explode("toks").alias("tok"))
    bc = ex.groupBy("doc_id", _bucket(F.col("tok")).alias("bucket")).agg(
        F.count("*").cast("double").alias("cnt")
    )
    bmap = bc.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "cnt"))).alias("bmap")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(NUM_FEATURES - 1)),
        lambda i: F.coalesce(F.element_at(F.col("bmap"), i), F.lit(0.0)),
    )
    return (
        data.join(bmap, "doc_id", "left")  # keep token-less docs (zero vector)
        .withColumn("features", array_to_vector(dense))
        .drop("bmap")
    )


def train_quality_model(data: DataFrame):
    """Fit LogisticRegression on the train split over the hashed
    bucket counts; returns (coefficients list[float], intercept).
    Deterministic: L-BFGS from a zero init on a fixed dataset has no
    RNG. Only the 1024+1 floats leave the JVM -- the model object (and
    its summary, which pins the training Dataset) never escapes."""
    from pyspark.ml.classification import LogisticRegression

    feat = _dense_features(data)
    lr = LogisticRegression(
        maxIter=25, regParam=0.01, labelCol="label", featuresCol="features"
    )
    model = lr.fit(feat.where(F.col("split") == "train"))
    return [float(w) for w in model.coefficients], float(model.intercept)


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


#: Fixed 12-doc training corpus for the strict driver certificate:
#: two perfectly separated token families ("quality-marker" prose vs
#: junk/spam markers), labels assigned directly -- the cert pins the
#: TRAIN+SCORE machinery (hashed featurization, distributed L-BFGS,
#: closed-form literal-coefficient scoring), not the Gopher teacher.
_FIXED_DOCS: list[tuple[int, str, float]] = [
    (0, "clear structured prose with coherent informative sentences", 1.0),
    (1, "informative coherent writing with clear structured paragraphs", 1.0),
    (2, "well researched informative structured coherent analysis prose", 1.0),
    (3, "coherent clear analysis with structured informative detail", 1.0),
    (4, "structured prose detail coherent informative writing analysis", 1.0),
    (5, "clear informative detail structured writing researched prose", 1.0),
    (6, "spam spam click here buy now cheap deals", 0.0),
    (7, "buy cheap deals now click spam here offer", 0.0),
    (8, "click buy offer cheap spam deals now now", 0.0),
    (9, "cheap offer spam buy click now deals here", 0.0),
    (10, "deals now cheap click offer buy spam spam", 0.0),
    (11, "offer here now buy deals spam cheap click", 0.0),
]

#: Pinned scores: computed by the operator below, verified identical
#: at local[8] and local[32] (1e-16 intercept noise, 5e-6+ clearance
#: from every 1e-4 rounding boundary). A drift here is a real change
#: in featurization, optimization, or the closed-form scoring path.
_FIXED_EXPECTED: list[tuple[int, int, int]] = [
    (0, 9954, 1), (1, 9952, 1), (2, 9950, 1), (3, 9955, 1),
    (4, 9955, 1), (5, 9950, 1), (6, 54, 0), (7, 45, 0),
    (8, 46, 0), (9, 45, 0), (10, 50, 0), (11, 45, 0),
]


@register(
    "quality_classifier_fixed",
    oracle="SELECT * FROM (VALUES "
    + ", ".join(f"({i}, {p}, {c})" for i, p, c in _FIXED_EXPECTED)
    + ") AS t(doc_id, p_good_x1e4, pred)",
)
def quality_classifier_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict driver certificate for the distilled-classifier path:
    the REAL distributed pipeline (hashed featurization ->
    LogisticRegression -> literal-coefficient closed-form sigmoid) on
    the fixed corpus, scores pinned as 1e-4-scaled ints (the
    pagerank_fixed / kmeans_fixed playbook). Float-order determinism:
    the 12-row feature frame is ``coalesce(1)``'d, so the L-BFGS
    gradient folds sequentially in row order at any cluster
    parallelism; features themselves are exact integer counts.
    sf_dir unused (fixed corpus). Complements
    classifier_accuracy_cert (testdata-grain accuracy bound) and the
    rows-only quality_classifier_scores (testdata-grain raw scores).
    """
    data = spark.createDataFrame(_FIXED_DOCS, "doc_id long, text string, label double")
    toks = data.select("doc_id", raw_tokens_expr("text").alias("toks"), "label")
    feat = _dense_features(toks.withColumn("split", F.lit("train"))).coalesce(1)
    from pyspark.ml.classification import LogisticRegression

    lr = LogisticRegression(
        maxIter=25, regParam=0.01, labelCol="label", featuresCol="features"
    )
    model = lr.fit(feat)
    weights = array_lit([float(w) for w in model.coefficients])
    margin = F.aggregate(
        F.transform("toks", _bucket),
        F.lit(float(model.intercept)),
        lambda acc, b: acc + F.element_at(weights, b + F.lit(1)),
    )
    p_good = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return toks.select(
        "doc_id",
        F.round(p_good * 10000).cast("bigint").alias("p_good_x1e4"),
        (p_good > 0.5).cast("bigint").alias("pred"),
    )


@register("quality_classifier_scores", oracle=None)
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distilled quality classifier scored over every document:
    doc_id, split, weak label, p_good, pred.

    Train on the ~90% md5 split, score all docs (the held-out rows are
    the accuracy evidence). Scoring is closed-form: the 1024 L-BFGS
    coefficients become an array literal and the margin is a map-only
    ``F.aggregate`` over the token buckets -- no shuffle, no UDF, no
    model object in the plan.
    """
    data = _labeled_features(spark, sf_dir)
    coef, intercept = cached_fit(
        "quality_lr", (NUM_FEATURES,), sf_dir, lambda: train_quality_model(data)
    )

    weights = array_lit([float(w) for w in coef])
    margin = F.aggregate(
        F.transform("toks", _bucket),
        F.lit(intercept),
        lambda acc, b: acc + F.element_at(weights, b + F.lit(1)),
    )
    p_good = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return data.select(
        "doc_id",
        "split",
        F.col("label").cast("bigint").alias("weak_label"),
        F.round(p_good, 4).alias("p_good"),
        (p_good > 0.5).cast("bigint").alias("pred"),
    )
