"""Bloom prefilter (operators/bloom.py): no false negatives ever, a
real rejection rate on disjoint probes, and the decontamination query
is bit-identical to its no-Bloom exact plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from conversation_analysis_tools_spark.operators.bloom import (
    bloom_prefilter,
    build_bloom,
    might_contain,
)
from conversation_analysis_tools_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _strs(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], ["s"])


def test_no_false_negatives(spark):
    vals = [f"member-{i}" for i in range(2000)]
    build = _strs(spark, vals)
    kept = bloom_prefilter(_strs(spark, vals), build, "s", "s")
    assert kept.count() == len(vals)  # every present element survives


def test_rejects_most_absent(spark):
    build = _strs(spark, [f"member-{i}" for i in range(2000)])
    absent = _strs(spark, [f"absent-{i}" for i in range(2000)])
    fp = bloom_prefilter(absent, build, "s", "s").count()
    # 2^18 bits / 2k elements / k=5 => FP ~1e-5; 5% is a loose ceiling
    assert fp <= 100, fp


def test_small_filter_geometry_still_exact_after_verify(spark):
    # Tiny m forces real false positives; the verify join must remove
    # exactly those, which is the property the query's oracle relies on
    members = [f"m-{i}" for i in range(500)]
    build = _strs(spark, members)
    probe = _strs(spark, members + [f"a-{i}" for i in range(500)])
    cand = bloom_prefilter(probe, build, "s", "s", m_bits=1024, k=3)
    n_cand = cand.count()
    assert n_cand >= 500  # no false negative even at saturating load
    verified = cand.join(build.distinct(), "s", "left_semi")
    assert verified.count() == 500


def test_bits_are_plan_data_not_udf(spark):
    bloom = build_bloom(_strs(spark, ["x"]), "s")
    probed = (
        _strs(spark, ["x", "y"])
        .crossJoin(F.broadcast(bloom))
        .select("s", might_contain(F.col("bits"), F.col("s")).alias("hit"))
    )
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan
    got = {r["s"]: r["hit"] for r in probed.collect()}
    assert got["x"] is True


def test_decontamination_bloom_equals_exact_plan(spark):
    from conversation_analysis_tools_spark.operators import dedup as D
    from conversation_analysis_tools_spark.catalog import table

    got = {
        (r["train_id"], r["shared_shingles"])
        for r in REGISTRY["decontamination_bloom"].fn(spark, SF_DIR).collect()
    }
    sh = D.shingles(table(spark, "documents", SF_DIR))
    ev = sh.where(F.col("doc_id") % 10 == 0).select("shingle").distinct()
    want = {
        (r["train_id"], r["n"])
        for r in (
            sh.where(F.col("doc_id") % 10 != 0)
            .join(ev, "shingle", "left_semi")
            .groupBy(F.col("doc_id").alias("train_id"))
            .agg(F.count("*").alias("n"))
            .where(F.col("n") >= 3)
        ).collect()
    }
    assert got == want
