"""One-parse literal arrays must be value- and type-identical to the
per-element ``F.lit`` construction (functions/lits.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from conversation_analysis_tools_spark.functions.lits import array_lit, matrix_lit


def test_array_lit_parity(spark):
    cases = [
        [1.5, -2.0, 0.0, 1e-20, 3.14159, float(np.float64(7.25))],
        [1, -5, 0, 2**40],
        ["cat", "it's", 'a "b"', "back\\slash", "", "naïve"],
    ]
    df = spark.range(1)
    for vals in cases:
        fast, slow = array_lit(vals), F.array(*[F.lit(v) for v in vals])
        row = df.select(fast.alias("a"), slow.alias("b")).head()
        assert row["a"] == row["b"], vals
        sch = df.select(fast.alias("a"), slow.alias("b")).schema
        assert sch["a"].dataType == sch["b"].dataType, vals


def test_array_lit_fallback_non_finite(spark):
    vals = [1.0, float("nan"), float("inf")]
    row = spark.range(1).select(array_lit(vals).alias("a")).head()
    assert row["a"][0] == 1.0 and np.isnan(row["a"][1]) and np.isinf(row["a"][2])


def test_matrix_lit_parity(spark):
    mat = np.random.RandomState(3).standard_normal((5, 7))
    fast = matrix_lit(mat)
    slow = F.array(*[F.array(*[F.lit(float(x)) for x in r]) for r in mat])
    row = spark.range(1).select(fast.alias("a"), slow.alias("b")).head()
    assert row["a"] == row["b"]
    # constant-index element_at folds to the same plain literal row
    got = spark.range(1).select(F.element_at(fast, 3).alias("r")).head()["r"]
    assert got == [float(x) for x in mat[2]]
