"""functions/numeric.py parity: the integer half-up rounding must be
bit-identical between Spark, DuckDB (via avg4_sql), and a pure-Python
reference -- INCLUDING sums that land exactly on .00005 boundaries,
the case plain round() gets wrong across engines."""

from __future__ import annotations

import duckdb
import pytest

from conversation_analysis_tools_spark.functions.numeric import avg4, avg4_sql


def _py_ref(s: int, d: int) -> float:
    """Nearest integer to s/d, halves toward +inf, then /10000."""
    q, r = divmod(2 * s + d, 2 * d)  # floor division (d > 0)
    return q / 10000.0


#: (scaled_sum, scaled_count) cases: exact halves both signs, exact
#: integers, non-terminating ratios, zero, single row.
CASES = [
    (1, 2),         # s/d = 0.5 -> rounds up to 1
    (-1, 2),        # -0.5 -> rounds toward +inf to 0
    (955755, 2),    # .5 boundary at scale, positive
    (-955755, 2),   # .5 boundary, negative
    (477875, 100),  # the observed pair_join case shape
    (-477875, 100),
    (10, 3),        # non-terminating ratio
    (-10, 3),
    (0, 7),
    (123456789, 1),
    (7, 7),
]


def test_avg4_matches_python_and_duckdb(spark):
    rows = [(i, s, d) for i, (s, d) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "i int, s long, d long")
    from pyspark.sql import functions as F

    got = {
        r["i"]: r["v"]
        for r in df.select("i", avg4(F.col("s"), F.col("d")).alias("v")).collect()
    }
    sql_expr = avg4_sql("s", "d")
    duck = {
        i: v
        for i, v in duckdb.sql(
            "SELECT i, " + sql_expr + " AS v FROM (VALUES "
            + ", ".join(f"({i}, {s}::BIGINT, {d}::BIGINT)" for i, s, d in rows)
            + ") AS t(i, s, d)"
        ).fetchall()
    }
    for i, (s, d) in enumerate(CASES):
        want = _py_ref(s, d)
        assert got[i] == want, (s, d, got[i], want)
        assert duck[i] == want, (s, d, duck[i], want)


def test_half_boundary_direction():
    # halves go toward +inf on BOTH signs (the documented semantic)
    assert _py_ref(1, 2) == 0.0001
    assert _py_ref(-1, 2) == 0.0
