"""Skyline operator anchors: dominance semantics (ties survive,
transitivity via kept-set pruning), multi-partition equivalence."""

from conversation_analysis_tools_spark.operators.skyline import skyline


def test_skyline_known_frontier_with_ties(spark):
    rows = [
        (1, 1.0, 9),   # frontier (best price)
        (2, 3.0, 3),   # frontier
        (3, 9.0, 1),   # frontier (best size)
        (4, 3.0, 3),   # exact tie of 2: neither dominates -> both kept
        (5, 4.0, 3),   # dominated by 2/4 (worse price, equal size)
        (6, 9.0, 9),   # dominated by everything on the frontier
        (7, 1.0, 10),  # dominated by 1 (equal price, worse size)
    ]
    df = spark.createDataFrame(rows, "id long, price double, size int")
    got = sorted(r["id"] for r in skyline(df, ["price", "size"]).collect())
    assert got == [1, 2, 3, 4]


def test_skyline_partition_invariant(spark):
    # the two-phase plan must equal the single-partition answer at any
    # input partitioning (local-phase survivors are a superset)
    rows = [(i, float((i * 37) % 101), (i * 53) % 97) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, x double, y int")
    one = sorted(r["id"] for r in skyline(df.coalesce(1), ["x", "y"]).collect())
    many = sorted(r["id"] for r in skyline(df.repartition(16), ["x", "y"]).collect())
    assert one == many and one


def test_skyline_maximize_via_negation(spark):
    from pyspark.sql import functions as F

    rows = [(1, 10.0), (2, 5.0), (3, 10.0)]
    df = spark.createDataFrame(rows, "id long, score double").withColumn(
        "neg", -F.col("score")
    )
    got = sorted(r["id"] for r in skyline(df, ["neg"]).collect())
    assert got == [1, 3]  # both maxima survive as ties


def test_skyline_final_phase_exact_across_arrow_batches(spark):
    """The final single-task phase must filter across Arrow batch
    boundaries: with maxRecordsPerBatch=200 and the only dominator
    arriving in the LAST batch, a per-batch filter would leak every
    earlier batch's rows into the output."""
    n = 3000
    rows = [(i, float(n - i), float(n - i)) for i in range(n - 1)]
    rows.append((n - 1, 0.0, 0.0))  # dominates everything, arrives last
    df = spark.createDataFrame(rows, "id long, x double, y double").coalesce(1)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "200")
    try:
        got = sorted(r["id"] for r in skyline(df, ["x", "y"]).collect())
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == [n - 1]


def test_skyline_anticorrelated_fallback_all_frontier(spark):
    """Anti-correlated corpus (~every row Pareto-optimal) over the
    global cap: the quantile-grid fallback must return the full
    frontier, and its stripe assignment must be balanced so no task
    sees ~n rows (the single-global-task plan it replaces)."""
    from pyspark.sql import functions as F

    n, stripes = 4000, 8
    rows = [(i, float(i), float(n - i)) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, x double, y double").repartition(8)
    got = sorted(
        r["id"]
        for r in skyline(df, ["x", "y"], global_cap=100, stripes=stripes).collect()
    )
    assert got == list(range(n))
    # balance pin: the same quantile striping the operator applies
    # puts at most ~2n/R rows in any stripe on this corpus
    bounds = sorted(set(df.approxQuantile("x", [i / stripes for i in range(1, stripes)], 0.001)))
    stripe = sum((F.col("x") > F.lit(b)).cast("int") for b in bounds)
    hist = [r["count"] for r in df.withColumn("_s", stripe).groupBy("_s").count().collect()]
    assert len(hist) >= stripes // 2 and max(hist) <= 2 * n / stripes


def test_skyline_fallback_matches_bruteforce_with_duplicates(spark):
    """Grid fallback vs quadratic brute force on a mixed corpus with
    planted exact-duplicate rows (multiplicity must be preserved:
    exceptAll, not a distinct-based rebuild)."""
    import numpy as np

    n = 1200
    rows = [
        (i, float((i * 37) % 211), float((i * 53) % 197), (i * 7) % 5)
        for i in range(n)
    ]
    rows += [(n + k, rows[k][1], rows[k][2], rows[k][3]) for k in range(40)]
    rows += [(n + 100, None, 0.0, 0), (n + 101, None, 500.0, 1)]  # null dim
    df = spark.createDataFrame(rows, "id long, x double, y double, tag int")
    got = sorted(
        r["id"]
        for r in skyline(
            df.repartition(6), ["x", "y"], global_cap=10, stripes=6
        ).collect()
    )
    a = np.array(
        [[np.nan if r[1] is None else r[1], r[2]] for r in rows], dtype="float64"
    )
    dominated = [
        bool(
            (
                ((a <= a[i]).all(axis=1)) & ((a < a[i]).any(axis=1))
            ).any()
        )
        for i in range(len(rows))
    ]
    want = sorted(rows[i][0] for i in range(len(rows)) if not dominated[i])
    assert got == want


def test_skyline_null_dimension_rows_survive(spark):
    """A null skyline dimension compares as NaN: the row neither
    dominates nor is dominated, so it always survives."""
    rows = [(1, 1.0, 1.0), (2, None, 0.0), (3, 2.0, 2.0)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = sorted(r["id"] for r in skyline(df, ["x", "y"]).collect())
    assert got == [1, 2]


def test_skyline_three_dimensions_known_frontier(spark):
    # 3-D: (1,1,9) survives because nothing dominates it in ALL dims;
    # (2,2,9) is dominated by (1,1,9); duplicates of a frontier point
    # both survive (ties); a point minimal in one dim alone survives
    from conversation_analysis_tools_spark.operators.skyline import skyline

    rows = [
        (1, 1.0, 1.0, 9.0),
        (2, 2.0, 2.0, 9.0),   # dominated by id 1
        (3, 9.0, 9.0, 0.0),   # unique min in z
        (4, 1.0, 1.0, 9.0),   # tie of id 1: survives
        (5, 0.0, 9.0, 9.0),   # unique min in x
        (6, 1.0, 1.0, 10.0),  # dominated by id 1 (z strictly worse)
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double, z double")
    got = sorted(r["id"] for r in skyline(df, ["x", "y", "z"]).collect())
    assert got == [1, 3, 4, 5]


def test_fallback_stripes_scale_with_survivors(spark):
    # per-task input must stay bounded near global_cap/2 however big
    # the pathological frontier gets: a tiny cap on an anti-correlated
    # corpus must yield many small stripes, and the result must still
    # be the full frontier
    from pyspark.sql import functions as F

    from conversation_analysis_tools_spark.operators.skyline import skyline

    n = 4000
    df = spark.createDataFrame(
        [(float(i), float(n - i)) for i in range(n)], "x double, y double"
    )
    out = skyline(df, ["x", "y"], global_cap=200, stripes=4)
    assert out.count() == n  # every row Pareto-optimal, none dropped
