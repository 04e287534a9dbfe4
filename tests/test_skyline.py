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
