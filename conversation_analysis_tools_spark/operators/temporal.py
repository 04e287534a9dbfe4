"""Temporal join operators Spark lacks natively: as-of join and
bounded range (interval) join -- implemented as compositions of
built-in ops with scale-safe plans (SURVEY §2.3 notes the reference
has neither; its sequential-pair J3 is the degenerate case).

As-of join (each left row matched to the latest right row at or
before it, per key): the union-tag trick -- union both sides ordered
by (key, time), propagate the last right value with a window
``last(ignorenulls)``; ONE shuffle on the key, no join at all, no
per-row subqueries. This is how kdb/QuestDB/Flink implement it
logically; at 100 TB the shuffle is on the natural key so it
co-locates with the rest of the per-key pipeline.

Range join (pairs within a time distance): naive is a conditional
join that Spark plans as O(n^2) BroadcastNestedLoop. The scale plan
buckets time into width-`delta` buckets, joins on (key, bucket) for
the 3 adjacent buckets, then applies the exact band predicate --
candidates are bounded by bucket occupancy, never n^2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right_time <= left_time`` within the same ``on`` key (nulls when
    no prior right row exists).
    """
    l_tag = left.withColumn("_t", F.col(left_time)).withColumn("_is_left", F.lit(1))
    r_tag = right.select(
        F.col(on),
        F.col(right_time).alias("_t"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    ).withColumn("_is_left", F.lit(0))
    # deterministic final tiebreak: duplicate right timestamps within a
    # key would otherwise make last(ignorenulls) pick whichever
    # duplicate happened to sort last physically -- order by the
    # right row's own columns so every run/partitioning agrees
    r_tiebreak = F.xxhash64(*[F.col(f"_r_{c}") for c in right_cols])
    l_tag = l_tag.withColumn("_tb", F.lit(0).cast("long"))
    r_tag = r_tag.withColumn("_tb", r_tiebreak)

    merged = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows sort before left rows at equal time => "at or before"
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_t"), F.col("_is_left"), F.col("_tb"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in right_cols:
        merged = merged.withColumn(
            f"asof_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w)
        )
    return (
        merged.where(F.col("_is_left") == 1)
        .drop("_t", "_is_left", "_tb", *[f"_r_{c}" for c in right_cols])
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    delta_seconds: float,
) -> DataFrame:
    """All (left, right) pairs within the same key whose times differ
    by at most ``delta_seconds``. Bucketed-candidate plan: equi-join on
    (key, time bucket) over the 3 adjacent width-delta buckets, exact
    band filter after."""
    delta_us = int(delta_seconds * 1_000_000)
    lb = left.withColumn("_lt", F.unix_micros(F.col(left_time)))
    rb = right.withColumn("_rt", F.unix_micros(F.col(right_time))).withColumn(
        "_rbucket", (F.col("_rt") / delta_us).cast("long")
    )
    lb = lb.withColumn(
        "_bucket",
        F.explode(
            F.array(
                (F.col("_lt") / delta_us).cast("long") - 1,
                (F.col("_lt") / delta_us).cast("long"),
                (F.col("_lt") / delta_us).cast("long") + 1,
            )
        ),
    )
    rb = rb.withColumnRenamed(on, "_ron")
    joined = lb.join(
        rb, (lb[on] == F.col("_ron")) & (F.col("_bucket") == F.col("_rbucket"))
    )
    return joined.where(
        F.abs(F.col("_lt") - F.col("_rt")) <= F.lit(delta_us)
    ).drop("_lt", "_rt", "_bucket", "_rbucket", "_ron")
