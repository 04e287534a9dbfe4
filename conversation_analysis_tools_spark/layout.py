"""Physical-layout utilities for the 100 TB posture (SURVEY §4 item
4): bucketed tables for shuffle-free equi-joins, and salted joins for
skewed keys.

These are physical-design decisions, not Catalyst rules: Spark picks
the join algorithm, but only the table layout can make the workhorse
join (messages ⋈ conversations on conversation_id; events ⋈ users on
user_id) arrive pre-partitioned. Bucketing both sides on the join key
with the same bucket count lets the planner drop both Exchanges; a
sortBy inside buckets additionally drops the Sort of a sort-merge
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    Bucket count is a layout contract: every table that will join on
    ``bucket_key`` must use the SAME count for the exchange-free plan.
    At 100 TB pick buckets so one bucket ~ one executor-memory-sized
    unit (e.g. 4096); here 32 matches local parallelism.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_key)
    if sort:
        w = w.sortBy(bucket_key)
    w.saveAsTable(table_name)


def bucketed_tables_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Equi-join two same-bucketed tables on their bucket key.

    With both sides bucketed on ``key`` with equal bucket counts the
    physical plan has NO Exchange on either side (verified in
    tests/test_layout.py by asserting on the explain output).
    """
    return spark.table(left_table).join(spark.table(right_table), key)


def salted_join(
    big: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: explode the (small) dim side into
    ``n_salts`` replicas and spread the big side's hot keys across
    them.

    The big side's salt is a deterministic hash of the whole row
    (xxhash64 over all columns), so rows of one hot key scatter
    uniformly over ``n_salts`` reducers instead of landing on one.
    Result is row-identical to the plain join (each big row matches
    exactly the one dim replica carrying its salt). Use when AQE's
    skew-join split isn't available (e.g. the skew is in a broadcast-
    ineligible dim) -- otherwise prefer AQE.
    """
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    dim_rep = dim.select("*", salts)
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    return big_s.join(dim_rep, [key, "_salt"], how).drop("_salt")
