"""Table catalog: load the synthetic star-schema parquet tables and
register them as temp views.

Tables (see TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings -- one parquet file per table
under an ``sf_dir``.

Scale notes (100 TB posture):
* Reads are plain ``spark.read.parquet`` so Catalyst keeps predicate
  pushdown + column pruning; never ``.cache()`` the raw fact tables.
* ``dim_tables`` lists the small dimensions that should be broadcast
  on join (region/nation/supplier are tiny at every scale factor;
  customer/part grow with sf but stay << lineitem/orders).
* On a real deployment the fact tables would be written partitioned
  (events by ``date(ts)``, lineitem by ``l_shipdate`` month) and
  bucketed by their join key (orders/lineitem by orderkey) -- see
  ``write_partitioned_layout`` which produces that layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any scale factor.
DIM_TABLES = ("region", "nation", "supplier")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    """Read the events table, normalizing ``ts`` to TIMESTAMP_LTZ.

    The synthetic ``events.ts`` physical type has varied across data
    generations: INT64 TIMESTAMP(NANOS,false) (vanilla Spark rejects
    it -- read nanos as long and rebuild micros, the same truncation
    DuckDB applies narrowing ns -> us) or TIMESTAMP(MICROS,
    isAdjustedToUTC=false) (Spark reads TIMESTAMP_NTZ, which
    ``unix_micros``/watermarks refuse). The session timezone is pinned
    to UTC, so the NTZ -> LTZ cast is wall-clock-identity and matches
    DuckDB's naive-timestamp oracle reads either way.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every table of the star schema as a DataFrame."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # oracle tz parity
    out = {}
    for name in TABLES:
        path = f"{sf_dir}/{name}.parquet"
        out[name] = _read_events(spark, path) if name == "events" else spark.read.parquet(path)
    return out


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view (for ``spark.sql``)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load a single table.

    Pins the session timezone to UTC on every load: the driver's
    SparkSession (not built by our factory) must bucket timestamps
    identically to the DuckDB oracle. Same chokepoint pins the
    InferFiltersFromGenerate exclusion (see session.py for why) so
    driver-owned sessions get the plan fix too; both sets are
    idempotent constants, not toggled state.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    _infer = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    current = spark.conf.get("spark.sql.optimizer.excludedRules", None) or ""
    if _infer not in current:  # append, never clobber a session's own list
        spark.conf.set(
            "spark.sql.optimizer.excludedRules",
            f"{current},{_infer}" if current else _infer,
        )
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    return _read_events(spark, path) if name == "events" else spark.read.parquet(path)


def staging_dir(kind: str, sf_dir: str) -> str:
    """Deterministic per-(kind, sf_dir) scratch directory.

    Queries that materialize a derived physical layout (partitioned
    copy, streaming source staging) must NOT mkdtemp() per invocation
    -- repeated bench/verify loops would accumulate unbounded temp
    disk. A deterministic path + overwrite semantics bounds usage to
    one copy per layout kind. Rooted on the same RAM-backed scratch
    the session uses for shuffle files when available (staged layouts
    at test SF are MBs; /tmp on the harness box is iowait-bound)."""
    import hashlib

    from conversation_analysis_tools_spark.session import _local_scratch

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    root = _local_scratch() or "/tmp"
    d = os.path.join(root, "cats_staging", f"{kind}_{key}")
    os.makedirs(d, exist_ok=True)
    return d


def write_partitioned_layout(
    spark: SparkSession, sf_dir: str, out_dir: str, buckets: int = 64
) -> None:
    """Produce the physical layout we would use at 100 TB.

    * ``events`` partitioned by event date -> partition pruning for
      every time-ranged query.
    * ``lineitem``/``orders`` bucketed by orderkey -> the workhorse
      equi-join (SURVEY J1) becomes shuffle-free.
    * dimensions written plain (broadcast side).
    """
    from pyspark.sql import functions as F

    dfs = load_tables(spark, sf_dir)
    dfs["events"].withColumn("event_date", F.to_date("ts")).write.mode(
        "overwrite"
    ).partitionBy("event_date").parquet(f"{out_dir}/events")
    for name in ("orders", "lineitem"):
        key = "o_orderkey" if name == "orders" else "l_orderkey"
        (
            dfs[name]
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(buckets, key)
            .sortBy(key)
            .option("path", f"{out_dir}/{name}")
            .saveAsTable(f"bucketed_{name}")
        )
    for name in ("region", "nation", "customer", "supplier", "part", "documents", "embeddings"):
        dfs[name].write.mode("overwrite").parquet(f"{out_dir}/{name}")
