"""Structured Streaming over events: tumbling / sliding / session
windows with watermarked late-data handling.

The transformations are written against a plain DataFrame so the SAME
function serves batch (oracle-checkable -- time bucketing is pure SQL)
and streaming (``readStream`` + watermark). That is the Spark model:
the logical plan is identical, the sink/trigger decide incremental
execution.

Scale posture: event streams shuffle on (window, key); watermark
bounds state; session windows use the built-in ``session_window``
(state store merges, no custom applyInPandasWithState needed for gap
sessions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def read_event_stream(
    spark: SparkSession, path_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over an events parquet directory.

    (The synthetic single-file table is read with nanos-as-long the
    same way catalog.py does for batch.)
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = (
        spark.readStream.schema(
            "event_id bigint, ts bigint, user_id bigint, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path_dir)
    )
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_counts(events: DataFrame, width: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time windows; watermark bounds late data and
    state size when the input is a stream."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "avg_value")
    )


def sliding_counts(
    events: DataFrame, width: str = "2 hours", slide: str = "1 hour", watermark: str = "3 hours"
) -> DataFrame:
    """Sliding windows: each event lands in width/slide windows."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def session_aggregate(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user: events closer than ``gap`` merge into
    one session (built-in session_window state merge)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("session_value"))
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def run_to_memory_sink(stream_df: DataFrame, name: str, timeout_sec: int = 120) -> None:
    """Execute a streaming query to completion with availableNow (all
    existing files, then stop) into an in-memory table ``name``."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
