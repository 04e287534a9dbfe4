"""Physical-layout tests: date-partitioned events enable partition
pruning (the 100 TB posture of catalog.write_partitioned_layout)."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from conversation_analysis_tools_spark.catalog import table
from tests.conftest import SF_DIR


def test_partitioned_events_prune(spark, tmp_path):
    out = str(tmp_path / "events_part")
    events = table(spark, "events", SF_DIR)
    events.withColumn("event_date", F.to_date("ts")).write.mode(
        "overwrite"
    ).partitionBy("event_date").parquet(out)

    part = spark.read.parquet(out)
    one_day = part.where(F.col("event_date") == "2024-01-03")

    buf = io.StringIO()
    with redirect_stdout(buf):
        one_day.explain(True)
    plan = buf.getvalue()
    # the date predicate must become a PartitionFilter, not a row filter
    assert "PartitionFilters" in plan
    assert "event_date" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]

    expected = events.where(F.to_date("ts") == "2024-01-03").count()
    assert one_day.count() == expected


def test_partitioned_roundtrip_preserves_rows(spark, tmp_path):
    out = str(tmp_path / "events_part2")
    events = table(spark, "events", SF_DIR)
    events.withColumn("event_date", F.to_date("ts")).write.mode(
        "overwrite"
    ).partitionBy("event_date").parquet(out)
    assert spark.read.parquet(out).count() == events.count()
