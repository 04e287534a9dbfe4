"""transformWithStateInPandas cumulative-stats operator
(streaming/events.cumulative_user_stats).

The real TWS execution needs the protobuf proto client; when absent
(this container) the streaming path must refuse loudly and the batch
path must carry identical semantics. When protobuf IS present, the
streamed changelog's last-row-per-user must equal the batch GROUP BY.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from conversation_analysis_tools_spark.catalog import table
from conversation_analysis_tools_spark.streaming.events import (
    cumulative_user_stats,
    read_event_stream,
    tws_available,
)

SF_DIR = "/root/testdata/sf0.001"


def test_batch_path_equals_group_by(spark):
    events = table(spark, "events", SF_DIR)
    got = {
        r["user_id"]: (r["n_events"], r["total_value"], r["first_ts"], r["last_ts"])
        for r in cumulative_user_stats(events).collect()
    }
    want = {
        r["user_id"]: (r["n"], r["tv"], r["lo"], r["hi"])
        for r in events.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0, 4
            ).alias("tv"),
            F.min("ts").alias("lo"),
            F.max("ts").alias("hi"),
        )
        .collect()
    }
    assert got == want


def test_streaming_path_gated_or_correct(spark):
    d = tempfile.mkdtemp(prefix="tws_test_")
    os.symlink(os.path.abspath(f"{SF_DIR}/events.parquet"), f"{d}/events.parquet")
    src = read_event_stream(spark, d)
    if not tws_available():
        with pytest.raises(NotImplementedError, match="protobuf"):
            cumulative_user_stats(src)
        return
    # protobuf present: run the real TWS changelog and compare the
    # final row per user against the batch path
    out = cumulative_user_stats(src)
    q = (
        out.writeStream.format("memory")
        .queryName("tws_totals_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(300)
    assert finished, "TWS availableNow drain did not finish within 300s"
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        spark.table("tws_totals_test")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in final.collect()
    }
    want = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in cumulative_user_stats(table(spark, "events", SF_DIR)).collect()
    }
    assert got == want
