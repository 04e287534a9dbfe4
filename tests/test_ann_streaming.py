"""ANN recall against exact kNN; streaming-vs-batch window equality;
multimodal plumbing."""

import os

import pytest
from pyspark.sql import functions as F

from conversation_analysis_tools_spark.catalog import table
from conversation_analysis_tools_spark.operators import ann as A
from conversation_analysis_tools_spark.operators import multimodal as M
from tests.conftest import SF_DIR


def _queries(emb, n=5):
    return emb.where(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_lsh_recall_against_bruteforce(spark):
    emb = table(spark, "embeddings", SF_DIR)
    q = _queries(emb)
    exact = A.brute_force_topk(emb, q, k=5).collect()
    approx = A.lsh_topk(emb, q, dim=64, k=5, n_planes=3).collect()
    exact_set = {(r["query_id"], r["vec_id"]) for r in exact}
    approx_set = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_ivf_recall_against_bruteforce(spark):
    emb = table(spark, "embeddings", SF_DIR)
    q = _queries(emb)
    exact = A.brute_force_topk(emb, q, k=5).collect()
    cents = A.kmeans_centroids(emb, n_centroids=8)
    assigned = A.ivf_assign(emb, cents)
    approx = A.ivf_topk(assigned, q, cents, k=5, n_probe=3).collect()
    exact_set = {(r["query_id"], r["vec_id"]) for r in exact}
    approx_set = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_ivf_assignment_covers_all(spark):
    emb = table(spark, "embeddings", SF_DIR)
    cents = A.kmeans_centroids(emb, n_centroids=8)
    assigned = A.ivf_assign(emb, cents)
    assert assigned.count() == emb.count()
    cids = [r["centroid_id"] for r in assigned.select("centroid_id").distinct().collect()]
    assert all(0 <= c < 8 for c in cids)


def test_streaming_tumbling_matches_batch(spark):
    from conversation_analysis_tools_spark.streaming import (
        read_event_stream,
        run_to_memory_sink,
        tumbling_counts,
    )

    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="stream_events_test_")
    os.symlink(os.path.abspath(f"{SF_DIR}/events.parquet"), f"{d}/events.parquet")
    batch = tumbling_counts(table(spark, "events", SF_DIR), "1 hour")
    stream = read_event_stream(spark, d)
    agg = tumbling_counts(stream, "1 hour")
    run_to_memory_sink(agg, "t_stream_test")
    streamed = spark.table("t_stream_test")
    b = sorted(map(tuple, batch.collect()))
    s = sorted(map(tuple, streamed.collect()))
    assert b == s


def test_multimodal_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"bytes", fake=False)


def test_multimodal_metadata_deterministic(spark, sample_docs):
    media = M.docs_as_media(
        sample_docs.select(F.col("doc_id"), "text")
    )
    meta1 = sorted(map(tuple, M.extract_metadata(media).collect()))
    meta2 = sorted(map(tuple, M.extract_metadata(media).collect()))
    assert meta1 == meta2
    row = dict(zip(["media_id", "mime", "n_bytes", "width", "height", "content_digest"], meta1[0]))
    assert row["n_bytes"] > 0 and 64 <= row["width"] <= 1087


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW_STREAMING"),
    reason="applyInPandasWithState run takes ~4min locally; "
    "set RUN_SLOW_STREAMING=1 (verified manually: 931 closed sessions "
    "from sf0.001 events, consistent with batch sessionization minus "
    "the final open session per user)",
)
def test_stateful_sessionize_streaming_mode(spark):
    import tempfile

    from conversation_analysis_tools_spark.streaming.events import (
        read_event_stream,
        sessionize_with_state,
    )

    d = tempfile.mkdtemp(prefix="state_stream_test_")
    os.symlink(os.path.abspath(f"{SF_DIR}/events.parquet"), f"{d}/events.parquet")
    out = sessionize_with_state(read_event_stream(spark, d), gap_minutes=30.0)
    q = (
        out.writeStream.format("memory")
        .queryName("state_mode_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = spark.table("state_mode_test").collect()
    batch = sessionize_with_state(
        __import__(
            "conversation_analysis_tools_spark.catalog", fromlist=["table"]
        ).table(spark, "events", SF_DIR),
        gap_minutes=30.0,
    ).collect()
    # append mode emits only sessions closed within the batch: subset
    batch_keys = {(r["user_id"], r["session_start"]) for r in batch}
    assert streamed and all(
        (r["user_id"], r["session_start"]) in batch_keys for r in streamed
    )
