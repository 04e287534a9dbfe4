"""Streaming near-dup admission (streaming/neardup.py): greedy
semantics, drain determinism, and replay safety."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from conversation_analysis_tools_spark.streaming.neardup import (
    _greedy_admit,
    stream_neardup_dedup,
)


def test_greedy_admit_order():
    """Greedy differs from component-min: chain 1-2, 2-3 admits 1 and
    3 (2 dropped against 1, 3 admitted because 2 was NOT admitted)."""
    assert _greedy_admit([1, 2, 3], [(1, 2), (2, 3)]) == {1, 3}
    # triangle: only the first survives
    assert _greedy_admit([1, 2, 3], [(1, 2), (1, 3), (2, 3)]) == {1}
    assert _greedy_admit([], []) == set()


def _stage(spark, docs, src, n_files):
    os.makedirs(src, exist_ok=True)
    ids = [r[0] for r in docs.select("doc_id").orderBy("doc_id").collect()]
    per = (len(ids) + n_files - 1) // n_files
    for k in range(n_files):
        chunk = ids[k * per : (k + 1) * per]
        part = f"{src}_part{k}"
        docs.where(F.col("doc_id").isin(chunk)).coalesce(1).write.parquet(part)
        f = next(x for x in os.listdir(part) if x.endswith(".parquet"))
        dst = os.path.join(src, f"{k:02d}.parquet")
        os.rename(os.path.join(part, f), dst)
        os.utime(dst, (1_000_000 + k, 1_000_000 + k))


def test_empty_source_returns_empty_admission(spark, tmp_path):
    """Zero source files -> no fold ever runs -> empty doc_id set, not
    an AnalysisException on the never-created store (ADVICE r3)."""
    src = str(tmp_path / "empty_src")
    os.makedirs(src, exist_ok=True)
    kept = stream_neardup_dedup(spark, src, str(tmp_path / "store"))
    assert kept.columns == ["doc_id"]
    assert kept.count() == 0


def test_stream_admits_first_drops_exact_dup(spark, sample_docs, tmp_path):
    """sample_docs: doc 5 is an exact copy of doc 0 -> doc 5 dropped,
    everything else admitted (the other five texts are dissimilar)."""
    src = str(tmp_path / "src")
    _stage(spark, sample_docs, src, 3)
    kept = stream_neardup_dedup(spark, src, str(tmp_path / "store"), threshold=0.5)
    ids = sorted(r[0] for r in kept.collect())
    assert ids == [0, 1, 2, 3, 4]


def test_batch_split_invariance(spark, sample_docs, tmp_path):
    """1-file and 6-file drains admit the same set: the fold dedups
    against the store built so far, so only ARRIVAL ORDER matters,
    which the staging pins to doc_id order."""
    results = []
    for n_files in (1, 6):
        src = str(tmp_path / f"src{n_files}")
        _stage(spark, sample_docs, src, n_files)
        kept = stream_neardup_dedup(
            spark, src, str(tmp_path / f"store{n_files}"), threshold=0.5
        )
        results.append(sorted(r[0] for r in kept.collect()))
    assert results[0] == results[1]


def test_replay_is_idempotent(spark, sample_docs, tmp_path):
    """Re-draining with the same checkpoint+store appends nothing:
    the batch_id marker skips replayed folds and the checkpoint
    serves no new files."""
    src = str(tmp_path / "src")
    _stage(spark, sample_docs, src, 2)
    store = str(tmp_path / "store")
    first = sorted(r[0] for r in stream_neardup_dedup(spark, src, store).collect())
    second = sorted(r[0] for r in stream_neardup_dedup(spark, src, store).collect())
    assert first == second


def test_fold_replay_overwrites_not_appends(spark, sample_docs, tmp_path):
    """A crashed-then-replayed fold (same batch_id, marker not yet
    written) must converge: per-batch store partitions overwrite."""
    from conversation_analysis_tools_spark.streaming.neardup import (
        fold_neardup_batch,
    )

    store = str(tmp_path / "store")
    batch = sample_docs.where("doc_id < 3")
    fold_neardup_batch(batch, 0, store, threshold=0.5)
    fold_neardup_batch(batch, 0, store, threshold=0.5)  # replay
    got = spark.read.parquet(f"{store}/arrs").select("doc_id").collect()
    ids = sorted(r[0] for r in got)
    assert ids == [0, 1, 2]  # no duplicates, nothing lost


def test_replica_burst_batch_admits_one_rep(spark, tmp_path):
    """A byte-identical replica BURST inside one micro-batch (the
    adversarial case for the internal batch-vs-itself join) admits
    exactly the min-id representative; a later batch of more replicas
    is then blocked by the store. The collapse that makes the burst
    candidate join representative-sized must not change greedy
    semantics: dissimilar docs and no-shingle docs pass untouched."""
    t_dup = "the quick brown fox jumps over the lazy dog again and again"
    t_other = "completely unrelated text about spark shuffle partitions here"
    burst = spark.createDataFrame(
        [(i, t_dup) for i in range(30)]
        + [(100, t_other), (101, "")],  # empty text: no shingles
        "doc_id long, text string",
    )
    later = spark.createDataFrame(
        [(200 + i, t_dup) for i in range(10)], "doc_id long, text string"
    )
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    for k, df in enumerate((burst, later)):
        part = str(tmp_path / f"part{k}")
        df.coalesce(1).write.parquet(part)
        f = next(x for x in os.listdir(part) if x.endswith(".parquet"))
        dst = os.path.join(src, f"{k:02d}.parquet")
        os.rename(os.path.join(part, f), dst)
        os.utime(dst, (1_000_000 + k, 1_000_000 + k))
    kept = stream_neardup_dedup(
        spark, src, str(tmp_path / "store"), threshold=0.5
    )
    ids = sorted(r[0] for r in kept.collect())
    assert ids == [0, 100, 101]
