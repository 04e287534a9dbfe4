"""Train-once artifact cache: hit on identical corpus, miss when any
file changes (fitcache.py)."""

from __future__ import annotations

import os

from conversation_analysis_tools_spark.fitcache import cached_fit


def test_hit_miss_semantics(tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    f = d / "part-0.parquet"
    f.write_bytes(b"abc")
    calls = []

    def fit():
        calls.append(1)
        return len(calls)

    assert cached_fit("op", (1,), str(d), fit) == 1
    assert cached_fit("op", (1,), str(d), fit) == 1  # hit
    assert cached_fit("op", (2,), str(d), fit) == 2  # params miss
    assert cached_fit("other", (1,), str(d), fit) == 3  # op miss
    f.write_bytes(b"abcd")  # content change -> size differs
    assert cached_fit("op", (1,), str(d), fit) == 4
    os.utime(f, ns=(1, 1))  # mtime change alone also misses
    assert cached_fit("op", (1,), str(d), fit) == 5
    assert cached_fit("op", (1,), str(d), fit) == 5
