"""Shared fixtures: one session-scoped SparkSession and tiny literal
corpora mirroring the reference's fixtures (tests/conftest.py:9-39 in
the reference; see FIXTURES.md §A)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conversation_analysis_tools_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="cats-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sample_docs(spark):
    """Six short texts; index 5 is an exact duplicate of index 0
    (mirrors reference tests/conftest.py:9-19)."""
    texts = [
        "Machine learning is a subset of artificial intelligence.",
        "Deep learning uses neural networks with many layers.",
        "Natural language processing analyzes human language.",
        "Transformers revolutionized natural language processing tasks.",
        "The weather is nice today.",
        "Machine learning is a subset of artificial intelligence.",
    ]
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
