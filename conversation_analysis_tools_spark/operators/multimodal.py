"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas
iterators (``mapInPandas``).

The decode/resize/frame-sample *codecs* are STUBBED (no image/audio
libraries in this container): ``decode_image`` raises
NotImplementedError unless ``fake=True``, in which case a
deterministic fake (metadata derived from the md5 of the bytes)
stands in. Everything around the codec -- schema, batch iteration,
partitioning, UDF signature -- is real and tested; swapping in PIL /
torchaudio later changes only the inner function.

Scale notes: binary payloads dominate row size; ``mapInPandas``
streams Arrow batches so peak memory is one batch per task
(arrow.maxRecordsPerBatch caps it); never collect_list binaries; at
100 TB the media table is partitioned by content shard and the
feature extraction is a map-only stage (no shuffle).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
    ]
)

META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("content_digest", StringType()),
    ]
)


def decode_image(content: bytes, fake: bool = False) -> tuple[int, int]:
    """Decode image dimensions. STUB: real decoding needs an imaging
    library not present in this container."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library (e.g. PIL); "
            "pass fake=True for the deterministic test double"
        )
    digest = hashlib.md5(content).digest()
    # deterministic pseudo-dimensions in [64, 1087]
    return 64 + digest[0] * 4, 64 + digest[1] * 4


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into a media-shaped table (binary
    payload = utf-8 bytes) so the plumbing is exercised end-to-end."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("content"),
        F.lit("text/plain").alias("mime"),
    )


def extract_metadata(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction: per-batch pandas, one output row
    per media row. The only Python stage in the plan; Arrow both ways."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [decode_image(c, fake=fake) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(c) for c in pdf["content"]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "content_digest": [
                        hashlib.md5(c).hexdigest() for c in pdf["content"]
                    ],
                }
            )

    return media.mapInPandas(run, schema=META_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan* shape: explode a (stubbed) frame
    index list -- the real decoder would yield (frame_idx, frame_bytes).
    Kept to show the partition-preserving explode layout."""
    n_frames = (F.length("content") % 50 + 1).cast("int")
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return media.select(
        "media_id", F.explode(idx).alias("frame_idx")
    )
