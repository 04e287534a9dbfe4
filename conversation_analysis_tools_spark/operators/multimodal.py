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


def png_dimensions(content: bytes) -> tuple[int, int] | None:
    """PNG IHDR width/height (public spec: 8-byte signature, then the
    IHDR chunk whose data starts at offset 16 -- width and height as
    big-endian uint32)."""
    if len(content) < 24 or content[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    if content[12:16] != b"IHDR":
        return None
    w = int.from_bytes(content[16:20], "big")
    h = int.from_bytes(content[20:24], "big")
    return w, h


def jpeg_dimensions(content: bytes) -> tuple[int, int] | None:
    """JPEG SOFn height/width (public spec: walk marker segments from
    SOI; any SOF0-SOF15 except DHT/JPG/DAC carries the frame header:
    [len u16][precision u8][height u16][width u16])."""
    if len(content) < 4 or content[:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(content)
    while i + 3 < n:
        if content[i] != 0xFF:
            i += 1
            continue
        marker = content[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers, no length field
            continue
        if i + 4 > n:
            return None
        seg_len = int.from_bytes(content[i + 2 : i + 4], "big")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > n:
                return None
            h = int.from_bytes(content[i + 5 : i + 7], "big")
            w = int.from_bytes(content[i + 7 : i + 9], "big")
            return w, h
        i += 2 + seg_len
    return None


def gif_dimensions(content: bytes) -> tuple[int, int] | None:
    """GIF logical-screen width/height (public spec: 'GIF87a'/'GIF89a'
    then little-endian uint16 pair)."""
    if len(content) < 10 or content[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w = int.from_bytes(content[6:8], "little")
    h = int.from_bytes(content[8:10], "little")
    return w, h


def _pil_dimensions(content: bytes) -> tuple[int, int] | None:
    """Real-codec path, import-gated on PIL (same optional-dep pattern
    as sources/charts.render_png): covers every format PIL knows,
    lazy -- ``Image.open`` reads only headers, no full pixel decode.
    Returns None when PIL is absent or cannot parse the payload."""
    try:
        import io

        from PIL import Image
    except ImportError:
        return None
    try:
        with Image.open(io.BytesIO(content)) as im:
            return im.width, im.height
    except Exception:
        return None


def decode_image(content: bytes, fake: bool = False) -> tuple[int, int]:
    """Image dimensions. PNG / JPEG / GIF headers are parsed for real
    (pure-Python readers over the public container formats -- no
    imaging library needed for dimensions); other formats fall through
    to PIL when installed. With neither: NotImplementedError unless
    ``fake=True`` selects the deterministic test double."""
    for parse in (png_dimensions, jpeg_dimensions, gif_dimensions):
        dims = parse(content)
        if dims is not None:
            return dims
    dims = _pil_dimensions(content)
    if dims is not None:
        return dims
    if not fake:
        raise NotImplementedError(
            "pixel decode of non-PNG/JPEG/GIF payloads requires an "
            "imaging library (e.g. PIL); pass fake=True for the "
            "deterministic test double"
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
