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
    Returns None when PIL is absent or cannot parse the payload.
    (Dimension fallback to the md5 fake is collision-safe, unlike
    pixel decode: the full digest avalanches, so two distinct corrupt
    payloads never share fake dimensions by header alone.)"""
    import io

    image_mod = _pil_image_module()
    if image_mod is None:
        return None
    try:
        with image_mod.open(io.BytesIO(content)) as im:
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


# ---------------------------------------------------------------------------
# Perceptual hash (dHash) + near-dup pairs over decoded pixels
# ---------------------------------------------------------------------------

#: dHash grid: 6 rows x 11 cols -> 6*10 = 60 difference bits, sized to
#: reuse the SimHash 15-bit-block hamming candidate machinery
#: (operators/dedup.simhash_pairs) unchanged.
DHASH_ROWS = 6
DHASH_COLS = 11


def fake_pixels(content: bytes, rows: int = DHASH_ROWS, cols: int = DHASH_COLS):
    """Deterministic grayscale grid test double (the imaging libs are
    absent here; the real path resizes a PIL grayscale image to the
    same grid). LOCALLY sensitive by construction, mirroring what a
    real downscale does to a slightly-edited image: a smooth gradient
    keyed by the first 4 payload bytes, plus one bounded bump per byte
    of the next 8 -- payloads sharing a prefix decode to
    perceptually-near grids, unrelated payloads to unrelated ones."""
    import numpy as np

    seed = int.from_bytes(content[:4].ljust(4, b"\0"), "big")
    xs = np.arange(cols)[None, :]
    ys = np.arange(rows)[:, None]
    grid = ((seed % 7 + 1) * xs * 16 + (seed % 11 + 1) * ys * 8 + seed % 256) % 256
    grid = grid.astype("int64")
    for b in content[4:12]:
        grid[b % rows, b % cols] = (grid[b % rows, b % cols] + b) % 256
    return grid


_PIL_IMAGE = None
_PIL_PROBED = False


def _pil_image_module():
    """PIL availability resolved ONCE per process (a failed import is
    not cached in sys.modules, so probing per row would re-walk the
    path finders inside the hot mapInPandas loop)."""
    global _PIL_IMAGE, _PIL_PROBED
    if not _PIL_PROBED:
        _PIL_PROBED = True
        try:
            from PIL import Image as _img

            _PIL_IMAGE = _img
        except ImportError:
            _PIL_IMAGE = None
    return _PIL_IMAGE


def _pil_pixels(content: bytes, rows: int, cols: int):
    """Grayscale-resized pixel grid via PIL. Raises: ImportError when
    PIL is absent, ValueError when PIL cannot decode the payload --
    two different operator problems, kept distinguishable."""
    import io

    import numpy as np

    image_mod = _pil_image_module()
    if image_mod is None:
        raise ImportError("PIL not installed")
    try:
        with image_mod.open(io.BytesIO(content)) as im:
            g = im.convert("L").resize((cols, rows))
            return np.asarray(g, dtype="int64")
    except Exception as exc:
        raise ValueError(f"undecodable image payload ({exc})") from exc


def pgm_pixels(content: bytes, rows: int, cols: int):
    """REAL pixel grid from a binary PGM payload, block-mean pooled to
    (rows, cols) -- the library-free decode+resize path (pure byte
    math, same family as parse_wav). Ragged block boundaries follow
    the standard index map r -> r*rows//h, so ANY raster size pools to
    the target grid with integer-exact cell means (sum // count), and
    an external engine can re-derive every cell. Returns None when the
    payload is not a parseable PGM at least (rows, cols) large."""
    import numpy as np

    parsed = parse_pgm(content)
    if parsed is None:
        return None
    w, h, a = parsed
    if h < rows or w < cols:
        return None
    a = a.astype(np.int64)
    ri = np.arange(h) * rows // h
    ci = np.arange(w) * cols // w
    sums = np.zeros((rows, cols), dtype=np.int64)
    counts = np.zeros((rows, cols), dtype=np.int64)
    np.add.at(sums, (ri[:, None], ci[None, :]), a)
    np.add.at(counts, (ri[:, None], ci[None, :]), 1)
    return sums // counts


def dhash60(content: bytes, fake: bool = False) -> int:
    """60-bit difference hash: bit = pixel[r,c] < pixel[r,c+1] over
    the 6x11 grid (row-major).

    ``fake=True`` ALWAYS uses the deterministic double (never real
    decode): the two modes must not mix, or an undecodable payload in
    a real corpus would silently fall back to a hash of its first 12
    bytes -- and corrupt files sharing a format header (every JFIF
    starts with the same 12 bytes) would collide as hamming-0
    "duplicates". ``fake=False`` decodes REAL pixels: binary PGM
    payloads go through the library-free ``pgm_pixels`` path
    (parse -> integer block-mean pool to the hash grid -- decode AND
    resize with no imaging library); everything else needs PIL
    (NotImplementedError otherwise) and surfaces undecodable payloads
    as ValueError naming the payload problem, not a missing
    library."""
    if fake:
        grid = fake_pixels(content)
    elif content[:2] == b"P5":
        grid = pgm_pixels(content, DHASH_ROWS, DHASH_COLS)
        if grid is None:
            raise ValueError("undecodable or undersized PGM payload")
    else:
        try:
            grid = _pil_pixels(content, DHASH_ROWS, DHASH_COLS)
        except ImportError:
            raise NotImplementedError(
                "pixel decode requires an imaging library (e.g. PIL); "
                "pass fake=True for the deterministic test double"
            ) from None
    h = 0
    bit = 0
    for r in range(DHASH_ROWS):
        for c in range(DHASH_COLS - 1):
            if grid[r, c] < grid[r, c + 1]:
                h |= 1 << bit
            bit += 1
    return h


def phash_column(media: DataFrame, fake: bool = False) -> DataFrame:
    """(media_id, simhash): the dHash as a column, computed in one
    Arrow-batched mapInPandas pass (the only Python stage); named
    ``simhash`` so the JVM-side hamming-block candidate join
    (operators/dedup.simhash_pairs) applies verbatim. NULL payloads
    carry no perceptual content and are dropped before the stage.

    ``fake`` defaults to False (same as :func:`dhash60`): the public
    dedup primitive must never silently hash the first payload bytes
    instead of decoded pixels -- real corpora without PIL get a
    NotImplementedError; tests and the registered queries opt into the
    deterministic double explicitly."""
    media = media.where(F.col("content").isNotNull())
    schema = StructType(
        [StructField("media_id", LongType()), StructField("simhash", LongType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "simhash": [dhash60(c, fake=fake) for c in pdf["content"]],
                }
            )

    return media.mapInPandas(run, schema=schema)


def image_neardup_pairs(
    media: DataFrame, max_hamming: int = 3, fake: bool = False
) -> DataFrame:
    """Perceptual image near-dup pairs: decode -> dHash (Python,
    Arrow-batched, map-only) -> 15-bit-block pigeonhole candidates ->
    exact hamming verify (all JVM-side). Same scale shape as text
    SimHash: candidates are bucket-join-linear, never all-pairs."""
    from conversation_analysis_tools_spark.operators import dedup as D

    return D.simhash_pairs(
        phash_column(media, fake=fake), max_hamming=max_hamming, id_col="media_id"
    )


# ---------------------------------------------------------------------------
# Uncompressed raster path: real decode + real resize, no codec library
# ---------------------------------------------------------------------------
#
# Compressed codecs stay behind the PIL gate, but binary PGM (P5 --
# the netpbm grayscale format: an ASCII header then raw 8-bit rows)
# is pure byte math, exactly like the WAV path in audio.py. That
# makes RESIZE a first-class, oracle-provable operator instead of
# dhash-internal plumbing: block-mean pooling over the raw pixel grid
# is integer-exact (sum // block_area), so an external engine can
# re-derive every output pixel of a synthetic corpus.

#: Modulus for the synthetic pixel recurrence; < 256 so values are
#: valid 8-bit samples.
_PIX_P = 251


def synth_gray_np(media_id: int, width: int, height: int):
    """Deterministic grayscale grid: pixel (r, c) of media m is
    ``(r*31 + c*7 + m*13) % 251`` -- integer-only, engine-portable."""
    import numpy as np

    r = np.arange(height, dtype=np.int64)[:, None]
    c = np.arange(width, dtype=np.int64)[None, :]
    return ((r * 31 + c * 7 + media_id * 13) % _PIX_P).astype(np.uint8)


def pgm_bytes(pixels) -> bytes:
    """Binary PGM (P5) container around an (h, w) uint8 grid."""
    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    h, w = a.shape
    return f"P5\n{w} {h}\n255\n".encode() + a.tobytes()


def parse_pgm(content: bytes):
    """(width, height, (h, w) uint8 grid) from a binary PGM, or None
    when the container is not P5 / is truncated. Header: magic,
    whitespace-separated width height maxval, ONE whitespace byte,
    then raw rows (the netpbm spec)."""
    import numpy as np

    if not content.startswith(b"P5"):
        return None
    # the magic must be FOLLOWED by whitespace (spec); 'P5x...' is not
    # a PGM and must fall to None, not to a shifted raster
    if len(content) < 3 or not content[2:3].isspace():
        return None
    # tokenize the header: three ints after the magic, skipping
    # whitespace runs ('#' comments are legal PGM; unsupported here --
    # synthetic corpora never emit them, foreign files fall to None)
    pos, vals = 2, []
    while len(vals) < 3 and pos < len(content):
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(content) and content[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            return None
        vals.append(int(content[start:pos]))
    if len(vals) < 3 or pos >= len(content):
        return None
    w, h, maxval = vals
    # exactly ONE whitespace byte separates maxval from the raster
    # (spec), and a conforming P5 ends right after the raster. Both
    # checks together make a shifted parse impossible: a non-space
    # separator rejects outright, and a '\r\n' double separator (each
    # byte individually whitespace) leaves the file one byte LONGER
    # than pos + w*h, failing the exact-length check below instead of
    # silently shifting every pixel.
    if not content[pos : pos + 1].isspace():
        return None
    pos += 1
    if maxval != 255 or w < 1 or h < 1 or len(content) != pos + w * h:
        return None
    a = np.frombuffer(content[pos : pos + w * h], dtype=np.uint8).reshape(h, w)
    return w, h, a


def resize_pool(
    media: DataFrame,
    factor: int = 4,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """REAL image resize over a binary column: parse PGM, block-mean
    downscale by ``factor`` (output pixel = integer mean, sum //
    factor^2, of its factor x factor input block; ragged right/bottom
    edges are dropped -- the fixed-grid rule every pooling featurizer
    uses), re-encode as PGM. One Arrow-batched map-only stage; emits
    (id, content, width, height) where content is the RESIZED
    container, so downstream stages (thumbnail sinks, dhash, a second
    pool) consume the same binary-column shape they were fed.
    Non-PGM rows drop (the codec gate: compressed formats need PIL).
    """
    out_schema = f"{id_col} bigint, {content_col} binary, width int, height int"

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                parsed = parse_pgm(bytes(content))
                if parsed is None:
                    continue
                w, h, a = parsed
                ow, oh = w // factor, h // factor
                if not ow or not oh:
                    continue
                pooled = (
                    a[: oh * factor, : ow * factor]
                    .astype("int64")
                    .reshape(oh, factor, ow, factor)
                    .sum(axis=(1, 3))
                    // (factor * factor)
                ).astype("uint8")
                rows.append((mid, pgm_bytes(pooled), ow, oh))
            yield pd.DataFrame(
                rows, columns=[id_col, content_col, "width", "height"]
            )

    return media.mapInPandas(batches, out_schema)
