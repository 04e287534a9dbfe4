"""Multimodal queries: metadata extraction over binary media columns.

The md5 digest is engine-portable, so even the pandas-UDF path gets a
real oracle: DuckDB recomputes n_bytes and the digest from the same
bytes; width/height come from the same md5-derived deterministic fake
(first two digest bytes), expressible in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from conversation_analysis_tools_spark.catalog import table as _catalog_table
from conversation_analysis_tools_spark.operators import multimodal as M
from conversation_analysis_tools_spark.queries.registry import register


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           'text/plain' AS mime,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST(64 + CAST(strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 AS INT) * 64
                   + CAST(strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1 AS INT) * 4
                AS INT) AS width,
           CAST(64 + CAST(strpos('0123456789abcdef', substr(md5(text), 3, 1)) - 1 AS INT) * 64
                   + CAST(strpos('0123456789abcdef', substr(md5(text), 4, 1)) - 1 AS INT) * 4
                AS INT) AS height,
           md5(text) AS content_digest
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction via mapInPandas (Arrow
    batches). The codec is the deterministic md5 fake (see
    operators/multimodal.decode_image) -- byte0*4+64 width,
    byte1*4+64 height -- which the oracle reproduces from hex digits
    (byte0 = 16*hex[0] + hex[1], so width = 64 + hex[0]*64 + hex[1]*4).
    """
    docs = _catalog_table(spark, "documents", sf_dir)
    media = M.docs_as_media(docs)
    return M.extract_metadata(media, fake=True)


@register(
    "multimodal_frame_plan",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(unnest(generate_series(0, octet_length(encode(text)) % 50, 10))
                AS INT) AS frame_idx
    FROM documents
    """,
)
def multimodal_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plan shape (explode of per-media frame indexes);
    the real decoder is stubbed but the index math is deterministic
    (n_frames = byte_length %% 50 + 1, stride 10), so DuckDB can
    reproduce it with generate_series over octet_length."""
    docs = _catalog_table(spark, "documents", sf_dir)
    return M.frame_sample_plan(M.docs_as_media(docs))


@register(
    "image_phash_dedup",
    oracle="""
    SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(1 AS BIGINT)),
        (CAST(4 AS BIGINT), CAST(5 AS BIGINT), CAST(0 AS BIGINT))
    ) AS t(id1, id2, hamming)
    """,
)
def image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup detection: decode -> 60-bit dHash
    (Arrow-batched mapInPandas, the only Python stage) -> 15-bit-block
    pigeonhole candidates -> exact hamming verify, all JVM-side
    (reuses the text-SimHash machinery; same bucket-join-linear scale
    shape -- never all-pairs).

    Fixed in-query corpus, so the oracle is literal and data-
    independent: two pixel-identical payloads (hamming 0), one
    single-bump edit (hamming 1 -- the tolerance a perceptual hash
    exists for), one heavier edit and two unrelated images that must
    NOT pair at max_hamming=3. Pixel decode is the deterministic
    locally-sensitive double (operators/multimodal.fake_pixels); the
    real path is PIL grayscale-resize behind the same import gate."""
    corpus = [
        (1, b"AAAA" + bytes([1, 2, 3, 4, 5, 6, 7, 8])),
        (2, b"AAAA" + bytes([1, 2, 3, 4, 5, 6, 7, 200])),  # near dup of 1
        (3, b"AAAA" + bytes([200, 201, 202, 203, 204, 205, 206, 207])),
        (4, b"BBBB" + bytes([1, 2, 3, 4, 5, 6, 7, 8])),
        (5, b"BBBB" + bytes([1, 2, 3, 4, 5, 6, 7, 8])),  # exact dup of 4
        (6, b"CCCC" + bytes([50] * 8)),
    ]
    media = spark.createDataFrame(
        [(i, c, "image/x-test") for i, c in corpus],
        "media_id bigint, content binary, mime string",
    )
    return M.image_neardup_pairs(media, max_hamming=3, fake=True)
