"""Perceptual dHash operator: locality of the test double, PIL gate."""

from __future__ import annotations

import pytest

from conversation_analysis_tools_spark.operators.multimodal import (
    DHASH_COLS,
    DHASH_ROWS,
    dhash60,
    fake_pixels,
)


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_fake_double_is_locally_sensitive():
    base = b"SEED" + bytes(range(8))
    same = b"SEED" + bytes(range(8))
    tweak = b"SEED" + bytes([0, 1, 2, 3, 4, 5, 6, 250])
    other = b"ELSE" + bytes(range(8))
    h = lambda c: dhash60(c, fake=True)  # noqa: E731
    assert h(base) == h(same)
    assert 0 <= _ham(h(base), h(tweak)) <= 3  # bounded drift on a small edit
    assert _ham(h(base), h(other)) > 10  # unrelated stays far


def test_dhash_range_and_grid():
    g = fake_pixels(b"xy")
    assert g.shape == (DHASH_ROWS, DHASH_COLS)
    v = dhash60(b"xy", fake=True)
    assert 0 <= v < (1 << 60)


def test_real_decode_requires_imaging_lib():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed: the real path would decode")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        dhash60(b"not-an-image", fake=False)


def test_null_content_rows_dropped(spark):
    from conversation_analysis_tools_spark.operators import multimodal as M

    media = spark.createDataFrame(
        [(1, b"AAAA" + bytes(8), "x"), (2, None, "x"), (3, b"AAAA" + bytes(8), "x")],
        "media_id bigint, content binary, mime string",
    )
    pairs = M.image_neardup_pairs(media, fake=True).collect()
    assert [(r["id1"], r["id2"], r["hamming"]) for r in pairs] == [(1, 3, 0)]


def test_pgm_roundtrip_and_parse_rejects():
    from conversation_analysis_tools_spark.operators import multimodal as M

    g = M.synth_gray_np(7, 20, 12)
    w, h, a = M.parse_pgm(M.pgm_bytes(g))
    assert (w, h) == (20, 12) and (a == g).all()
    assert M.parse_pgm(b"P6\n1 1\n255\nx") is None  # PPM, not PGM
    assert M.parse_pgm(b"P5\n4 4\n255\nxx") is None  # truncated raster
    assert M.parse_pgm(b"P5\n4 4\n65535\n" + b"x" * 32) is None  # 16-bit


def test_resize_pool_matches_numpy_and_drops_ragged(spark):
    import numpy as np

    from conversation_analysis_tools_spark.operators import multimodal as M

    rows = [
        (1, M.pgm_bytes(M.synth_gray_np(1, 32, 16)), "image/x-portable-graymap"),
        (2, M.pgm_bytes(M.synth_gray_np(2, 18, 10)), "image/x-portable-graymap"),
        (3, b"not a raster", "application/octet-stream"),  # drops
        (4, M.pgm_bytes(M.synth_gray_np(4, 3, 3)), "image/x-portable-graymap"),
        # 3x3 at factor 4 -> zero full blocks: drops
    ]
    media = spark.createDataFrame(rows, "media_id bigint, content binary, mime string")
    out = {r["media_id"]: r for r in M.resize_pool(media, factor=4).collect()}
    assert sorted(out) == [1, 2]
    for mid, w, h in [(1, 32, 16), (2, 18, 10)]:
        a = M.synth_gray_np(mid, w, h).astype(np.int64)
        ow, oh = w // 4, h // 4
        want = (a[: oh * 4, : ow * 4].reshape(oh, 4, ow, 4).sum((1, 3)) // 16)
        got = M.parse_pgm(bytes(out[mid]["content"]))
        assert (out[mid]["width"], out[mid]["height"]) == (ow, oh)
        assert got[0] == ow and got[1] == oh and (got[2] == want).all()


def test_resize_pool_composes_with_dhash(spark):
    # the resized binary column feeds the SAME downstream shape:
    # dhash over resized thumbnails runs without reshaping anything
    from conversation_analysis_tools_spark.operators import multimodal as M

    media = spark.createDataFrame(
        [(1, M.pgm_bytes(M.synth_gray_np(1, 64, 48)), "image/x-portable-graymap")],
        "media_id bigint, content binary, mime string",
    )
    from pyspark.sql import functions as F

    thumbs = M.resize_pool(media, factor=2).select("media_id", "content")
    hashed = M.phash_column(thumbs.withColumn("mime", F.lit("x")), fake=True)
    assert hashed.count() == 1


def test_pgm_pixels_ragged_pooling_matches_reference():
    import numpy as np

    from conversation_analysis_tools_spark.operators import multimodal as M

    g = M.synth_gray_np(5, 37, 23)  # deliberately not divisible by 6/11
    got = M.pgm_pixels(M.pgm_bytes(g), 6, 11)
    a = g.astype(np.int64)
    want = np.zeros((6, 11), dtype=np.int64)
    cnt = np.zeros((6, 11), dtype=np.int64)
    for r in range(23):
        for c in range(37):
            want[r * 6 // 23, c * 11 // 37] += a[r, c]
            cnt[r * 6 // 23, c * 11 // 37] += 1
    assert (got == want // cnt).all()


def test_dhash_real_pgm_path_is_perceptually_stable():
    # a smooth gradient survives a 4x downscale with a near-identical
    # hash: the property a perceptual hash exists for, now exercised
    # over REAL pixels with no imaging library
    import numpy as np

    from conversation_analysis_tools_spark.operators import multimodal as M

    grad = np.add.outer(np.arange(48) * 2, np.arange(88)).astype("uint8")
    h_full = M.dhash60(M.pgm_bytes(grad))
    small = (
        grad.astype("int64").reshape(12, 4, 22, 4).sum((1, 3)) // 16
    ).astype("uint8")
    h_small = M.dhash60(M.pgm_bytes(small))
    assert bin(h_full ^ h_small).count("1") <= 3
    # undersized PGM: loud ValueError, not a junk hash
    import pytest as _pytest

    with _pytest.raises(ValueError):
        M.dhash60(M.pgm_bytes(grad[:3, :5]))


def test_parse_pgm_rejects_nonconforming_separators():
    # headers that would silently SHIFT the raster must fall to None:
    # '\r\n' double separator after maxval, no whitespace after magic,
    # trailing junk after the raster
    from conversation_analysis_tools_spark.operators import multimodal as M

    raster = bytes(range(16))
    assert M.parse_pgm(b"P5\n4 4\n255\n" + raster) is not None
    assert M.parse_pgm(b"P5\n4 4\n255\r\n" + raster) is None
    assert M.parse_pgm(b"P54 4\n255\n" + raster) is None
    assert M.parse_pgm(b"P5\n4 4\n255\n" + raster + b"\n") is None
