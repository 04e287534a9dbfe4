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
