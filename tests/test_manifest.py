"""Packfile + byte-range manifest layout (operators/manifest.py):
round-trip exactness, partial reads, packfile shape."""

import os

import pytest
from pyspark.sql import functions as F

from conversation_analysis_tools_spark.operators import manifest as MF


def _media(spark, n=20):
    # payloads of varied size incl. empty and 1-byte; deterministic
    rows = [
        (i, bytes([(i * 7 + j) % 256 for j in range(i * 13 % 97)]), f"m/{i%3}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "media_id bigint, content binary, mime string")


def test_pack_roundtrip_exact(spark, tmp_path):
    media = _media(spark)
    man = MF.pack_media(media, str(tmp_path / "packs"), n_packs=3)
    back = MF.read_media(man).collect()
    want = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    got = {r["media_id"]: bytes(r["content"]) for r in back}
    assert got == want
    # metadata columns ride along unchanged
    assert {r["mime"] for r in back} == {"m/0", "m/1", "m/2"}


def test_manifest_lengths_and_packfiles(spark, tmp_path):
    media = _media(spark)
    man = MF.pack_media(media, str(tmp_path / "packs"), n_packs=3)
    rows = man.collect()
    assert len(rows) == 20
    for r in rows:
        assert r["length"] == (r["media_id"] * 13) % 97
        assert os.path.getsize(r["path"]) >= r["offset"] + r["length"]
    # spans within one packfile are disjoint and gap-free (pure concat)
    by_path = {}
    for r in rows:
        by_path.setdefault(r["path"], []).append((r["offset"], r["length"]))
    for path, spans in by_path.items():
        spans.sort()
        pos = 0
        for off, ln in spans:
            assert off == pos
            pos += ln
        assert os.path.getsize(path) == pos


def test_partial_read_filters_bytes(spark, tmp_path):
    # the layout's point: filtering the manifest bounds the byte cost
    media = _media(spark)
    man = MF.pack_media(media, str(tmp_path / "packs"), n_packs=2)
    some = MF.read_media(man.where(F.col("media_id") % 5 == 0)).collect()
    assert sorted(r["media_id"] for r in some) == [0, 5, 10, 15]
    want = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    for r in some:
        assert bytes(r["content"]) == want[r["media_id"]]


def test_pack_rerun_is_stable(spark, tmp_path):
    # overwrite semantics: packing twice into the same dir leaves a
    # readable, consistent layout (atomic tmp+rename publish)
    media = _media(spark, n=8)
    out = str(tmp_path / "packs")
    MF.pack_media(media, out, n_packs=2)
    man2 = MF.pack_media(media, out, n_packs=2)
    back = MF.read_media(man2).collect()
    want = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    assert {r["media_id"]: bytes(r["content"]) for r in back} == want
