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


def test_read_media_raises_on_torn_packfile(spark, tmp_path):
    # a truncated packfile must fail LOUDLY, not flow downstream as a
    # silently-short payload
    media = _media(spark, n=6)
    out = str(tmp_path / "packs")
    man = MF.pack_media(media, out, n_packs=1)
    # tear the pack: drop the last 5 bytes
    path = man.select("path").first()["path"]
    blob = open(path, "rb").read()
    open(path, "wb").write(blob[:-5])
    import pytest as _pytest

    with _pytest.raises(Exception, match="torn packfile"):
        MF.read_media(man).collect()
    # salvage mode reads what it can without raising
    got = MF.read_media(man, verify=None).collect()
    assert len(got) == 6


def test_read_media_digest_verify_catches_corruption(spark, tmp_path):
    media = _media(spark, n=6)
    out = str(tmp_path / "packs")
    man = MF.pack_media(media, out, n_packs=1)
    path = man.select("path").first()["path"]
    blob = bytearray(open(path, "rb").read())
    if not blob:  # all-empty payload corner: nothing to corrupt
        return
    blob[len(blob) // 2] ^= 0xFF  # flip one byte mid-pack
    open(path, "wb").write(bytes(blob))
    import pytest as _pytest

    # length verify passes (spans intact), digest verify must not
    MF.read_media(man, verify="length").collect()
    with _pytest.raises(Exception, match="digest mismatch"):
        MF.read_media(man, verify="digest").collect()


def test_manifest_digest_matches_payload(spark, tmp_path):
    import hashlib

    media = _media(spark, n=10)
    man = MF.pack_media(media, str(tmp_path / "packs"), n_packs=2)
    want = {
        r["media_id"]: hashlib.md5(bytes(r["content"])).hexdigest()
        for r in media.collect()
    }
    for r in man.collect():
        assert r["payload_md5"] == want[r["media_id"]]


def test_pack_read_roundtrip_property(spark):
    # adversarial payload-list sweep (one Spark job per case): any
    # payload list, bit-exact digest-verified recovery. Cases target
    # the layout's edge arithmetic: empties between payloads (0-length
    # spans), repeated identical blobs (same digest, distinct spans),
    # every byte value, null-byte runs, single-byte packs.
    import random
    import tempfile

    rng = random.Random(21)
    cases = [
        [],
        [b""],
        [b"", b"x", b"", b"yz", b""],
        [b"\x00" * 150] * 5,
        [bytes(range(256))],
        [bytes([rng.randrange(256)]) for _ in range(12)],
        [bytes(rng.randrange(256) for _ in range(rng.randrange(0, 200)))
         for _ in range(9)],
    ]
    for blobs in cases:
        rows = [(i, b, "x") for i, b in enumerate(blobs)]
        media = spark.createDataFrame(
            rows, "media_id bigint, content binary, mime string"
        ) if rows else spark.createDataFrame(
            [], "media_id bigint, content binary, mime string"
        )
        with tempfile.TemporaryDirectory() as d:
            man = MF.pack_media(media, d, n_packs=3)
            got = {
                r["media_id"]: bytes(r["content"])
                for r in MF.read_media(man, verify="digest").collect()
            }
        assert got == {i: b for i, b in enumerate(blobs)}


def test_pack_null_payload_raises_descriptive(spark, tmp_path):
    """A NULL content row must fail the pack LOUDLY with the offending
    row named, not an opaque bytes(None) TypeError mid-task."""
    media = spark.createDataFrame(
        [(1, b"ok", "m/0"), (2, None, "m/1")],
        "media_id bigint, content binary, mime string",
    )
    with pytest.raises(Exception, match="null 'content' payload"):
        MF.pack_media(media, str(tmp_path / "packs"), n_packs=1)


def test_pack_content_only_media_schema_wellformed(spark, tmp_path):
    """Media with ONLY the content column: the output schema must not
    start with a dangling ', ' (the zero-meta-column join case)."""
    media = spark.createDataFrame([(b"abc",), (b"defgh",)], "content binary")
    man = MF.pack_media(media, str(tmp_path / "packs"), n_packs=1)
    assert set(man.columns) == {"path", "offset", "length", "payload_md5"}
    assert sorted(r["length"] for r in man.collect()) == [3, 5]


def test_pack_and_manifest_repacks_on_definition_change(spark, tmp_path, monkeypatch):
    """The memo marker carries the pack definition: a changed media
    schema or version token must trigger a repack instead of silently
    serving the stale pack (and a legacy empty marker upgrades)."""
    from conversation_analysis_tools_spark import catalog

    monkeypatch.setattr(
        catalog, "staging_dir", lambda kind, sf: str(tmp_path / kind)
    )
    media1 = _media(spark, n=4)
    man1 = MF.pack_and_manifest(spark, media1, "packmemo", "sfX")
    n1 = man1.count()
    # same definition -> memoized (manifest files untouched)
    mtime = os.path.getmtime(str(tmp_path / "packmemo" / "manifest.parquet"))
    MF.pack_and_manifest(spark, media1, "packmemo", "sfX").count()
    assert os.path.getmtime(str(tmp_path / "packmemo" / "manifest.parquet")) == mtime
    # different corpus under the same kind, version bumped -> repack
    media2 = _media(spark, n=9)
    man2 = MF.pack_and_manifest(spark, media2, "packmemo", "sfX", version="v2")
    assert man2.count() == 9 and n1 == 4
    # legacy empty marker (pre-definition format) -> repack, not reuse
    marker = str(tmp_path / "packmemo" / "_SUCCESS_pack")
    open(marker, "w").close()
    man3 = MF.pack_and_manifest(spark, media1, "packmemo", "sfX")
    assert man3.count() == 4


def test_pack_version_dir_fingerprint_invalidates_on_regeneration(
    spark, tmp_path, monkeypatch
):
    """The file-derived caller contract from the pack_and_manifest
    docstring, pinned end to end: media read from files, packed with
    version=repr(dir_fingerprint(src_dir)), must serve FRESH payloads
    after the source files are regenerated in place (same names, same
    sizes allowed -- the fingerprint carries mtime_ns, which an
    in-place rewrite always advances). Without the version token the
    memo marker matches and the stale pack is served -- also pinned,
    as the hazard the token exists to close."""
    from conversation_analysis_tools_spark import catalog
    from conversation_analysis_tools_spark.fitcache import dir_fingerprint

    monkeypatch.setattr(
        catalog, "staging_dir", lambda kind, sf: str(tmp_path / kind)
    )
    src = tmp_path / "media_src"
    src.mkdir()
    (src / "a.bin").write_bytes(b"payload-one")

    def load_media():
        rows = [
            (i, p.name, p.read_bytes())
            for i, p in enumerate(sorted(src.iterdir()))
        ]
        return spark.createDataFrame(
            rows, "media_id bigint, name string, content binary"
        )

    def first_payload(man):
        return MF.read_media(man).orderBy("media_id").first()["content"]

    # the hazard the token closes: no version -> after an in-place
    # regeneration the marker still matches and the STALE pack serves
    man1 = MF.pack_and_manifest(spark, load_media(), "fpack", "sfX")
    assert first_payload(man1) == b"payload-one"
    (src / "a.bin").write_bytes(b"payload-TWO")
    stale = MF.pack_and_manifest(spark, load_media(), "fpack", "sfX")
    assert first_payload(stale) == b"payload-one"

    # the contract: version=repr(dir_fingerprint(src)) repacks on the
    # regeneration (mtime_ns advances on in-place rewrite) ...
    man2 = MF.pack_and_manifest(
        spark, load_media(), "fpack2", "sfX",
        version=repr(dir_fingerprint(str(src))),
    )
    assert first_payload(man2) == b"payload-TWO"
    (src / "a.bin").write_bytes(b"payload-THREE")
    man3 = MF.pack_and_manifest(
        spark, load_media(), "fpack2", "sfX",
        version=repr(dir_fingerprint(str(src))),
    )
    assert first_payload(man3) == b"payload-THREE"

    # ... and memoizes while the fingerprint is unchanged
    mtime = os.path.getmtime(str(tmp_path / "fpack2" / "manifest.parquet"))
    MF.pack_and_manifest(
        spark, load_media(), "fpack2", "sfX",
        version=repr(dir_fingerprint(str(src))),
    ).count()
    assert os.path.getmtime(str(tmp_path / "fpack2" / "manifest.parquet")) == mtime


def test_pack_rejects_file_derived_media_without_version(
    spark, tmp_path, monkeypatch
):
    """VERDICT r8 item 7: the version= contract is enforced, not
    conventional -- a caller whose media plan reads FILES (Spark file
    source in the analyzed plan) must pass a version token or
    pack_and_manifest raises; with the token the same plan packs
    fine. In-code corpora (LocalRelation lineage) stay exempt: the
    marker's schema record already invalidates them."""
    import pytest

    from conversation_analysis_tools_spark import catalog

    monkeypatch.setattr(
        catalog, "staging_dir", lambda kind, sf: str(tmp_path / kind)
    )
    src = str(tmp_path / "media_pq")
    spark.createDataFrame(
        [(1, "a", bytearray(b"xx")), (2, "b", bytearray(b"yyy"))],
        "media_id bigint, name string, content binary",
    ).write.parquet(src)
    filed = spark.read.parquet(src)
    with pytest.raises(ValueError, match="version="):
        MF.pack_and_manifest(spark, filed, "lintpack", "sfX")
    man = MF.pack_and_manifest(
        spark, filed, "lintpack", "sfX", version="fp-v1"
    )
    assert man.count() == 2
    # a narrowed projection of a file read still counts as file-derived
    with pytest.raises(ValueError, match="version="):
        MF.pack_and_manifest(
            spark, filed.select("media_id", "content"), "lintpack2", "sfX"
        )
    # synthetic media keeps working without a token
    synth = spark.createDataFrame(
        [(1, bytearray(b"z"))], "media_id bigint, content binary"
    )
    assert MF.pack_and_manifest(spark, synth, "lintpack3", "sfX").count() == 1


def test_external_relation_pattern_shapes():
    """The lineage lint must catch every external-source relation
    shape the analyzed plan prints (ADVICE r9: the v1-path-only
    pattern failed open for catalog tables and DSv2), and must keep
    rejecting in-code corpora."""
    import re

    from conversation_analysis_tools_spark.operators.manifest import (
        _EXTERNAL_RELATION_RE,
    )

    hits = [
        "Relation [media_id#1,content#2] parquet",  # v1 path read
        "Relation spark_catalog.default.media[media_id#1] parquet",
        "RelationV2[media_id#1, content#2] cat.media",  # DSv2
    ]
    misses = [
        "LocalRelation [media_id#1, content#2]",  # createDataFrame
        "LogicalRDD [media_id#1]",
        "Project [media_id#1]",
    ]
    for s in hits:
        assert re.search(_EXTERNAL_RELATION_RE, s), s
    for s in misses:
        assert not re.search(_EXTERNAL_RELATION_RE, s), s


def test_version_lint_catches_catalog_table(spark, tmp_path, monkeypatch):
    """A catalog-table read (saveAsTable -> spark.table) is
    file-derived lineage: the version= contract must not fail open on
    it (ADVICE r9)."""
    import pytest

    from conversation_analysis_tools_spark import catalog
    from conversation_analysis_tools_spark.operators import manifest as MF

    monkeypatch.setattr(
        catalog, "staging_dir", lambda kind, sf: str(tmp_path / kind)
    )
    spark.createDataFrame(
        [(1, bytearray(b"xx"))], "media_id bigint, content binary"
    ).write.mode("overwrite").saveAsTable("lint_media_tbl")
    try:
        tbl = spark.table("lint_media_tbl")
        with pytest.raises(ValueError, match="version="):
            MF.pack_and_manifest(spark, tbl, "lintpack_cat", "sfX")
        assert MF.pack_and_manifest(
            spark, tbl, "lintpack_cat", "sfX", version="fp-v1"
        ).count() == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS lint_media_tbl")
