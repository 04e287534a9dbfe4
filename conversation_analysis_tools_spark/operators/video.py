"""Video container operators over binary columns.

Completes the multimodal container-parse triple (image header dims in
operators/multimodal.py, RIFF/WAVE in operators/audio.py): a real
ISO-BMFF (MP4) box walk -- pure byte math, no codec library -- pulling
the movie-header timescale/duration and the track count. Frame DECODE
needs a codec this environment does not ship and stays behind the
documented gate (the frame-sampling PLAN over opaque payloads is
operators/multimodal.frame_sample_plan).

Scale posture: one Arrow-batched mapInPandas stage, map-only; only
KB-scale metadata rows leave the stage, payload bytes never shuffle.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame


def _boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each ISO-BMFF box in
    buf[start:end]; stops cleanly on truncated/garbage sizes."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", buf[pos : pos + 4])[0]
        btype = buf[pos + 4 : pos + 8]
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            size = struct.unpack(">Q", buf[pos + 8 : pos + 16])[0]
            body = pos + 16
        else:
            body = pos + 8
        if size < 8 or pos + size > end:
            return
        yield btype, body, pos + size
        pos += size


def parse_mp4(content: bytes) -> dict | None:
    """Movie metadata from an ISO-BMFF container: major brand (ftyp),
    mvhd timescale/duration (version 0 and 1 layouts), and the count
    of trak children of moov. None when the payload is not BMFF
    (first top-level box must be ftyp per the spec)."""
    top = list(_boxes(content, 0, len(content)))
    if not top or top[0][0] != b"ftyp":
        return None
    out = {"major_brand": content[top[0][1] : top[0][1] + 4].decode("ascii", "replace")}
    for btype, body, bend in top:
        if btype != b"moov":
            continue
        n_tracks = 0
        for ctype, cbody, cend in _boxes(content, body, bend):
            if ctype == b"trak":
                n_tracks += 1
            elif ctype == b"mvhd":
                if cend - cbody < 20:  # undersized box: malformed, skip
                    continue
                version = content[cbody]
                if version == 1:  # 64-bit times
                    if cend - cbody < 32:
                        continue
                    timescale = struct.unpack(">I", content[cbody + 20 : cbody + 24])[0]
                    duration = struct.unpack(">Q", content[cbody + 24 : cbody + 32])[0]
                else:
                    timescale, duration = struct.unpack(
                        ">II", content[cbody + 12 : cbody + 20]
                    )
                if timescale < 1:
                    continue  # zeroed header: never divide by it
                out["timescale"] = timescale
                out["duration"] = duration
        out["n_tracks"] = n_tracks
    if "timescale" not in out:
        return None
    return out


def mp4_box(btype: bytes, payload: bytes) -> bytes:
    """Pack one ISO-BMFF box (32-bit size form)."""
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def synth_mp4(major: bytes, timescale: int, duration: int, n_tracks: int) -> bytes:
    """Minimal valid BMFF container for the fixed test corpus: ftyp +
    moov(mvhd v0 + n empty-ish trak children)."""
    ftyp = mp4_box(b"ftyp", major + struct.pack(">I", 0) + major)
    mvhd = mp4_box(
        b"mvhd", b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, timescale, duration) + b"\x00" * 80
    )
    traks = b"".join(mp4_box(b"trak", mp4_box(b"free", b"")) for _ in range(n_tracks))
    return ftyp + mp4_box(b"moov", mvhd + traks)


def video_metadata(
    media: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Per-media BMFF metadata in one Arrow-batched mapInPandas stage;
    duration_ms is integer math (duration * 1000 // timescale) so an
    external engine reproduces it exactly. Non-BMFF rows drop."""
    out_schema = (
        f"{id_col} bigint, major_brand string, timescale int, "
        "duration bigint, duration_ms bigint, n_tracks int"
    )

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                meta = parse_mp4(bytes(content))
                if meta is None:
                    continue
                rows.append(
                    (
                        mid,
                        meta["major_brand"],
                        meta["timescale"],
                        meta["duration"],
                        meta["duration"] * 1000 // meta["timescale"],
                        meta["n_tracks"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "major_brand", "timescale", "duration", "duration_ms", "n_tracks"],
            )

    return media.mapInPandas(batches, out_schema)
