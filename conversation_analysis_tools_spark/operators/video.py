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


# ---------------------------------------------------------------------------
# Real frame path: length-prefixed raw-frame container + frame sampling
# ---------------------------------------------------------------------------
#
# Compressed video decode stays behind the codec gate, but a raw
# frame container -- magic, frame count, then length-prefixed binary
# PGM frames -- is pure byte math, like the RIFF walk above. That
# upgrades frame SAMPLING from a plan shape
# (multimodal.frame_sample_plan) to a real operator: parse the
# container, slice every Nth frame's exact byte span, emit it as its
# own binary column row. The layout mirrors raw-video interchange
# (e.g. yuv4mpeg's FRAME-delimited stream) without needing a codec.

_FRV_MAGIC = b"FRV1"


def frv_bytes(frames: list[bytes]) -> bytes:
    """Container around raw frame blobs: magic + u32 frame count +
    per-frame u32 length prefix (big-endian) then the frame bytes."""
    out = [_FRV_MAGIC, struct.pack(">I", len(frames))]
    for f in frames:
        out.append(struct.pack(">I", len(f)))
        out.append(f)
    return b"".join(out)


def parse_frv(content: bytes) -> list[bytes] | None:
    """Frame blobs from an FRV1 container, or None when the magic is
    absent or any length prefix overruns the buffer (torn file)."""
    if len(content) < 8 or content[:4] != _FRV_MAGIC:
        return None
    n = struct.unpack(">I", content[4:8])[0]
    pos, frames = 8, []
    for _ in range(n):
        if pos + 4 > len(content):
            return None
        ln = struct.unpack(">I", content[pos : pos + 4])[0]
        pos += 4
        if pos + ln > len(content):
            return None
        frames.append(content[pos : pos + ln])
        pos += ln
    return frames


def frame_sample(
    media: DataFrame,
    every_n: int = 10,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """REAL frame sampling over a binary column: walk the FRV1
    container and emit every ``every_n``-th frame (index 0, n, 2n...)
    as its own row (id, frame_idx, frame binary). One map-only Arrow
    stage; the expansion is bounded at frames/every_n rows per media,
    and each emitted frame is an exact byte slice of the container --
    downstream per-frame stages (resize_pool, dhash, a feature
    extractor) consume the standard binary-column shape. Non-FRV rows
    drop (compressed containers need the gated codec path)."""
    out_schema = f"{id_col} bigint, frame_idx int, frame binary"

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                frames = parse_frv(bytes(content))
                if frames is None:
                    continue
                rows.extend(
                    (mid, i, frames[i]) for i in range(0, len(frames), every_n)
                )
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame"])

    return media.mapInPandas(batches, out_schema)
