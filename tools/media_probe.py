"""Multimodal byte-path scaling probe.

Builds synthetic media corpora at 1x / 10x / 100x (WAV audio blobs --
the only codec the container can decode for real -- plus MP4
container stubs and binary image blobs for the fake-decode dhash
path), runs each Arrow ``mapInPandas`` media stage at every scale,
and writes a measured table (wall seconds, payload MB, MB/s, wall
growth) into SCALE.md between the ``media-probe`` markers.

What a pass looks like: every stage is map-only, so wall growth must
track payload bytes (~10x per step) with MB/s roughly flat -- a
super-linear step means the stage is shuffling or collecting payload
bytes somewhere. The packed-manifest path (operators/manifest.py) is
probed twice: full rematerialization (read_media over the whole
manifest, the worst case -- every byte fetched) and a 1%-filtered
partial read, whose wall must sit near the fixed job overhead, not
near the full-scan cost: the layout's point is that byte cost follows
the FILTERED manifest.

Usage: python tools/media_probe.py [--skip-100x]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from conversation_analysis_tools_spark.catalog import staging_dir
from conversation_analysis_tools_spark.operators import audio as A
from conversation_analysis_tools_spark.operators import manifest as MF
from conversation_analysis_tools_spark.operators import multimodal as M
from conversation_analysis_tools_spark.operators import video as V
from conversation_analysis_tools_spark.operators.cache import release_all
from conversation_analysis_tools_spark.session import get_spark

BASE_CLIPS = 200  # 1x; clips are ~2 s @ 8 kHz PCM16 -> ~32 KB each
SF_ANCHOR = "/root/testdata/sf0.1"  # staging key only; no table reads


def best_of(fn, n: int = 3) -> float:
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
        release_all()
    return round(best, 2)


def build_audio(spark, n_clips: int) -> str:
    """n_clips synthetic WAVs as a (media_id, content, mime) parquet.
    Generation is DISTRIBUTED (mapInPandas over spark.range) and
    vectorized (synth_pcm16_np): the driver never holds a payload.
    Durations vary 2.0-2.7 s so window counts are not uniform."""
    out = os.path.join(staging_dir("mediaprobe", SF_ANCHOR), f"audio{n_clips}")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        def gen(it):
            import pandas as pd

            for pdf in it:
                rows = [
                    (
                        int(mid),
                        A.wav_bytes(
                            A.synth_pcm16_np(int(mid), 16000 + (int(mid) % 7) * 800)
                        ),
                        "audio/wav",
                    )
                    for mid in pdf["id"]
                ]
                yield pd.DataFrame(rows, columns=["media_id", "content", "mime"])

        (
            spark.range(n_clips)
            .repartition(32)
            .mapInPandas(gen, "media_id bigint, content binary, mime string")
            .write.mode("overwrite")
            .parquet(os.path.join(out, "media.parquet"))
        )
        open(marker, "w").close()
    return os.path.join(out, "media.parquet")


def build_mp4(spark, n_clips: int) -> str:
    """MP4 container stubs (ftyp+mvhd+trak boxes, ~100 B each): the
    box-walk parse is header-bound, so this probe scales ROW count."""
    out = os.path.join(staging_dir("mediaprobe", SF_ANCHOR), f"mp4_{n_clips}")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        def gen(it):
            import pandas as pd

            for pdf in it:
                rows = [
                    (
                        int(mid),
                        V.synth_mp4(
                            b"isom", 1000, 1000 + int(mid) % 9000, 1 + int(mid) % 3
                        ),
                        "video/mp4",
                    )
                    for mid in pdf["id"]
                ]
                yield pd.DataFrame(rows, columns=["media_id", "content", "mime"])

        (
            spark.range(n_clips)
            .repartition(32)
            .mapInPandas(gen, "media_id bigint, content binary, mime string")
            .write.mode("overwrite")
            .parquet(os.path.join(out, "media.parquet"))
        )
        open(marker, "w").close()
    return os.path.join(out, "media.parquet")


def build_pgm(spark, n_imgs: int) -> str:
    """n_imgs 128x128 binary PGM rasters (~16 KB each): the REAL
    decode+resize byte path's input."""
    out = os.path.join(staging_dir("mediaprobe", SF_ANCHOR), f"pgm{n_imgs}")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        def gen(it):
            import pandas as pd

            for pdf in it:
                rows = [
                    (
                        int(mid),
                        M.pgm_bytes(M.synth_gray_np(int(mid), 128, 128)),
                        "image/x-portable-graymap",
                    )
                    for mid in pdf["id"]
                ]
                yield pd.DataFrame(rows, columns=["media_id", "content", "mime"])

        (
            spark.range(n_imgs)
            .repartition(32)
            .mapInPandas(gen, "media_id bigint, content binary, mime string")
            .write.mode("overwrite")
            .parquet(os.path.join(out, "media.parquet"))
        )
        open(marker, "w").close()
    return os.path.join(out, "media.parquet")


def build_frv(spark, n_vids: int) -> str:
    """n_vids FRV1 frame containers (12 frames of 64x32 PGM each,
    ~25 KB/video): the REAL frame-sampling byte path's input."""
    out = os.path.join(staging_dir("mediaprobe", SF_ANCHOR), f"frv{n_vids}")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        def gen(it):
            import numpy as np
            import pandas as pd

            r = np.arange(32, dtype=np.int64)[:, None]
            c = np.arange(64, dtype=np.int64)[None, :]
            for pdf in it:
                rows = []
                for mid in pdf["id"]:
                    m = int(mid)
                    frames = [
                        M.pgm_bytes(
                            ((r * 31 + c * 7 + m * 13 + f * 17) % 251).astype("uint8")
                        )
                        for f in range(12)
                    ]
                    rows.append((m, V.frv_bytes(frames), "video/x-frv"))
                yield pd.DataFrame(rows, columns=["media_id", "content", "mime"])

        (
            spark.range(n_vids)
            .repartition(32)
            .mapInPandas(gen, "media_id bigint, content binary, mime string")
            .write.mode("overwrite")
            .parquet(os.path.join(out, "media.parquet"))
        )
        open(marker, "w").close()
    return os.path.join(out, "media.parquet")


def payload_mb(spark, path: str) -> float:
    b = spark.read.parquet(path).agg(F.sum(F.length("content"))).collect()[0][0]
    return round((b or 0) / 1e6, 1)


def main() -> None:
    skip_100x = "--skip-100x" in sys.argv
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    scales = [1, 10] + ([] if skip_100x else [100])

    audio = {s: build_audio(spark, BASE_CLIPS * s) for s in scales}
    mp4 = {s: build_mp4(spark, BASE_CLIPS * s) for s in scales}
    pgm = {s: build_pgm(spark, BASE_CLIPS * s) for s in scales}
    frv = {s: build_frv(spark, BASE_CLIPS * s) for s in scales}
    mb = {s: payload_mb(spark, audio[s]) for s in scales}
    # per-corpus payload at max scale, so every stage row gets a real
    # MB/s (resize reads PGM bytes, frame-sample FRV bytes, ...)
    smax0 = scales[-1]
    corpus_mb = {
        id(audio): mb[smax0],
        id(mp4): payload_mb(spark, mp4[smax0]),
        id(pgm): payload_mb(spark, pgm[smax0]),
        id(frv): payload_mb(spark, frv[smax0]),
    }

    #: (label, corpus dict, stage runner returning a materializable DF)
    stages = [
        (
            "audio_metadata (RIFF chunk walk)",
            audio,
            lambda df: A.audio_metadata(df),
        ),
        (
            "energy_windows (25 ms features)",
            audio,
            lambda df: A.energy_windows(df, window_ms=25),
        ),
        (
            "silence_trim (features + JVM agg)",
            audio,
            lambda df: A.silence_trim_plan(
                A.energy_windows(df, window_ms=25), threshold=10_000_000
            ),
        ),
        (
            "image dhash60 (fake decode)",
            audio,  # content-agnostic: hashes the same binary blobs
            lambda df: M.phash_column(df, fake=True),
        ),
        (
            "video_metadata (ISO-BMFF box walk)",
            mp4,
            lambda df: V.video_metadata(df),
        ),
        (
            "resize_pool 4x (PGM parse+pool+encode)",
            pgm,
            lambda df: M.resize_pool(df, factor=4),
        ),
        (
            "frame_sample /4 (FRV walk + slice)",
            frv,
            lambda df: V.frame_sample(df, every_n=4),
        ),
    ]

    lines = [
        "",
        f"Synthetic corpora: {BASE_CLIPS}/{BASE_CLIPS*10}"
        + ("" if skip_100x else f"/{BASE_CLIPS*100}")
        + f" WAV clips (~2-2.7 s PCM16 @ 8 kHz; {'/'.join(str(mb[s]) for s in scales)} MB"
        " payload), equal-count ~100 B MP4 stubs, 128x128 PGM rasters"
        " and 12-frame FRV containers. Wall seconds best-of-3 after an"
        " untimed warm pass, local[32]; MB/s = that corpus's payload"
        " bytes / wall at max scale.",
        "",
        "| stage | " + " | ".join(f"{s}x" for s in scales)
        + " | 10x growth | " + ("100x growth | " if not skip_100x else "")
        + "MB/s @ max |",
        "|---|" + "---|" * (len(scales) + (2 if not skip_100x else 1) + 1),
    ]
    for label, corpus, run in stages:
        ts = {}
        for s in scales:
            df = spark.read.parquet(corpus[s])
            run(df).count()  # untimed warm pass: page cache + Arrow
            release_all()    # worker spin-up are not the stage's cost
            ts[s] = best_of(lambda d=df: run(d).count())
        smax = scales[-1]
        vol = corpus_mb[id(corpus)]
        row = (
            f"| {label} | "
            + " | ".join(f"{ts[s]} s" for s in scales)
            + f" | {round(ts[10] / max(ts[1], 0.01), 1)}x |"
        )
        if not skip_100x:
            row += f" {round(ts[100] / max(ts[1], 0.01), 1)}x |"
        row += f" {round(vol / max(ts[smax], 0.01)) if vol else '-'} |"
        lines.append(row)
        print(lines[-1], flush=True)

    # --- packed-manifest path: full rematerialization vs partial read
    # (inline baseline measured BEFORE the pack write so both sides
    # see the same page-cache state; the 737 MB pack write right
    # before a parquet re-read skewed the first probe run 4x)
    smax = scales[-1]
    media = spark.read.parquet(audio[smax])
    t_inline = best_of(lambda: A.audio_metadata(media).count())
    pack_dir = os.path.join(
        staging_dir("mediaprobe", SF_ANCHOR), f"packs{BASE_CLIPS*smax}"
    )
    pmark = os.path.join(pack_dir, "_SUCCESS_pack")
    t0 = time.time()
    if not os.path.exists(pmark):
        MF.pack_media(media, pack_dir, n_packs=32)
        open(pmark, "w").close()
    t_pack = round(time.time() - t0, 2)
    man = spark.read.parquet(os.path.join(pack_dir, "manifest.parquet"))
    t_full = best_of(lambda: A.audio_metadata(MF.read_media(man)).count())
    t_part = best_of(
        lambda: A.audio_metadata(
            MF.read_media(man.where(F.col("media_id") % 100 == 0))
        ).count()
    )
    lines += [
        "",
        f"Packed-manifest path at {smax}x ({mb[smax]} MB payload, 32"
        f" packfiles; pack build {t_pack} s, one-off): inline"
        f" parquet-column parse {t_inline} s; manifest full"
        f" rematerialize + parse {t_full} s (worst case, every byte"
        f" seek-read); 1%-filtered partial read + parse {t_part} s --"
        " byte cost follows the FILTERED manifest, which is the"
        " pointer layout's contract (operators/manifest.py; ranged"
        " GETs at object-store scale).",
    ]
    print(lines[-1], flush=True)

    from tools.md_block import write_md_block

    body = (
        "## Measured multimodal scaling (tools/media_probe.py)\n"
        "\n"
        "Every media stage is one Arrow mapInPandas island, map-only\n"
        "(payload bytes never shuffle and never reach the driver), so\n"
        "the pass criterion is wall growth tracking payload bytes with\n"
        "roughly flat MB/s across a 100x sweep.\n"
        + "\n".join(lines)
    )
    write_md_block("/root/repo/SCALE.md", "media-probe", body)
    print("SCALE.md updated")


if __name__ == "__main__":
    main()
