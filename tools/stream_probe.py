"""Streaming THROUGHPUT probe (VERDICT r9 item 6): the streaming
queries are oracle-verified on finite drains, but none published
rows/s, per-batch latency, or how the per-batch store grows -- and
store growth is the real at-scale risk for the two streams that keep
one (the curation funnel's fp store and the near-dup admission's
shingle/band store; both are O(admitted corpus) by contract).

Method: stage the documents table as N doc_id-ordered range files
(the queries' own _stage_ordered_docs, just with more batches), drain
them through the SAME foreachBatch folds the certified queries run
(streaming/curation.fold_curation_batch,
streaming/neardup.fold_neardup_batch -- shared definitions, so the
probe can never measure a different pipeline than the one the oracle
gate certifies), and read per-batch wall from the streaming query's
own progress events. Reported per stream:

* rows/s over the whole drain (input rows / sum of batch walls);
* per-batch trigger wall p50 / p95 (fixed micro-batch overhead shows
  up here; a GROWING batch wall over a flat batch size is the
  store-join cost curving up);
* the store-size-vs-batch curve (cumulative admitted rows per batch
  partition) next to each batch's wall -- the adjudication column: a
  per-batch wall that stays flat while the store grows 20x means the
  cross-batch anti-join/band-join is partition-pruned as designed;
  a wall tracking store size means state leaked into the per-batch
  cost.

Results land in tools/stream_results.json and the SCALE.md block
between the ``stream-probe`` markers.

Usage: python tools/stream_probe.py [--batches 20]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

RESULTS = "/root/repo/tools/stream_results.json"

#: Per-stream corpus: the curation funnel runs on the SATURATED
#: 31-word-vocab corpus (its docs pass the Gopher stopword/length
#: gates, and long docs share token-SET fingerprints, so the fp store
#: actually exercises cross-batch admission); the near-dup admission
#: runs on the RICH 4096-word corpus (near-dups rare -> ~everything
#: admits -> the store grows to the full corpus, the state-growth
#: stress the probe exists to measure).
CORPORA = {
    "curation_funnel": ("/root/repo/testdata_sf1", ["--sf", "1"]),
    "neardup_admission": (
        "/root/repo/testdata_sf1rich",
        ["--sf", "1", "--docs-only", "--vocab", "4096"],
    ),
}


def _ensure_corpus(d: str, gen_args: list[str]) -> None:
    if os.path.isdir(d):
        return
    subprocess.run(
        [sys.executable, "/root/repo/tools/gen_testdata.py"]
        + gen_args + ["--out", d],
        check=True,
    )


def _drain(spark, src: str, store: str, fold) -> list[dict]:
    """Run one availableNow drain with per-batch progress capture;
    returns the progress rows (batch wall ms + input rows)."""
    from conversation_analysis_tools_spark.streaming.events import scoped_session

    s2 = scoped_session(spark, 8)
    # recentProgress retains only numRecentProgressUpdates entries
    # (default 100): raise it so a long drain keeps EVERY batch's
    # trigger wall -- dropping the earliest batches would silently
    # inflate rows/s and hide early-vs-late wall growth
    s2.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")
    stream = (
        s2.readStream.schema("doc_id bigint, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(store, "_ckpt"))
        .start()
    )
    if not q.awaitTermination(1800):
        q.stop()
        raise RuntimeError("drain did not finish in 30 min")
    return [
        {
            "batch": p.batchId,
            "rows": p.numInputRows,
            "ms": p.durationMs["triggerExecution"],
        }
        for p in q.recentProgress
        if p.numInputRows > 0
    ]


def _store_curve(spark, path: str) -> list[int]:
    """Cumulative admitted-row count per batch partition."""
    if not os.path.exists(path):
        return []
    per = {
        int(r["batch"]): int(r["n"])
        for r in spark.read.parquet(path)
        .groupBy("batch")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    out, cum = [], 0
    for b in sorted(per):
        cum += per[b]
        out.append(cum)
    return out


def _summarize(
    name: str, prog: list[dict], curve: list[int], total_rows: int
) -> dict:
    # total_rows comes from the staged corpus, NOT sum(numInputRows):
    # a foreachBatch fold whose persist materializes after the first
    # action scans the source twice, and the file source's
    # numInputRows metric double-counts those scans
    walls = sorted(p["ms"] for p in prog)
    total_ms = sum(p["ms"] for p in prog)
    n = len(walls)
    rec = {
        "batches": n,
        "rows": total_rows,
        "rows_per_sec": round(total_rows / (total_ms / 1000.0), 1),
        "batch_ms_p50": walls[n // 2],
        "batch_ms_p95": walls[min(n - 1, int(n * 0.95))],
        "batch_ms_first": prog[0]["ms"],
        "batch_ms_last": prog[-1]["ms"],
        "store_rows_final": curve[-1] if curve else 0,
        "store_curve": curve,
    }
    print(name, json.dumps(rec), flush=True)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=20)
    args = ap.parse_args()
    for d, gen_args in CORPORA.values():
        _ensure_corpus(d, gen_args)

    from conversation_analysis_tools_spark.queries.streaming import (
        _stage_ordered_docs,
    )
    from conversation_analysis_tools_spark.queries.textstats import _v2_gop
    from conversation_analysis_tools_spark.session import get_spark
    from conversation_analysis_tools_spark.streaming.curation import (
        fold_curation_batch,
    )
    from conversation_analysis_tools_spark.streaming.neardup import (
        fold_neardup_batch,
    )

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    state: dict = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            state = json.load(f)
    state["corpora"] = {k: v[0] for k, v in CORPORA.items()}
    state["batches_requested"] = args.batches

    # --- curation funnel ------------------------------------------------
    # The synthetic vocabularies carry only one Gopher stopword, so the
    # certified funnel's quality gate (>= 2 distinct stopwords) passes
    # NOTHING on any generated corpus -- correct per the oracle, but a
    # degenerate throughput measurement (an empty fp store exercises no
    # cross-batch admission). The probe therefore appends a stopword
    # tail to every doc before staging: ~half the corpus (the n_words
    # >= 50 slice) then survives to the admission join, and the
    # saturated vocabulary's shared token SETS make the fp store's
    # cross-batch anti-join actually drop rows.
    corpus = CORPORA["curation_funnel"][0]
    amended = os.path.join(
        os.path.dirname(RESULTS), "..", "testdata_sf1gop"
    )
    amended = os.path.abspath(amended)
    if not os.path.isdir(amended):
        os.makedirs(amended)
        from conversation_analysis_tools_spark.catalog import table as _table

        _table(spark, "documents", corpus).select(
            "doc_id",
            "source",
            F.concat(F.col("text"), F.lit(" to of and that")).alias("text"),
            "lang",
            "n_chars",
        ).coalesce(4).write.mode("overwrite").parquet(
            os.path.join(amended, "documents.parquet")
        )
    d, src = _stage_ordered_docs(
        spark, amended, "probe_stream_curation",
        ["doc_id", "source", "text"], n_files=args.batches,
    )
    n_docs = spark.read.parquet(src).count()
    store = os.path.join(d, "store")
    shutil.rmtree(store, ignore_errors=True)
    prog = _drain(
        spark, src, store,
        lambda bdf, bid: fold_curation_batch(
            bdf, bid, store, lambda b: _v2_gop(b, cache=False)
        ),
    )
    state["curation_funnel"] = _summarize(
        "curation_funnel", prog,
        _store_curve(spark, os.path.join(store, "fps")), n_docs,
    )

    # --- near-dup admission ----------------------------------------------
    corpus = CORPORA["neardup_admission"][0]
    d, src = _stage_ordered_docs(
        spark, corpus, "probe_stream_neardup",
        ["doc_id", "source", "text"], n_files=args.batches,
    )
    n_docs = spark.read.parquet(src).count()
    store = os.path.join(d, "store")
    shutil.rmtree(store, ignore_errors=True)
    prog = _drain(
        spark, src, store,
        lambda bdf, bid: fold_neardup_batch(
            bdf.select("doc_id", "text"), bid, store, 0.2
        ),
    )
    state["neardup_admission"] = _summarize(
        "neardup_admission", prog,
        _store_curve(spark, os.path.join(store, "arrs")), n_docs,
    )

    with open(RESULTS, "w") as f:
        json.dump(state, f, indent=1)
    _write_block(state)
    print("SCALE.md stream-probe block updated")


def _write_block(state: dict) -> None:
    def row(name: str, key: str) -> str:
        r = state[key]
        curve = r["store_curve"]
        spark_note = (
            f"{curve[0]} -> {curve[-1]}" if curve else "(empty)"
        )
        return (
            f"| {name} | {r['batches']} | {r['rows']} | {r['rows_per_sec']} "
            f"| {r['batch_ms_p50']} / {r['batch_ms_p95']} ms "
            f"| {r['batch_ms_first']} -> {r['batch_ms_last']} ms "
            f"| {spark_note} |"
        )

    corp = state.get("corpora", {})
    lines = [
        "",
        f"Corpora (50k docs each): curation funnel on "
        f"`{corp.get('curation_funnel')}` (saturated vocab, a stopword "
        "tail appended probe-side so the certified Gopher gate passes "
        "the n_words >= 50 slice and the shared token-set fingerprints "
        "exercise cross-batch admission); near-dup admission on "
        f"`{corp.get('neardup_admission')}` (rich vocab -- near-dups "
        "rare, ~everything admits: the state-growth stress). Staged as "
        f"{state['batches_requested']} doc_id-ordered files, one file "
        "per micro-batch (availableNow drain); walls are the streaming "
        "engine's own triggerExecution durations.",
        "",
        "| stream | batches | rows | rows/s | batch wall p50 / p95 "
        "| first -> last batch wall | store rows (cumulative) |",
        "|---|---|---|---|---|---|---|",
        row("curation funnel (fp store)", "curation_funnel"),
        row("near-dup admission (shingle+band store)", "neardup_admission"),
        "",
    ]
    from tools.md_block import write_md_block

    write_md_block("/root/repo/SCALE.md", "stream-probe", "\n".join(lines))


if __name__ == "__main__":
    main()
