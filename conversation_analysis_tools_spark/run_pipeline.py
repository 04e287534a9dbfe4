"""CLI for the content-analysis pipeline -- the Spark counterpart of
the reference's ``run_pipeline.py`` (reference run_pipeline.py:29-66:
``--config/--db/--platform/--limit/--output/--no-save-db``).

Reads the SAME YAML config shape as the reference's
``config/pipeline_config.yaml`` (keywords, relevance.weights,
summarizer, duplicate_threshold, priority.*, processing, output) and
maps it onto :mod:`conversation_analysis_tools_spark.pipeline`.

Usage::

    python -m conversation_analysis_tools_spark.run_pipeline \
        --data /root/testdata/sf0.001 --config my_config.yaml \
        --limit 1000 --output /tmp/results

``--output`` writes analysis_results as parquet (``.json`` suffix
switches to a JSON-lines directory -- the reference writes one JSON
file; a distributed engine writes a directory of parts). ``--master``
defaults to the local session factory; on a cluster leave it unset
and launch through ``spark-submit``, which provides the master.
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Any


def load_reference_config(raw: dict) -> dict[str, Any]:
    """Map the reference's pipeline_config.yaml shape
    (config/pipeline_config.yaml:1-99) onto run_content_pipeline's
    config keys. Missing sections fall back to DEFAULT_CONFIG."""
    cfg: dict[str, Any] = {}
    if "keywords" in raw:
        cfg["keywords"] = list(raw["keywords"])
    rel = raw.get("relevance", {})
    if "weights" in rel:
        cfg["relevance_weights"] = dict(rel["weights"])
    summ = raw.get("summarizer", {})
    if "damping" in summ:
        cfg["textrank_damping"] = float(summ["damping"])
    if "summary_sentences" in summ:
        cfg["summary_top_k"] = int(summ["summary_sentences"])
    if "duplicate_threshold" in raw:
        cfg["duplicate_threshold"] = float(raw["duplicate_threshold"])
    prio = raw.get("priority", {})
    if "weights" in prio:
        cfg["priority_weights"] = dict(prio["weights"])
    kw = prio.get("keyword_thresholds", {})
    if "critical_keywords" in kw:
        cfg["critical_keywords"] = list(kw["critical_keywords"])
    if "high_keywords" in kw:
        cfg["high_keywords"] = list(kw["high_keywords"])
    proc = raw.get("processing", {})
    if "skip_duplicates" in proc:
        cfg["remove_duplicates"] = bool(proc["skip_duplicates"])
    return cfg


def main(argv: list[str] | None = None) -> dict:
    """Run the pipeline; returns the stats row as a dict (also printed
    as one JSON line, mirroring the reference's summary print)."""
    p = argparse.ArgumentParser(description="Run the content-analysis pipeline")
    p.add_argument("--config", default=None, help="reference-shape YAML config")
    p.add_argument(
        "--data",
        default="/root/testdata/sf0.001",
        help="table directory holding documents.parquet",
    )
    p.add_argument("--limit", type=int, default=None, help="first N docs by id")
    p.add_argument("--output", default=None, help="results path (.json => JSONL dir)")
    p.add_argument("--no-save", action="store_true", help="skip writing results")
    p.add_argument("--master", default=None, help="Spark master override")
    args = p.parse_args(argv)

    cfg: dict[str, Any] = {}
    if args.config:
        import yaml  # baked-in dep; the reference uses the same loader

        with open(args.config) as f:
            cfg = load_reference_config(yaml.safe_load(f) or {})

    from conversation_analysis_tools_spark.catalog import table
    from conversation_analysis_tools_spark.pipeline import run_content_pipeline
    from conversation_analysis_tools_spark.session import get_spark

    spark = get_spark(master=args.master)
    docs = table(spark, "documents", args.data)
    if args.limit:
        docs = docs.orderBy("doc_id").limit(args.limit)

    out = run_content_pipeline(docs, cfg)
    if args.output and not args.no_save:
        results = out["analysis_results"]
        if args.output.endswith(".json"):
            results.write.mode("overwrite").json(args.output)
        else:
            results.write.mode("overwrite").parquet(args.output)

    stats = out["stats"].first().asDict()
    print(json.dumps(stats))
    return stats


if __name__ == "__main__":
    main(sys.argv[1:])
