"""Analysis-visualization adapter (exper_sql.py:344-355's ~20 charts;
sql_search.py:1251-1290 analyze_search_results).

Spark-first split of responsibilities: every chart the reference draws
is an AGGREGATE (value_counts, histogram, time buckets, top terms) --
the engine computes those as DataFrames (bounded output), and this
module only adapts the collected aggregate into a chart:

* :func:`chart_spec` -- a plain serializable dict (kind/x/y/series),
  the artifact a dashboard or notebook renders; collecting it is safe
  because the input is already grouped (cardinality = #groups).
* :func:`render_png` -- matplotlib rendering, import-gated (the lib
  is optional; without it you still get the spec + ASCII form).
* :func:`render_ascii` -- terminal bar chart, mirroring the
  reference's print-based result displays.
* :func:`search_result_panels` -- the 2x2 analyze_search_results
  grid (results by source, over time, top terms, language mix) as
  four specs computed in ONE pass over the result DataFrame each.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Cap on chart categories -- a chart with more bars than this is a
#: table, and an unbounded collect is a bug, not a chart.
MAX_POINTS = 1000


def chart_spec(
    df: DataFrame,
    kind: str,
    x: str,
    y: str,
    title: str = "",
    limit: int = MAX_POINTS,
) -> dict:
    """Collect an aggregated DataFrame into a serializable chart spec.

    ``df`` must already be grouped/aggregated; rows beyond ``limit``
    are dropped deterministically (ordered by x) and counted in
    ``truncated``.
    """
    rows = df.select(x, y).orderBy(x).limit(limit + 1).collect()
    truncated = len(rows) > limit
    rows = rows[:limit]
    return {
        "kind": kind,
        "title": title or f"{y} by {x}",
        "x_label": x,
        "y_label": y,
        "x": [r[x] for r in rows],
        "y": [r[y] for r in rows],
        "truncated": truncated,
    }


def spec_json(spec: dict) -> str:
    """Chart spec as JSON (timestamps/dates stringified)."""
    return json.dumps(spec, default=str)


def render_ascii(spec: dict, width: int = 40) -> str:
    """Terminal bar chart (the reference prints result tables to the
    terminal; this is the same surface for aggregates)."""
    ys = [float(v) if v is not None else 0.0 for v in spec["y"]]
    top = max(ys, default=0.0) or 1.0
    lines = [spec["title"]]
    for xv, yv in zip(spec["x"], ys):
        bar = "#" * max(0, round(width * yv / top))
        lines.append(f"{str(xv)[:20]:>20} | {bar} {yv:g}")
    if spec.get("truncated"):
        lines.append(f"... truncated to {len(ys)} points")
    return "\n".join(lines)


def render_png(spec: dict, path: str) -> str:
    """matplotlib rendering, import-gated (optional dependency)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover - lib absent in CI
        raise NotImplementedError(
            "render_png requires matplotlib; use spec_json/render_ascii "
            "or render the spec in a notebook"
        ) from e
    fig, ax = plt.subplots(figsize=(8, 5))
    if spec["kind"] == "line":
        ax.plot(spec["x"], spec["y"])
    else:
        ax.bar([str(v) for v in spec["x"]], spec["y"])
        ax.tick_params(axis="x", rotation=45)
    ax.set_title(spec["title"])
    ax.set_xlabel(spec["x_label"])
    ax.set_ylabel(spec["y_label"])
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path


def search_result_panels(
    results: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    lang_col: str = "lang",
    top_terms: int = 15,
) -> dict[str, dict]:
    """The analyze_search_results 2x2 grid (sql_search.py:1263-1280)
    over a search-result DataFrame: distribution by source, result
    volume over doc_id (the corpus has no timestamp column; the
    reference buckets created_at), top non-stopword terms, language
    mix. Each panel is one aggregate -> one bounded spec."""
    from conversation_analysis_tools_spark.functions.text import tokens_expr

    cols = set(results.columns)
    panels: dict[str, dict] = {}

    if source_col in cols:
        by_source = results.groupBy(source_col).agg(F.count("*").alias("n"))
        panels["by_source"] = chart_spec(
            by_source, "bar", source_col, "n", "Results by source"
        )
    if "doc_id" in cols:
        buckets = results.select(
            (F.col("doc_id") - F.col("doc_id") % 100).alias("doc_bucket")
        ).groupBy("doc_bucket").agg(F.count("*").alias("n"))
        panels["over_ids"] = chart_spec(
            buckets, "line", "doc_bucket", "n", "Results across the corpus"
        )
    if text_col in cols:
        terms = (
            results.select(F.explode(tokens_expr(text_col)).alias("term"))
            .groupBy("term")
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "term")
            .limit(top_terms)
        )
        panels["top_terms"] = chart_spec(terms, "bar", "term", "n", "Common terms")
    if lang_col in cols:
        by_lang = results.groupBy(lang_col).agg(F.count("*").alias("n"))
        panels["by_lang"] = chart_spec(
            by_lang, "bar", lang_col, "n", "Language distribution"
        )
    return panels
