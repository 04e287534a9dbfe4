"""Chart-adapter surface (exper_sql.py:344-355, sql_search.py:1251-1290):
specs are bounded, deterministic, serializable; ascii render works
without matplotlib."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from conversation_analysis_tools_spark.sources import charts as CH


def test_chart_spec_bounded_and_ordered(spark):
    df = spark.range(0, 2005).select(
        (F.col("id") % 5).alias("grp")
    ).groupBy("grp").agg(F.count("*").alias("n"))
    spec = CH.chart_spec(df, "bar", "grp", "n", limit=3)
    assert spec["x"] == [0, 1, 2] and spec["truncated"] is True
    full = CH.chart_spec(df, "bar", "grp", "n")
    assert full["x"] == [0, 1, 2, 3, 4]
    assert all(v == 401 for v in full["y"])
    json.loads(CH.spec_json(full))  # serializable


def test_render_ascii_shape():
    spec = {"kind": "bar", "title": "t", "x_label": "x", "y_label": "y",
            "x": ["a", "b"], "y": [10, 5], "truncated": False}
    out = CH.render_ascii(spec, width=10)
    lines = out.splitlines()
    assert lines[0] == "t"
    assert lines[1].count("#") == 10 and lines[2].count("#") == 5


def test_search_result_panels(spark, sample_docs):
    res = sample_docs.withColumn("source", F.lit("src0")).withColumn(
        "lang", F.lit("en")
    )
    panels = CH.search_result_panels(res)
    assert set(panels) == {"by_source", "over_ids", "top_terms", "by_lang"}
    assert panels["by_source"]["y"][0] == res.count()
    assert len(panels["top_terms"]["x"]) <= 15
    # every panel renders without matplotlib
    for spec in panels.values():
        assert CH.render_ascii(spec)


def test_render_png_import_gate(spark, tmp_path):
    """The optional-dep path: renders a PNG when matplotlib is
    installed, raises the documented NotImplementedError when not --
    either way the gate itself is exercised."""
    import pytest

    from conversation_analysis_tools_spark.sources import charts as CH

    df = spark.createDataFrame([("a", 1), ("b", 3)], ["k", "n"])
    spec = CH.chart_spec(df, "bar", "k", "n", title="t")
    out = str(tmp_path / "chart.png")
    try:
        import matplotlib  # noqa: F401

        has_mpl = True
    except ImportError:
        has_mpl = False
    if has_mpl:
        p = CH.render_png(spec, out)
        import os

        assert os.path.getsize(p) > 0
    else:
        with pytest.raises(NotImplementedError):
            CH.render_png(spec, out)
