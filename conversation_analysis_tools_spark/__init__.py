"""PySpark-native analytics engine with the query and data-processing
capabilities of CrazyDubya/conversation-analysis-tools, re-architected
Spark-first (DataFrame/SQL + Catalyst + Structured Streaming).

Layout:
    session     -- SparkSession factory tuned for the target scale
    catalog     -- parquet table loader / temp-view registration
    functions/  -- shared column-expression library (text, time, vector)
    operators/  -- relational + NLP + dedup/similarity operators
    sources/    -- conversation-export ingest (Claude / ChatGPT JSON)
    plans/      -- plan-audit helpers (pushdown / broadcast / codegen)
    streaming/  -- Structured Streaming extensions over event tables
"""

from conversation_analysis_tools_spark.session import get_spark
from conversation_analysis_tools_spark.catalog import load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views"]
__version__ = "0.1.0"
