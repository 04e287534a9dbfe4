"""Named-query registry: the driver-facing catalog of every implemented
operator (SURVEY.md §2), each with its DuckDB oracle SQL.

Importing this package loads every query module, which registers its
queries into ``REGISTRY``; ``__spark_entry__.py`` exposes them.
"""

from conversation_analysis_tools_spark.queries.registry import REGISTRY, register, Query

# Import for registration side effects -- order matters only for
# readability of the registry listing.
from conversation_analysis_tools_spark.queries import relational  # noqa: F401
from conversation_analysis_tools_spark.queries import nlp  # noqa: F401
from conversation_analysis_tools_spark.queries import dedup  # noqa: F401
from conversation_analysis_tools_spark.queries import textstats  # noqa: F401
from conversation_analysis_tools_spark.queries import similarity  # noqa: F401
from conversation_analysis_tools_spark.queries import iterative  # noqa: F401
from conversation_analysis_tools_spark.queries import streaming  # noqa: F401
from conversation_analysis_tools_spark.queries import multimodal  # noqa: F401
from conversation_analysis_tools_spark.queries import sampling  # noqa: F401
from conversation_analysis_tools_spark.queries import behavior  # noqa: F401
from conversation_analysis_tools_spark.queries import audit  # noqa: F401
from conversation_analysis_tools_spark.queries import retrieval  # noqa: F401

__all__ = ["REGISTRY", "register", "Query"]
