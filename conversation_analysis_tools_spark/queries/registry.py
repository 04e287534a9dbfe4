"""Registry plumbing for named queries.

Each query is a callable ``(spark, sf_dir) -> DataFrame`` plus an
optional ANSI-SQL oracle string that DuckDB runs on the same parquet
tables. Column names are aliased identically on both sides (the
driver's comparison sorts columns by name before hashing).

Float discipline: aggregate/computed float columns are rounded to a
fixed number of decimals on BOTH sides (``round(x, 4)`` in Spark and in
the oracle SQL) so that summation-order differences between engines
(last-ulp noise) cannot flip the value hash. Raw column passthroughs
are never rounded. For averages/ratios of EXACT quantities (cents,
microseconds, counts), ``round()`` itself is unsafe -- integer ratios
land exactly on .00005 boundaries where Spark and DuckDB round
differently -- so those use ``functions/numeric.avg4``/``avg4_sql``:
integer half-up rounding via ``floor((2s+d)/(2d))``, bit-identical on
both engines at any summation order. Transcendental results (logs,
cosines) stay on plain ``round``: their boundary set has measure zero.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # None -> rows-only check (non-SQL-expressible)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a named query with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco
