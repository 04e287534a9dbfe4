"""Time expressions with SQLite-compatible semantics.

The reference does all time bucketing with SQLite ``strftime`` /
``julianday`` / ``DATE`` over string timestamps (exper_sql.py:236-244,
create_views.sql:40,59-71). Parity traps handled here (SURVEY §7
hard-part #1):

* ``strftime('%w')`` is 0=Sunday..6=Saturday; Spark ``dayofweek`` is
  1=Sunday..7=Saturday -> ``sqlite_dow`` subtracts 1.
* ``julianday(t2)-julianday(t1)`` fractional-day arithmetic ->
  integer epoch-microsecond subtraction (exact, no float drift).
* Session timezone is pinned to UTC (session.py) so ``hour``/``date``
  bucketing matches the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def sqlite_dow(ts: Column | str) -> Column:
    """Day of week, 0=Sunday..6=Saturday (SQLite ``strftime('%w')``)."""
    return (F.dayofweek(_c(ts)) - F.lit(1)).cast("int")


def hour_bucket(ts: Column | str) -> Column:
    """Hour of day 0..23 (SQLite ``strftime('%H')`` as int)."""
    return F.hour(_c(ts)).cast("int")


def month_bucket(ts: Column | str) -> Column:
    """Month bucket 'YYYY-MM' (SQLite ``strftime('%Y-%m')``)."""
    return F.date_format(_c(ts), "yyyy-MM")


def epoch_micros(ts: Column | str) -> Column:
    """Exact integer microseconds since epoch (no float drift)."""
    return F.unix_micros(_c(ts))


def gap_seconds(t1: Column | str, t2: Column | str) -> Column:
    """(t2 - t1) in seconds as double, via exact integer micros.

    Replaces the reference's ``(julianday(t2)-julianday(t1))*24*60*60``
    (create_views.sql:40, advanced_queries.sql:100-118) with
    drift-free integer math.
    """
    return (epoch_micros(t2) - epoch_micros(t1)) / F.lit(1_000_000.0)
