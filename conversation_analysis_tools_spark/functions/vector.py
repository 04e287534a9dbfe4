"""Dense-vector expressions over ``array<float>`` embedding columns.

The reference computes dense cosine with numpy (sql_search.py:2227-2236)
over TF-IDF vectors; here the same math is a higher-order-function
column expression (``zip_with`` + ``aggregate``) that runs JVM-side --
no Python crossing, broadcastable, codegen-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_expr(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<numeric> columns (double)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a: Column | str) -> Column:
    """L2 norm of an array<numeric> column (double)."""
    sq = F.aggregate(
        _c(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )
    return F.sqrt(sq)


def cosine_expr(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either norm is 0 (reference's
    zero-guard, pipeline/duplicate_detector.py:101-105)."""
    na, nb = norm_expr(a), norm_expr(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(
        dot_expr(a, b) / (na * nb)
    )
