"""Cheap construction of large literal arrays.

``F.array(*[F.lit(x) for x in xs])`` costs one Py4J round-trip per
element -- ~0.5 s of driver time for a 16x64 float matrix, ~1 s for
the 1024-dim classifier weight vector -- all before a single task
runs. One ``F.expr`` parse of the same values is single-digit
milliseconds, and Catalyst constant-folds the result into the exact
same literal the per-element form produces (verified by the parity
tests in tests/test_lits.py).

Scalars are rendered as SQL literals: floats get the ``D`` (double)
suffix, ints stay integral, strings are single-quoted with backslash
escaping (Spark's default string-literal mode). Values the renderer
can't express (NaN/inf, other types) make the helpers fall back to
the per-element path, so callers never need to pre-validate.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _render(x) -> str | None:
    if isinstance(x, bool):
        return None  # ambiguous downstream type; use the slow path
    if isinstance(x, str):
        return "'" + x.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if isinstance(x, int):
        return repr(x)
    if isinstance(x, float):
        return f"{x!r}D" if math.isfinite(x) else None
    try:  # numpy scalars
        import numpy as np

        if isinstance(x, np.integer):
            return repr(int(x))
        if isinstance(x, np.floating):
            xf = float(x)
            return f"{xf!r}D" if math.isfinite(xf) else None
    except ImportError:  # pragma: no cover
        pass
    return None


def array_lit(values) -> Column:
    """array<T> literal from ONE SQL parse (falls back to per-element
    ``F.lit`` for empty/unrenderable input)."""
    parts = [_render(v) for v in values]
    if not parts or any(p is None for p in parts):
        return F.array(*[F.lit(v) for v in values])
    return F.expr("array(" + ",".join(parts) + ")")


def matrix_lit(mat) -> Column:
    """array<array<double>> literal from ONE SQL parse. Rows pulled
    out with constant-index ``element_at`` are constant-folded back to
    plain array literals, so the executed plan matches the per-element
    construction exactly."""
    rows = []
    for row in mat:
        parts = [_render(float(x)) for x in row]
        if any(p is None for p in parts):
            return F.array(*[array_lit([float(x) for x in r]) for r in mat])
        rows.append("array(" + ",".join(parts) + ")")
    return F.expr("array(" + ",".join(rows) + ")")
