"""Session-lifetime cache bookkeeping for operator-internal persists.

Several operators persist an intermediate relation that is consumed by
more than one Spark job (a strategy probe + the main computation, or a
count + the pipeline). The persisted DataFrame must outlive the
operator call -- the returned DataFrame is lazy -- so the operator
cannot unpersist in a ``finally``. Instead it registers the persist
here, and long-lived harnesses (verify / bench loops that run all 116
registry queries in one session) call :func:`release_all` between
queries so storage memory does not accumulate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for later bulk release."""
    df.persist()
    _TRACKED.append(df)
    return df


def release_all() -> int:
    """Unpersist every tracked DataFrame; returns how many were freed.

    Safe to call at any time: consumed results are unaffected (lineage
    recomputes if re-executed later), and double-release is a no-op.
    """
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 -- session may already be gone
            pass
    return n
