"""Cache lifecycle for persisted operator intermediates.

Several operators persist() an intermediate DataFrame that feeds multiple
consumers in the same plan (the ngram inverted index, MinHash band table,
rollup levels).  The persist MUST outlive the caller's consuming action, so
the operator cannot unpersist it itself — but a long-lived session that
invokes these operators repeatedly would otherwise accumulate executor
storage memory without bound.

Contract: callers own cache lifecycle.  Every operator-internal persist()
is registered here; after the consuming action, call
:func:`release_tracked` (idempotent) to unpersist everything at once.
``bench.py`` and the test-suite fixtures do exactly that between queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Strong refs on purpose: a JVM-side persist outlives its Python wrapper
# (dropping the DataFrame object does NOT unpersist the cached plan), so
# the registry must hold the handle needed to free it later.
_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """persist() ``df`` and register it for later :func:`release_tracked`."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked intermediate; returns the count released."""
    n = 0
    for df in _TRACKED:
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    _TRACKED.clear()
    return n


def tracked_mark() -> int:
    """Position marker for :func:`release_after` — lets library code
    that runs inside a loop (e.g. a foreachBatch sink) free ONLY the
    intermediates its own body tracked, without touching caches an
    application holds across the loop."""
    return len(_TRACKED)


def release_after(mark: int) -> int:
    """Unpersist every intermediate tracked AFTER ``mark`` (a value
    from :func:`tracked_mark`); returns the count released."""
    n = 0
    for df in _TRACKED[mark:]:
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    del _TRACKED[mark:]
    return n
