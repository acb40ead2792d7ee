"""Bounded-liveness persist tracking (ADVICE r09).

Operators that persist an internal frame (a dup-digest set, a batch's
decoded hashes) have no natural place to unpersist it — the caller
consumes a lazy DataFrame built over the cache. Leaving the handles
live accumulates one cached relation per call in a long-lived session
(bench loops, streaming drivers) with nothing but a blanket
``spark.catalog.clearCache()`` to free them. The registry here bounds
liveness to "the latest call per scope": each tracked call first
evicts (non-blocking) whatever its scope tracked before. A caller that
interleaves two calls before consuming either only loses the speedup —
the evicted plan recomputes — never correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: dict[str, list[DataFrame]] = {}


def evict_tracked(scope: str) -> None:
    """Unpersist (non-blocking) everything ``scope`` tracked."""
    for cached in _TRACKED.get(scope, ()):
        try:
            cached.unpersist(blocking=False)
        except Exception:  # session already stopped — nothing to free
            pass
    _TRACKED[scope] = []


def persist_tracked(scope: str, df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for eviction by the next
    ``evict_tracked(scope)`` call."""
    _TRACKED.setdefault(scope, []).append(df.persist())
    return df
