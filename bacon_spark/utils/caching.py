"""Session-scoped ownership for operator-internal persists.

Several operators persist an intermediate frame that the RETURNED lazy
plan still reads (q139's quantized corpus, q140's token frame, the
shingle frame inside :func:`bacon_spark.llm.dedup.canonical_dedup_scalable`).
Unpersisting inside the operator would recompute the frame when the
caller finally executes the plan — defeating the persist — but never
unpersisting leaks executor/driver memory across a long session
(measured pre-round-4: tail queries in a 150-query bench ran 2-6x
slower from accumulated cache + GC pressure).

Ownership contract: operators register every persisted frame here via
:func:`managed_persist`; whoever owns the session calls
:func:`release_caches` once the results have been materialized.
``bench.py`` and ``tools/check_oracle.py`` call it after every query;
an interactive user composing operators calls
``bacon_spark.release_caches()`` between pipelines.

The registry is deliberately a plain list of DataFrame handles (not a
WeakSet): the JVM-side cache outlives the Python object, so dropping
the handle on GC would orphan the cache entry — the exact leak this
module exists to prevent.
"""

from __future__ import annotations

from typing import List

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_MANAGED: List[DataFrame] = []


def managed_persist(
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """``df.persist(level)`` + registration for :func:`release_caches`."""
    df.persist(level)
    _MANAGED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every frame registered via :func:`managed_persist`.

    Safe to call with a stopped session (errors are swallowed — there is
    nothing left to leak). Returns the number of frames released."""
    n = 0
    while _MANAGED:
        df = _MANAGED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
