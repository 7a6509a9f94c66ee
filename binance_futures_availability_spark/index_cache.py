"""Session-lifetime corpus-index cache.

A real engine does not recompute its inverted index, signature table, or
quantized-vector store on every query — it builds the index artifact once
and serves queries from it. These handles are the in-session analogue for
the derived corpus artifacts the dedup/similarity/text operators share
(shingle arrays, MinHash signatures, SimHash fingerprints, quantized
embeddings): the first query over a source table pays the derivation and
``.persist()``-es it; every later query reuses the in-memory columnar form.
The fact-table twin of this idea is ``operators.availability._FACT_HANDLES``.

Keys capture BOTH the source files and the md5 of the canonicalized logical
plan, so ``docs`` vs ``docs.filter(...)`` — same files, different plan —
never share an entry, and a rewritten table (new file names) misses.
Non-file-backed DataFrames (in-memory test frames) are never cached: their
plans are cheap to recompute and their lifetimes are test-scoped.

Memory bound: one entry per (source table, artifact, params) actually used
in the session — bounded by the catalog, not by queries run.
``clear_indexes()`` releases everything (e.g. between benchmark phases).
"""

from __future__ import annotations

import hashlib
from typing import Callable

from pyspark.sql import DataFrame

_HANDLES: dict = {}


def plan_key(df: DataFrame, *extra):
    """Cache key for an index artifact derived from ``df``, or None when
    ``df`` is not file-backed (then caching is disabled for safety)."""
    try:
        files = tuple(sorted(df.inputFiles()))
        if not files:
            return None
        plan = df._jdf.queryExecution().analyzed().canonicalized().toString()
    except Exception:  # noqa: BLE001 — streaming/exotic plans: just don't cache
        return None
    return (files, hashlib.md5(plan.encode()).hexdigest(), *extra)


def cached_index(key, factory: Callable[[], DataFrame]) -> DataFrame:
    """Return the persisted index artifact for ``key``, building it via
    ``factory`` on first use. ``key=None`` bypasses the cache entirely."""
    if key is None:
        return factory()
    handle = _HANDLES.get(key)
    if handle is None:
        handle = factory().persist()
        _HANDLES[key] = handle
    return handle


def clear_indexes() -> None:
    """Unpersist and drop every cached index artifact."""
    while _HANDLES:
        _, handle = _HANDLES.popitem()
        try:
            handle.unpersist()
        except Exception:  # noqa: BLE001 — context may already be stopped
            pass
