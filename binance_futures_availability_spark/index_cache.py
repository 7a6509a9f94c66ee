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
in the session — bounded by the catalog, not by queries run — AND a byte
budget (``INDEX_CACHE_BUDGET_BYTES``): on every miss insert the registry
polls the JVM's persisted-block footprint and evicts least-recently-USED
handles until the total fits (hits refresh recency). A 166-query catalog
accumulates ~a dozen corpus artifacts (span stream, inverted index, kNN
graph, quantized vectors…); entry-count bounds alone let their BYTES grow
with the catalog on a long-lived session.
``clear_indexes()`` releases everything (e.g. between benchmark phases).
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable

from pyspark.sql import DataFrame

_HANDLES: dict = {}

#: Total persisted-storage budget (bytes) above which miss inserts evict
#: least-recently-used index handles. Counts ALL persisted blocks in the
#: session (fact handles and tracked scoped persists included — they share
#: the same storage pool), but only keyed index handles are evictable.
#: Default 8 GiB — generous for a single-node session, a rounding error
#: for a cluster (override via SPARK_GRAFT_INDEX_CACHE_BYTES; executors
#: sized for 100 TB set it to a fraction of aggregate storage memory).
INDEX_CACHE_BUDGET_BYTES = int(
    os.environ.get("SPARK_GRAFT_INDEX_CACHE_BYTES", str(8 << 30))
)


def storage_bytes(spark) -> int:
    """Total bytes (memory + disk) of every persisted block in the
    session, from the driver's RDDStorageInfo — one py4j call, no job."""
    try:
        return sum(
            i.memSize() + i.diskSize()
            for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        )
    except Exception:  # noqa: BLE001 — context stopped / exotic backend
        return 0


#: Bytes persisted by NON-evictable owners (fact handles, tracked scoped
#: persists) observed the last time evicting every keyed handle still left
#: the session over budget. storage_bytes() counts the whole session pool,
#: so without this floor a foreign footprint larger than the budget makes
#: every miss insert evict the entire index cache down to the inserted key
#: — silent thrash of exactly the warm artifacts the catalog depends on
#: (r11 advice). Budget checks subtract the floor; it resets whenever the
#: session footprint drops below it (foreign blocks were released).
_FOREIGN_FLOOR = 0

#: Observability: number of times eviction exhausted every evictable
#: handle while the session stayed over budget (i.e. the overage was not
#: attributable to the index cache). Non-zero means the budget is sized
#: below the session's non-evictable persists.
EVICTION_STALLS = 0


def _attributable_bytes(spark) -> int:
    """Session persisted footprint minus the recorded non-evictable
    floor — the portion of the pool the index cache can actually free."""
    global _FOREIGN_FLOOR
    total = storage_bytes(spark)
    if total < _FOREIGN_FLOOR:
        _FOREIGN_FLOOR = 0  # foreign blocks released; stop discounting
    return total - _FOREIGN_FLOOR


def _evict_over_budget(spark, keep_key) -> int:
    """Unpersist least-recently-used index handles until the session's
    ATTRIBUTABLE persisted footprint fits the budget. ``keep_key`` (the
    entry being inserted) is never evicted — a new artifact must not
    evict itself before first use. Returns the number of evictions.
    Freshly inserted, not-yet-materialized handles report 0 bytes, so the
    budget reacts one insert late — steady state is bounded by budget +
    one artifact. If evicting every evictable handle still leaves the
    session over budget, the residual is non-evictable (fact handles,
    scoped persists): it is recorded as the foreign floor and discounted
    from later checks, so a big foreign footprint degrades to a smaller
    effective index budget instead of evict-everything thrash."""
    global _FOREIGN_FLOOR, EVICTION_STALLS
    # Decay the floor on every miss insert: it was measured at one
    # stall instant, and only a total-below-floor drop resets it — if
    # foreign blocks shrink while index handles grow, total stays above
    # the stale-high floor forever and the discount lets the cache
    # under-evict past the budget indefinitely. Geometric decay
    # (-12.5%/insert) converges the discount back toward zero; if the
    # foreign footprint is genuinely still large, the next stall
    # re-measures it at the true current value.
    _FOREIGN_FLOOR -= _FOREIGN_FLOOR >> 3
    n = 0
    while (
        len(_HANDLES) > 1
        and _attributable_bytes(spark) > INDEX_CACHE_BUDGET_BYTES
    ):
        victim = next((k for k in _HANDLES if k != keep_key), None)
        if victim is None:
            break
        handle = _HANDLES.pop(victim)
        try:
            handle.unpersist(blocking=True)
        except Exception:  # noqa: BLE001
            pass
        n += 1
    if (
        len(_HANDLES) <= 1
        and n
        and _attributable_bytes(spark) > INDEX_CACHE_BUDGET_BYTES
    ):
        EVICTION_STALLS += 1
        _FOREIGN_FLOOR = storage_bytes(spark)
    return n


def is_file_backed(df: DataFrame) -> bool:
    """True when ``df`` reads identifiable files (directly or through a
    hot-pinned catalog handle's ``_spark_graft_source``) — i.e. when
    ``plan_key`` would return a real key and derived artifacts may cache.
    Use this for BRANCHING on cacheability (advisor r14): probing with
    ``plan_key(df, "<some-tag>")`` works only because the result is
    discarded, pays a JVM plan-canonicalization round-trip for nothing,
    and misleads readers into thinking the probe tag is the cache key."""
    try:
        if df.inputFiles():
            return True
    except Exception:  # noqa: BLE001 — streaming/exotic plans
        return False
    return getattr(df, "_spark_graft_source", None) is not None


def plan_key(df: DataFrame, *extra):
    """Cache key for an index artifact derived from ``df``, or None when
    ``df`` is not file-backed (then caching is disabled for safety).

    PITFALL: call this on the RAW source frame, never on a frame derived
    from another cached handle — ``inputFiles()`` is empty through an
    InMemoryRelation (the optimized plan has no file scan), so the key
    degenerates to None and silently disables caching. Operators that
    build an index over another index thread the source-frame key down
    (see dedup._pair_jaccard's ``postings_key``). Hot-pinned catalog
    tables (``catalog.load_table_hot``) carry their source identity in
    ``_spark_graft_source`` — (path, fingerprint) — which substitutes
    for the empty file list, so derived artifacts over hot tables cache
    too (the fingerprint keys staleness exactly like the hot cache)."""
    try:
        files = tuple(sorted(df.inputFiles()))
        if not files:
            src = getattr(df, "_spark_graft_source", None)
            if src is None:
                return None
            # md5 of the fingerprint, not str(tuple): the raw tuple
            # embeds file NAMES, and a name containing '#' would corrupt
            # sweep_dead_entries' rpartition('#') split (the artifact
            # would evict+rebuild on every miss insert). The hash also
            # keeps keys small for large directories.
            fp_hash = hashlib.md5(str(src[1]).encode()).hexdigest()
            files = (f"hot:{src[0]}#{fp_hash}",)
        plan = df._jdf.queryExecution().analyzed().canonicalized().toString()
    except Exception:  # noqa: BLE001 — streaming/exotic plans: just don't cache
        return None
    return (files, hashlib.md5(plan.encode()).hexdigest(), *extra)


def multi_plan_key(dfs, *extra):
    """Cache key for an artifact derived from SEVERAL source frames
    (e.g. a fact ⋈ dimension pre-join rollup). ``key[0]`` merges every
    source's input files, so ``sweep_dead_entries`` invalidates the
    artifact when ANY source table is rewritten — a single-source
    plan_key with the second frame folded into ``extra`` would dodge
    the sweep and serve a stale pre-join. None when any source is
    non-file-backed (same safety rule as plan_key)."""
    parts = [plan_key(df) for df in dfs]
    if any(p is None for p in parts):
        return None
    files = tuple(sorted({f for p in parts for f in p[0]}))
    digest = hashlib.md5("|".join(p[1] for p in parts).encode()).hexdigest()
    return (files, digest, *extra)


def _local_path(uri: str) -> str | None:
    """Filesystem path for a ``file:``-scheme input URI, else None."""
    if uri.startswith("file:"):
        import urllib.parse

        return urllib.parse.unquote(uri[5:].replace("///", "/", 1)) or None
    if uri.startswith("/"):
        return uri
    return None


def sweep_dead_entries(cache: dict) -> int:
    """Evict (and unpersist) entries whose source files no longer exist.

    Keys follow the ``plan_key`` shape — ``key[0]`` is the sorted tuple of
    input files. A table rewritten in place gets NEW part-file names, so
    the superseded snapshot's entries point at deleted files; without this
    sweep they sit persisted in executor storage for the session. Remote
    (non-``file:``) inputs are never treated as dead — existence can't be
    checked cheaply and a false eviction only costs a rebuild anyway.
    Returns the number of entries evicted. O(live entries) per call; runs
    only on cache MISS inserts, so steady-state hits pay nothing.

    ``hot:PATH#md5(FP)`` pseudo-URIs (artifacts derived from hot-pinned
    catalog tables) are dead when the md5 of the directory's CURRENT
    fingerprint no longer matches — same staleness rule the hot cache
    itself uses. FP is hashed at key construction (plan_key) because the
    raw fingerprint embeds file names, which may themselves contain
    '#' and would corrupt this rpartition split."""
    import os

    dead = []
    for key in cache:
        files = key[0] if isinstance(key, tuple) and key else ()
        if not isinstance(files, tuple):
            continue
        for uri in files:
            if isinstance(uri, str) and uri.startswith("hot:"):
                from . import catalog

                path, _, fp = uri[4:].rpartition("#")
                cur = hashlib.md5(
                    str(catalog._dir_fingerprint(path)).encode()
                ).hexdigest()
                if cur != fp:
                    dead.append(key)
                    break
                continue
            p = _local_path(uri)
            if p is not None and not os.path.exists(p):
                dead.append(key)
                break
    for key in dead:
        handle = cache.pop(key)
        try:
            handle.unpersist()
        except AttributeError:
            pass  # scalar caches share the key shape but hold plain values
        except Exception:  # noqa: BLE001 — context may already be stopped
            pass
    return len(dead)


#: insertion-order bound for scalar caches (counts, vocab sizes) — large
#: enough that a whole catalog run never evicts, small enough that a
#: resident service rewriting tables forever stays flat.
SCALAR_CACHE_CAP = 512


def bounded_scalar_put(cache: dict, key, value) -> None:
    """Insert into a scalar cache with dead-file sweep + hard size bound.

    The sweep reclaims entries for rewritten tables immediately; the cap
    is the backstop for non-file churn (dicts preserve insertion order,
    so eviction is oldest-first)."""
    sweep_dead_entries(cache)
    while len(cache) >= SCALAR_CACHE_CAP:
        cache.pop(next(iter(cache)))
    cache[key] = value


def cached_index(key, factory: Callable[[], DataFrame]) -> DataFrame:
    """Return the persisted index artifact for ``key``, building it via
    ``factory`` on first use. ``key=None`` bypasses the cache entirely.
    Every miss first sweeps entries whose source files were deleted by an
    in-place table rewrite, so superseded snapshots don't accumulate in
    executor storage on long-lived sessions."""
    if key is None:
        return factory()
    handle = _HANDLES.get(key)
    if handle is None:
        sweep_dead_entries(_HANDLES)
        handle = factory().persist()
        _HANDLES[key] = handle
        _evict_over_budget(handle.sparkSession, key)
    else:
        # LRU recency: dicts preserve insertion order, so re-inserting on
        # a hit makes iteration order = least-recently-used-first
        _HANDLES[key] = _HANDLES.pop(key)
    return handle


#: persists made OUTSIDE the keyed cache (self-join intermediates over
#: non-file-backed inputs) — tracked so clear_indexes() releases them.
#: Strong references ON PURPOSE: DataFrame.persist registers the plan in
#: the JVM CacheManager, which pins the storage blocks until an explicit
#: unpersist — Python GC never frees them (the ContextCleaner's weak-ref
#: reclamation applies to raw RDD caches only). A weakref registry would
#: therefore turn every dropped handle into a permanently leaked block.
_SCOPED: list = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` with session-scoped release discipline.

    Operators that materialize a self-join intermediate (simhash_pairs,
    lsh_cosine_pairs) persist it for the duration of the returned lazy
    result. When the input is file-backed the intermediate IS the keyed
    index artifact (already tracked); otherwise the persist would be
    invisible to ``clear_indexes()``. Tracked intermediates live until
    ``clear_indexes()`` is called — there is no GC fallback, because SQL
    caches sit in the JVM CacheManager until explicitly unpersisted; call
    ``clear_indexes()`` between corpus-scale phases on long-lived sessions.
    """
    _SCOPED.append(df.persist())
    return df


def clear_indexes() -> None:
    """Unpersist and drop every cached index artifact and every tracked
    scoped persist — storage memory returns to its pre-index baseline."""
    global _FOREIGN_FLOOR
    _FOREIGN_FLOOR = 0
    while _HANDLES:
        _, handle = _HANDLES.popitem()
        try:
            handle.unpersist(blocking=True)
        except Exception:  # noqa: BLE001 — context may already be stopped
            pass
    while _SCOPED:
        try:
            _SCOPED.pop().unpersist(blocking=True)
        except Exception:  # noqa: BLE001
            pass
