"""Table registry: parquet directories → DataFrames / temp views.

The engine's "catalog" role (reference keeps one DuckDB file,
database/availability_db.py:32-47; here a directory of parquet tables).
Also knows the driver-generated synthetic testdata layout (TESTDATA.md):
``region nation customer supplier part orders lineitem events documents
embeddings`` — one parquet file/dir per table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


#: memoized relation handles — the engine's catalog-metadata cache. A fresh
#: ``spark.read.parquet(path)`` builds a new InMemoryFileIndex, and the
#: file listing + schema resolution run A SPARK JOB each time; resolving
#: the same path once per session is what any engine's catalog does.
#: Keyed by (app id, path, directory fingerprint): in-place regeneration
#: of the testdata (new file sizes/mtimes) misses and re-lists.
_TABLE_CACHE: dict = {}


def _dir_fingerprint(path: str):
    try:
        with os.scandir(path) as entries:
            return tuple(
                sorted(
                    (e.name, e.stat().st_size, e.stat().st_mtime_ns)
                    for e in entries
                )
            )
    except NotADirectoryError:  # single-file parquet table
        st = os.stat(path)
        return ((os.path.basename(path), st.st_size, st.st_mtime_ns),)
    except OSError:
        return None  # unreadable/remote path: skip memoization


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Column pruning + predicate pushdown happen at the scan
    because callers express projections/filters declaratively on the result.
    Relation handles are served from the catalog-metadata cache above."""
    path = table_path(sf_dir, name)
    fp = _dir_fingerprint(path)
    if fp is None:
        return spark.read.parquet(path)
    key = (spark.sparkContext.applicationId, path, fp)
    df = _TABLE_CACHE.get(key)
    if df is None:
        # drop superseded fingerprints for this path (plain relation
        # handles, nothing persisted — eviction just keeps the dict flat
        # across in-place testdata rewrites)
        for old_key in [
            k for k in _TABLE_CACHE if k[:2] == key[:2] and k != key
        ]:
            _TABLE_CACHE.pop(old_key)
        df = spark.read.parquet(path)
        _TABLE_CACHE[key] = df
    return df


#: hot-table handles — the buffer-pool analogue for tables whole queries
#: re-scan (the warehouse join family re-reads lineitem/orders/customer on
#: every call; DuckDB serves the same re-reads from its buffer pool + OS
#: page cache). Keyed like _TABLE_CACHE.
_HOT_CACHE: dict = {}


def load_table_hot(
    spark: SparkSession, sf_dir: str, name: str, slices: int = 8
) -> DataFrame:
    """Catalog read pinned in the in-memory columnar cache, re-sliced so
    downstream scans parallelize regardless of the source file's row-group
    layout (a single-row-group parquet file yields ONE input partition —
    every aggregate over it runs single-threaded no matter the core count).

    Scale stance: pin hot DIMENSION tables and repeatedly-scanned working
    sets; a 100 TB fact stream should NOT route through here (Spark's
    storage layer would spill-evict it block by block — harmless but
    pointless). The repartition shuffle is paid once at first touch;
    filters still prune cached batches via per-batch column stats."""
    path = table_path(sf_dir, name)
    fp = _dir_fingerprint(path)
    if fp is None:
        # unfingerprintable (remote/unreadable) paths are never memoized
        # by load_table either; pinning a snapshot we could not detect
        # going stale would serve wrong rows after an in-place rewrite
        return load_table(spark, sf_dir, name)
    app_id = spark.sparkContext.applicationId
    key = (app_id, path, fp, slices)
    df = _HOT_CACHE.get(key)
    if df is None:
        # Evict-and-unpersist superseded entries for this (app, path):
        # a testdata rewrite changes the fingerprint, and the pinned
        # blocks of the stale snapshot would otherwise sit in executor
        # storage for the life of the session (mirrors duckdb_io's
        # _invalidate_handle discipline).
        for old_key in [
            k
            for k in _HOT_CACHE
            if k[0] == app_id and k[1] == path and k != key
        ]:
            try:
                _HOT_CACHE.pop(old_key).unpersist()
            except Exception:  # noqa: BLE001 — eviction is best-effort
                pass
        df = load_table(spark, sf_dir, name).repartition(slices).cache()
        # source identity for index_cache.plan_key: inputFiles() is empty
        # once the CacheManager swaps in the InMemoryRelation, which would
        # silently disable derived-artifact caching over hot tables (the
        # plan_key PITFALL). The fingerprint keys staleness exactly like
        # _HOT_CACHE itself does.
        df._spark_graft_source = (path, fp)
        _HOT_CACHE[key] = df
    return df


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; returns the DataFrames."""
    out: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
