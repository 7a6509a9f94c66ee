"""Session-cache hygiene: superseded entries must not accumulate.

VERDICT r8 #5 / ADVICE r8: every module-level handle cache keyed on a
directory fingerprint (or input-file set) must evict the stale entry when
the underlying table is rewritten in place — a resident service rewriting
tables forever must see flat dict sizes and no stranded persisted blocks.
"""

from __future__ import annotations


def test_cached_index_sweeps_rewritten_tables(spark, tmp_path):
    """An in-place overwrite produces new part-file names; the old keyed
    index artifact points at deleted files and must be swept (and
    unpersisted) on the next miss insert — never >1 live entry per table."""
    from binance_futures_availability_spark import index_cache

    path = str(tmp_path / "t.parquet")
    for v in range(10):
        spark.createDataFrame(
            [(v, "a b c")], "doc_id long, text string"
        ).write.mode("overwrite").parquet(path)
        df = spark.read.parquet(path)
        key = index_cache.plan_key(df, "cache_bounds_artifact")
        assert key is not None
        got = index_cache.cached_index(key, lambda d=df: d.select("doc_id"))
        assert got.count() == 1
        live = [
            k
            for k in index_cache._HANDLES
            if any(path in f for f in k[0])
        ]
        assert len(live) == 1


def test_bounded_scalar_put_caps_size():
    from binance_futures_availability_spark import index_cache

    cache: dict = {}
    for i in range(index_cache.SCALAR_CACHE_CAP + 100):
        # keys shaped like plan_key output, files kept non-local so the
        # dead-file sweep never fires — this exercises the hard cap alone
        key = ((f"hdfs:/warehouse/t{i}/part-0.parquet",), f"md5{i}", "n")
        index_cache.bounded_scalar_put(cache, key, i)
    assert len(cache) == index_cache.SCALAR_CACHE_CAP
    # oldest-first eviction: the newest entries survive
    assert ((f"hdfs:/warehouse/t0/part-0.parquet",), "md50", "n") not in cache


def test_scalar_caches_flat_across_rewrites(spark, tmp_path):
    """100 rewrite cycles of the same table leave the textops scalar
    caches flat: dead-file sweep reclaims each superseded key."""
    from binance_futures_availability_spark.operators import textops

    path = str(tmp_path / "docs.parquet")
    sizes = set()
    for v in range(100):
        spark.createDataFrame(
            [(v, "x y z")], "doc_id long, text string"
        ).write.mode("overwrite").parquet(path)
        docs = spark.read.parquet(path)
        assert textops._corpus_count(docs) == 1
        live = [
            k for k in textops._NDOCS_CACHE if any(path in f for f in k[0])
        ]
        sizes.add(len(live))
    assert sizes == {1}


def test_read_fact_evicts_on_rewrite(spark, tmp_path, populated_da):
    from binance_futures_availability_spark.sources import duckdb_io

    path = str(tmp_path / "fact.parquet")
    for _ in range(5):
        populated_da.write.mode("overwrite").parquet(path)
        df = duckdb_io.read_fact(spark, path)
        assert df.count() == populated_da.count()
        import os

        real = os.path.realpath(path)
        live = [k for k in duckdb_io._IMPORT_HANDLES if k[1] == real]
        assert len(live) == 1
