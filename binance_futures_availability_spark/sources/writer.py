"""Writers: key-dedup UPSERT, partitioned parquet, matview refresh.

Parity targets:
- INSERT OR REPLACE single/batch upsert (reference
  database/availability_db.py:94-197, S2/S3 in SURVEY.md). Spark/parquet has
  no PK, so upsert = union + deterministic winner per key (latest
  ``probe_timestamp``) — exactly the idempotent-reprobe semantics the 20-day
  lookback depends on (reference .github/scripts/run_daily_update.py:41-69).
- ``daily_symbol_counts`` matview refresh (availability_db.py:219-244, A8).

Scale notes: the dedup window shuffles on the key — the same shuffle a MERGE
would do. For a date-partitioned table, ``upsert_partitioned`` rewrites ONLY
the touched date partitions (dynamic partition overwrite), which is the
100 TB-safe path: work is proportional to the incoming dates, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_latest(
    df: DataFrame, key: list[str], version_col: str
) -> DataFrame:
    """Keep exactly one row per key — the one with the highest version.

    Ties (same version) break deterministically on the remaining column
    values, mirroring last-write-wins of INSERT OR REPLACE
    (availability_db.py:97-101).
    """
    order = [F.col(version_col).desc()] + [
        F.col(c).desc() for c in df.columns if c not in key and c != version_col
    ]
    w = Window.partitionBy(*key).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert(
    existing: DataFrame,
    incoming: DataFrame,
    key: list[str],
    version_col: str,
) -> DataFrame:
    """S2/S3 — batch UPSERT: incoming rows replace same-key existing rows.

    Incoming always beats existing on key collision regardless of version
    (matching INSERT OR REPLACE), via a precedence column that sorts after
    the version. A narrower incoming frame (e.g. 8-column probe results
    into the 17-column fact table) is legal and NULLs the unsupplied
    columns on replace — exactly what INSERT OR REPLACE with a column list
    does in the reference (availability_db.py:97-124).
    """
    tagged = existing.withColumn("__src", F.lit(0)).unionByName(
        incoming.withColumn("__src", F.lit(1)), allowMissingColumns=True
    )
    w = Window.partitionBy(*key).orderBy(F.col("__src").desc(), F.col(version_col).desc())
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def write_partitioned(df: DataFrame, path: str, partition_col: str = "date") -> None:
    """Write the fact table partitioned by date — the layout that replaces
    the reference's indexes (SURVEY.md §1.4): date-equality queries prune to
    one partition; parquet min/max stats on symbol serve the timeline path."""
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "symbol",
    n_buckets: int = 64,
    sort_cols: tuple[str, ...] = ("symbol", "date"),
    path: str | None = None,
) -> None:
    """Bucketed + sorted table — the Spark-native form of the reference's
    ``idx_symbol_date`` secondary index (schema.py:101-116).

    Rows are hash-clustered into ``n_buckets`` files by ``bucket_col`` and
    sorted within each bucket, so every per-symbol operation downstream —
    timeline scans, the rankings window cluster, self-joins on symbol —
    reads data already hash-distributed and sorted: Catalyst plans them
    with NO exchange on the bucket column. Pick ``n_buckets`` so one
    bucket ≈ one task's worth of data at table scale; date partitioning
    (write_partitioned) and bucketing compose for the two access paths.
    """
    w = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(*sort_cols)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def upsert_partitioned(
    spark_existing_path: str,
    incoming: DataFrame,
    key: list[str],
    version_col: str,
    partition_col: str = "date",
) -> None:
    """Upsert by rewriting only the partitions present in ``incoming``.
    Cost ∝ touched dates, not table size.

    Spark cannot overwrite a path that is also an input of the running plan
    (lazy read + overwrite of the same directory is an AnalysisException, or
    silent data loss without that guard). So the merge is STAGED: write the
    merged touched-partition rows to a sibling staging directory first, then
    re-read them (fresh lineage, no dependency on the target) and commit via
    dynamic partition overwrite, which replaces only the touched partition
    directories of the target table.
    """
    spark = incoming.sparkSession
    staging = spark_existing_path.rstrip("/") + ".__staging__"
    existing = spark.read.parquet(spark_existing_path)
    touched = incoming.select(partition_col).distinct()
    relevant = existing.join(F.broadcast(touched), partition_col, "left_semi")
    merged = upsert(relevant, incoming, key, version_col)
    merged.write.mode("overwrite").partitionBy(partition_col).parquet(staging)

    prev_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        spark.read.parquet(staging).write.mode("overwrite").partitionBy(
            partition_col
        ).parquet(spark_existing_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
        _rm_tree(spark, staging)


def _rm_tree(spark, path: str) -> None:
    """Recursive delete through the Hadoop FileSystem API — works for any
    scheme the table lives on (local, hdfs://, s3a://); a shutil.rmtree
    would silently leak the staging copy on object stores."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    fs.delete(hpath, True)


def table_exists(spark, path: str) -> bool:
    """True when ``path`` holds a committed table (its ``_SUCCESS`` marker).

    Same Hadoop FileSystem routing as _rm_tree: an ``os.path.exists`` check
    is always False for hdfs:// / s3a:// paths, which would make callers
    treat every write as the first one and overwrite committed data."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "/_SUCCESS")
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def refresh_symbol_counts(da: DataFrame) -> DataFrame:
    """A8 — recompute the ``daily_symbol_counts`` summary (matview).

    Reference SQL: availability_db.py:219-244 (per-date total/available/
    unavailable + CURRENT_TIMESTAMP). One narrow shuffle; incremental refresh
    = filter ``da`` to touched dates first and overwrite those summary rows.
    """
    return da.groupBy("date").agg(
        F.count(F.lit(1)).alias("total_symbols"),
        F.sum(F.when(F.col("available"), 1).otherwise(0)).alias("available_count"),
        F.sum(F.when(~F.col("available"), 1).otherwise(0)).alias("unavailable_count"),
        F.current_timestamp().alias("last_updated"),
    )


def refresh_symbol_counts_incremental(
    existing_counts: DataFrame, da: DataFrame, touched_dates: list
) -> DataFrame:
    """A8 incremental — refresh summary rows ONLY for ``touched_dates``.

    The daily pipeline upserts a bounded set of dates (the 20-day lookback
    window); recomputing the whole summary scans the entire fact table for
    no reason. The literal date list makes the fact-table filter a static
    partition-pruning predicate on a date-partitioned table, so refresh
    cost is ∝ touched dates, not history length (the incremental promise
    of availability_db.py:219-244's post-batch refresh).
    """
    touched = [F.lit(d).cast("date") for d in touched_dates]
    recomputed = refresh_symbol_counts(da.filter(F.col("date").isin(touched)))
    untouched = existing_counts.filter(~F.col("date").isin(touched))
    return untouched.unionByName(recomputed)
