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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Column pruning + predicate pushdown happen at the scan
    because callers express projections/filters declaratively on the result."""
    return spark.read.parquet(table_path(sf_dir, name))


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
