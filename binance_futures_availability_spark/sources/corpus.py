"""Corpus management for the LLM-data pipeline: JSONL ingest and
language-partitioned storage.

Training corpora arrive as JSON-lines dumps and are consumed by
per-language pipelines; these adapters give both directions a Spark-native
shape:

- ``read_jsonl``: schema-enforced ``spark.read.json`` with PERMISSIVE
  corrupt-record capture — at 100 TB a crawl dump always contains broken
  lines, and failing the job on line 40 billion is not an option. Broken
  lines land in a quarantine column instead of killing the read, and
  ``split_corrupt`` separates them for audit.
- ``write_corpus``: parquet partitioned by predicted language (composing
  ``textops.language_id``), so per-language pipelines (tokenizers, quality
  filters, dedup) read ONLY their partition directories — the same
  partition-pruning play the fact table makes with ``date``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

#: JSONL document schema + quarantine column for unparseable lines
JSONL_DOC = StructType(
    [
        StructField("doc_id", LongType(), nullable=True),
        StructField("text", StringType(), nullable=True),
        StructField("source", StringType(), nullable=True),
        StructField("_corrupt", StringType(), nullable=True),
    ]
)


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Schema-enforced JSONL read with corrupt-line quarantine.

    PERMISSIVE mode + an explicit ``columnNameOfCorruptRecord`` column:
    parseable lines get typed columns (with nulls for missing fields),
    unparseable lines arrive whole in ``_corrupt`` with every other column
    NULL. The scan stays a normal distributed text read — no driver-side
    validation pass.
    """
    return (
        spark.read.schema(JSONL_DOC)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )


def split_corrupt(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) — clean rows drop the quarantine column.

    The parsed frame is cached first: Spark refuses plans over a raw JSON
    source that reference ONLY the internal corrupt-record column
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — caching materializes the parse
    once, which is also what you want before fanning out to two branches.
    The cache is registered with ``index_cache.tracked_persist`` so
    ``clear_indexes()`` releases it like every other cached artifact.
    """
    from ..index_cache import tracked_persist

    docs = tracked_persist(docs)
    clean = docs.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    bad = docs.filter(F.col("_corrupt").isNotNull()).select("_corrupt")
    return clean, bad


def write_corpus(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Write a language-partitioned corpus: parquet under
    ``<path>/predicted_lang=<lang>/``.

    The language column comes from ``textops.language_id`` (a narrow
    scan-speed projection), so the write costs one pass; downstream
    per-language jobs prune to their directories at planning time
    (PartitionFilters), never scanning other languages' bytes.
    """
    from ..operators.textops import language_id

    langs = language_id(docs, id_col, text_col).select(
        F.col(id_col), F.col("predicted_lang")
    )
    (
        docs.join(langs, id_col)
        .write.mode("overwrite")
        .partitionBy("predicted_lang")
        .parquet(path)
    )


def read_corpus(spark: SparkSession, path: str, lang: str | None = None) -> DataFrame:
    """Read a ``write_corpus`` table; ``lang`` prunes to one partition."""
    df = spark.read.parquet(path)
    if lang is not None:
        df = df.filter(F.col("predicted_lang") == lang)
    return df
