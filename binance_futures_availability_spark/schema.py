"""Explicit StructTypes for every stored table — never infer.

Parity targets (reference file:line cited per schema):
- DAILY_AVAILABILITY: the 17-column fact table
  (reference: src/binance_futures_availability/database/schema.py:68-95).
- RANKINGS: the 13-column cumulative volume-rankings archive
  (reference: .github/scripts/generate_volume_rankings.py:38-52). Spark has no
  unsigned ints; the signed mapping matches the shipped script (documented
  drift vs ADR-0013's unsigned spec — SURVEY.md §1.2).
- SYMBOL_COUNTS: the materialized per-date summary
  (reference: database/schema.py:118-129).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DAILY_AVAILABILITY = StructType(
    [
        StructField("date", DateType(), nullable=False),
        StructField("symbol", StringType(), nullable=False),
        StructField("available", BooleanType(), nullable=False),
        StructField("file_size_bytes", LongType(), nullable=True),
        StructField("last_modified", TimestampType(), nullable=True),
        StructField("url", StringType(), nullable=False),
        StructField("status_code", IntegerType(), nullable=False),
        StructField("probe_timestamp", TimestampType(), nullable=False),
        StructField("quote_volume_usdt", DoubleType(), nullable=True),
        StructField("trade_count", LongType(), nullable=True),
        StructField("volume_base", DoubleType(), nullable=True),
        StructField("taker_buy_volume_base", DoubleType(), nullable=True),
        StructField("taker_buy_quote_volume_usdt", DoubleType(), nullable=True),
        StructField("open_price", DoubleType(), nullable=True),
        StructField("high_price", DoubleType(), nullable=True),
        StructField("low_price", DoubleType(), nullable=True),
        StructField("close_price", DoubleType(), nullable=True),
    ]
)

#: Primary-key columns of the fact table; UPSERT dedups on these
#: (reference: database/schema.py:93 — composite PK (date, symbol)).
DAILY_AVAILABILITY_KEY = ["date", "symbol"]

#: Deterministic winner for key-dedup: the latest probe wins
#: (reference: availability_db.py:97-101 INSERT OR REPLACE semantics).
DAILY_AVAILABILITY_VERSION = "probe_timestamp"

RANKINGS = StructType(
    [
        StructField("date", DateType(), nullable=False),
        StructField("symbol", StringType(), nullable=False),
        StructField("rank", ShortType(), nullable=False),
        StructField("quote_volume_usdt", DoubleType(), nullable=False),
        StructField("trade_count", LongType(), nullable=True),
        StructField("rank_change_1d", ShortType(), nullable=True),
        StructField("rank_change_7d", ShortType(), nullable=True),
        StructField("rank_change_14d", ShortType(), nullable=True),
        StructField("rank_change_30d", ShortType(), nullable=True),
        # field names follow the reference parquet schema
        # (generate_volume_rankings.py:38-52: percentile, days_available,
        # generation_timestamp) and match operators/rankings.volume_rankings
        StructField("percentile", FloatType(), nullable=False),
        StructField("market_share_pct", FloatType(), nullable=False),
        StructField("days_available", ByteType(), nullable=False),
        StructField("generation_timestamp", TimestampType(), nullable=False),
    ]
)

SYMBOL_COUNTS = StructType(
    [
        StructField("date", DateType(), nullable=False),
        StructField("total_symbols", LongType(), nullable=False),
        StructField("available_count", LongType(), nullable=False),
        StructField("unavailable_count", LongType(), nullable=False),
        StructField("last_updated", TimestampType(), nullable=False),
    ]
)

#: ProbeResult ingestion-unit schema
#: (reference: probing/s3_vision.py:24-34 — 8-field TypedDict).
PROBE_RESULT = StructType(
    [
        StructField("date", DateType(), nullable=False),
        StructField("symbol", StringType(), nullable=False),
        StructField("available", BooleanType(), nullable=False),
        StructField("file_size_bytes", LongType(), nullable=True),
        StructField("last_modified", TimestampType(), nullable=True),
        StructField("url", StringType(), nullable=False),
        StructField("status_code", IntegerType(), nullable=False),
        StructField("probe_timestamp", TimestampType(), nullable=False),
    ]
)
