"""Timeline queries — "when was symbol X available".

Parity: reference src/binance_futures_availability/queries/timelines.py
(P3 at :29-72, A2 at :74-140 in SURVEY.md). The symbol equality predicate is
pushed to the parquet scan; with in-file sort by symbol (the layout replacing
the reference's idx_symbol_date index, SURVEY.md §1.4) row-group min/max
statistics skip most files at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import gathered_sort


def availability_timeline(da: DataFrame, symbol: str) -> DataFrame:
    """P3 — full probe history of one symbol, sorted by date.

    Reference SQL: timelines.py:54-61. Result bounded by #dates per symbol →
    gathered_sort.
    """
    return gathered_sort(
        da.filter(F.col("symbol") == symbol).select(
            "date", "available", "file_size_bytes", "status_code"
        ),
        "date",
    )


def first_listing_date(da: DataFrame, symbol: str) -> DataFrame:
    """A2 — MIN(date) where the symbol was available.

    Reference SQL: timelines.py:94-100.
    """
    return (
        da.filter((F.col("symbol") == symbol) & F.col("available"))
        .agg(F.min("date").alias("first_date"))
    )


def last_available_date(da: DataFrame, symbol: str) -> DataFrame:
    """A2 — MAX(date) where the symbol was available.

    Reference SQL: timelines.py:129-135.
    """
    return (
        da.filter((F.col("symbol") == symbol) & F.col("available"))
        .agg(F.max("date").alias("last_date"))
    )
