"""Timeline queries — "when was symbol X available".

Parity: reference src/binance_futures_availability/queries/timelines.py
(P3 at :29-72, A2 at :74-140 in SURVEY.md). The symbol equality predicate is
pushed to the parquet scan; with in-file sort by symbol (the layout replacing
the reference's idx_symbol_date index, SURVEY.md §1.4) row-group min/max
statistics skip most files at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def gap_filled_volumes(da: DataFrame) -> DataFrame:
    """Time-series completion: each symbol's daily series densified over
    its OWN [first, last] observed range, missing days forward-filled —
    (symbol, date, quote_volume_usdt, is_filled). The upsample + LOCF
    (last-observation-carried-forward) pass every daily-bar consumer
    runs before resampling or feature windows.

    Shape: the per-symbol date skeleton is one aggregate + one
    F.sequence explode (rows ∝ calendar days, generated not shuffled);
    the observed rows LEFT-join onto it by (symbol, date) and ONE
    symbol-key window carries the last non-null volume forward — the
    same single-shuffle discipline as sessionize. Fill flags stay
    explicit so downstream stats can exclude imputed rows.
    """
    observed = da.filter(
        F.col("available") & F.col("quote_volume_usdt").isNotNull()
    ).select("symbol", "date", "quote_volume_usdt")
    skeleton = (
        observed.groupBy("symbol")
        .agg(F.min("date").alias("__lo"), F.max("date").alias("__hi"))
        .select(
            "symbol",
            F.explode(
                F.sequence("__lo", "__hi", F.expr("interval 1 day"))
            ).alias("date"),
        )
    )
    joined = skeleton.join(observed, ["symbol", "date"], "left")
    w = (
        Window.partitionBy("symbol")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "symbol",
        "date",
        F.last("quote_volume_usdt", ignorenulls=True)
        .over(w)
        .alias("quote_volume_usdt"),
        F.col("quote_volume_usdt").isNull().alias("is_filled"),
    )
