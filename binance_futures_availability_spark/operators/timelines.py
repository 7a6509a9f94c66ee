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

    Shape (r13): LOCF as a RUN explode — one ``lead(date)`` window over
    the observed rows (the only shuffle: hash by symbol), then each
    observed row GENERATES its own fill run ``[date, next_date)`` via
    F.sequence (rows ∝ calendar days, produced map-side, never
    shuffled). Equivalent to the skeleton/left-join/carry-forward form
    the oracle keeps (every skeleton day ≥ the symbol's first observed
    day falls in exactly one observed row's run, and the carried value
    is that row's volume) but with the (symbol, date) join — two more
    fact-sized exchanges — and the unbounded LOCF window deleted:
    4 Exchanges → 1 (plans/r13/gap_filled_volumes_*.txt). Fill flags
    stay explicit so downstream stats can exclude imputed rows.
    """
    observed = da.filter(
        F.col("available") & F.col("quote_volume_usdt").isNotNull()
    ).select("symbol", "date", "quote_volume_usdt")
    nxt = F.lead("date").over(Window.partitionBy("symbol").orderBy("date"))
    runs = observed.withColumn(
        "__until", F.coalesce(F.date_sub(nxt, 1), F.col("date"))
    )
    return runs.select(
        "symbol",
        "quote_volume_usdt",
        F.col("date").alias("__obs"),
        F.explode(
            F.sequence("date", "__until", F.expr("interval 1 day"))
        ).alias("date"),
    ).select(
        "symbol",
        "date",
        "quote_volume_usdt",
        (F.col("date") != F.col("__obs")).alias("is_filled"),
    )
