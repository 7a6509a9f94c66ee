"""Snapshot queries — "what was available on date X".

Parity: reference src/binance_futures_availability/queries/snapshots.py
(P1 at :29-68, P2 at :70-110 in SURVEY.md §2.2). Pure
filter/project/sort/distinct; at scale the date equality predicate prunes to
a single partition of a date-partitioned table and the scan reads only the
projected columns (check: .explain shows PushedFilters + ReadSchema).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import gathered_sort


def available_symbols_on_date(da: DataFrame, date: dt.date | str) -> DataFrame:
    """P1 — symbols (with size/mtime) available on one date, sorted by symbol.

    Reference SQL: snapshots.py:56-63
    (SELECT symbol, file_size_bytes, last_modified WHERE date=? AND
    available=true ORDER BY symbol). Result bounded by #symbols →
    gathered_sort.
    """
    return gathered_sort(
        da.filter((F.col("date") == F.lit(date)) & F.col("available")).select(
            "symbol", "file_size_bytes", "last_modified"
        ),
        "symbol",
    )


def symbols_available_in_range(
    da: DataFrame, start: dt.date | str, end: dt.date | str
) -> DataFrame:
    """P2 — DISTINCT symbols available at any point in [start, end].

    Reference SQL: snapshots.py:100-107. distinct() is a shuffle on symbol;
    at 100 TB the date-range filter prunes partitions first so the shuffle
    input is only the window, and partial aggregation dedups map-side.
    """
    return gathered_sort(
        da.filter(
            F.col("date").between(F.lit(start), F.lit(end)) & F.col("available")
        )
        .select("symbol")
        .distinct(),
        "symbol",
    )
