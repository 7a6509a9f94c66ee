"""Completeness validation — dates whose symbol count is suspiciously low.

Parity: reference src/binance_futures_availability/validation/completeness.py
(A7 in SURVEY.md §2.4: ``GROUP BY date HAVING COUNT(*) < ?``). The reference
applies a T+3 buffer before today to absorb S3 publishing delay
(completeness.py:71-76); that policy belongs to the caller here.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import gathered_sort


def incomplete_dates(
    da: DataFrame,
    min_expected: int,
    start: dt.date | str | None = None,
    end: dt.date | str | None = None,
) -> DataFrame:
    """A7 — dates with fewer than ``min_expected`` available symbols.

    Reference SQL: completeness.py:79-88.
    """
    cohort = da.filter(F.col("available"))
    if start is not None:
        cohort = cohort.filter(F.col("date") >= F.lit(start))
    if end is not None:
        cohort = cohort.filter(F.col("date") <= F.lit(end))
    return gathered_sort(
        cohort.groupBy("date")
        .agg(F.count(F.lit(1)).alias("symbol_count"))
        .filter(F.col("symbol_count") < min_expected),
        "date",
    )
