"""Continuity validation — find calendar dates with no data at all.

Parity: reference src/binance_futures_availability/validation/continuity.py
(J5 + F2 in SURVEY.md §2: ``unnest(generate_series(...)::DATE[]) ... NOT IN
(SELECT DISTINCT date)``). Spark-first: ``sequence() + explode`` generates
the expected calendar, then a left-anti join against the distinct observed
dates. The observed-dates side collapses to one row per date before the
join, so the anti-join's build side is tiny and broadcasts.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import gathered_sort


def expected_dates(da: DataFrame, start: dt.date | str, end: dt.date | str) -> DataFrame:
    """F2 — one row per calendar date in [start, end]."""
    spark = da.sparkSession
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("expected_date")
    )


def find_gaps(da: DataFrame, start: dt.date | str, end: dt.date | str) -> DataFrame:
    """J5 — expected dates with no rows in the fact table.

    Reference SQL: continuity.py:74-83.
    """
    observed = da.select("date").distinct()
    return gathered_sort(
        expected_dates(da, start, end).join(
            observed, F.col("expected_date") == F.col("date"), "left_anti"
        ),
        "expected_date",
    )
