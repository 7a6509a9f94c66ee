"""Cross-check validation — compare two symbol universes (DB vs API).

Parity: reference src/binance_futures_availability/validation/cross_check.py
(J6/S17 in SURVEY.md: Python set ``&``/``-`` on DB symbols vs exchangeInfo
symbols). Spark-first: set algebra as intersect / left-anti joins over
single-column DataFrames — distributed, no driver-side sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import gathered_sort


def compare_symbol_sets(db_symbols: DataFrame, api_symbols: DataFrame) -> dict:
    """J6 — intersection / only-in-db / only-in-api + match percentage.

    Reference: cross_check.py:116-148. Inputs are one-column ('symbol')
    DataFrames. One full-outer join + one aggregation = a single Spark job
    (an intersect + two anti-joins would scan both inputs three times).
    """
    db = db_symbols.select("symbol").distinct().withColumn("__db", F.lit(1))
    api = api_symbols.select("symbol").distinct().withColumn("__api", F.lit(1))
    counts = (
        db.join(api, "symbol", "full_outer")
        .agg(
            F.count(F.when(F.col("__db").isNotNull() & F.col("__api").isNotNull(), 1)).alias("matched"),
            F.count(F.when(F.col("__api").isNull(), 1)).alias("only_db"),
            F.count(F.when(F.col("__db").isNull(), 1)).alias("only_api"),
        )
        .collect()[0]
    )
    total_api = counts["matched"] + counts["only_api"]
    return {
        "matched": counts["matched"],
        "only_in_db": counts["only_db"],
        "only_in_api": counts["only_api"],
        "match_pct": (100.0 * counts["matched"] / total_api) if total_api else 0.0,
    }


def symbol_set_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """J6/U3 as a row stream: (symbol, membership ∈ both/only_a/only_b).

    The DataFrame form of compare_symbol_sets — same single full-outer
    join, but returning the classified universe instead of counts (what a
    reconciliation report joins against).
    """
    da_ = a.select("symbol").distinct().withColumn("__a", F.lit(1))
    db_ = b.select("symbol").distinct().withColumn("__b", F.lit(1))
    # bounded by the symbol universe → gathered presentation sort
    return gathered_sort(
        da_.join(db_, "symbol", "full_outer").select(
            "symbol",
            F.when(
                F.col("__a").isNotNull() & F.col("__b").isNotNull(), "both"
            )
            .when(F.col("__b").isNull(), "only_a")
            .otherwise("only_b")
            .alias("membership"),
        ),
        "symbol",
    )


def symbols_missing_from_db(discovered: DataFrame, db_symbols: DataFrame) -> DataFrame:
    """J7 — gap detection: discovered symbols not yet in the fact table.

    Reference: scripts/operations/detect_symbol_gaps.py:89-125.
    """
    return gathered_sort(
        discovered.select("symbol")
        .distinct()
        .join(db_symbols.select("symbol").distinct(), "symbol", "left_anti"),
        "symbol",
    )
