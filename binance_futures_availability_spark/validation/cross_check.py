"""Cross-check validation — compare two symbol universes (DB vs API).

Parity: reference src/binance_futures_availability/validation/cross_check.py
(J6/S17 in SURVEY.md: Python set ``&``/``-`` on DB symbols vs exchangeInfo
symbols). Spark-first: set algebra as intersect / left-anti joins over
single-column DataFrames — distributed, no driver-side sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compare_symbol_sets(db_symbols: DataFrame, api_symbols: DataFrame) -> dict:
    """J6 — intersection / only-in-db / only-in-api + match percentage.

    Reference: cross_check.py:116-148. Inputs are one-column ('symbol')
    DataFrames. Returns counts (small scalars — the only collect is the agg).
    """
    db = db_symbols.select("symbol").distinct()
    api = api_symbols.select("symbol").distinct()
    matched = db.intersect(api).count()
    only_db = db.join(api, "symbol", "left_anti").count()
    only_api = api.join(db, "symbol", "left_anti").count()
    total_api = matched + only_api
    return {
        "matched": matched,
        "only_in_db": only_db,
        "only_in_api": only_api,
        "match_pct": (100.0 * matched / total_api) if total_api else 0.0,
    }


def symbols_missing_from_db(discovered: DataFrame, db_symbols: DataFrame) -> DataFrame:
    """J7 — gap detection: discovered symbols not yet in the fact table.

    Reference: scripts/operations/detect_symbol_gaps.py:89-125.
    """
    return (
        discovered.select("symbol")
        .distinct()
        .join(db_symbols.select("symbol").distinct(), "symbol", "left_anti")
        .orderBy("symbol")
    )
