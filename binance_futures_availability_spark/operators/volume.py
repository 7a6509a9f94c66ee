"""Volume queries — top-N, percentile, averages, trend, market summary.

Parity: reference src/binance_futures_availability/queries/volume.py
(W1-W3, O2, O3, A3, A4 in SURVEY.md §2). Cohort predicate everywhere:
``available = TRUE AND quote_volume_usdt IS NOT NULL`` (volume.py:57-59).

Determinism discipline: AVG/SUM over DOUBLE depends on reduction order, which
differs between engines and between runs at scale. Every sum here aggregates
the exact DECIMAL(18,2) image of the volume column (lossless round-trip, see
operators/availability.py) and casts to DOUBLE at the end, so results are
bit-stable and oracle-hashable.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Reference cohort predicate (volume.py:57-59).
def _cohort(da: DataFrame) -> DataFrame:
    return da.filter(F.col("available") & F.col("quote_volume_usdt").isNotNull())


def top_by_volume(
    da: DataFrame,
    target_date: dt.date | str,
    limit: int = 10,
    min_volume: float | None = None,
) -> DataFrame:
    """O2 + W1 + W2 — top-N symbols by volume with market share.

    Reference SQL: volume.py:48-81 (RANK + unbounded SUM CTE, then
    ROUND(100*qv/total, 2), ORDER BY qv DESC LIMIT n).

    The window partitions by date (constant within the cohort) rather than
    using a global single-partition window: per-date cohorts are bounded by
    symbol count, so even at 100 TB each window partition is small.
    Catalyst plans ORDER BY+LIMIT as TakeOrderedAndProject (no full sort).
    """
    cohort = _cohort(da).filter(F.col("date") == F.lit(target_date))
    if min_volume is not None:
        cohort = cohort.filter(F.col("quote_volume_usdt") >= F.lit(min_volume))
    w = Window.partitionBy("date").orderBy(F.col("quote_volume_usdt").desc())
    wtot = Window.partitionBy("date")
    ranked = cohort.select(
        "symbol",
        "quote_volume_usdt",
        "trade_count",
        F.rank().over(w).alias("volume_rank"),
        F.sum(F.col("quote_volume_usdt").cast("decimal(18,2)"))
        .over(wtot)
        .cast("double")
        .alias("total_market_volume"),
    )
    return (
        ranked.select(
            "symbol",
            "quote_volume_usdt",
            "trade_count",
            "volume_rank",
            F.round(
                100.0 * F.col("quote_volume_usdt") / F.col("total_market_volume"), 2
            ).alias("market_share_pct"),
        )
        .orderBy(F.col("quote_volume_usdt").desc())
        .limit(limit)
    )


def volume_percentile(
    da: DataFrame, symbol: str, target_date: dt.date | str
) -> DataFrame:
    """W1 + W3 — a symbol's rank / total / percentile on one date.

    Reference SQL: volume.py:114-131 (RANK + COUNT(*) OVER (), then
    ROUND(100*(total-rank)/total, 2)).
    """
    cohort = _cohort(da).filter(F.col("date") == F.lit(target_date))
    w = Window.partitionBy("date").orderBy(F.col("quote_volume_usdt").desc())
    wtot = Window.partitionBy("date")
    ranked = cohort.select(
        "symbol",
        F.rank().over(w).alias("rank"),
        F.count(F.lit(1)).over(wtot).alias("total_symbols"),
    )
    return ranked.filter(F.col("symbol") == symbol).select(
        "rank",
        "total_symbols",
        F.round(
            100.0 * (F.col("total_symbols") - F.col("rank")) / F.col("total_symbols"),
            2,
        ).alias("percentile"),
    )


def average_volume(
    da: DataFrame, symbol: str, start: dt.date | str, end: dt.date | str
) -> DataFrame:
    """A3 — AVG/COUNT/MIN/MAX of volume for one symbol over a range.

    Reference SQL: volume.py:169-181. AVG is computed as exact decimal SUM /
    COUNT (bit-stable), matching DuckDB's value on the same data.
    """
    cohort = _cohort(da).filter(
        (F.col("symbol") == symbol) & F.col("date").between(F.lit(start), F.lit(end))
    )
    return cohort.agg(
        (
            F.sum(F.col("quote_volume_usdt").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_volume_usdt"),
        (
            F.sum("trade_count").cast("double") / F.count(F.lit(1))
        ).alias("avg_trade_count"),
        F.count(F.lit(1)).alias("days_with_data"),
        F.min("quote_volume_usdt").alias("min_volume_usdt"),
        F.max("quote_volume_usdt").alias("max_volume_usdt"),
    )


def volume_trend(da: DataFrame, symbol: str, days: int = 30) -> DataFrame:
    """O3 — last-N-days volume trend for a symbol.

    Reference SQL: volume.py:219-232 (ORDER BY date DESC LIMIT n).
    """
    return (
        _cohort(da)
        .filter(F.col("symbol") == symbol)
        .select("date", "quote_volume_usdt", "trade_count")
        .orderBy(F.col("date").desc())
        .limit(days)
    )


def market_summary(da: DataFrame, target_date: dt.date | str) -> DataFrame:
    """A4 — one-row market totals for a date.

    Reference SQL: volume.py:259-269.
    """
    cohort = _cohort(da).filter(F.col("date") == F.lit(target_date))
    return cohort.agg(
        F.sum(F.col("quote_volume_usdt").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_volume_usdt"),
        F.sum("trade_count").alias("total_trade_count"),
        F.count(F.lit(1)).alias("symbol_count"),
        (
            F.sum(F.col("quote_volume_usdt").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_volume_usdt"),
    )


def volume_histogram(da: DataFrame, bin_width: float = 25000.0) -> DataFrame:
    """Volume distribution histogram: (bin, bin_lo, n_records) over rows
    with a volume — the monitoring/planning surface for skew decisions
    (which volume strata dominate, where to cut sampling tiers).

    One narrow projection (floor-divide bin assignment) + one partial-agg
    shuffle on a small integer key — the same shape as a group-count, so
    it runs at scan speed at any table size. The bin id is
    floor(volume / width): float division + floor is deterministic on
    IEEE doubles, and bin_lo = bin · width multiplies an exact small
    integer — both engines agree bit-for-bit.
    """
    b = F.floor(F.col("quote_volume_usdt") / F.lit(bin_width)).cast("long")
    return (
        da.filter(F.col("quote_volume_usdt").isNotNull())
        .select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_records"))
        .select(
            "bin",
            (F.col("bin").cast("double") * F.lit(bin_width)).alias("bin_lo"),
            "n_records",
        )
    )


def symbol_volume_profile(da: DataFrame) -> DataFrame:
    """Per-symbol trading profile through the full value-window family:
    (symbol, n_days, first_volume, second_volume, last_volume,
    total_volume, volume_cume_dist) — FIRST_VALUE / NTH_VALUE /
    LAST_VALUE over each symbol's dated history plus a market-wide
    CUME_DIST of total volume.

    Shape: ONE symbol-key shuffle serves every per-symbol window (same
    partitioning, full-frame); the row_number pick collapses to one row
    per symbol before the cume_dist window, whose input is bounded by
    the symbol universe (the W1 global-window precedent). Totals sum as
    exact DECIMAL(18,2); value columns are read-through doubles — both
    engines agree bit-for-bit, and CUME_DIST's tie semantics (ties share
    the value) make the global window order-stable.
    """
    cohort = _cohort(da).select(
        "symbol", "date", F.col("quote_volume_usdt").alias("qv")
    )
    w_full = (
        Window.partitionBy("symbol")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    profile = (
        cohort.withColumn("first_volume", F.first("qv").over(w_full))
        .withColumn("second_volume", F.nth_value("qv", 2).over(w_full))
        .withColumn("last_volume", F.last("qv").over(w_full))
        .withColumn("n_days", F.count("qv").over(w_full).cast("long"))
        .withColumn(
            "total_volume",
            F.sum(F.col("qv").cast("decimal(18,2)")).over(w_full).cast("double"),
        )
        .withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy("symbol").orderBy("date")),
        )
        .filter(F.col("__rn") == 1)
        .select(
            "symbol", "n_days", "first_volume", "second_volume",
            "last_volume", "total_volume",
        )
    )
    return profile.withColumn(
        "volume_cume_dist", F.cume_dist().over(Window.orderBy("total_volume"))
    )
