"""Volume backfill — work-list discovery and in-place column enrichment.

Parity: reference scripts/operations/backfill_volume.py:
- P7 missing-volume predicate (:77-82) — rows probed available but whose
  1d-kline volume metrics were never fetched.
- P6 dynamic conjunctive filter builder (:77-106) — optional date-range and
  symbol-list restrictions ANDed onto the work-list query.
- S4 in-place UPDATE of the 9 volume columns (:109-160) — parquet has no
  in-place update, so the Spark shape is a left join + per-column COALESCE
  (metrics win when present), after which the touched date partitions are
  rewritten via writer.upsert_partitioned.

Scale: the work-list is a pruned narrow scan (predicate pushed to parquet);
the enrich join broadcasts when the metrics batch is small (the normal case:
a daily backfill touches a bounded set of (date, symbol) cells).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: the 9 columns the reference's UPDATE statement sets
#: (backfill_volume.py:109-160)
VOLUME_COLS = [
    "quote_volume_usdt",
    "trade_count",
    "volume_base",
    "taker_buy_volume_base",
    "taker_buy_quote_volume_usdt",
    "open_price",
    "high_price",
    "low_price",
    "close_price",
]


def apply_backfill_filters(
    df: DataFrame,
    start: dt.date | str | None = None,
    end: dt.date | str | None = None,
    symbols: Sequence[str] | None = None,
) -> DataFrame:
    """P6 — chain optional conjunctive predicates (reference builds SQL
    strings; here each arg is one ``.filter`` Catalyst folds into the scan)."""
    if start is not None:
        df = df.filter(F.col("date") >= F.lit(start))
    if end is not None:
        df = df.filter(F.col("date") <= F.lit(end))
    if symbols is not None:
        df = df.filter(F.col("symbol").isin(list(symbols)))
    return df


def missing_volume(
    da: DataFrame,
    start: dt.date | str | None = None,
    end: dt.date | str | None = None,
    symbols: Sequence[str] | None = None,
) -> DataFrame:
    """P7 — the backfill work-list: available rows with no volume metrics.

    Reference SQL: backfill_volume.py:77-82 (``available = TRUE AND
    quote_volume_usdt IS NULL``), ordered for stable batching. Distributed
    range sort, not ``gathered_sort``: after an outage or on first
    backfill the work-list is a large fraction of the fact table, so it is
    NOT bounded by #symbols/#dates and must never gather to one task.
    """
    base = da.filter(F.col("available") & F.col("quote_volume_usdt").isNull())
    base = apply_backfill_filters(base, start, end, symbols)
    return base.select("date", "symbol", "url").orderBy("date", "symbol")


def enrich_volume(da: DataFrame, metrics: DataFrame) -> DataFrame:
    """S4 — apply fetched kline metrics to the fact table (UPDATE-equivalent).

    ``metrics`` carries (date, symbol) plus any subset of VOLUME_COLS; for
    those columns the metric value wins where present (COALESCE), matching
    the reference's ``UPDATE ... SET col = ? WHERE symbol = ? AND date = ?``.
    Returns the full-width table; persist with writer.upsert_partitioned to
    rewrite only the touched date partitions.
    """
    cols = [c for c in VOLUME_COLS if c in metrics.columns]
    m = metrics.select(
        "date", "symbol", *[F.col(c).alias(f"__m_{c}") for c in cols]
    )
    joined = da.join(F.broadcast(m), ["date", "symbol"], "left")
    # original column order preserved; metric temporaries dropped
    return joined.select(
        *[
            F.coalesce(F.col(f"__m_{c}"), F.col(c)).alias(c)
            if c in cols
            else F.col(c)
            for c in da.columns
        ]
    )
