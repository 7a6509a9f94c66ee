"""Physical-plan assertions — the scale properties, checked in CI.

Correctness tests prove values; these prove the *plan shapes* that make the
operators survive a 100× scale-up: predicate pushdown into the parquet
scan, partition pruning on date-partitioned layouts, column pruning,
broadcast anti-joins, and shuffle budgets.
"""

from __future__ import annotations

import datetime as dt

import pytest

from binance_futures_availability_spark.operators import (
    analytics,
    rankings,
    snapshots,
    timelines,
)
from binance_futures_availability_spark.schema import DAILY_AVAILABILITY
from binance_futures_availability_spark.sources import writer

from conftest import _row

D = dt.date


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def partitioned_table(spark, tmp_path_factory):
    rows = [
        _row(D(2024, 1, d), s, True, 100.0 * d)
        for d in (1, 2, 3)
        for s in ("BTCUSDT", "ETHUSDT")
    ]
    da = spark.createDataFrame(rows, DAILY_AVAILABILITY)
    path = str(tmp_path_factory.mktemp("plans") / "fact")
    writer.write_partitioned(da, path, partition_col="date")
    return spark.read.parquet(path)


def test_snapshot_prunes_date_partitions(partitioned_table):
    plan = _plan(
        snapshots.available_symbols_on_date(partitioned_table, D(2024, 1, 2))
    )
    # the date equality lands in PartitionFilters, not a post-scan Filter
    assert "PartitionFilters" in plan
    assert "date" in plan.split("PartitionFilters")[1][:200]


def test_timeline_pushes_symbol_filter_to_scan(partitioned_table):
    plan = _plan(timelines.availability_timeline(partitioned_table, "BTCUSDT"))
    pushed = plan.split("PushedFilters")[1][:200]
    assert "EqualTo(symbol,BTCUSDT)" in pushed


def test_snapshot_prunes_columns(partitioned_table):
    plan = _plan(
        snapshots.available_symbols_on_date(partitioned_table, D(2024, 1, 2))
    )
    read_schema = plan.split("ReadSchema")[1][:300]
    # projection reaches the scan: unused wide columns are absent
    for col in ("url", "quote_volume_usdt", "open_price"):
        assert col not in read_schema
    assert "file_size_bytes" in read_schema


def test_new_listings_broadcasts_anti_join(partitioned_table):
    plan = _plan(analytics.new_listings(partitioned_table, D(2024, 1, 2)))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_rankings_shuffle_budget(partitioned_table):
    """The rankings pipeline performs exactly 2 data shuffles (by date for
    ranks, by symbol for lags/trailing) + 1 range exchange for the output
    sort — the reference's 3-way CTE self-join is fused away (no joins)."""
    plan = _plan(
        rankings.volume_rankings(partitioned_table, generated_at="2026-01-01")
    )
    assert "Join" not in plan  # window fusion eliminated J1/J2
    n_exchanges = plan.count("Exchange ")
    assert n_exchanges <= 3, plan


def test_gathered_sort_has_no_range_exchange(partitioned_table):
    plan = _plan(
        snapshots.available_symbols_on_date(partitioned_table, D(2024, 1, 2))
    )
    assert "rangepartitioning" not in plan.lower()
    assert "SinglePartition" in plan
