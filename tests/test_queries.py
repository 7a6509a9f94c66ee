"""Operator unit tests on the 3×3 fixture — reference test parity:
tests/test_queries/test_snapshots.py, test_validation/test_continuity.py."""

from __future__ import annotations

import datetime as dt

from binance_futures_availability_spark.operators import (
    analytics,
    snapshots,
    timelines,
    volume,
)
from binance_futures_availability_spark.validation import completeness, continuity

from conftest import D1, D2, D3


def test_snapshot_returns_available_sorted(populated_da):
    rows = snapshots.available_symbols_on_date(populated_da, D3).collect()
    assert [r["symbol"] for r in rows] == ["BTCUSDT", "NEWUSDT"]


def test_snapshot_empty_out_of_range(populated_da):
    assert (
        snapshots.available_symbols_on_date(populated_da, dt.date(2020, 1, 1)).count()
        == 0
    )


def test_range_distinct(populated_da):
    rows = snapshots.symbols_available_in_range(populated_da, D1, D3).collect()
    assert [r["symbol"] for r in rows] == ["BTCUSDT", "ETHUSDT", "NEWUSDT"]


def test_timeline(populated_da):
    rows = timelines.availability_timeline(populated_da, "ETHUSDT").collect()
    assert [(r["date"], r["available"]) for r in rows] == [
        (D1, True),
        (D2, True),
        (D3, False),
    ]


def test_first_last_listing(populated_da):
    assert timelines.first_listing_date(populated_da, "NEWUSDT").collect()[0][
        "first_date"
    ] == D3
    assert timelines.last_available_date(populated_da, "ETHUSDT").collect()[0][
        "last_date"
    ] == D2


def test_trend(populated_da):
    rows = analytics.availability_trend(populated_da).collect()
    assert [(r["date"], r["available_count"]) for r in rows] == [
        (D1, 2),
        (D2, 2),
        (D3, 2),
    ]


def test_new_listings(populated_da):
    rows = analytics.new_listings(populated_da, D3).collect()
    assert [r["symbol"] for r in rows] == ["NEWUSDT"]


def test_delistings(populated_da):
    rows = analytics.delistings(populated_da, D3).collect()
    assert [r["symbol"] for r in rows] == ["ETHUSDT"]


def test_stats(populated_da):
    r = analytics.availability_stats(populated_da).collect()[0]
    assert r["total_records"] == 8
    assert r["available_records"] == 6
    assert r["unavailable_records"] == 2
    assert r["distinct_dates"] == 3
    assert r["distinct_symbols"] == 3


def test_top_by_volume(populated_da):
    rows = volume.top_by_volume(populated_da, D3, limit=10).collect()
    assert [(r["symbol"], r["volume_rank"]) for r in rows] == [
        ("BTCUSDT", 1),
        ("NEWUSDT", 2),
    ]
    # share: 100*100/150, 100*50/150 rounded
    assert [r["market_share_pct"] for r in rows] == [66.67, 33.33]


def test_top_by_volume_min_volume(populated_da):
    rows = volume.top_by_volume(populated_da, D3, limit=10, min_volume=60.0).collect()
    assert [r["symbol"] for r in rows] == ["BTCUSDT"]


def test_volume_percentile(populated_da):
    r = volume.volume_percentile(populated_da, "NEWUSDT", D3).collect()[0]
    assert r["rank"] == 2 and r["total_symbols"] == 2
    assert r["percentile"] == 0.0


def test_average_volume(populated_da):
    r = volume.average_volume(populated_da, "BTCUSDT", D1, D3).collect()[0]
    assert r["avg_volume_usdt"] == 200.0
    assert r["days_with_data"] == 3
    assert r["min_volume_usdt"] == 100.0
    assert r["max_volume_usdt"] == 300.0


def test_market_summary(populated_da):
    r = volume.market_summary(populated_da, D1).collect()[0]
    assert r["total_volume_usdt"] == 330.0
    assert r["symbol_count"] == 2


def test_continuity_no_gaps(populated_da):
    assert continuity.find_gaps(populated_da, D1, D3).count() == 0


def test_continuity_gaps(populated_da):
    rows = continuity.find_gaps(
        populated_da, dt.date(2024, 1, 12), dt.date(2024, 1, 16)
    ).collect()
    assert [r["expected_date"] for r in rows] == [
        dt.date(2024, 1, 12),
        dt.date(2024, 1, 16),
    ]


def test_incomplete_dates(populated_da):
    rows = completeness.incomplete_dates(populated_da, 3).collect()
    # every fixture date has 2 available < 3
    assert [r["date"] for r in rows] == [D1, D2, D3]
    assert all(r["symbol_count"] == 2 for r in rows)
