"""Backfill work-list / enrich (S4, P6, P7) and classify_symbol (F10)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from binance_futures_availability_spark.functions import classify_symbol
from binance_futures_availability_spark.operators import backfill
from binance_futures_availability_spark.schema import DAILY_AVAILABILITY

from conftest import _row

D = dt.date


def make_da(spark, rows):
    return spark.createDataFrame([_row(*r) for r in rows], DAILY_AVAILABILITY)


def _fixture(spark):
    return make_da(
        spark,
        [
            (D(2024, 1, 1), "BTCUSDT", True, None),  # missing volume
            (D(2024, 1, 1), "ETHUSDT", True, 50.0),  # has volume
            (D(2024, 1, 2), "BTCUSDT", True, None),  # missing volume
            (D(2024, 1, 2), "XRPUSDT", False, None),  # unavailable → excluded
        ],
    )


def test_missing_volume_worklist(spark):
    got = backfill.missing_volume(_fixture(spark)).collect()
    assert [(r["date"], r["symbol"]) for r in got] == [
        (D(2024, 1, 1), "BTCUSDT"),
        (D(2024, 1, 2), "BTCUSDT"),
    ]


def test_missing_volume_dynamic_filters(spark):
    da = _fixture(spark)
    got = backfill.missing_volume(da, start=D(2024, 1, 2)).collect()
    assert [(r["date"], r["symbol"]) for r in got] == [(D(2024, 1, 2), "BTCUSDT")]
    got = backfill.missing_volume(da, symbols=["ETHUSDT"]).collect()
    assert got == []


def test_enrich_volume_fills_only_matched(spark):
    da = _fixture(spark)
    metrics = spark.createDataFrame(
        [(D(2024, 1, 1), "BTCUSDT", 123.0, 42)],
        ["date", "symbol", "quote_volume_usdt", "trade_count"],
    )
    out = {
        (r["date"], r["symbol"]): r
        for r in backfill.enrich_volume(da, metrics).collect()
    }
    assert out[(D(2024, 1, 1), "BTCUSDT")]["quote_volume_usdt"] == 123.0
    assert out[(D(2024, 1, 1), "BTCUSDT")]["trade_count"] == 42
    # untouched rows keep their values (including remaining NULL)
    assert out[(D(2024, 1, 1), "ETHUSDT")]["quote_volume_usdt"] == 50.0
    assert out[(D(2024, 1, 2), "BTCUSDT")]["quote_volume_usdt"] is None
    # column set and order preserved
    assert backfill.enrich_volume(da, metrics).columns == da.columns


def test_classify_symbol(spark):
    df = spark.createDataFrame(
        [
            ("BTCUSDT",),  # no suffix → perpetual
            ("BTCUSDT_240229",),  # valid leap date → delivery
            ("BTCUSDT_991399",),  # month 13 → perpetual
            ("BTCUSDT_000000",),  # day 0 → perpetual
            ("ETH_USDT_210630",),  # suffix after last underscore → delivery
            ("BTCUSDT_12345",),  # 5 digits → perpetual
        ],
        ["symbol"],
    )
    got = {
        r["symbol"]: r["t"]
        for r in df.select("symbol", classify_symbol(F.col("symbol")).alias("t")).collect()
    }
    assert got == {
        "BTCUSDT": "perpetual",
        "BTCUSDT_240229": "delivery",
        "BTCUSDT_991399": "perpetual",
        "BTCUSDT_000000": "perpetual",
        "ETH_USDT_210630": "delivery",
        "BTCUSDT_12345": "perpetual",
    }
