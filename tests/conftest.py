"""Shared fixtures.

Mirrors the reference's fixture style (tests/conftest.py:83-122): a tiny
deterministic world — 3 symbols × 3 days — exercised by every operator test.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import SparkSession

from binance_futures_availability_spark.schema import DAILY_AVAILABILITY
from binance_futures_availability_spark.session import get_session


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = get_session("tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


D1, D2, D3 = dt.date(2024, 1, 13), dt.date(2024, 1, 14), dt.date(2024, 1, 15)
TS = dt.datetime(2024, 1, 16, 0, 0, 0)


def _row(date, symbol, available, qv, tc=100):
    return (
        date,
        symbol,
        available,
        1024 if available else None,
        TS if available else None,
        f"s3://data/{symbol}/{date}",
        200 if available else 404,
        TS,
        qv,
        tc if qv is not None else None,
        None,
        None,
        None,
        None,
        None,
        None,
        None,
    )


@pytest.fixture(scope="session")
def populated_da(spark):
    """3 symbols × 3 days (reference conftest.py:83-122 shape):

    - BTCUSDT: available all 3 days, volumes 300/200/100
    - ETHUSDT: available D1,D2 only (delisted on D3), volumes 30/20
    - NEWUSDT: unavailable D1, available D3 (newly listed), volume 50
    """
    rows = [
        _row(D1, "BTCUSDT", True, 300.0),
        _row(D2, "BTCUSDT", True, 200.0),
        _row(D3, "BTCUSDT", True, 100.0),
        _row(D1, "ETHUSDT", True, 30.0),
        _row(D2, "ETHUSDT", True, 20.0),
        _row(D3, "ETHUSDT", False, None),
        _row(D1, "NEWUSDT", False, None),
        _row(D3, "NEWUSDT", True, 50.0),
    ]
    return spark.createDataFrame(rows, DAILY_AVAILABILITY)
