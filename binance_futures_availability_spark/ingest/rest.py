"""REST + config sources — S17 (exchangeInfo), S18 (symbols.json).

Parity: reference validation/cross_check.py:37-77 (fetch + PERPETUAL/
TRADING/USDT filter) and config/symbol_loader.py:15-65 (JSON loader with
perpetual/delivery/all selection).

The filter half is expressed both host-side (tiny set arithmetic feeding
validation/cross_check) and as a DataFrame predicate for symmetry with the
reference's documented mapping (SURVEY.md §2.1 S17).
"""

from __future__ import annotations

import json
from collections.abc import Callable
from pathlib import Path
from typing import Literal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FetchFn = Callable[[str], bytes]

EXCHANGE_INFO_URL = "https://fapi.binance.com/fapi/v1/exchangeInfo"


def _default_fetch(url: str) -> bytes:
    import urllib.request

    with urllib.request.urlopen(url, timeout=10) as resp:
        return resp.read()


def fetch_exchange_info(fetch: FetchFn | None = None) -> dict:
    """S17 fetch — raw exchangeInfo payload; strict raise on failure."""
    fetch = fetch or _default_fetch
    try:
        return json.loads((fetch)(EXCHANGE_INFO_URL).decode())
    except Exception as e:
        raise RuntimeError(f"Failed to fetch exchangeInfo from API: {e}") from e


def current_usdt_perpetuals(info: dict) -> set[str]:
    """S17 filter — TRADING PERPETUAL *USDT symbols (cross_check.py:68-74)."""
    return {
        s["symbol"]
        for s in info.get("symbols", [])
        if s.get("contractType") == "PERPETUAL"
        and s.get("status") == "TRADING"
        and s.get("symbol", "").endswith("USDT")
    }


def exchange_info_df(spark: SparkSession, info: dict) -> DataFrame:
    """S17 as a dimension DataFrame with the same predicate as a Catalyst
    filter — the shape used when the API set joins against the fact table."""
    rows = [
        (
            s.get("symbol"),
            s.get("status"),
            s.get("contractType"),
        )
        for s in info.get("symbols", [])
    ]
    df = spark.createDataFrame(
        rows, "symbol string, status string, contractType string"
    )
    return df.filter(
        (F.col("contractType") == "PERPETUAL")
        & (F.col("status") == "TRADING")
        & F.col("symbol").endswith("USDT")
    ).select("symbol")


def load_symbols(
    path: str | Path,
    contract_type: Literal["perpetual", "delivery", "all"] = "perpetual",
) -> list[str]:
    """S18 — symbols.json loader (symbol_loader.py:15-65 semantics:
    missing file and bad contract_type are strict errors)."""
    p = Path(path)
    if not p.exists():
        raise FileNotFoundError(f"Symbols data file not found: {p}")
    data = json.loads(p.read_text(encoding="utf-8"))
    perpetual = data["perpetual_symbols"]
    delivery = data["delivery_symbols"]
    if contract_type == "perpetual":
        return perpetual
    if contract_type == "delivery":
        return delivery
    if contract_type == "all":
        return perpetual + delivery
    raise ValueError(
        f"Invalid contract_type: {contract_type!r}. "
        "Must be 'perpetual', 'delivery', or 'all'"
    )
