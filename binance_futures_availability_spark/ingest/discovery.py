"""S3 XML symbol discovery — S14.

Parity: reference probing/s3_symbol_discovery.py:25-146 — paginated bucket
listing (CommonPrefixes / IsTruncated / NextMarker), symbol = last path
segment, then perpetual-vs-delivery classification.

Pagination is inherently sequential (each page's marker comes from the
previous response), so fetching is driver-side; classification of the
resulting symbol list is the native ``classify_symbol`` expression over a
DataFrame — the same expression the query catalog uses (F10).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable
from xml.etree import ElementTree

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import classify_symbol

#: (url) -> xml bytes
FetchFn = Callable[[str], bytes]

S3_BASE = "https://s3-ap-northeast-1.amazonaws.com/data.binance.vision"
S3_NS = {"s3": "http://s3.amazonaws.com/doc/2006-03-01/"}


def parse_listing_page(xml_data: bytes) -> tuple[list[str], bool, str | None]:
    """One S3 listing page → (symbols, is_truncated, next_marker).

    Raises on malformed XML (strict policy, s3_symbol_discovery.py:117-120).
    """
    try:
        root = ElementTree.fromstring(xml_data)
    except ElementTree.ParseError as e:
        raise RuntimeError(f"Failed to parse S3 listing XML: {e}") from e
    symbols = []
    for el in root.findall(".//s3:CommonPrefixes/s3:Prefix", S3_NS):
        if el.text:
            symbols.append(el.text.rstrip("/").split("/")[-1])
    trunc_el = root.find(".//s3:IsTruncated", S3_NS)
    is_truncated = trunc_el is not None and trunc_el.text == "true"
    marker_el = root.find(".//s3:NextMarker", S3_NS)
    next_marker = marker_el.text if marker_el is not None else None
    return symbols, is_truncated, next_marker


def _default_fetch(url: str) -> bytes:
    import urllib.request

    with urllib.request.urlopen(url, timeout=30) as resp:
        return resp.read()


def discover_symbols(
    fetch: FetchFn | None = None,
    market_type: str = "um",
    granularity: str = "daily",
    max_pages: int = 100,
) -> list[str]:
    """S14 — enumerate all symbol directories under the klines prefix.

    Follows IsTruncated/NextMarker pagination; when NextMarker is absent
    (S3 omits it with a delimiter) falls back to last-symbol-as-marker
    (s3_symbol_discovery.py:130-137).
    """
    from urllib.parse import quote

    fetch = fetch or _default_fetch
    prefix = f"data/futures/{market_type}/{granularity}/klines/"
    all_symbols: list[str] = []
    marker: str | None = None
    for _ in range(max_pages):
        params = f"prefix={quote(prefix)}&delimiter=/"
        if marker:
            params += f"&marker={quote(marker)}"
        try:
            xml_data = fetch(f"{S3_BASE}?{params}")
        except Exception as e:
            raise RuntimeError(f"Failed to fetch S3 listing: {e}") from e
        batch, is_truncated, next_marker = parse_listing_page(xml_data)
        all_symbols.extend(batch)
        if not is_truncated:
            return all_symbols
        if next_marker:
            marker = next_marker
        elif batch:
            marker = f"{prefix}{batch[-1]}/"
        else:
            break
    # strict-error policy (ADR-0003 / batch_prober collect-then-raise): a
    # truncated universe must never be mistaken for the complete one —
    # downstream gap detection would misreport every missing symbol
    raise RuntimeError(
        f"S3 listing still truncated after {max_pages} pages "
        f"({len(all_symbols)} symbols so far); raise max_pages"
    )


def classify_symbols_df(spark: SparkSession, symbols: list[str]) -> DataFrame:
    """(symbol, symbol_type) via the native F10 expression."""
    df = spark.createDataFrame([(s,) for s in symbols], "symbol string")
    return df.select(
        "symbol", classify_symbol(F.col("symbol")).alias("symbol_type")
    ).orderBy("symbol")


def discover_classified(
    spark: SparkSession, fetch: FetchFn | None = None
) -> dict[str, list[str]]:
    """Discovery output in the reference's shape:
    {"perpetual": [...], "delivery": [...]} (s3_symbol_discovery.py:139-146),
    with generation metadata left to the caller."""
    classified = classify_symbols_df(spark, discover_symbols(fetch)).collect()
    return {
        "perpetual": sorted(
            r["symbol"] for r in classified if r["symbol_type"] == "perpetual"
        ),
        "delivery": sorted(
            r["symbol"] for r in classified if r["symbol_type"] == "delivery"
        ),
    }


def symbols_file_payload(discovered: dict[str, list[str]], generated_at: dt.datetime) -> dict:
    """symbols.json-shaped payload (config/symbol_loader.py:12-65 reader)."""
    return {
        "metadata": {
            "generated_at": generated_at.isoformat(),
            "perpetual_count": len(discovered["perpetual"]),
            "delivery_count": len(discovered["delivery"]),
        },
        "perpetual_symbols": discovered["perpetual"],
        "delivery_symbols": discovered["delivery"],
    }


def write_symbols_file(
    path: str,
    discovered: dict[str, list[str]],
    generated_at: dt.datetime | None = None,
) -> dict:
    """Persist the symbols.json artifact the reference's discover workflow
    refreshes (reference scripts/discover_symbols.py + data/symbols.json;
    read back by ``rest.load_symbols``). Atomic: written to a sibling temp
    file and renamed, so a concurrent reader never sees a torn file.
    Returns the payload that was written."""
    import json
    import os

    payload = symbols_file_payload(
        discovered, generated_at or dt.datetime.now(dt.timezone.utc)
    )
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(payload, f, indent=2)
    os.replace(tmp, path)
    return payload
