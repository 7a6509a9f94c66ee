"""AWS CLI bulk listing + 1d-kline ZIP/CSV parsing — S15, S16.

Parity: reference probing/aws_s3_lister.py —
- S15 ``aws s3 ls --no-sign-request`` per symbol, parsed from
  ``DATE TIME SIZE FILENAME`` lines, CHECKSUM files skipped, the date taken
  from the FILENAME (more reliable than the listing date) (:60-120).
- S16 1d-kline ZIP download → single CSV (optional header) with 12 fields
  → 9 volume/price metrics (:160-295). The metric dict feeds
  operators/backfill.enrich_volume.

Spark-first: line parsing is a native ``regexp_extract`` projection over a
lines DataFrame — at backfill scale (708 symbols × ~2 240 dates) the parse
runs distributed and lands directly in columnar form; the subprocess/ZIP
transports stay injectable driver-side callables so tests are hermetic.
"""

from __future__ import annotations

import csv
import datetime as dt
import io
import zipfile
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_S3 = "s3://data.binance.vision/data/futures/um/daily/klines"
BASE_HTTP = "https://data.binance.vision/data/futures/um/daily/klines"

#: (argv, timeout) -> (returncode, stdout_bytes, stderr_bytes)
RunFn = Callable[[list[str], float], tuple[int, bytes, bytes]]

#: listing line: "2022-03-21 01:58:10      56711 BTCUSDT-1m-2019-12-31.zip"
_LINE_RE = r"^(\d{4}-\d{2}-\d{2}) (\d{2}:\d{2}:\d{2})\s+(\d+)\s+(.+)$"

#: the 12-field 1d-kline row (aws_s3_lister.py:235-295 mapping)
KLINE_FIELDS = [
    "open_time",
    "open",
    "high",
    "low",
    "close",
    "volume",
    "close_time",
    "quote_volume",
    "count",
    "taker_buy_volume",
    "taker_buy_quote_volume",
    "ignore",
]


def _default_run(argv: list[str], timeout: float) -> tuple[int, bytes, bytes]:
    import subprocess

    try:
        r = subprocess.run(
            argv, capture_output=True, timeout=timeout, check=False
        )
    except FileNotFoundError as e:
        raise RuntimeError("AWS CLI not found on PATH") from e
    except subprocess.TimeoutExpired as e:
        raise RuntimeError(f"AWS CLI timeout: {argv}") from e
    return r.returncode, r.stdout, r.stderr


def list_symbol_files_raw(
    symbol: str,
    run: RunFn | None = None,
    granularity: str = "1m",
    timeout: float = 30.0,
) -> str:
    """S15 fetch half — raw ``aws s3 ls`` stdout for one symbol directory.

    Exit 1 + empty output = path absent (valid for delisted symbols);
    nonzero + stderr = real error (aws_s3_lister.py:50-58).
    """
    run = run or _default_run
    url = f"{BASE_S3}/{symbol}/{granularity}/"
    code, out, err = run(["aws", "s3", "ls", url, "--no-sign-request"], timeout)
    if code != 0 and err.strip():
        raise RuntimeError(f"AWS CLI failed for {symbol}: {err.decode().strip()}")
    return out.decode()


def listing_to_df(
    spark: SparkSession, listings: dict[str, str], granularity: str = "1m"
) -> DataFrame:
    """S15 parse half — {symbol: raw ls output} → availability records.

    Native expressions end-to-end: split lines, regexp-extract the
    DATE TIME SIZE FILENAME groups, take the date from the filename, drop
    CHECKSUM and malformed lines — one narrow distributed projection.
    Output: (symbol, date, file_size_bytes, last_modified, url).
    """
    rows = [(s, text) for s, text in listings.items()]
    raw = spark.createDataFrame(rows, "symbol string, raw string")
    lines = raw.select(
        "symbol", F.explode(F.split("raw", r"\n")).alias("line")
    ).filter((F.col("line") != "") & ~F.col("line").contains(".CHECKSUM"))
    parsed = lines.select(
        "symbol",
        F.regexp_extract("line", _LINE_RE, 1).alias("ls_date"),
        F.regexp_extract("line", _LINE_RE, 2).alias("ls_time"),
        F.regexp_extract("line", _LINE_RE, 3).alias("size_str"),
        F.regexp_extract("line", _LINE_RE, 4).alias("filename"),
    ).filter(F.col("filename") != "")
    fname_date = F.regexp_extract(
        "filename",
        r"-" + granularity + r"-(\d{4}-\d{2}-\d{2})\.zip$",
        1,
    )
    return (
        parsed.select(
            "symbol",
            F.try_to_date(fname_date).alias("date"),
            F.col("size_str").cast("long").alias("file_size_bytes"),
            F.try_to_timestamp(
                F.concat_ws(" ", "ls_date", "ls_time")
            ).alias("last_modified"),
            F.concat(
                F.lit(BASE_HTTP + "/"),
                F.col("symbol"),
                F.lit(f"/{granularity}/"),
                F.col("filename"),
            ).alias("url"),
        )
        .filter(F.col("date").isNotNull())
    )


def parse_1d_kline_csv(csv_content: str) -> dict:
    """S16 parse — 12-field kline CSV (optional header row) → 9 metrics.

    Field mapping per aws_s3_lister.py:276-287; 1-2 rows expected, 12
    fields enforced, strict errors otherwise.
    """
    rows = list(csv.reader(io.StringIO(csv_content)))
    if len(rows) == 2:
        row = rows[1]
    elif len(rows) == 1:
        row = rows[0]
    else:
        raise RuntimeError(f"Expected 1-2 rows in 1d kline CSV, got {len(rows)}")
    if len(row) != 12:
        raise RuntimeError(f"Expected 12 fields in 1d kline CSV, got {len(row)}")
    try:
        return {
            "quote_volume_usdt": float(row[7]),
            "trade_count": int(row[8]),
            "volume_base": float(row[5]),
            "taker_buy_volume_base": float(row[9]),
            "taker_buy_quote_volume_usdt": float(row[10]),
            "open_price": float(row[1]),
            "high_price": float(row[2]),
            "low_price": float(row[3]),
            "close_price": float(row[4]),
        }
    except (ValueError, IndexError) as e:
        raise RuntimeError(f"Failed to parse 1d kline numeric fields: {e}") from e


def download_1d_kline(
    symbol: str,
    target_date: dt.date,
    run: RunFn | None = None,
    timeout: float = 30.0,
) -> dict | None:
    """S16 fetch — ``aws s3 cp - `` the 1d ZIP, unzip in memory, parse.

    Exit code 1 = file absent → None (valid); other failures raise.
    """
    run = run or _default_run
    date_str = target_date.isoformat()
    fname = f"{symbol}-1d-{date_str}.zip"
    code, out, err = run(
        ["aws", "s3", "cp", f"{BASE_S3}/{symbol}/1d/{fname}", "-",
         "--no-sign-request"],
        timeout,
    )
    if code == 1:
        return None
    if code != 0:
        raise RuntimeError(
            f"AWS CLI failed downloading 1d kline {symbol} {date_str}: "
            f"{err.decode().strip()}"
        )
    try:
        with zipfile.ZipFile(io.BytesIO(out)) as zf:
            with zf.open(f"{symbol}-1d-{date_str}.csv") as f:
                return parse_1d_kline_csv(f.read().decode("utf-8"))
    except zipfile.BadZipFile as e:
        raise RuntimeError(f"Invalid ZIP for {symbol} {date_str}") from e
    except KeyError as e:
        raise RuntimeError(f"CSV missing in ZIP for {symbol} {date_str}") from e


def klines_to_metrics_df(
    spark: SparkSession,
    klines: Iterable[tuple[dt.date, str, dict]],
) -> DataFrame:
    """(date, symbol, metrics) triples → the metrics DataFrame shape that
    operators/backfill.enrich_volume consumes."""
    rows = [
        (
            d,
            s,
            m["quote_volume_usdt"],
            m["trade_count"],
            m["volume_base"],
            m["taker_buy_volume_base"],
            m["taker_buy_quote_volume_usdt"],
            m["open_price"],
            m["high_price"],
            m["low_price"],
            m["close_price"],
        )
        for d, s, m in klines
    ]
    return spark.createDataFrame(
        rows,
        "date date, symbol string, quote_volume_usdt double, trade_count long,"
        " volume_base double, taker_buy_volume_base double,"
        " taker_buy_quote_volume_usdt double, open_price double,"
        " high_price double, low_price double, close_price double",
    )
