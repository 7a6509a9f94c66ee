"""Time the DuckDB oracle side of the query catalog — the single-node
comparator for bench.py.

Runs every ``oracle_sql()`` statement on the same parquet tables DuckDB-side
and prints one JSON line mirroring bench.py's shape, so Spark-vs-DuckDB is
an apples-to-apples diff at any SF:

    python tools/oracle_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from binance_futures_availability_spark.catalog import (  # noqa: E402
    TESTDATA_TABLES,
    table_path,
)


def run(sf_dir: str) -> dict:
    """One oracle catalog sweep; returns the bench-shaped dict. Importable
    so ``bench.py --assert-budget`` can pair Spark and oracle back-to-back
    in ONE process (cross-process totals vary ±3 s on this box and are not
    comparable)."""
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
            )
        except duckdb.Error:
            pass
    times: dict[str, float] = {}
    for name, sql in entrymod.oracle_sql().items():
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            times[name] = round(time.time() - t0, 3)
        except Exception:  # noqa: BLE001
            times[name] = -1.0
    total = round(sum(v for v in times.values() if v >= 0), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    return {
        "metric": "oracle_catalog_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    print(json.dumps(run(sf_dir)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
