"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Each query plan is fully executed via
the noop sink (materializes every output column; nothing collected to the
driver). Session startup is excluded; one warmup query primes the JVM.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from binance_futures_availability_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_df(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_session("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warmup: prime JVM/codegen with the smallest query
    try:
        run_df(qs["availability_snapshot"](spark, SF_DIR))
    except Exception:  # noqa: BLE001
        pass

    times: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.time()
        try:
            run_df(fn(spark, SF_DIR))
            times[name] = round(time.time() - t0, 3)
        except Exception:  # noqa: BLE001
            times[name] = -1.0

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    total = round(sum(t for t in times.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "query_catalog_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
