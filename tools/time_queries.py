"""Targeted warm-latency timer for a subset of catalog queries.

Mirrors bench.py's protocol (noop sink, min-of-3 warm after a cold pass,
shuffle=8, AQE off) but runs only the named queries, so an A/B of one
operator change costs seconds, not a full-catalog sweep.

Usage: python tools/time_queries.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from binance_futures_availability_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    spark = get_session(
        "time_queries",
        shuffle_partitions=int(os.environ.get("BENCH_SHUFFLE", "8")),
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.locality.wait": "0",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    missing = [n for n in names if n not in qs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    def run(name: str) -> float:
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    cold = {n: run(n) for n in names}
    reps: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(3):
        for n in names:
            reps[n].append(run(n))
    out = {
        "cold": cold,
        "warm": {n: min(r) for n, r in reps.items()},
        "reps": reps,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
