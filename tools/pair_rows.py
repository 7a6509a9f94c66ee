"""Spark-vs-DuckDB pair rows for a NAMED query subset at one SF — the
targeted form of bench.py+oracle_bench.py for scale witnesses where a
full-catalog oracle sweep is wall-clock infeasible (sf10).

Usage: SPARK_GRAFT_SF_DIR=<dir> python tools/pair_rows.py <query> [...]
Prints one JSON line: {"sf_dir":..., "rows": {name: {"spark": s,
"oracle": s, "ratio": r}}} — spark = noop-sink warm min-of-3 after one
cold run (bench.py protocol), oracle = DuckDB wall min-of-3 same process.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from binance_futures_availability_spark.catalog import (  # noqa: E402
    TESTDATA_TABLES,
    table_path,
)
from binance_futures_availability_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    spark = get_session(
        "pair_rows",
        shuffle_partitions=int(os.environ.get("BENCH_SHUFFLE", "8")),
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = table_path(SF_DIR, t)
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    rows = {}
    for name in names:
        fn = qs[name]
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        sts = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            sts.append(time.time() - t0)
        ots = []
        sql = sqls.get(name)
        if sql is not None:
            con.execute(sql).fetchall()  # cold
            for _ in range(3):
                t0 = time.time()
                con.execute(sql).fetchall()
                ots.append(time.time() - t0)
        s = round(min(sts), 3)
        o = round(min(ots), 3) if ots else None
        rows[name] = {
            "spark": s,
            "oracle": o,
            "ratio": round(s / o, 2) if o else None,
        }
        print(f"# {name}: spark {s}s oracle {o}s", file=sys.stderr)
    print(json.dumps({"sf_dir": SF_DIR, "rows": rows}))


if __name__ == "__main__":
    main()
