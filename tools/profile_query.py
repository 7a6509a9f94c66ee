"""Per-query isolation profiler: time + job/stage counts per execution.

Usage: SPARK_GRAFT_SF_DIR=... python tools/profile_query.py q1 [q2 ...]
       python tools/profile_query.py --all-over 0.3   # profile every query
                                                      # whose BENCH_FULL warm
                                                      # time exceeds the bound

Same session shape as bench.py (shuffle=8, AQE off, noop sink). For each
query: one cold run, then WARM_REPS warm runs; reports wall seconds and the
delta in job/stage counts from the status tracker, so "N jobs x floor" vs
"real work" is visible per query (guide 1.1/1.5).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from binance_futures_availability_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_REPS = int(os.environ.get("PROFILE_WARM_REPS", "3"))


def main() -> None:
    args = sys.argv[1:]
    qs = entrymod.queries()
    if args and args[0] == "--all-over":
        bound = float(args[1])
        bench = json.load(open(os.path.join(REPO, "BENCH_FULL.json")))
        names = [n for n, t in bench["queries"].items() if t >= bound]
        names = [n for n in qs if n in names]
    else:
        names = args
    spark = get_session(
        "profile",
        shuffle_partitions=int(os.environ.get("BENCH_SHUFFLE", "8")),
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.locality.wait": "0",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def run(name: str, fn) -> tuple[float, int, int]:
        jobs0 = tracker.getJobIdsForGroup(name)
        sc.setJobGroup(name, name)
        sc.setJobDescription(name)
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        jobs = [j for j in tracker.getJobIdsForGroup(name) if j not in jobs0]
        n_stages = 0
        for j in jobs:
            info = tracker.getJobInfo(j)
            if info:
                n_stages += len(info.stageIds)
        sc.setJobGroup("", "")
        return dt, len(jobs), n_stages

    print(f"{'query':38s} {'cold':>7s} {'warm(min)':>9s} {'jobs':>5s} {'stages':>7s}")
    results = {}
    for name in names:
        if name not in qs:
            print(f"SKIP {name}")
            continue
        fn = qs[name]
        cold, cj, cs = run(name, fn)
        warms = []
        wj = ws = 0
        for _ in range(WARM_REPS):
            w, wj, ws = run(name, fn)
            warms.append(w)
        results[name] = {
            "cold": round(cold, 3),
            "warm": round(min(warms), 3),
            "warm_jobs": wj,
            "warm_stages": ws,
            "cold_jobs": cj,
            "cold_stages": cs,
        }
        print(
            f"{name:38s} {cold:7.3f} {min(warms):9.3f} {wj:5d} {ws:7d}"
            f"   (cold jobs {cj}, stages {cs})"
        )
    out = os.environ.get("PROFILE_OUT", "")
    if out:
        with open(out, "w", encoding="utf-8") as f:
            json.dump(results, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
