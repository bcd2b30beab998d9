#!/usr/bin/env python3
"""Optimization-round profiling harness (guide §1).

Times, for each named query: DataFrame construction (driver/py4j) and
noop-sink execution (guide §1.4), optionally dumping
``.explain("formatted")`` to plans/r13/<name>_<tag>.txt.

Usage:
    python scripts/opt_profile.py [--plans TAG] [--reps N] name [name ...]
    python scripts/opt_profile.py --all          # every benchable query
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from google_analytics_to_s3_spark.plans import driver_queries as dq  # noqa: E402
from google_analytics_to_s3_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--plans", default=None, help="dump explain to plans/r13/<name>_<TAG>.txt")
    ap.add_argument("--plan-only", action="store_true", help="no noop execution, just build + explain")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    names = sorted(set(dq.QUERIES) - {"streaming_sessions"}) if args.all else args.names
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="opt-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM the same way bench.py does
    dq.QUERIES["hit_type_mapping"](spark, args.sf_dir).write.format("noop").mode("overwrite").save()

    plan_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    if args.plans:
        os.makedirs(plan_dir, exist_ok=True)

    out = {}
    for name in names:
        if name not in dq.QUERIES:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        best_build = best_exec = float("inf")
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"opt: {name}")
            t0 = time.perf_counter()
            df = dq.QUERIES[name](spark, args.sf_dir)
            t1 = time.perf_counter()
            if not args.plan_only:
                df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            best_build = min(best_build, t1 - t0)
            best_exec = min(best_exec, t2 - t1)
            spark.catalog.clearCache()
        if args.plans:
            df = dq.QUERIES[name](spark, args.sf_dir)
            with open(os.path.join(plan_dir, f"{name}_{args.plans}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        out[name] = {"build": round(best_build, 3), "exec": round(best_exec, 3)}
        print(f"{name:40s} build={best_build:7.3f}  exec={best_exec:7.3f}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
