#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full execution, no
driver-side collect overhead).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from google_analytics_to_s3_spark.plans import driver_queries as dq  # noqa: E402
from google_analytics_to_s3_spark.session import get_spark  # noqa: E402

# Every registered query, in stable (alphabetical) order, minus the
# ones that run side-effecting streaming jobs (timed separately by
# their tests) — keeps the bench in sync with the registry.
SKIP = {"streaming_sessions"}
BENCH_QUERIES = sorted(set(dq.QUERIES) - SKIP)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = get_spark(
        app_name="ga-spark-engine-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers once so per-query timings measure the
    # query, not session bootstrap.
    dq.QUERIES["hit_type_mapping"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # This host shows ±2-3x per-query timing noise under sustained
    # all-core load (CPU quota throttling): min-over-N full PASSES
    # reports each query's actual cost instead of whichever run hit a
    # throttle window. Passes (not back-to-back reps) because throttle
    # windows span seconds — consecutive reps of one query land in the
    # same window, while a later pass decorrelates. The wall-clock
    # budget skips extra passes if the run falls behind, so reps can
    # never push the bench past an external timeout.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    # r7 lesson (VERDICT r7 item 3): with 236 queries a throttled
    # first pass alone exceeded the old 420 s budget, so the
    # min-over-passes machinery silently degraded to one cold pass
    # and the driver board showed 2-26x phantom regressions. The
    # second pass is now UNCONDITIONAL — the budget only gates
    # passes >= 3 — and the default budget covers ~2 throttled
    # passes.
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "1200"))
    bench_start = time.perf_counter()

    timings: dict[str, float] = {}
    for _pass in range(reps):
        if _pass > 1 and time.perf_counter() - bench_start > budget:
            break
        for name in BENCH_QUERIES:
            if name not in dq.QUERIES:
                continue
            t0 = time.perf_counter()
            dq.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            if name not in timings or dt < timings[name]:
                timings[name] = dt
            # several dedup/similarity operators persist() intermediates
            # the caller owns; drop them so the query loop doesn't
            # accumulate cached blocks until storage eviction churn
            # sets in (and so each pass re-measures the full compute)
            spark.catalog.clearCache()
    timings = {k: round(v, 3) for k, v in timings.items()}

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(payload))
    # The driver's BENCH_r{N}.json keeps only the LAST ~2000 chars of
    # stdout and parses a JSON line found there; with 180+ queries the
    # full line above is ~5 KB, so its head gets truncated and nothing
    # parses (r2-r5 all recorded parsed=null). Emit a compact summary
    # as the FINAL line — same metric/value plus the slowest queries —
    # sized to always fit inside the tail window, so the driver-side
    # record parses again. The complete per-query dict lives in the
    # first line and in BENCH_FULL_latest.json.
    slowest = dict(sorted(
        timings.items(), key=lambda kv: kv[1], reverse=True
    )[:25])
    compact = {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": "sec",
        "queries": slowest,
        "n_queries": len(timings),
        "queries_truncated_to": "slowest 25 (full set: line 1 / "
                                "BENCH_FULL_latest.json)",
        "sf": payload["sf"],
    }
    print(json.dumps(compact))
    # The driver's BENCH_r{N}.json keeps only a truncated tail of this
    # line; persist the COMPLETE per-query timing set next to it so
    # round-over-round diffs cover every query (committed per round as
    # the PERF.md evidence base).
    try:
        full_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "BENCH_FULL_latest.json",
        )
        with open(full_path, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError:
        pass  # read-only checkout: stdout line is still authoritative
    spark.stop()


if __name__ == "__main__":
    main()
