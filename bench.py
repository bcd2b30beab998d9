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

BENCH_QUERIES = [
    "sessionize_full",
    "session_stats",
    "session_revenue",
    "daily_engagement",
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "order_lineitem_left_join",
    "dedup_exact",
    "text_stats",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_dup_pairs",
    "ngram_jaccard_pairs",
    "promo_revenue",
    "events_cube",
    "text_quality",
    "knn_cosine",
    "knn_ivf",
    "cosine_dup_pairs",
    "customer_order_ranks",
    "sales_rollup",
    "anonymize_ip",
    "geo_enrich",
    "ua_parse",
    "touchpoints",
    "unpivot_products",
    "session_window_rollup",
    "traffic_attribution",
    "multimodal_decode",
    "asof_join",
    "order_percentiles",
    "string_funcs",
]


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

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name not in dq.QUERIES:
            continue
        t0 = time.perf_counter()
        dq.QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
