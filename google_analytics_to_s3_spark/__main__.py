"""Daily-job entrypoint — the reference's EP3 ``main()``
(sessionization/main.py:1335-1390) as a CLI over the library:

    python -m google_analytics_to_s3_spark \\
        --input  /data/enriched/ga/year=2026/month=08/day=13 \\
        --output /data/aggregated/ga/daily \\
        --history /data/aggregated/ga/sessions_history \\
        --date 2026-08-13

Reads the day's enriched JSONL hits with the explicit 266-column
schema (S1 — no RDD normalizer), runs the full pipeline (sessionize →
attribution → unpivot → six GA360 marts, with touchpoints recomputed
over history ∪ today when --history is given), filters each mart to
the job date (P5, as ``to_date(timestamp) = date`` instead of the
reference's string ``contains``), appends today's sessions to the
history table (S3) and writes each mart under Hive-style
``type=X/year=Y/month=M/day=D`` (S4) so downstream reads
partition-prune natively.
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F


def _query_main(argv: list[str]) -> None:
    """``query`` subcommand: run any registered analytics query.

        python -m google_analytics_to_s3_spark query list
        python -m google_analytics_to_s3_spark query pricing_summary \\
            --sf-dir /root/testdata/sf0.01 --limit 20
        python -m google_analytics_to_s3_spark query rfm_segments \\
            --sf-dir /data/tables --out /data/marts/rfm
    """
    p = argparse.ArgumentParser(
        prog="python -m google_analytics_to_s3_spark query",
        description="Run a registered query from the analytics registry.",
    )
    p.add_argument("name", help="query name, or 'list' to enumerate")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                   help="directory holding the parquet tables")
    p.add_argument("--limit", type=int, default=20,
                   help="rows to show when --out is not given")
    p.add_argument("--out", default=None,
                   help="write the full result as parquet here instead "
                        "of showing rows")
    p.add_argument("--master", default=None,
                   help="Spark master override (default: session config)")
    args = p.parse_args(argv)

    from .plans import driver_queries as dq

    if args.name == "list":
        for n in sorted(dq.QUERIES):
            print(n)
        return
    if args.name not in dq.QUERIES:
        raise SystemExit(
            f"unknown query {args.name!r}; "
            f"run 'query list' for the {len(dq.QUERIES)} available"
        )

    from .session import get_spark

    spark = (
        get_spark(master=args.master) if args.master else get_spark()
    )
    df = dq.QUERIES[args.name](spark, args.sf_dir)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print({"query": args.name, "out": args.out, "rows": df.count()})
    else:
        df.show(args.limit, truncate=False)


def main(argv: list[str] | None = None) -> None:
    if argv is None:
        import sys as _sys

        argv = _sys.argv[1:]
    argv = list(argv)
    if argv and argv[0] == "query":
        return _query_main(argv[1:])
    p = argparse.ArgumentParser(
        prog="python -m google_analytics_to_s3_spark",
        description="Run the daily GA sessionization/export job.",
    )
    p.add_argument("--input", required=True,
                   help="enriched JSONL path/glob for the day")
    p.add_argument("--output", required=True,
                   help="base dir for the six daily marts")
    p.add_argument("--date", required=True, help="job date YYYY-MM-DD")
    p.add_argument("--history", default=None,
                   help="session-history parquet dir (read + appended)")
    p.add_argument("--master", default=None,
                   help="Spark master override (default: session config)")
    p.add_argument("--hot-visitor-min-hits", type=int, default=None,
                   help="hot/cold split threshold for skewed visitors")
    p.add_argument("--no-day-filter", action="store_true",
                   help="keep hits of every date in the outputs")
    args = p.parse_args(argv)

    from .plans.pipeline import run_daily_pipeline
    from .session import get_spark
    from .sources.ga import (
        append_session_history,
        load_own_session_history,
        read_enriched_hits,
        save_daily_marts,
    )

    spark = (
        get_spark(master=args.master) if args.master else get_spark()
    )
    hits = read_enriched_hits(spark, args.input)
    history = (
        load_own_session_history(spark, args.history)
        if args.history
        else None
    )
    marts = run_daily_pipeline(
        hits,
        session_history=history,
        hot_visitor_min_hits=args.hot_visitor_min_hits,
    )
    if not args.no_day_filter:
        marts = {
            name: df.filter(
                F.to_date("timestamp") == F.lit(args.date).cast("date")
            )
            for name, df in marts.items()
        }
    if args.history:
        append_session_history(marts["sessions"], args.history)
    save_daily_marts(marts, args.output, args.date)
    counts = {n: df.count() for n, df in marts.items()}
    print({"date": args.date, "rows": counts})


if __name__ == "__main__":
    main()
