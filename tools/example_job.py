"""Example production job: point-in-time feature backfill, submitted as

  spark-submit --master <cluster> --py-files dist/chronon_spark.zip \
      tools/example_job.py --events <table-or-path> --output <dir> \
      --start 2024-01-05 --end 2024-01-20

Runs the temporal as-of join through the resumable backfill planner
(unfilled ranges, step chunking, manifest lineage) — re-running after a
failure computes only missing partitions.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession

from chronon_spark.api import (
    Aggregation, EventSource, GroupBy, Join, JoinPart, Operation, Query, Window,
)
from chronon_spark.plans.backfill import join_backfill
from chronon_spark.sources.catalog import ParquetWarehouse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--start", required=True)
    ap.add_argument("--end", required=True)
    ap.add_argument("--step-days", type=int, default=15)
    args = ap.parse_args()

    # on a cluster, spark-submit supplies master/conf; this builder only
    # attaches the engine's session defaults
    spark = SparkSession.builder.appName("chronon-backfill").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    right = EventSource(
        args.events,
        Query(selects={"user_id": "user_id", "value": "value"},
              time_column="unix_millis(cast(ts as timestamp))"),
        topic="events",  # TEMPORAL accuracy
    )
    gb = GroupBy(
        sources=[right],
        key_columns=["user_id"],
        aggregations=[
            Aggregation("value", Operation.COUNT, windows=[Window(1), Window(7), None]),
            Aggregation("value", Operation.SUM, windows=[Window(7), Window(30)]),
            Aggregation("value", Operation.LAST_K, arg_map={"k": 5}, windows=[Window(7)]),
        ],
        name="user_activity",
    )
    join = Join(
        left=EventSource(args.events, Query(
            selects={"event_id": "event_id", "user_id": "user_id"},
            time_column="unix_millis(cast(ts as timestamp))")),
        join_parts=[JoinPart(gb)],
        name="training_features",
    )
    wh = ParquetWarehouse(spark, args.output)
    job = join_backfill(spark, wh, join, "training_features", step_days=args.step_days)
    report = job.run(args.start, args.end)
    print(f"wrote {report.rows_written} rows over "
          f"{len(report.steps)} steps into {args.output}/training_features")


if __name__ == "__main__":
    main()
