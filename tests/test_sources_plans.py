"""Source machinery: JoinSource chaining, cumulative sources, small-mode
pushdown, and physical-plan assertions (predicate pushdown reaches the
parquet scan)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from chronon_spark.api import (
    Aggregation,
    DataFrameSource,
    EventSource,
    GroupBy,
    Join,
    JoinPart,
    JoinSource,
    Operation,
    Query,
    Window,
)

BASE = 1704067200000
DAY = 86_400_000


@pytest.fixture(scope="module")
def events_path(spark, tmp_path_factory):
    rng = np.random.default_rng(23)
    rows = [
        (int(rng.integers(0, 8)), int(BASE + rng.integers(0, 10 * DAY)),
         float(round(rng.uniform(0, 20), 2)))
        for _ in range(800)
    ]
    df = spark.createDataFrame(rows, "user_id int, ts long, value double")
    p = str(tmp_path_factory.mktemp("sp") / "events.parquet")
    df.write.parquet(p)
    return p


def test_join_source_chaining(spark, events_path):
    """GroupBy over a Join's output (reference: replaceJoinSource):
    upstream join computes count_7d per event; the chained GroupBy
    aggregates the MAX of that feature per user per day."""
    src = EventSource(events_path, Query(
        selects={"user_id": "user_id", "value": "value"}, time_column="ts"))
    from chronon_spark.api import Accuracy

    gb_inner = GroupBy(
        sources=[src], key_columns=["user_id"],
        aggregations=[Aggregation("value", Operation.COUNT, windows=[Window(7)])],
        accuracy=Accuracy.TEMPORAL, name="inner",
    )
    upstream = Join(
        left=EventSource(events_path, Query(selects={"user_id": "user_id"}, time_column="ts")),
        join_parts=[JoinPart(gb_inner)],
        name="up",
    )
    chained = GroupBy(
        sources=[JoinSource(join=upstream, query=Query(
            selects={"user_id": "user_id", "cnt": "inner_value_count_7d"},
            time_column="ts"))],
        key_columns=["user_id"],
        aggregations=[Aggregation("cnt", Operation.MAX, windows=[Window(7)])],
        name="outer",
    )
    from chronon_spark.operators.groupby import compute_snapshot_groupby

    out = compute_snapshot_groupby(spark, chained)
    assert out.count() > 0
    assert "cnt_max_7d" in out.columns
    # the max of a running 7d count per user/day must be >= 1
    assert out.where("cnt_max_7d < 1").count() == 0


def test_cumulative_source_uses_latest_partition(spark, tmp_path):
    """is_cumulative: only the latest partition (full history) is scanned;
    stale partitions with garbage values must not leak in."""
    good = [(1, BASE + i * DAY, float(i), "2024-01-10") for i in range(5)]
    stale = [(1, BASE + i * DAY, 999.0, "2024-01-05") for i in range(3)]
    df = spark.createDataFrame(good + stale, "user_id int, ts long, value double, ds string")
    p = str(tmp_path / "cum.parquet")
    df.write.partitionBy("ds").parquet(p)

    src = EventSource(p, Query(selects={"user_id": "user_id", "value": "value"},
                               time_column="ts"), is_cumulative=True)
    from chronon_spark.sources.scan import scan_source

    out = scan_source(spark, src)
    vals = sorted(r["value"] for r in out.collect())
    assert vals == [0.0, 1.0, 2.0, 3.0, 4.0]  # no 999s from the stale partition


def test_small_mode_pushes_key_filter(spark, events_path):
    """With a tiny left, the right scan plan must contain the IN-list
    pushed filter (reference: injectKeyFilter)."""
    from chronon_spark.operators.temporal_join import compute_temporal_join

    left = spark.createDataFrame([(3, BASE + 5 * DAY)], "user_id int, ts long")
    gb = GroupBy(
        sources=[EventSource(events_path, Query(
            selects={"user_id": "user_id", "value": "value"}, time_column="ts"))],
        key_columns=["user_id"],
        aggregations=[Aggregation("value", Operation.SUM, windows=[Window(7)])],
        name="g",
    )
    join = Join(left=DataFrameSource(lambda s: left), join_parts=[JoinPart(gb)], name="j")
    out = compute_temporal_join(spark, join)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    # the user_id IN (3) predicate reached the parquet scan of the right
    assert "In(user_id" in plan or "EqualTo(user_id,3)" in plan.replace(" ", ""), plan[:2000]
    row = out.collect()[0]
    assert row["g_value_sum_7d"] is not None or row["g_value_sum_7d"] is None  # runs


def test_scan_projection_pushdown(spark, events_path):
    """Query-DSL selects must prune columns at the parquet scan
    (ReadSchema contains only what's needed)."""
    from chronon_spark.sources.scan import scan_df

    df = scan_df(spark, events_path, Query(
        selects={"user_id": "user_id"}, time_column="ts",
        wheres=["value > 5.0"]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(value,5.0)" in plan.replace(" ", "")
    # ReadSchema should NOT include columns the query never references
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "value" in read_schema[0]


def test_partition_format_scan(spark, tmp_path):
    """Query.partitionFormat (api.thrift:21): a source partitioned as
    yyyyMMdd is pruned in ITS format (pushed-down string predicates) and
    the column is normalized to engine-canonical yyyy-MM-dd."""
    from chronon_spark.api import Query
    from chronon_spark.partitions import PartitionRange
    from chronon_spark.sources.scan import scan_df

    df = spark.createDataFrame(
        [(1, 1704326400000 + i * 86_400_000, f"2024010{4 + i}") for i in range(4)],
        "user_id int, ts long, ds string",
    )
    p = str(tmp_path / "fmt.parquet")
    df.write.parquet(p)
    out = scan_df(
        spark, p,
        Query(selects={"user_id": "user_id"}, time_column="ts",
              partition_format="yyyyMMdd"),
        PartitionRange("2024-01-05", "2024-01-06"),
    )
    rows = sorted(r["ds"] for r in out.collect())
    assert rows == ["2024-01-05", "2024-01-06"]  # pruned + normalized
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "20240105" in plan  # predicate rendered in the SOURCE format


def test_dataframe_source_honors_query_partition_bounds_and_setups(spark):
    """The DataFrameSource branch (JoinSource / ModelTransformSource /
    cumulative EventSource all route here) must apply the query's OWN
    start/end_partition and run setups, exactly like scan_df — previously
    both were silently ignored, widening the scan."""
    from chronon_spark.sources.scan import scan_source

    rows = [(i, float(i), BASE + i * DAY) for i in range(5)]
    df = spark.createDataFrame(rows, "user_id long, value double, ts long")
    src = DataFrameSource(
        lambda s: df,
        query=Query(
            selects={"user_id": "user_id", "v2": "value * 2"},
            time_column="ts",
            start_partition="2024-01-02",
            end_partition="2024-01-03",
            setups=[
                "CREATE OR REPLACE TEMPORARY VIEW _setup_probe "
                "AS SELECT 1 AS one"
            ],
        ),
    )
    out = scan_source(spark, src)
    got = sorted((r["user_id"], r["ds"]) for r in out.collect())
    assert got == [(1, "2024-01-02"), (2, "2024-01-03")]
    assert spark.sql("SELECT * FROM _setup_probe").count() == 1  # setups ran
