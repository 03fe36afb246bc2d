"""Snapshot-accuracy join tests — features "as of end of yesterday"
(reference: EventsEventsSnapshotTest / EventsEntitiesSnapshotTest /
NoAggTest semantics)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from chronon_spark.api import (
    Accuracy,
    Aggregation,
    DataFrameSource,
    EntitySource,
    GroupBy,
    Join,
    JoinPart,
    Operation,
    Window,
)
from chronon_spark.operators.snapshot_join import compute_join

BASE = 1704067200000  # 2024-01-01 UTC
DAY = 86_400_000


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(17)
    ev = [
        (
            int(rng.integers(0, 12)),
            int(BASE + rng.integers(0, 15 * DAY)),
            float(round(rng.uniform(0, 50), 2)),
        )
        for _ in range(1200)
    ]
    right = spark.createDataFrame(ev, "user_id int, ts long, value double")
    q = [(int(rng.integers(0, 12)), int(BASE + rng.integers(2 * DAY, 15 * DAY)))
         for _ in range(300)]
    left = spark.createDataFrame(q, "user_id int, ts long")
    left = left.withColumn("ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd"))
    right.createOrReplaceTempView("sj_events")
    left.createOrReplaceTempView("sj_left")
    return left, right


def test_events_events_snapshot_vs_golden(spark, data):
    """7d-window SUM as of END OF YESTERDAY: for a left row on day D the
    window is [epoch(D-1) - 6d, epoch(D)) — golden per GroupByTest.scala
    shifted onto the left's previous day."""
    left, right = data
    gb = GroupBy(
        sources=[DataFrameSource(lambda s: right)],
        key_columns=["user_id"],
        aggregations=[
            Aggregation("value", Operation.SUM, windows=[Window(7)]),
            Aggregation("value", Operation.COUNT, windows=[Window(7)]),
        ],
        accuracy=Accuracy.SNAPSHOT,
        name="snap",
    )
    join = Join(left=DataFrameSource(lambda s: left), join_parts=[JoinPart(gb)], name="j")
    out = compute_join(spark, join)
    golden = spark.sql(f"""
        WITH l AS (SELECT DISTINCT user_id, ts,
                          CAST(unix_date(to_date(ds)) AS BIGINT) * {DAY} AS day0
                   FROM sj_left)
        SELECT l.user_id, l.ts,
               SUM(CASE WHEN e.ts >= l.day0 - {7 * DAY} AND e.ts < l.day0
                        THEN e.value END) AS snap_value_sum_7d,
               COUNT(CASE WHEN e.ts >= l.day0 - {7 * DAY} AND e.ts < l.day0
                          THEN e.value END) AS snap_value_count_7d
        FROM l LEFT JOIN sj_events e ON l.user_id = e.user_id
        GROUP BY l.user_id, l.ts, l.day0
    """)
    a = {(r["user_id"], r["ts"]): (r["snap_value_sum_7d"], r["snap_value_count_7d"])
         for r in out.collect()}
    b = {(r["user_id"], r["ts"]): (r["snap_value_sum_7d"], r["snap_value_count_7d"])
         for r in golden.collect()}
    assert set(a) == set(b)
    for k in a:
        sa, ca = a[k]
        sb, cb = b[k]
        # engine: count null (dense row exists but no events) == golden 0
        assert (ca or 0) == (cb or 0), f"{k}: count {ca} vs {cb}"
        if sb is None:
            assert sa is None, f"{k}: {sa} vs None"
        else:
            assert sa == pytest.approx(sb), f"{k}"


def test_no_temporal_leakage_same_day(spark, data):
    """An event earlier the SAME day as the left row must NOT be visible
    under snapshot accuracy (only end-of-yesterday state is)."""
    right = spark.createDataFrame(
        [(1, BASE + 5 * DAY + 1000, 100.0),  # same day as query, earlier
         (1, BASE + 4 * DAY, 7.0)],          # yesterday
        "user_id int, ts long, value double",
    )
    left = spark.createDataFrame(
        [(1, BASE + 5 * DAY + 2000)], "user_id int, ts long"
    ).withColumn("ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd"))
    gb = GroupBy(
        sources=[DataFrameSource(lambda s: right)],
        key_columns=["user_id"],
        aggregations=[Aggregation("value", Operation.SUM, windows=[Window(7)])],
        accuracy=Accuracy.SNAPSHOT,
        name="g",
    )
    join = Join(left=DataFrameSource(lambda s: left), join_parts=[JoinPart(gb)], name="j")
    row = compute_join(spark, join).collect()[0]
    assert row["g_value_sum_7d"] == pytest.approx(7.0)  # same-day 100 excluded


def test_mixed_accuracy_join(spark, data):
    """One TEMPORAL part + one SNAPSHOT part in a single join."""
    left, right = data
    src = DataFrameSource(lambda s: right)
    gb_t = GroupBy(sources=[src], key_columns=["user_id"],
                   aggregations=[Aggregation("value", Operation.COUNT, windows=[Window(7)])],
                   accuracy=Accuracy.TEMPORAL, name="t")
    gb_s = GroupBy(sources=[src], key_columns=["user_id"],
                   aggregations=[Aggregation("value", Operation.COUNT, windows=[Window(7)])],
                   accuracy=Accuracy.SNAPSHOT, name="s")
    join = Join(left=DataFrameSource(lambda s: left),
                join_parts=[JoinPart(gb_t), JoinPart(gb_s)], name="j")
    out = compute_join(spark, join)
    rows = out.where("t_value_count_7d IS NOT NULL").collect()
    assert rows
    # temporal count (as of ts, head-inclusive) >= snapshot count shifted a
    # day back MINUS events aging out — just sanity check both populated
    assert {"t_value_count_7d", "s_value_count_7d"} <= set(out.columns)


def test_entity_snapshot_join(spark):
    """(EVENTS, ENTITIES): left events pick the dimension's previous-day
    snapshot row values."""
    snap = spark.createDataFrame(
        [(1, "2024-01-04", 10.0), (1, "2024-01-05", 20.0), (2, "2024-01-04", 5.0),
         (1, "2024-01-06", 30.0)],
        "cust int, ds string, balance double",
    )
    left = spark.createDataFrame(
        [(1, BASE + 5 * DAY + 500)], "cust int, ts long"  # day = 01-06
    ).withColumn("ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd"))
    gb = GroupBy(
        sources=[DataFrameSource(lambda s: snap, entity=True)],
        key_columns=["cust"],
        aggregations=[Aggregation("balance", Operation.LAST, windows=[Window(3)])],
        accuracy=Accuracy.SNAPSHOT,
        name="dim",
    )
    join = Join(left=DataFrameSource(lambda s: left), join_parts=[JoinPart(gb)], name="j")
    row = compute_join(spark, join).collect()[0]
    # left on 01-06 -> snapshot as of 01-05 -> last balance 20.0
    assert row["dim_balance_last_3d"] == pytest.approx(20.0)


def test_no_agg_passthrough_join(spark):
    dim = spark.createDataFrame(
        [(1, "2024-01-04", "gold"), (1, "2024-01-05", "platinum"), (2, "2024-01-05", "basic")],
        "cust int, ds string, tier string",
    )
    left = spark.createDataFrame(
        [(1, BASE + 9 * DAY), (2, BASE + 9 * DAY), (3, BASE + 9 * DAY)], "cust int, ts long"
    ).withColumn("ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd"))
    gb = GroupBy(sources=[DataFrameSource(lambda s: dim)], key_columns=["cust"],
                 aggregations=None, name="dim")
    join = Join(left=DataFrameSource(lambda s: left), join_parts=[JoinPart(gb)], name="j")
    rows = {r["cust"]: r for r in compute_join(spark, join).collect()}
    assert rows[1]["dim_tier"] == "platinum"  # latest snapshot wins
    assert rows[2]["dim_tier"] == "basic"
    assert rows[3]["dim_tier"] is None
