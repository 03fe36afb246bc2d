"""Regression tests for the round-1 ADVICE / VERDICT findings:

1. dense bucketed snapshot parts must emit rows on event-free days
2. no-agg join parts must not leak same-day / future snapshot partitions
3. modular MergeJob must survive null-valued and duplicated left rows
4. mismatched key dtypes (int left vs string right) must still match
5. skew keys must be filtered from the RIGHT scan too
"""

import pytest
from pyspark.sql import functions as F

from chronon_spark.api import (
    Accuracy,
    Aggregation,
    DataFrameSource,
    EventSource,
    GroupBy,
    Join,
    JoinPart,
    Operation,
    Query,
    Window,
)
from chronon_spark.operators.snapshot_join import compute_join
from chronon_spark.operators.temporal_join import (
    compute_temporal_join,
    temporal_features,
)
from chronon_spark.partitions import PartitionRange

BASE = 1704067200000  # 2024-01-01 UTC
DAY = 86_400_000


def test_dense_bucketed_event_free_day(spark):
    """ADVICE #1: a 7d bucketed SUM must produce the in-window map on a day
    with NO events for the key (snapshot joins read the dense table)."""
    right = spark.createDataFrame(
        [(1, BASE + 5 * DAY + 1000, 10.0, "food"),
         (1, BASE + 5 * DAY + 2000, 4.0, "gas")],
        "user_id int, ts long, value double, cat string",
    )
    # left rows on 01-07 and 01-08: snapshots as of 01-06 / 01-07 — both
    # event-free days, both still inside the 7d window of the 01-06 events
    left = spark.createDataFrame(
        [(1, BASE + 6 * DAY + 500), (1, BASE + 7 * DAY + 500)],
        "user_id int, ts long",
    ).withColumn("ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd"))
    gb = GroupBy(
        sources=[DataFrameSource(lambda s: right)],
        key_columns=["user_id"],
        aggregations=[
            Aggregation("value", Operation.SUM, windows=[Window(7)], buckets=["cat"])
        ],
        accuracy=Accuracy.SNAPSHOT,
        name="b",
    )
    join = Join(left=DataFrameSource(lambda s: left), join_parts=[JoinPart(gb)], name="j")
    rows = sorted(compute_join(spark, join).collect(), key=lambda r: r["ts"])
    for row in rows:
        m = row["b_value_sum_7d_by_cat"]
        assert m is not None, "event-free day returned NULL map"
        assert m["food"] == pytest.approx(10.0)
        assert m["gas"] == pytest.approx(4.0)


def test_no_agg_no_future_leakage(spark):
    """ADVICE #2: a left row must see the latest snapshot <= date(ts)-1,
    never a later partition."""
    dim = spark.createDataFrame(
        [(1, "2024-01-04", "gold"), (1, "2024-01-08", "vip")],
        "cust int, ds string, tier string",
    )
    left = spark.createDataFrame(
        [(1, BASE + 5 * DAY + 10),   # 01-06 -> as of 01-05 -> gold
         (1, BASE + 8 * DAY + 10),   # 01-09 -> as of 01-08 -> vip
         (1, BASE + 7 * DAY + 10)],  # 01-08 -> as of 01-07 -> still gold
        "cust int, ts long",
    ).withColumn("ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd"))
    gb = GroupBy(sources=[DataFrameSource(lambda s: dim)], key_columns=["cust"],
                 aggregations=None, name="dim")
    join = Join(left=DataFrameSource(lambda s: left), join_parts=[JoinPart(gb)], name="j")
    rows = {r["ts"]: r["dim_tier"] for r in compute_join(spark, join).collect()}
    assert rows[BASE + 5 * DAY + 10] == "gold"
    assert rows[BASE + 7 * DAY + 10] == "gold"  # 01-08 partition NOT visible
    assert rows[BASE + 8 * DAY + 10] == "vip"


def test_modular_join_null_and_dup_left(spark, tmp_path):
    """ADVICE #3: MergeJob keyed on row ids — duplicate left rows must stay
    1:1 (not n x n) and null-valued left columns must keep their features."""
    from chronon_spark.plans.backfill import run_modular_join
    from chronon_spark.sources.catalog import ParquetWarehouse

    ev = spark.createDataFrame(
        [(1, BASE + 4 * DAY + 100, 5.0, None),
         (1, BASE + 5 * DAY + 100, 7.0, "x"),
         (1, BASE + 5 * DAY + 100, 7.0, "x"),  # exact duplicate row
         (2, BASE + 5 * DAY + 200, 11.0, None)],
        "user_id int, ts long, value double, note string",
    )
    p = str(tmp_path / "ev.parquet")
    ev.write.parquet(p)
    # left: selects a NULL-valued column and contains an exact duplicate row
    left_q = Query(
        selects={"user_id": "user_id", "note": "note"}, time_column="ts",
        wheres=["user_id = 1"],
    )
    gb = GroupBy(
        sources=[EventSource(p, Query(
            selects={"user_id": "user_id", "value": "value"}, time_column="ts"))],
        key_columns=["user_id"],
        aggregations=[Aggregation("value", Operation.SUM, windows=[Window(7)])],
        accuracy=Accuracy.TEMPORAL,
        name="g",
    )
    # duplicate the left by unioning the source with itself
    join = Join(
        left=EventSource(p, left_q), join_parts=[JoinPart(gb)], name="dupj"
    )
    rng = PartitionRange("2024-01-05", "2024-01-07")

    mono = compute_temporal_join(spark, join, rng)
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    modular = run_modular_join(spark, wh, join, rng)

    mono_rows = sorted(
        [(r["user_id"], r["ts"], r["note"], r["g_value_sum_7d"]) for r in mono.collect()]
    )
    mod_rows = sorted(
        [(r["user_id"], r["ts"], r["note"], r["g_value_sum_7d"]) for r in modular.collect()]
    )
    assert mono_rows == mod_rows and len(mod_rows) > 0
    # the null-note row kept its feature
    null_note = [r for r in mod_rows if r[2] is None]
    assert null_note and all(r[3] is not None for r in null_note)


def test_key_dtype_mismatch_matches(spark):
    """ADVICE #5: left int key vs right string key — the kernel must agree
    with the bucket hash (cast to right types) instead of yielding nulls."""
    right = spark.createDataFrame(
        [("1", BASE + 1000, 2.0), ("1", BASE + 2000, 3.0), ("2", BASE + 1500, 9.0)],
        "user_id string, ts long, value double",
    )
    left = spark.createDataFrame(
        [(1, BASE + 5000), (2, BASE + 5000), (3, BASE + 5000)],
        "user_id int, ts long",
    )
    out = temporal_features(
        left, right, ["user_id"], ["user_id"],
        GroupBy(
            sources=[], key_columns=["user_id"],
            aggregations=[Aggregation("value", Operation.SUM, windows=[Window(7)])],
        ).aggregation_parts(),
    )
    rows = {r["user_id"]: r["value_sum_7d"] for r in out.collect()}
    assert rows[1] == pytest.approx(5.0)
    assert rows[2] == pytest.approx(9.0)
    assert rows[3] is None


def test_skew_keys_filter_right_side(spark):
    """VERDICT wrong#5: excluded hot keys must be filtered from the right
    scan too, not just the left."""
    right = spark.createDataFrame(
        [(i, BASE + 1000 * i, float(i)) for i in range(20)]
        + [(7, BASE + 50_000 + i, 1.0) for i in range(50)]
        + [(8, BASE + 60_000 + i, 1.0) for i in range(50)],
        "user_id int, ts long, value double",
    )
    left = spark.createDataFrame(
        [(i, BASE + 10 * DAY) for i in range(20)], "user_id int, ts long"
    ).withColumn("ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd"))
    gb = GroupBy(
        sources=[DataFrameSource(lambda s: right)],
        key_columns=["user_id"],
        aggregations=[Aggregation("value", Operation.COUNT, windows=[Window(30)])],
        accuracy=Accuracy.TEMPORAL,
        name="g",
    )
    join = Join(
        left=DataFrameSource(lambda s: left),
        join_parts=[JoinPart(gb)],
        skew_keys={"user_id": [7, 8]},
        name="j",
    )
    out = compute_temporal_join(spark, join)
    # hot keys dropped from the left entirely
    got = {r["user_id"] for r in out.collect()}
    assert 7 not in got and 8 not in got
    # and the plan filters them from the RIGHT scan as well: the NOT-IN
    # predicate must appear on both branches of the cogroup
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("7,8") + plan.count("7, 8") >= 2, plan
