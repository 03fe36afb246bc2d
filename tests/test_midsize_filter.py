"""Mid-size left pre-filter (reference: bloom filter, Join.scala:267-285;
ours: broadcast left-semi on distinct left keys): plan assertion + exact
equivalence with the unfiltered join."""

import pytest
from pyspark.sql import functions as F

from chronon_spark.api import (
    Accuracy,
    Aggregation,
    DataFrameSource,
    GroupBy,
    Join,
    JoinPart,
    Operation,
    Window,
)
from chronon_spark.operators.temporal_join import compute_temporal_join

BASE = 1704067200000
DAY = 86_400_000


def _mk_join(spark, n_left):
    right = spark.createDataFrame(
        [(i % 500, BASE + (i % 14) * DAY + i, float(i % 97)) for i in range(8000)],
        "user_id int, ts long, value double",
    )
    left = spark.createDataFrame(
        [(i % 40, BASE + 10 * DAY + i) for i in range(n_left)],
        "user_id int, ts long",
    ).withColumn("ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd"))
    gb = GroupBy(
        sources=[DataFrameSource(lambda s: right)],
        key_columns=["user_id"],
        aggregations=[Aggregation("value", Operation.SUM, windows=[Window(7)])],
        accuracy=Accuracy.TEMPORAL,
        name="g",
    )
    return Join(left=DataFrameSource(lambda s: left), join_parts=[JoinPart(gb)],
                name="j")


def test_midsize_semi_filter_plan_and_values(spark):
    """6k left rows (> small-mode cutoff): the right scan must sit under a
    broadcast left-semi join, and values must equal the unfiltered run."""
    join = _mk_join(spark, 6000)
    spark.conf.set("spark.chronon.backfill.small_mode.cutoff", "5000")
    spark.conf.set("spark.chronon.backfill.bloom.min_right_bytes", "0")
    try:
        out = compute_temporal_join(spark, join)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "LeftSemi" in plan, plan
        rows = {(r["user_id"], r["ts"]): r["g_value_sum_7d"] for r in out.collect()}

        # disable the filter -> same values
        spark.conf.set("spark.chronon.backfill.bloom.cutoff", "0")
        base = compute_temporal_join(spark, join)
        assert "LeftSemi" not in base._jdf.queryExecution().optimizedPlan().toString()
        exp = {(r["user_id"], r["ts"]): r["g_value_sum_7d"] for r in base.collect()}
        assert rows.keys() == exp.keys() and len(rows) == 6000
        for k in exp:
            if exp[k] is None:
                assert rows[k] is None
            else:
                assert rows[k] == pytest.approx(exp[k]), k
    finally:
        spark.conf.unset("spark.chronon.backfill.bloom.cutoff")
        spark.conf.unset("spark.chronon.backfill.small_mode.cutoff")
        spark.conf.unset("spark.chronon.backfill.bloom.min_right_bytes")


def test_midsize_filter_skipped_above_cutoff(spark):
    """A left bigger than the cutoff must NOT pay the broadcast."""
    join = _mk_join(spark, 800)
    spark.conf.set("spark.chronon.backfill.small_mode.cutoff", "100")
    spark.conf.set("spark.chronon.backfill.bloom.cutoff", "500")
    spark.conf.set("spark.chronon.backfill.bloom.min_right_bytes", "0")
    try:
        out = compute_temporal_join(spark, join)
        assert "LeftSemi" not in out._jdf.queryExecution().optimizedPlan().toString()
    finally:
        spark.conf.unset("spark.chronon.backfill.bloom.cutoff")
        spark.conf.unset("spark.chronon.backfill.small_mode.cutoff")
        spark.conf.unset("spark.chronon.backfill.bloom.min_right_bytes")


def test_midsize_filter_skipped_for_small_right(spark, tmp_path):
    """A small FILE-BACKED right scan (below min_right_bytes, known from
    file stats without any job) must not pay the probe or broadcast —
    the default behavior at test scale. In-memory test frames have no
    stats and conservatively apply the filter."""
    from chronon_spark.api import EventSource, Query

    right = spark.createDataFrame(
        [(i % 500, BASE + (i % 14) * DAY + i, float(i % 97)) for i in range(8000)],
        "user_id int, ts long, value double",
    )
    rp = str(tmp_path / "right.parquet")
    right.write.parquet(rp)
    left = spark.createDataFrame(
        [(i % 40, BASE + 10 * DAY + i) for i in range(6000)],
        "user_id int, ts long",
    ).withColumn("ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd"))
    lp = str(tmp_path / "left.parquet")
    left.write.parquet(lp)
    gb = GroupBy(
        sources=[EventSource(rp, Query(
            selects={"user_id": "user_id", "value": "value"}, time_column="ts"))],
        key_columns=["user_id"],
        aggregations=[Aggregation("value", Operation.SUM, windows=[Window(7)])],
        accuracy=Accuracy.TEMPORAL,
        name="g",
    )
    join = Join(
        left=EventSource(lp, Query(selects={"user_id": "user_id"}, time_column="ts")),
        join_parts=[JoinPart(gb)], name="j",
    )
    spark.conf.set("spark.chronon.backfill.small_mode.cutoff", "5000")
    try:
        out = compute_temporal_join(spark, join)
        assert "LeftSemi" not in out._jdf.queryExecution().optimizedPlan().toString()
    finally:
        spark.conf.unset("spark.chronon.backfill.small_mode.cutoff")
