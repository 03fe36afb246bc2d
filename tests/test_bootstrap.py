"""Bootstrap parts + covering sets (reference: batch/JoinBootstrapJob.scala,
Join.scala:38-60/130-193): pre-joined feature values short-circuit the
join-part computation for covered rows; bootstrap values take precedence
over computed ones; uncovered rows still compute correctly."""

import pytest
from pyspark.sql import functions as F

from chronon_spark.api import (
    Accuracy,
    Aggregation,
    BootstrapPart,
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

BASE = 1704067200000
DAY = 86_400_000


@pytest.fixture(scope="module")
def fixture(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bs")
    right = spark.createDataFrame(
        [(u, BASE + d * DAY + 100 * u, float(u * 10 + d))
         for u in range(6) for d in range(10)],
        "user_id int, ts long, value double",
    )
    right_p = str(root / "right.parquet")
    right.write.parquet(right_p)
    left = spark.createDataFrame(
        [(u, BASE + 9 * DAY + u) for u in range(6)], "user_id int, ts long"
    ).withColumn("ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd"))
    left_p = str(root / "left.parquet")
    left.write.parquet(left_p)
    # bootstrap table covers users 0-2 with a PRE-COMPUTED (wrong-on-purpose
    # sentinel) feature value, keyed on (user_id, ds)
    bs = spark.createDataFrame(
        [(u, "2024-01-10", 9999.0 + u) for u in range(3)],
        "user_id int, ds string, g_value_sum_7d double",
    )
    bs_p = str(root / "bs.parquet")
    bs.write.parquet(bs_p)
    return left_p, right_p, bs_p


def _join(left_p, right_p, bs_p, bootstrap=True):
    gb = GroupBy(
        sources=[EventSource(right_p, Query(
            selects={"user_id": "user_id", "value": "value"}, time_column="ts"))],
        key_columns=["user_id"],
        aggregations=[Aggregation("value", Operation.SUM, windows=[Window(7)])],
        accuracy=Accuracy.TEMPORAL,
        name="g",
    )
    return Join(
        left=EventSource(left_p, Query(
            selects={"user_id": "user_id"}, time_column="ts")),
        join_parts=[JoinPart(gb)],
        row_ids=["user_id", "ds"],
        bootstrap_parts=[BootstrapPart(bs_p)] if bootstrap else None,
        name="bj",
    )


def test_bootstrap_covering_short_circuits(spark, fixture):
    left_p, right_p, bs_p = fixture
    base = {r["user_id"]: r["g_value_sum_7d"]
            for r in compute_join(spark, _join(left_p, right_p, bs_p, False)).collect()}
    out = compute_join(spark, _join(left_p, right_p, bs_p, True))
    got = {r["user_id"]: r["g_value_sum_7d"] for r in out.collect()}
    assert set(got) == set(base) == set(range(6))
    for u in range(3):  # covered: bootstrap sentinel survives untouched
        assert got[u] == pytest.approx(9999.0 + u)
    for u in range(3, 6):  # uncovered: real computation
        assert got[u] == pytest.approx(base[u])
    assert "__matched_hashes" not in out.columns


def test_bootstrap_uncovered_plan_filters_left(spark, fixture):
    """The expensive part computation must see ONLY the uncovered rows —
    the covering filter sits below the cogroup."""
    left_p, right_p, bs_p = fixture
    out = compute_join(spark, _join(left_p, right_p, bs_p, True))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "FlatMapCoGroups" in plan  # uncovered slice still computes
    assert "__matched_hashes" in plan  # covering filter present below


def test_bootstrap_noncovering_columns_ignored(spark, fixture):
    """A bootstrap table with an unrelated column covers nothing: every
    row computes normally."""
    left_p, right_p, bs_p = fixture
    import os

    other = os.path.join(os.path.dirname(bs_p), "other.parquet")
    spark.createDataFrame(
        [(0, "2024-01-10", 1.0)], "user_id int, ds string, unrelated double"
    ).write.mode("overwrite").parquet(other)
    join = _join(left_p, right_p, other, True)
    base = {r["user_id"]: r["g_value_sum_7d"]
            for r in compute_join(spark, _join(left_p, right_p, bs_p, False)).collect()}
    got = {r["user_id"]: r["g_value_sum_7d"]
           for r in compute_join(spark, join).collect()}
    for u in range(6):
        assert got[u] == pytest.approx(base[u])
