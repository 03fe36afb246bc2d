"""Conf analysis (reference: spark/.../Analyzer.scala — analyzeGroupBy /
analyzeJoin / runSchemaValidation / runTimestampChecks)."""

import pytest
from pyspark.sql import Row

from chronon_spark.api import (
    Aggregation,
    EventSource,
    GroupBy,
    Join,
    JoinPart,
    Operation,
    Query,
    Window,
)
from chronon_spark.operators.analyzer import (
    aggregation_metadata_df,
    analyze_group_by,
    analyze_join,
    run_timestamp_checks,
    validate_timestamp_checks,
)
from chronon_spark.sources.scan import DataFrameSource

TS = 1_704_067_200_000  # 2024-01-01


def _events_src(spark, with_topic=False):
    df = spark.createDataFrame(
        [Row(user_id=i % 3, value=float(i), ts=TS + i * 1000, ds="2024-01-01")
         for i in range(50)]
    )
    return DataFrameSource(
        lambda s, _df=df: _df,
        Query(selects={"user_id": "user_id", "value": "value"}),
        topic="t" if with_topic else None,
    )


def test_analyze_group_by_metadata(spark):
    gb = GroupBy(
        sources=[_events_src(spark)],
        key_columns=["user_id"],
        aggregations=[
            Aggregation("value", Operation.SUM, windows=[Window(7)]),
            Aggregation("value", Operation.COUNT, windows=[None]),
            Aggregation("value", Operation.LAST_K, arg_map={"k": 5},
                        windows=[Window(7)]),
        ],
        name="probe_gb",
    )
    meta, keys = analyze_group_by(spark, gb)
    by_name = {m.name: m for m in meta}
    assert set(by_name) == {"value_sum_7d", "value_count", "value_last5_7d"}
    assert by_name["value_sum_7d"].column_type == "double"
    assert by_name["value_count"].column_type == "bigint"
    assert by_name["value_count"].window == "unbounded"
    assert by_name["value_last5_7d"].column_type == "array<double>"
    assert by_name["value_last5_7d"].operation == "last_k"
    assert all(m.group_by == "probe_gb" for m in meta)
    assert keys == {"user_id": "bigint"}


def test_analyze_join_prefixes_and_validation_ok(spark):
    gb = GroupBy(
        sources=[_events_src(spark)], key_columns=["user_id"],
        aggregations=[Aggregation("value", Operation.AVERAGE, windows=[Window(7)])],
        name="gb_a",
    )
    join = Join(left=_events_src(spark), join_parts=[JoinPart(gb)], name="j")
    res = analyze_join(spark, join)
    assert [m.name for m in res["agg_metadata"]] == ["gb_a_value_average_7d"]
    assert res["key_errors"] == []
    assert res["timestamp_checks"]["notNullCount"] != "0"
    assert res["timestamp_checks"]["badRangeCount"] == "0"


def test_analyze_join_detects_key_problems(spark):
    gb = GroupBy(
        sources=[_events_src(spark)], key_columns=["user_id"],
        aggregations=[Aggregation("value", Operation.SUM, windows=[None])],
        name="gb_b",
    )
    # left lacks the key entirely
    left_df = spark.createDataFrame([Row(other=1, ts=TS, ds="2024-01-01")])
    join = Join(
        left=DataFrameSource(lambda s, _df=left_df: _df, Query()),
        join_parts=[JoinPart(gb)],
        name="bad",
    )
    res = analyze_join(spark, join)
    assert len(res["key_errors"]) == 1
    assert "doesn't contain the key user_id" in res["key_errors"][0][1]
    with pytest.raises(ValueError):
        analyze_join(spark, join, validation_assert=True)
    # dtype mismatch: left key is string
    left2 = spark.createDataFrame([Row(user_id="x", ts=TS, ds="2024-01-01")])
    join2 = Join(
        left=DataFrameSource(lambda s, _df=left2: _df, Query()),
        join_parts=[JoinPart(gb)],
        name="bad2",
    )
    errs = analyze_join(spark, join2)["key_errors"]
    assert len(errs) == 1 and "mismatched types" in errs[0][1]


def test_timestamp_checks(spark):
    ok = spark.createDataFrame([Row(ts=TS), Row(ts=TS + 5)])
    validate_timestamp_checks(run_timestamp_checks(ok), "t")
    # seconds instead of millis -> bad range
    secs = spark.createDataFrame([Row(ts=TS // 1000)])
    with pytest.raises(ValueError, match="outside the valid"):
        validate_timestamp_checks(run_timestamp_checks(secs), "t")
    # all null -> error
    nulls = spark.createDataFrame([Row(ts=None)], schema="ts long")
    with pytest.raises(ValueError, match="null for all"):
        validate_timestamp_checks(run_timestamp_checks(nulls), "t")
    # no ts column -> no-op
    no_ts = spark.createDataFrame([Row(x=1)])
    validate_timestamp_checks(run_timestamp_checks(no_ts), "t")


def test_skew_detection_and_df_shape(spark):
    gb = GroupBy(
        sources=[_events_src(spark)], key_columns=["user_id"],
        aggregations=[Aggregation("value", Operation.SUM, windows=[None])],
        name="gb_c",
    )
    join = Join(left=_events_src(spark), join_parts=[JoinPart(gb)], name="j2")
    res = analyze_join(spark, join, skew_detection=True)
    sk = {r["key_value"]: r["cnt"] for r in res["skew_keys"].collect()}
    assert sum(sk.values()) == 50 and len(sk) == 3
    df = aggregation_metadata_df(spark, join)
    assert df.columns == ["name", "column_type", "operation", "window",
                          "input_column", "group_by"]
    assert df.count() == 1
