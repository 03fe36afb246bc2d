"""Kernel-parity pin for keys whose input values (or buckets) are all
NULL: such a key still has event rows, so the snapshot engine must emit
its (key, ds) row with unique_count=0 / histogram={} / bucketed-map={} —
exactly what the temporal sawtooth kernel and a GROUP BY oracle produce.
Before the r4 fix the hist-like/bucketed scaffold inner-joined the
non-null bucket universe and silently DROPPED the key's rows entirely
(while the plain-parts path kept them — internally inconsistent output).
"""
import pyspark.sql.functions as F
import pytest

from chronon_spark.api import (
    Aggregation,
    DataFrameSource,
    GroupBy,
    Operation,
    Query,
    Window,
)
from chronon_spark.operators.groupby import compute_snapshot_groupby
from chronon_spark.partitions import DEFAULT_SPEC, PartitionRange

TS0 = 1704067200000  # 2024-01-01 00:00 UTC


def _gb(df, aggs):
    return GroupBy(
        sources=[DataFrameSource(lambda s: df)],
        key_columns=["user"],
        aggregations=aggs,
        name="allnull",
    )


def _with_ds(df):
    return df.withColumn(
        "ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd")
    )


def test_allnull_value_key_emits_zero_and_empty_map(spark):
    df = _with_ds(spark.createDataFrame(
        [("a", TS0, None), ("a", TS0 + 1000, None), ("b", TS0, "x")],
        "user string, ts long, val string",
    ))
    out = compute_snapshot_groupby(
        spark,
        _gb(df, [
            Aggregation("val", Operation.UNIQUE_COUNT, windows=[Window(7)]),
            Aggregation("val", Operation.HISTOGRAM, windows=[Window(7)]),
        ]),
    )
    rows = {r["user"]: r for r in out.collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"]["val_unique_count_7d"] == 0
    assert dict(rows["a"]["val_histogram_7d"]) == {}
    assert rows["b"]["val_unique_count_7d"] == 1
    assert dict(rows["b"]["val_histogram_7d"]) == {"x": 1}


def test_allnull_bucket_key_emits_empty_maps(spark):
    df = _with_ds(spark.createDataFrame(
        [("a", TS0, 1.0, None), ("b", TS0, 2.0, "g1")],
        "user string, ts long, v double, bkt string",
    ))
    out = compute_snapshot_groupby(
        spark,
        _gb(df, [
            Aggregation("v", Operation.SUM, windows=[Window(7)], buckets=["bkt"]),
            Aggregation("v", Operation.UNIQUE_COUNT, windows=[Window(7)],
                        buckets=["bkt"]),
        ]),
    )
    rows = {r["user"]: r for r in out.collect()}
    assert set(rows) == {"a", "b"}
    assert dict(rows["a"]["v_sum_7d_by_bkt"]) == {}
    assert dict(rows["a"]["v_unique_count_7d_by_bkt"]) == {}
    assert dict(rows["b"]["v_sum_7d_by_bkt"]) == {"g1": 2.0}
    assert dict(rows["b"]["v_unique_count_7d_by_bkt"]) == {"g1": 1}


def test_allnull_map_input_key_emits_empty_map(spark):
    df = _with_ds(spark.createDataFrame(
        [("a", TS0, None), ("b", TS0, {"k": 3.0})],
        "user string, ts long, m map<string,double>",
    ))
    out = compute_snapshot_groupby(
        spark,
        _gb(df, [Aggregation("m", Operation.SUM, windows=[Window(7)])]),
    )
    rows = {r["user"]: r for r in out.collect()}
    assert set(rows) == {"a", "b"}
    assert dict(rows["a"]["m_sum_7d"]) == {}
    assert dict(rows["b"]["m_sum_7d"]) == {"k": 3.0}


def test_allnull_key_dense_mode_covers_range(spark):
    df = _with_ds(spark.createDataFrame(
        [("a", TS0, 1.0, None), ("b", TS0, 2.0, "g1")],
        "user string, ts long, v double, bkt string",
    ))
    rng = PartitionRange("2024-01-01", "2024-01-03", DEFAULT_SPEC)
    out = compute_snapshot_groupby(
        spark,
        _gb(df, [
            Aggregation("v", Operation.SUM, windows=[Window(7)], buckets=["bkt"]),
        ]),
        rng=rng,
        dense=True,
    )
    rows = {(r["user"], r["ds"]): dict(r["v_sum_7d_by_bkt"] or {})
            for r in out.collect()}
    # dense: every (key, day) pair materializes, all-null key included
    for d in ("2024-01-01", "2024-01-02", "2024-01-03"):
        assert rows[("a", d)] == {}
        assert rows[("b", d)] == {"g1": 2.0}


def test_allnull_key_temporal_kernel_agrees(spark):
    import numpy as np

    from chronon_spark.api import AggregationPart
    from chronon_spark.operators.sawtooth import sawtooth_aggregate

    ets = np.array([TS0, TS0 + 1000], dtype=np.int64)
    vals = {"val": np.array([None, None], dtype=object),
            "bkt": np.array([None, None], dtype=object)}
    qts = np.array([TS0 + 2000], dtype=np.int64)
    res = sawtooth_aggregate(
        ets, vals, qts,
        [AggregationPart("val", Operation.UNIQUE_COUNT, {}, Window(7)),
         AggregationPart("val", Operation.HISTOGRAM, {}, Window(7)),
         AggregationPart("val", Operation.SUM, {}, Window(7), bucket="bkt")],
    )
    assert res["val_unique_count_7d"][0] == 0
    assert res["val_histogram_7d"][0] == {}
    assert res["val_sum_7d_by_bkt"][0] == {}
