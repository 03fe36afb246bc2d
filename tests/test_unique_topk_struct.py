"""UNIQUE_TOP_K struct{sort_key, unique_id} variant (reference:
SimpleAggregators.scala:768-917, UniqueOrderByLimit.scala): top-k by
sort_key desc with at most one element per unique_id — snapshot plan and
temporal kernel."""

import pytest
from pyspark.sql import functions as F

from chronon_spark.api import (
    Accuracy,
    Aggregation,
    AggregationPart,
    DataFrameSource,
    GroupBy,
    Operation,
    Window,
)
from chronon_spark.operators.groupby import compute_snapshot_groupby
from chronon_spark.operators.temporal_join import temporal_features

BASE = 1704067200000
DAY = 86_400_000


def _mk_df(spark):
    # (key, ts, sort_key, unique_id): ids 1 and 2 recur with different
    # sort keys; dedupe must keep each id once at its max sort_key
    rows = [
        (1, BASE + 0 * DAY + 10, "005", 1),
        (1, BASE + 0 * DAY + 20, "009", 2),
        (1, BASE + 1 * DAY + 10, "007", 1),   # id 1 again, higher key
        (1, BASE + 1 * DAY + 20, "003", 3),
        (1, BASE + 2 * DAY + 10, "008", 4),
        (1, BASE + 2 * DAY + 20, "001", 5),
    ]
    return spark.createDataFrame(
        rows, "k int, ts long, sk string, uid long"
    ).withColumn("item", F.struct(F.col("sk").alias("sort_key"),
                                  F.col("uid").alias("unique_id")))


def test_unique_topk_struct_snapshot(spark):
    df = _mk_df(spark).select("k", "ts", "item")
    gb = GroupBy(
        sources=[DataFrameSource(lambda s: df)],
        key_columns=["k"],
        aggregations=[Aggregation("item", Operation.UNIQUE_TOP_K, {"k": 3},
                                  windows=[Window(3)])],
        accuracy=Accuracy.SNAPSHOT,
        name="g",
    )
    out = {r["ds"]: r["item_unique_top3_3d"]
           for r in compute_snapshot_groupby(spark, gb).collect()}
    # end of 01-03: window holds all 6 rows; per-id maxes:
    # id1->007, id2->009, id3->003, id4->008, id5->001; top3 by sort_key desc
    got = [(e["sort_key"], e["unique_id"]) for e in out["2024-01-03"]]
    assert got == [("009", 2), ("008", 4), ("007", 1)]
    # end of 01-01: only day-1 rows -> id1:005, id2:009
    got1 = [(e["sort_key"], e["unique_id"]) for e in out["2024-01-01"]]
    assert got1 == [("009", 2), ("005", 1)]


def test_unique_topk_struct_temporal_kernel(spark):
    df = _mk_df(spark).select("k", "ts", "item")
    left = spark.createDataFrame(
        [(1, BASE + 2 * DAY + 30)], "k int, ts long"
    )
    parts = [AggregationPart("item", Operation.UNIQUE_TOP_K, {"k": 3}, Window(7))]
    row = temporal_features(left, df, ["k"], ["k"], parts).collect()[0]
    got = [(e["sort_key"], e["unique_id"]) for e in row["item_unique_top3_7d"]]
    assert got == [("009", 2), ("008", 4), ("007", 1)]


def test_unique_topk_struct_null_fields_skipped(spark):
    """Elements with NULL sort_key or unique_id are skipped, not a kernel
    crash (reference UniqueOrderByLimit null handling)."""
    rows = [
        (1, BASE + 10, "005", 1),
        (1, BASE + 20, None, 2),     # null sort_key
        (1, BASE + 30, "008", None),  # null unique_id
        (1, BASE + 40, "007", 3),
    ]
    df = spark.createDataFrame(
        rows, "k int, ts long, sk string, uid long"
    ).withColumn("item", F.struct(F.col("sk").alias("sort_key"),
                                  F.col("uid").alias("unique_id"))).select(
        "k", "ts", "item")
    left = spark.createDataFrame([(1, BASE + 100)], "k int, ts long")
    parts = [AggregationPart("item", Operation.UNIQUE_TOP_K, {"k": 5}, Window(7))]
    row = temporal_features(left, df, ["k"], ["k"], parts).collect()[0]
    got = [(e["sort_key"], e["unique_id"]) for e in row["item_unique_top5_7d"]]
    assert got == [("007", 3), ("005", 1)]
