"""Table comparison job (reference: stats/CompareBaseJob.scala,
CompareMetrics.scala)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from chronon_spark.operators.compare import (
    check_consistency,
    compare_tables,
    comparison_df,
)


@pytest.fixture(scope="module")
def pair(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, ts=10, v=1.0, s="a"),
            Row(k=2, ts=20, v=2.0, s="b"),
            Row(k=3, ts=30, v=None, s="c"),
            Row(k=4, ts=40, v=4.0, s="d"),  # only in left
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, ts=10, v=1.0, s="a"),     # equal
            Row(k=2, ts=20, v=2.5, s="B"),     # both mismatch
            Row(k=3, ts=30, v=None, s="c"),    # both null v
            Row(k=5, ts=50, v=5.0, s="e"),     # only in right
        ]
    )
    return left, right


def test_metrics_quadrants(pair):
    left, right = pair
    cdf, m = compare_tables(left, right, keys=["k", "ts"])
    assert cdf.count() == 5  # full outer: 3 shared + 1 left-only + 1 right-only
    by = {r["column"]: r for r in m.collect()}
    v = by["v"]
    assert v["total"] == 5
    assert v["both_null"] == 1   # k=3
    assert v["left_null"] == 1   # k=5 (left side absent)
    assert v["right_null"] == 1  # k=4 (right side absent)
    assert v["mismatch"] == 1    # k=2
    # smape: null-pair rows -> 0.0 (reference otherwise(0.0)); rows:
    # k=1: 0, k=2: |2-2.5|*2/4.5, k=3/4/5: 0  -> mean over 5
    assert abs(v["smape"] - (0.5 * 2 / 4.5) / 5) < 1e-12
    s = by["s"]
    assert s["mismatch"] == 1  # k=2 b vs B
    assert s["smape"] is None  # non-numeric


def test_diff_percentiles(pair):
    left, right = pair
    _, m = compare_tables(left, right, keys=["k", "ts"])
    v = {r["column"]: r for r in m.collect()}["v"]
    # non-null diffs: k=1 -> 0.0, k=2 -> -0.5; median interpolates
    assert abs(v["diff_p50"] - (-0.25)) < 1e-12


def test_mapping_renames_left(spark):
    left = spark.createDataFrame([Row(k=1, ts=1, old=2.0)])
    right = spark.createDataFrame([Row(k=1, ts=1, new=2.0)])
    cdf = comparison_df(left, right, keys=["k", "ts"], mapping={"old": "new"})
    assert set(cdf.columns) == {"k", "ts", "new_left", "new_right"}
    _, m = compare_tables(left, right, keys=["k", "ts"], mapping={"old": "new"})
    row = m.collect()[0]
    assert row["column"] == "new" and row["mismatch"] == 0


def test_consistency_errors(spark):
    left = spark.createDataFrame([Row(k=1, ts=1, v=1.0, extra="x")])
    right = spark.createDataFrame([Row(k=1, ts=1, v="str")])
    with pytest.raises(ValueError) as ei:
        check_consistency(left, right, keys=["k", "ts"])
    msg = str(ei.value)
    assert "field counts" in msg and "dtype mismatch" in msg
    # migration mode tolerates the wider left but not the dtype clash
    with pytest.raises(ValueError) as ei2:
        check_consistency(left, right, keys=["k", "ts"], migration_check=True)
    assert "field counts" not in str(ei2.value)
    assert "dtype mismatch" in str(ei2.value)


def test_consistency_requires_time_key(spark):
    df = spark.createDataFrame([Row(k=1, ts=1, v=1.0)])
    with pytest.raises(ValueError) as ei:
        check_consistency(df, df, keys=["k"])
    assert "time column" in str(ei.value)
    check_consistency(df, df, keys=["k", "ts"])  # ok


def test_migration_prunes_left_extras(spark):
    left = spark.createDataFrame([Row(k=1, ts=1, v=1.0, extra="x")])
    right = spark.createDataFrame([Row(k=1, ts=1, v=1.0)])
    cdf, m = compare_tables(left, right, keys=["k", "ts"], migration_check=True)
    rows = m.collect()
    # metrics computed over the RIGHT schema only — 'extra' not compared,
    # and pruned from the comparison frame (CompareBaseJob.scala:124-139)
    assert [r["column"] for r in rows] == ["v"]
    assert rows[0]["mismatch"] == 0 and rows[0]["total"] == 1
    assert "extra_left" not in cdf.columns
