"""Feature-stats + skew-key analysis (reference: stats/StatsCompute.scala,
Analyzer.scala:68-113 skewKeys)."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from chronon_spark.operators.stats import feature_stats, skew_keys


@pytest.fixture(scope="module")
def stats_df(spark):
    rows = []
    for i in range(100):
        rows.append(
            Row(
                uid=i % 7,
                ts=1_700_000_000_000 + i,
                v=float(i) if i % 10 != 0 else None,
                z=0.0 if i % 4 == 0 else 1.0,
                cat=None if i % 5 == 0 else f"c{i % 3}",
                ds="2024-01-01" if i < 60 else "2024-01-02",
            )
        )
    return spark.createDataFrame(rows)


def test_feature_stats_values(stats_df):
    out = feature_stats(stats_df, keys=["uid"]).collect()
    by_col = {r["column"]: r for r in out}
    # ts/ds are ignore-columns, uid is a key: only v, z, cat analyzed
    assert set(by_col) == {"v", "z", "cat"}
    v = by_col["v"]
    assert v["total"] == 100
    assert v["null_count"] == 10
    assert abs(v["null_rate"] - 0.1) < 1e-12
    vals = sorted(float(i) for i in range(100) if i % 10 != 0)
    assert v["unique_count"] == len(set(vals))
    assert v["zero_count"] == 0  # i=0 is null (0 % 10 == 0)
    assert v["min_value"] == vals[0] and v["max_value"] == vals[-1]
    mean = sum(vals) / len(vals)
    assert abs(v["avg_value"] - mean) < 1e-9
    var = sum((x - mean) ** 2 for x in vals) / len(vals)
    assert abs(v["variance"] - var) < 1e-9
    # exact interpolated median over sorted non-null values
    n = len(vals)
    idx = (n - 1) * 0.5
    lo, hi = vals[math.floor(idx)], vals[math.ceil(idx)]
    assert abs(v["p50"] - (lo + (hi - lo) * (idx - math.floor(idx)))) < 1e-9
    z = by_col["z"]
    assert z["zero_count"] == 25
    cat = by_col["cat"]
    assert cat["null_count"] == 20
    assert cat["unique_count"] == 3
    for c in ("zero_count", "min_value", "max_value", "avg_value",
              "variance", "p05", "p50", "p95"):
        assert cat[c] is None  # numeric-only metrics NULL for strings


def test_feature_stats_partition_series(stats_df):
    out = feature_stats(stats_df, keys=["uid"], partition_col="ds").collect()
    assert len(out) == 6  # 2 partitions x 3 columns
    d1 = {r["column"]: r for r in out if r["ds"] == "2024-01-01"}
    assert d1["v"]["total"] == 60
    assert d1["v"]["null_count"] == 6


def test_feature_stats_approx_mode(stats_df):
    """exact=False swaps in approx_count_distinct / approx_percentile:
    sane (not exact-pinned) values, same schema."""
    exact = feature_stats(stats_df, keys=["uid"])
    approx = feature_stats(stats_df, keys=["uid"], exact=False)
    assert exact.columns == approx.columns
    a = {r["column"]: r for r in approx.collect()}
    assert abs(a["v"]["unique_count"] - 90) <= 5
    assert a["v"]["p50"] is not None


def test_feature_stats_no_python_udf(stats_df):
    plan = feature_stats(stats_df, keys=["uid"])._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_skew_keys_exact(stats_df):
    out = skew_keys(stats_df, ["uid", "cat"], k=2).collect()
    got = {(r["col_name"], r["key_value"]): r["cnt"] for r in out}
    # uid 0..1 appear 15x (ceil(100/7) for uid<2), uid>=2 appear 14x;
    # ties broken by key_value ASC
    uid_rows = sorted((r for r in out if r["col_name"] == "uid"),
                      key=lambda r: (-r["cnt"], r["key_value"]))
    assert [(r["key_value"], r["cnt"]) for r in uid_rows] == [("0", 15), ("1", 15)]
    # cat: NULLs bucketed under literal 'NULL' (20); c0 appears for
    # i%3==0 and i%5!=0 -> 27
    assert got[("cat", "c0")] == 27
    cat_vals = {r["key_value"] for r in out if r["col_name"] == "cat"}
    assert len(cat_vals) == 2


def test_skew_keys_null_bucket(spark):
    df = spark.createDataFrame(
        [Row(k=None), Row(k=None), Row(k="a")]
    )
    out = skew_keys(df, ["k"], k=10).collect()
    got = {r["key_value"]: r["cnt"] for r in out}
    assert got == {"NULL": 2, "a": 1}


def test_skew_keys_sampled_scaling(spark):
    df = spark.range(0, 20000).withColumn("k", (F.col("id") % 4).cast("string"))
    out = skew_keys(df, ["k"], k=4, sample_fraction=0.2).collect()
    assert len(out) == 4
    for r in out:
        # estimate = sampled count / fraction: within 25% of true 5000
        assert abs(r["cnt"] - 5000) < 1250


def test_feature_stats_rejects_empty(spark):
    df = spark.createDataFrame([Row(uid=1, ts=2)])
    with pytest.raises(ValueError):
        feature_stats(df, keys=["uid"])
