"""Footer-metadata partition stats vs data-computed truth (the parquet
analog of the reference's IcebergPartitionStatsExtractor manifest walk)."""

import pytest
from pyspark.sql import functions as F

from chronon_spark.sources.catalog import ParquetWarehouse
from chronon_spark.sources.partition_stats import partition_stats


@pytest.fixture()
def wh(spark, tmp_path):
    return ParquetWarehouse(spark, str(tmp_path / "warehouse"))


def test_footer_stats_match_data(spark, wh):
    rows = []
    for d in range(1, 4):
        for i in range(50):
            rows.append((
                i,
                None if i % 7 == 0 else float(i * d),
                f"2024-01-{d:02d}",
            ))
    df = spark.createDataFrame(rows, "user_id int, v double, ds string")
    wh.insert_overwrite(df, "t")

    got = {
        (r["ds"], r["column"]): (r["n_rows"], r["n_nulls"], r["min_num"], r["max_num"])
        for r in partition_stats(wh, "t").collect()
    }
    truth = (
        wh.read("t")
        .groupBy("ds")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").isNull().cast("long")).alias("nulls"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
            F.min("user_id").alias("umn"),
            F.max("user_id").alias("umx"),
        )
        .collect()
    )
    for r in truth:
        assert got[(r["ds"], "v")] == (r["n"], r["nulls"], r["mn"], r["mx"])
        assert got[(r["ds"], "user_id")] == (
            r["n"], 0, float(r["umn"]), float(r["umx"]))


def test_stats_respect_snapshot_log(spark, wh):
    df = spark.createDataFrame(
        [(1, 1.0, "2024-01-01"), (2, 2.0, "2024-01-02")],
        "user_id int, v double, ds string",
    )
    wh.insert_overwrite(df, "t")
    # rewrite day 1; the replaced file stays on disk (time travel) but must
    # NOT be double-counted by the stats walk
    wh.insert_overwrite(
        spark.createDataFrame([(9, 9.0, "2024-01-01")],
                              "user_id int, v double, ds string"), "t")
    got = {(r["ds"], r["column"]): r["n_rows"]
           for r in partition_stats(wh, "t", columns=["v"]).collect()}
    assert got == {("2024-01-01", "v"): 1, ("2024-01-02", "v"): 1}
    mn = {r["ds"]: r["min_num"]
          for r in partition_stats(wh, "t", columns=["user_id"]).collect()}
    assert mn == {"2024-01-01": 9.0, "2024-01-02": 2.0}


def test_nested_list_columns_do_not_collide(spark, wh):
    """Two list columns share the parquet leaf name 'element' — stats must
    key on the TOP-LEVEL column (previously both merged into one 'element'
    row with doubled n_rows and cross-column min/max)."""
    df = spark.createDataFrame(
        [(1, [1.0, 2.0], [100.0], "2024-01-01"),
         (2, [3.0], [200.0, 300.0], "2024-01-01")],
        "id long, a array<double>, b array<double>, ds string")
    wh.insert_overwrite(df, "nested")
    rows = {r["column"]: r for r in partition_stats(wh, "nested").collect()}
    # (ds lives in the directory layout, not the data files — no stats row)
    assert set(rows) == {"id", "a", "b"}
    assert rows["a"]["n_rows"] == 2 and rows["b"]["n_rows"] == 2
    # element-level bounds of repeated leaves are NOT row-level column
    # bounds — they must be withheld, while flat numerics keep theirs
    assert rows["a"]["min_num"] is None and rows["b"]["min_num"] is None
    assert rows["id"]["min_num"] == 1.0 and rows["id"]["max_num"] == 2.0
    # filtering by the real column name works again
    assert partition_stats(wh, "nested", columns=["a"]).count() == 1
