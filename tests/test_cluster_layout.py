"""Clustered write layout (north rule: explicit repartitionByRange on
(entity, ts)): insert_overwrite(cluster_by=...) must produce data files
whose footer min/max cover disjoint entity slices, sorted within files —
the layout that lets as-of probes prune by footer instead of scanning
whole partitions."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from chronon_spark.sources.catalog import ParquetWarehouse


@pytest.fixture()
def wh(spark, tmp_path):
    return ParquetWarehouse(spark, str(tmp_path / "wh"))


def _events(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select(
            "user_id",
            F.unix_millis(F.col("ts").cast("timestamp")).alias("ts"),
            "value",
            F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd").alias("ds"),
        )
        .where(F.col("ds") <= "2024-01-02")
    )


def test_cluster_by_layout_and_equivalence(spark, wh):
    df = _events(spark)
    want = sorted((r["user_id"], r["ts"], r["value"], r["ds"])
                  for r in df.collect())

    # at test scale AQE coalesces the tiny range partitions into one file
    # per ds (desired in production, hides the layout here) — pin it off
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        wh.insert_overwrite(df, "t", cluster_by=("user_id", "ts"))
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")

    got = sorted((r["user_id"], r["ts"], r["value"], r["ds"])
                 for r in wh.read("t").collect())
    assert got == want  # layout never changes content

    # footer ranges: within each ds, files cover non-overlapping user_id
    # slices (boundary keys may touch), and each file is sorted
    by_ds: dict[str, list[tuple[int, int, str]]] = {}
    for rel in wh._live_files("t"):
        ds = rel.split("/")[0].split("=")[1]
        path = os.path.join(wh.path("t"), rel)
        md = pq.read_metadata(path)
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        lo = min(md.row_group(g).column(idx["user_id"]).statistics.min
                 for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx["user_id"]).statistics.max
                 for g in range(md.num_row_groups))
        by_ds.setdefault(ds, []).append((lo, hi, path))

    multi = 0
    for ds, ranges in by_ds.items():
        ranges.sort()
        if len(ranges) > 1:
            multi += 1
        for (lo_a, hi_a, _), (lo_b, hi_b, _) in zip(ranges, ranges[1:]):
            assert hi_a <= lo_b, (ds, ranges)  # disjoint up to the boundary key
    assert multi > 0, "fixture must fragment at least one ds into 2+ files"

    # rows inside a file are sorted on (user_id, ts)
    some = next(iter(by_ds.values()))[0][2]
    t = pq.read_table(some, columns=["user_id", "ts"]).to_pandas()
    keys = list(zip(t["user_id"], t["ts"]))
    assert keys == sorted(keys)


def test_backfill_cluster_by_threads_through(spark, wh):
    from chronon_spark.api import (
        Aggregation, EventSource, GroupBy, Operation, Query, Window,
    )
    from chronon_spark.plans.backfill import groupby_backfill

    src = EventSource(
        "/root/testdata/sf0.001/events.parquet",
        Query(selects={"user_id": "user_id", "value": "value"},
              time_column="unix_millis(cast(ts as timestamp))"),
    )
    gb = GroupBy(sources=[src], key_columns=["user_id"],
                 aggregations=[Aggregation("value", Operation.SUM,
                                           windows=[Window(7)])],
                 name="clustered")
    job = groupby_backfill(spark, wh, gb, "out", cluster_by=("user_id",))
    rep = job.run("2024-01-01", "2024-01-03")
    assert rep.rows_written > 0
    # every live file sorted by user_id
    for rel in wh._live_files("out"):
        t = pq.read_table(os.path.join(wh.path("out"), rel),
                          columns=["user_id"]).to_pandas()
        vals = t["user_id"].tolist()
        assert vals == sorted(vals)


def test_zorder_prunes_both_dimensions(spark, wh):
    """Z-order clustering: with two independent columns, every data file
    covers a NARROW slice of BOTH (footer min/max), whereas linear
    cluster_by only narrows the leading column."""
    import numpy as np

    from chronon_spark.sources.catalog import zorder_column

    rng = np.random.RandomState(5)
    n = 20_000
    df = spark.createDataFrame(
        [(int(x), int(y), "2024-01-01") for x, y in
         zip(rng.randint(0, 10_000, n), rng.randint(0, 10_000, n))],
        "x long, y long, ds string",
    )
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        wh.insert_overwrite(
            df.withColumn("__z", zorder_column([("x", 0, 10_000), ("y", 0, 10_000)])),
            "tz", cluster_by=("__z",),
        )
        wh.insert_overwrite(df, "tl", cluster_by=("x", "y"))
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", "4")

    def widths(table, col):
        out = []
        for rel in wh._live_files(table):
            md = pq.read_metadata(os.path.join(wh.path(table), rel))
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            lo = min(md.row_group(g).column(idx[col]).statistics.min
                     for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx[col]).statistics.max
                     for g in range(md.num_row_groups))
            out.append((hi - lo) / 10_000)
        return out

    def mean(xs):
        return sum(xs) / len(xs)

    assert len(widths("tz", "x")) >= 6
    # z-order: BOTH dimensions narrow on average per file (range-sampled
    # key boundaries mean an occasional straddler, hence mean not max)
    assert mean(widths("tz", "x")) < 0.7 and mean(widths("tz", "y")) < 0.7
    # linear: leading column narrow, second column spans ~everything
    assert mean(widths("tl", "x")) < 0.35
    assert mean(widths("tl", "y")) > 0.9
    # rows identical either way
    assert wh.read("tz").count() == wh.read("tl").count() == 20_000
