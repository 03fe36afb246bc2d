"""Session-catalog (Hive format provider) tests.

Reference parity: catalog/Hive.scala (SHOW PARTITIONS + hive-style
parse), Format.scala:51-75 (primaryPartitions sub-partition filter),
CreationUtils.scala:9-60 (CREATE TABLE DDL), TableUtils dynamic
partition-overwrite writes."""
import os
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from chronon_spark.sources.session_catalog import (
    SessionCatalog,
    create_table_sql,
    parse_hive_style_partition,
)
from chronon_spark.partitions import PartitionRange


@pytest.fixture(scope="module")
def cat(spark):
    db = f"cat_{uuid.uuid4().hex[:8]}"
    loc = tempfile.mkdtemp(prefix="chronon_sesscat_")
    c = SessionCatalog(spark, database=db, location=loc)
    yield c
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def _frame(spark):
    rows = [
        (1, 1000, "2024-01-01", "0"),
        (2, 2000, "2024-01-01", "1"),
        (3, 3000, "2024-01-02", "0"),
        (4, 4000, "2024-01-02", "1"),
        (5, 5000, "2024-01-03", "0"),
    ]
    return spark.createDataFrame(rows, "id int, cents bigint, ds string, hr string")


def test_parse_hive_style_partition():
    assert parse_hive_style_partition("ds=2024-01-01/hr=00") == {
        "ds": "2024-01-01", "hr": "00"}
    assert parse_hive_style_partition("ds=2024-01-01") == {"ds": "2024-01-01"}


def test_create_table_sql_ddl(spark):
    df = _frame(spark)
    sql = create_table_sql("db.t", df.schema, ["ds", "hr"],
                           {"team": "chronon"})
    assert "CREATE TABLE IF NOT EXISTS db.t" in sql
    assert "USING parquet" in sql
    # partition columns typed in PARTITIONED BY, excluded from column list
    assert ("PARTITIONED BY" in sql and "`ds` string" in sql
            and "`hr` string" in sql)
    head = sql.split("USING")[0]
    assert "ds" not in head.split("(", 1)[1] or "ds string" not in head
    assert "'team'='chronon'" in sql and "'chronon.table_type'='parquet'" in sql
    with pytest.raises(ValueError):
        create_table_sql("db.t", df.schema, ["ds"], table_type="csv")


def test_insert_overwrite_is_dynamic(spark, cat):
    df = _frame(spark)
    cat.insert_overwrite(df, "ev", partition_columns=["ds", "hr"])
    assert cat.exists("ev")
    got = {tuple(sorted(m.items())) for m in cat.partition_maps("ev")}
    assert len(got) == 5 and (
        ("ds", "2024-01-01"), ("hr", "0")) in got

    # overwrite ONE (ds, hr) partition — every other partition survives
    patch = spark.createDataFrame(
        [(99, 9900, "2024-01-02", "0")], df.schema)
    cat.insert_overwrite(patch, "ev", partition_columns=["ds", "hr"])
    out = {(r.id, r.cents) for r in cat.read("ev").collect()}
    assert (99, 9900) in out and (3, 3000) not in out
    assert (4, 4000) in out and (1, 1000) in out  # untouched partitions
    assert len(out) == 5


def test_primary_partitions_and_subfilter(spark, cat):
    # primary values are distinct and sorted
    assert cat.primary_partitions("ev") == [
        "2024-01-01", "2024-01-02", "2024-01-03"]
    # sub-partition equality filter (Format.scala:51-75)
    assert cat.primary_partitions(
        "ev", sub_partitions_filter={"hr": "1"}) == [
        "2024-01-01", "2024-01-02"]
    # metadata-only SQL filter over partition values
    assert cat.primary_partitions(
        "ev", partition_filters="ds >= '2024-01-02' AND hr = '0'") == [
        "2024-01-02", "2024-01-03"]
    # ParquetWarehouse-compatible alias
    assert cat.partitions("ev") == cat.primary_partitions("ev")


def test_read_partition_pruning_in_plan(spark, cat):
    rng = PartitionRange("2024-01-02", "2024-01-02")
    df = cat.read("ev", rng=rng)
    assert {r.ds for r in df.collect()} == {"2024-01-02"}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "2024-01-02" in plan


def test_scan_df_resolves_catalog_table(spark, cat):
    from chronon_spark.api import Query
    from chronon_spark.sources.scan import scan_df

    out = scan_df(
        spark, cat.full_name("ev"),
        Query(selects={"id": "id", "usd": "cents / 100.0"},
              start_partition="2024-01-01", end_partition="2024-01-01"),
    )
    got = {(r.id, r.usd) for r in out.collect()}
    assert got == {(1, 10.0), (2, 20.0)}


def test_insert_missing_column_raises(spark, cat):
    bad = spark.createDataFrame([(1, "2024-01-01", "0")],
                                "id int, ds string, hr string")
    with pytest.raises(ValueError, match="cents"):
        cat.insert_overwrite(bad, "ev", partition_columns=["ds", "hr"])


def test_insert_extra_column_raises(spark, cat):
    extra = _frame(spark).withColumn("usd", F.col("cents") / 100.0)
    with pytest.raises(ValueError, match="usd"):
        cat.insert_overwrite(extra, "ev", partition_columns=["ds", "hr"])


def test_typoed_partition_column_raises(spark):
    df = _frame(spark)
    with pytest.raises(ValueError, match="hrr"):
        create_table_sql("db.t", df.schema, ["ds", "hrr"])


def test_escaped_partition_values_unescape(spark, cat):
    # Hive path-escapes partition values (':' -> %3A); SHOW PARTITIONS
    # returns the escaped fragment — the provider must surface and
    # filter on the LOGICAL value
    rows = [(1, "2024-01-01", "00:30"), (2, "2024-01-01", "01:30"),
            (3, "2024-01-02", "00:30")]
    df = spark.createDataFrame(rows, "id int, ds string, hm string")
    cat.insert_overwrite(df, "esc_t", partition_columns=["ds", "hm"])
    assert {m["hm"] for m in cat.partition_maps("esc_t")} == {"00:30", "01:30"}
    assert cat.primary_partitions(
        "esc_t", sub_partitions_filter={"hm": "00:30"}) == [
        "2024-01-01", "2024-01-02"]


def test_table_properties_roundtrip(spark, cat):
    df = _frame(spark).withColumnRenamed("hr", "bucket")
    cat.insert_overwrite(df, "props_t", partition_columns=["ds"],
                         table_properties={"team": "chronon", "kind": "test"})
    props = cat.table_properties("props_t")
    assert props.get("team") == "chronon" and props.get("kind") == "test"
    assert props.get("chronon.table_type") == "parquet"
