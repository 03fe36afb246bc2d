"""Hive-format provider over Spark's session catalog.

The reference addresses warehouse tables through Spark's catalog by
name and dispatches partition discovery / reads / writes through a
``Format`` provider (reference: spark/catalog/Format.scala:26-88,
Hive.scala:5-28, CreationUtils.scala:5-60, TableUtils.scala insert
paths).  This module is that provider re-expressed for the session
catalog that ships with every SparkSession (in-memory or Hive
metastore — the SQL surface is identical):

* tables are **real catalog tables** (``db.table``), created with
  ``CREATE TABLE .. USING parquet PARTITIONED BY`` (CreationUtils
  parity, including TBLPROPERTIES),
* partitions come from ``SHOW PARTITIONS`` and are parsed from
  hive-style ``k=v/k=v`` strings (Format.parseHiveStylePartition),
  with sub-partition filtering (Format.primaryPartitions),
* writes are ``INSERT OVERWRITE`` with **dynamic partition
  overwrite** — only the partitions present in the incoming frame are
  replaced, the reference's backfill write discipline,
* reads go through ``spark.table`` so Catalyst partition-prunes from
  catalog metadata natively (no file listing in the plan).

At 100 TB this is the zero-copy path: the catalog owns file layout,
``SHOW PARTITIONS`` is a metastore lookup (no S3 LIST), and the scan
starts from the pruned partition set.  The snapshot-log warehouse
(catalog.py) remains the provider used when time travel / incremental
diffs are required; this provider covers the classic Hive surface the
reference's DefaultFormatProvider falls back to.
"""
from __future__ import annotations

from typing import Optional
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession

from chronon_spark.partitions import DEFAULT_SPEC, PartitionRange, PartitionSpec

_ALLOWED_TABLE_TYPES = ("iceberg", "delta", "hive", "parquet", "hudi")


def parse_hive_style_partition(pstring: str) -> dict[str, str]:
    """``'ds=2024-01-01/hr=00'`` -> ``{'ds': ..., 'hr': '00'}``
    (Format.parseHiveStylePartition, Format.scala:92-100). SHOW
    PARTITIONS returns the PATH-ESCAPED fragment (Hive escapePathName
    percent-encodes spaces, colons, ...), so values are unescaped here —
    otherwise a filter on the logical value silently matches nothing."""
    out: dict[str, str] = {}
    for part in pstring.split("/"):
        k, _, v = part.partition("=")
        out[unquote(k)] = unquote(v)
    return out


def create_table_sql(
    table_name: str,
    schema,
    partition_columns: list[str],
    table_properties: Optional[dict[str, str]] = None,
    file_format: str = "PARQUET",
    table_type: str = "parquet",
) -> str:
    """CREATE TABLE statement builder (CreationUtils.createTableSql,
    CreationUtils.scala:9-60): non-partition columns in the column
    list, partition columns typed in PARTITIONED BY, file_format /
    table_type recorded in TBLPROPERTIES."""
    if table_type and table_type.lower() not in _ALLOWED_TABLE_TYPES:
        raise ValueError(
            f"Invalid table type: {table_type}. Must be empty or one of "
            f"{_ALLOWED_TABLE_TYPES}")
    part_set = set(partition_columns or [])
    missing = part_set - {f.name for f in schema.fields}
    if missing:
        # a typo'd partition column must fail loudly: silently dropping
        # it would create the table at the WRONG partition granularity
        # and dynamic overwrite would then replace whole coarse
        # partitions instead of the intended sub-partition slices
        raise ValueError(
            f"partition columns {sorted(missing)} not in schema "
            f"{[f.name for f in schema.fields]}")

    def esc(s: str) -> str:
        return s.replace("'", "\\'")

    data_cols = ",\n    ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in schema.fields if f.name not in part_set)
    sql = [f"CREATE TABLE IF NOT EXISTS {table_name} (\n    {data_cols}\n)"]
    if table_type:
        sql.append(f"USING {table_type}")
    if partition_columns:
        part_defs = ",\n    ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in schema.fields if f.name in part_set)
        sql.append(f"PARTITIONED BY (\n    {part_defs}\n)")
    props = dict(table_properties or {})
    # the reference records file_format/table_type properties
    # (CreationUtils.scala:48-50); Spark 4 reserves the bare
    # `table_type`/`owner` keys, so they are namespaced here
    props["chronon.file_format"] = file_format
    props["chronon.table_type"] = table_type
    frag = ",\n   ".join(
        f"'{esc(k)}'='{esc(v)}'" for k, v in sorted(props.items()))
    sql.append(f"TBLPROPERTIES (\n   {frag}\n)")
    return "\n".join(sql)


class SessionCatalog:
    """Hive format provider over the session catalog.

    Mirrors the ParquetWarehouse surface (exists / partitions / read /
    insert_overwrite / drop) so jobs can target catalog tables and
    snapshot-log tables interchangeably; adds the Format-trait methods
    (``partition_maps``, ``primary_partitions``, sub-partition filters)
    the reference's orchestration calls."""

    supports_sub_partitions_filter = True  # Hive.scala:27

    def __init__(self, spark: SparkSession, database: str = "chronon",
                 location: Optional[str] = None,
                 spec: PartitionSpec = DEFAULT_SPEC):
        self.spark = spark
        self.database = database
        self.spec = spec
        loc = (f" LOCATION '{location.replace(chr(39), chr(92) + chr(39))}'"
               if location else "")
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}{loc}")

    def full_name(self, table: str) -> str:
        return table if "." in table else f"{self.database}.{table}"

    def exists(self, table: str) -> bool:
        return self.spark.catalog.tableExists(self.full_name(table))

    def drop(self, table: str) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self.full_name(table)}")

    def create(self, table: str, schema,
               partition_columns: Optional[list[str]] = None,
               table_properties: Optional[dict[str, str]] = None) -> None:
        cols = partition_columns if partition_columns is not None else [self.spec.column]
        self.spark.sql(create_table_sql(
            self.full_name(table), schema, cols, table_properties))

    def table_properties(self, table: str) -> dict[str, str]:
        rows = self.spark.sql(
            f"SHOW TBLPROPERTIES {self.full_name(table)}").collect()
        return {r["key"]: r["value"] for r in rows}

    # -- Format trait ---------------------------------------------------
    def partition_maps(self, table: str,
                       partition_filters: str = "") -> list[dict[str, str]]:
        """Every partition as a {key: value} map (Format.partitions,
        Hive.scala:14-26: SHOW PARTITIONS + hive-style parse).
        ``partition_filters`` is a SQL predicate applied over the parsed
        partition values — a metadata-only filter, no data scan."""
        rows = self.spark.sql(
            f"SHOW PARTITIONS {self.full_name(table)}").collect()
        maps = [parse_hive_style_partition(r[0]) for r in rows]
        if partition_filters and maps:
            cols = sorted({k for m in maps for k in m})
            pdf = self.spark.createDataFrame(
                [tuple(m.get(c) for c in cols) for m in maps], cols)
            kept = pdf.where(partition_filters).collect()
            maps = [{c: r[c] for c in cols if r[c] is not None} for r in kept]
        return maps

    def primary_partitions(self, table: str,
                           partition_column: Optional[str] = None,
                           partition_filters: str = "",
                           sub_partitions_filter: Optional[dict] = None,
                           ) -> list[str]:
        """Values of the primary partition column, narrowed by
        sub-partition equality filters (Format.primaryPartitions,
        Format.scala:51-75)."""
        col = partition_column or self.spec.column
        sub = sub_partitions_filter or {}
        out = []
        for m in self.partition_maps(table, partition_filters):
            if all(m.get(k) == v for k, v in sub.items()) and col in m:
                out.append(m[col])
        return sorted(set(out))

    def partitions(self, table: str) -> list[str]:
        """ParquetWarehouse-compatible: sorted primary partition values."""
        return self.primary_partitions(table)

    # -- reads ----------------------------------------------------------
    def read(self, table: str, rng: Optional[PartitionRange] = None,
             partition_filters: str = "") -> DataFrame:
        """spark.table + partition predicates — Catalyst prunes
        partitions from catalog metadata (Format.table,
        Format.scala:32-48)."""
        df = self.spark.table(self.full_name(table))
        if partition_filters:
            df = df.where(partition_filters)
        if rng is not None:
            for clause in rng.where_clauses(self.spec.column):
                df = df.where(clause)
        return df

    # -- writes ----------------------------------------------------------
    def insert_overwrite(self, df: DataFrame, table: str,
                         partition_columns: Optional[list[str]] = None,
                         table_properties: Optional[dict[str, str]] = None,
                         ) -> None:
        """Dynamic partition overwrite: replace exactly the partitions
        present in ``df``, leave every other partition untouched (the
        reference's backfill write — TableUtils insert with
        partitionOverwriteMode=dynamic).  Creates the table from the
        frame's schema on first write.  ``insertInto`` matches columns
        BY POSITION with partition columns last, so the frame is
        reordered to the table schema before the write."""
        name = self.full_name(table)
        cols = partition_columns if partition_columns is not None else [self.spec.column]
        if not self.exists(table):
            self.create(table, df.schema, cols, table_properties)
        target_cols = self.spark.table(name).columns
        missing = [c for c in target_cols if c not in df.columns]
        if missing:
            raise ValueError(f"frame missing table columns {missing} for {name}")
        extra = [c for c in df.columns if c not in target_cols]
        if extra:
            # silently projecting these away would lose a new feature
            # column without a trace; the session catalog does not do
            # additive evolution (the snapshot-log warehouse and the
            # Iceberg/Delta mirrors do) — fail loudly instead
            raise ValueError(
                f"frame has columns {extra} not in {name}; drop them or "
                "recreate the table (session-catalog tables do not "
                "schema-evolve)")
        conf = self.spark.conf
        prev = conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            df.select(*target_cols).write.insertInto(name, overwrite=True)
        finally:
            conf.set("spark.sql.sources.partitionOverwriteMode", prev)
