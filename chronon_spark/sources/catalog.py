"""Format-aware catalog: partition listing + idempotent partitioned writes.

The reference supports Hive / Iceberg / Delta catalogs (reference:
spark/.../catalog/Format.scala, Iceberg.scala:21-85, DeltaLake.scala,
FormatProvider.scala) with partition listing via Iceberg's `.partitions`
metadata table and dynamic insert-overwrite sinks
(TableUtils.insertPartitions:219-290).

This container ships no Iceberg/Delta jars, so the default implementation
is a directory-of-parquet warehouse with hive-style `ds=` partitioning that
exposes the exact same three primitives the engine needs:

  * partitions(table)          -> list of ds strings      (resume planning)
  * read(table[, range])       -> DataFrame               (pruned scan)
  * insert_overwrite(df,table) -> per-partition overwrite (idempotent sink)

A real-Iceberg catalog is gated behind an import-try; on a cluster with
the Iceberg runtime jar, `Catalog.for_session` picks it automatically and
the rest of the engine is unchanged.
"""

from __future__ import annotations

import os
import re
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from chronon_spark.partitions import DEFAULT_SPEC, PartitionRange, PartitionSpec


class ParquetWarehouse:
    """Directory-backed warehouse: <root>/<table>/ds=YYYY-MM-DD/*.parquet."""

    def __init__(self, spark: SparkSession, root: str, spec: PartitionSpec = DEFAULT_SPEC):
        self.spark = spark
        self.root = root
        self.spec = spec

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        return os.path.isdir(self.path(table))

    def partitions(self, table: str) -> list[str]:
        """List ds partition values from the directory layout (the analog of
        `SELECT partition FROM db.tbl.partitions` on Iceberg)."""
        if not self.exists(table):
            return []
        pat = re.compile(rf"^{re.escape(self.spec.column)}=(.+)$")
        out = []
        for entry in os.listdir(self.path(table)):
            m = pat.match(entry)
            if m:
                out.append(m.group(1))
        return sorted(out)

    def read(self, table: str, rng: Optional[PartitionRange] = None) -> DataFrame:
        # ds stays a string column (partition dirs would otherwise be
        # type-inferred to DATE on read-back). mergeSchema: evolved tables
        # (autoExpand — new feature columns added later) read old
        # partitions with NULLs for the new columns, the parquet analog of
        # the reference's ALTER TABLE ADD COLUMNS
        # (TableUtils.expandTable:542-603).
        self.spark.conf.set(
            "spark.sql.sources.partitionColumnTypeInference.enabled", "false"
        )
        df = self.spark.read.option("mergeSchema", "true").parquet(self.path(table))
        if rng is not None:
            for clause in rng.where_clauses(self.spec.column):
                df = df.where(clause)
        return df

    def archive(self, table: str) -> Optional[str]:
        """Rename the table out of the way instead of destroying it
        (reference: TableUtils.archiveOrDropTableIfExists:454-463 —
        `{table}_archive_{yyyyMMddHHmmss}`). Returns the archive path."""
        import datetime

        if not self.exists(table):
            return None
        suffix = datetime.datetime.now(datetime.timezone.utc).strftime("%Y%m%d%H%M%S")
        dst = self.path(f"{table}__archive_{suffix}")
        n = 0
        while os.path.exists(dst):  # same-second re-archives
            n += 1
            dst = self.path(f"{table}__archive_{suffix}_{n}")
        os.rename(self.path(table), dst)
        return dst

    def insert_overwrite(self, df: DataFrame, table: str) -> None:
        """Dynamic partition overwrite — idempotent per-partition sink.

        reference: TableUtils.insertPartitions (catalog/TableUtils.scala:219-290)
        with spark.sql.sources.partitionOverwriteMode=dynamic.
        """
        (
            df.write.mode("overwrite")
            .partitionBy(self.spec.column)
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.path(table))
        )

    def drop(self, table: str) -> None:
        import shutil

        if self.exists(table):
            shutil.rmtree(self.path(table))


class IcebergCatalog:  # pragma: no cover - requires iceberg runtime jar
    """Real Iceberg tables, when the runtime jar is on the classpath."""

    def __init__(self, spark: SparkSession, namespace: str = "chronon"):
        self.spark = spark
        self.namespace = namespace
        self.spec = DEFAULT_SPEC

    def partitions(self, table: str) -> list[str]:
        rows = self.spark.sql(
            f"SELECT partition.{self.spec.column} AS p FROM {self.namespace}.{table}.partitions"
        ).collect()
        return sorted({r["p"] for r in rows})

    def read(self, table: str, rng: Optional[PartitionRange] = None) -> DataFrame:
        df = self.spark.read.table(f"{self.namespace}.{table}")
        if rng is not None:
            for clause in rng.where_clauses(self.spec.column):
                df = df.where(clause)
        return df

    def insert_overwrite(self, df: DataFrame, table: str) -> None:
        df.writeTo(f"{self.namespace}.{table}").overwritePartitions()


class Catalog:
    @staticmethod
    def for_session(spark: SparkSession, root: str) -> ParquetWarehouse:
        try:  # use real Iceberg when the extension is configured
            ext = spark.conf.get("spark.sql.extensions", "")
            if "IcebergSparkSessionExtensions" in (ext or ""):
                return IcebergCatalog(spark)  # type: ignore[return-value]
        except Exception:
            pass
        return ParquetWarehouse(spark, root)
