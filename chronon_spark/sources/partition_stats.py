"""Partition stats from file metadata — ZERO data scan.

The reference walks Iceberg manifests to emit per-partition column stats
(row counts, null counts, bounds) for observability
(reference: batch/iceberg/IcebergPartitionStatsExtractor.scala:70-180,
which reads DataFile.recordCount/nullValueCounts/lowerBounds/upperBounds
from manifest entries without touching data).

The parquet-warehouse analog reads the same numbers from parquet FOOTERS:
every row group carries per-column statistics (num_values, null_count,
min, max), so a table's full per-partition profile costs one footer read
per file — O(KB) per file no matter how many GB of data, the property
that makes this usable on a 100 TB table. Footer reads are distributed
over the cluster with mapInPandas on the file list (the driver never
opens a data file), and the file list resolves through the snapshot log
when present, so stats describe committed live data only.
"""

from __future__ import annotations

import os
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chronon_spark.sources.catalog import ParquetWarehouse

_OUT_SCHEMA = (
    "ds string, column string, n_rows long, n_nulls long, "
    "min_num double, max_num double"
)


def _footer_stats(batch_iter, part_col: str):
    """Per-file, per-column stats from the parquet footer (executor side)."""
    import re

    import pyarrow.parquet as pq

    pat = re.compile(rf"(?:^|/){re.escape(part_col)}=([^/]+)/")

    for pdf in batch_iter:
        out = []
        for path in pdf["path"]:
            m = pat.search(path)
            ds = m.group(1) if m else ""
            md = pq.ParquetFile(path).metadata
            # report by the TOP-LEVEL column name derived from the full
            # dotted leaf path: the bare leaf name collides for nested
            # columns (every list column's leaf is literally 'element',
            # which merged unrelated columns' stats and multiply-counted
            # rows). Nested columns keep row/null counts from their
            # first leaf only; min/max of non-flat leaves are skipped
            # (parquet bounds of repeated leaves are element-level, not
            # row-level, so reporting them as column bounds would lie).
            paths_ = [md.schema.column(i).path for i in range(md.num_columns)]
            names = [p.split(".")[0] for p in paths_]
            is_flat = [p == n for p, n in zip(paths_, names)]
            first_leaf = {}
            for ci, n in enumerate(names):
                first_leaf.setdefault(n, ci)
            agg: dict[str, list] = {
                n: [0, 0, None, None] for n in names
            }  # rows, nulls, min, max
            for rg in range(md.num_row_groups):
                grp = md.row_group(rg)
                for ci in range(grp.num_columns):
                    if first_leaf[names[ci]] != ci:
                        continue  # one leaf per top-level column
                    col = grp.column(ci)
                    name = names[ci]
                    a = agg[name]
                    a[0] += grp.num_rows
                    st = col.statistics
                    if st is None:
                        continue
                    if st.null_count is not None:
                        a[1] += st.null_count
                    if (
                        is_flat[ci]
                        and st.has_min_max
                        and isinstance(st.min, (int, float))
                        and not isinstance(st.min, bool)
                    ):
                        mn, mx = float(st.min), float(st.max)
                        a[2] = mn if a[2] is None else min(a[2], mn)
                        a[3] = mx if a[3] is None else max(a[3], mx)
            for name, (rows, nulls, mn, mx) in agg.items():
                out.append((ds, name, rows, nulls, mn, mx))
        yield pd.DataFrame(
            out, columns=["ds", "column", "n_rows", "n_nulls", "min_num", "max_num"]
        )


def partition_stats(
    warehouse: ParquetWarehouse,
    table: str,
    columns: Optional[list[str]] = None,
) -> DataFrame:
    """Per-(partition, column) stats: row count, null count, numeric
    min/max — from footers only. Returns a DataFrame
    (ds, column, n_rows, n_nulls, min_num, max_num); min/max are NULL for
    non-numeric columns (parquet string bounds may be truncated, so they
    are not reported as exact)."""
    spark = warehouse.spark
    root = warehouse.path(table)
    rel = warehouse._live_files(table)
    if rel is None:
        rel = sorted(warehouse._data_files(table))
    paths = [(os.path.join(root, f),) for f in rel]
    if not paths:
        return spark.createDataFrame([], _OUT_SCHEMA)
    files_df = spark.createDataFrame(paths, "path string").repartition(
        min(len(paths), spark.sparkContext.defaultParallelism)
    )
    part_col = warehouse.spec.column
    per_file = files_df.mapInPandas(
        lambda it: _footer_stats(it, part_col), schema=_OUT_SCHEMA
    )
    out = per_file.groupBy("ds", "column").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_nulls").alias("n_nulls"),
        F.min("min_num").alias("min_num"),
        F.max("max_num").alias("max_num"),
    )
    if columns:
        out = out.where(F.col("column").isin(columns))
    return out
