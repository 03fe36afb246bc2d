"""Query-DSL scan: select/where projection + partition pruning + time
normalization.

reference: TableUtils.scanDf/scanDfBase (spark/.../catalog/TableUtils.scala:
611-688) — selects rendered per QueryUtils.buildSelects
(api/.../QueryUtils.scala:27-66), partition predicates
`col >= start AND col < after(end)`, epoch-millis LongType time column
enforced (spark/.../GroupBy.scala:506-513), snapshot-events fallback
timestamp = end-of-ds (`dsBasedTimestamp`, GroupBy.scala:693-697).

Everything here stays declarative: the selects/wheres become Catalyst
expressions, so predicate pushdown + column pruning reach the parquet
scan for free.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronon_spark.api import (
    TIME_COLUMN,
    DataFrameSource,
    EntitySource,
    EventSource,
    JoinSource,
    ModelTransformSource,
    Query,
)
from chronon_spark.partitions import DEFAULT_SPEC, PartitionRange, PartitionSpec


def _java_fmt_to_py(java_fmt: str) -> str:
    """Translate the (year-first) java DateTimeFormatter patterns the
    partitionFormat knob accepts into strftime form."""
    assert java_fmt.startswith("yyyy"), (
        f"partition_format must be year-first (lexicographic): {java_fmt}"
    )
    return java_fmt.replace("yyyy", "%Y").replace("MM", "%m").replace("dd", "%d")


def _load_table(spark: SparkSession, table: str,
                rng: Optional[PartitionRange] = None) -> DataFrame:
    """Table name, or a direct parquet path (dev convenience,
    reference: LocalDataLoader.scala). Paths resolve through the
    warehouse snapshot log / Iceberg metadata / Delta log when present
    (catalog.read_parquet_path); `rng` lets those formats prune FILES
    from the plan via their metadata."""
    if table.endswith(".parquet") or table.startswith("/") or table.startswith("file:"):
        from chronon_spark.sources.catalog import read_parquet_path

        return read_parquet_path(spark, table, rng)
    return spark.read.table(table)


def scan_df(
    spark: SparkSession,
    table: str,
    query: Optional[Query] = None,
    rng: Optional[PartitionRange] = None,
    spec: PartitionSpec = DEFAULT_SPEC,
) -> DataFrame:
    """Scan a table applying the Query DSL + partition pruning."""
    query = query or Query()
    for setup in query.setups or []:
        spark.sql(setup)

    part_col = query.partition_column or spec.column

    # partition pruning predicates first (pushed down by Catalyst)
    scan_rng = rng
    if query.start_partition or query.end_partition:
        q_rng = PartitionRange(query.start_partition, query.end_partition, spec)
        scan_rng = q_rng if scan_rng is None else scan_rng.intersect(q_rng)
    # metadata FILE pruning only under default partition semantics —
    # foreign partition columns/formats fall back to row predicates
    file_rng = (scan_rng
                if query.partition_column is None
                and query.partition_format in (None, "yyyy-MM-dd")
                else None)
    df = _load_table(spark, table, file_rng)
    pruned = False
    if scan_rng is not None and part_col in df.columns:
        if query.partition_format and query.partition_format != "yyyy-MM-dd":
            # source partitions in a foreign date format (reference:
            # Query.partitionFormat, api.thrift:21): render the pruning
            # bounds IN THAT FORMAT so they still push down as string
            # predicates, then normalize the column below
            src_spec = PartitionSpec(
                part_col, _java_fmt_to_py(query.partition_format),
                spec.interval_millis,
            )
            conv = lambda ds: src_spec.format(spec.parse(ds)) if ds else None
            src_rng = PartitionRange(conv(scan_rng.start), conv(scan_rng.end), src_spec)
            for clause in src_rng.where_clauses(part_col):
                df = df.where(clause)
        else:
            for clause in scan_rng.where_clauses(part_col):
                df = df.where(clause)
        pruned = True
    if (
        query.partition_format
        and query.partition_format != "yyyy-MM-dd"
        and part_col in df.columns
    ):
        df = df.withColumn(
            part_col,
            F.date_format(
                F.to_date(F.col(part_col), query.partition_format), "yyyy-MM-dd"
            ),
        )

    for clause in query.wheres or []:
        df = df.where(clause)

    if query.selects is not None:
        exprs = [f"({expr}) AS {name}" for name, expr in query.selects.items()]
        # keep partition + time columns alongside user selects
        passthrough = []
        if part_col in df.columns and part_col not in query.selects:
            passthrough.append(part_col)
        if query.time_column and TIME_COLUMN not in query.selects:
            exprs.append(f"({query.time_column}) AS {TIME_COLUMN}")
        elif TIME_COLUMN in df.columns and TIME_COLUMN not in query.selects:
            passthrough.append(TIME_COLUMN)
        df = df.selectExpr(*passthrough, *exprs)
    elif query.time_column:
        df = df.withColumn(TIME_COLUMN, F.expr(query.time_column))

    # normalize ts to epoch millis LongType (enforced, GroupBy.scala:506-513)
    if TIME_COLUMN in df.columns:
        dtype = dict(df.dtypes)[TIME_COLUMN]
        if dtype.startswith("timestamp"):
            df = df.withColumn(
                TIME_COLUMN, (F.unix_micros(F.col(TIME_COLUMN).cast("timestamp")) / 1000).cast("long")
            )
        elif dtype != "bigint":
            df = df.withColumn(TIME_COLUMN, F.col(TIME_COLUMN).cast("long"))

    # materialize the partition column if missing (event tables: ds = date_of(ts))
    if part_col not in df.columns and TIME_COLUMN in df.columns:
        df = df.withColumn(
            part_col,
            F.date_format(F.timestamp_millis(F.col(TIME_COLUMN)), "yyyy-MM-dd"),
        )
        if scan_rng is not None and not pruned:
            # ds is derived from ts, so prune with LONG ts-range predicates
            # — these push down to parquet row groups; a string ds filter
            # would format 10^11 per-row dates just to compare them
            if scan_rng.start is not None:
                df = df.where(F.col(TIME_COLUMN) >= spec.epoch_millis(scan_rng.start))
            if scan_rng.end is not None:
                df = df.where(
                    F.col(TIME_COLUMN) < spec.epoch_millis(spec.after(scan_rng.end))
                )
    return df


def scan_source(
    spark: SparkSession,
    source,
    rng: Optional[PartitionRange] = None,
    spec: PartitionSpec = DEFAULT_SPEC,
) -> DataFrame:
    """Materialize one GroupBy/Join source as a DataFrame.

    Cumulative sources scan only the latest partition (it contains full
    history — reference: GroupBy.getIntersectedRange, GroupBy.scala:631-645).
    """
    if isinstance(source, DataFrameSource):
        q = source.query
        # same Query-DSL contract as scan_df: setups run first (select
        # exprs may call setup-registered UDFs) and the query's OWN
        # partition bounds intersect the caller's range — JoinSource /
        # ModelTransformSource / cumulative EventSource all route here,
        # and ignoring q.start/end_partition silently widened their scans
        for setup in q.setups or []:
            spark.sql(setup)
        if q.start_partition or q.end_partition:
            q_rng = PartitionRange(q.start_partition, q.end_partition, spec)
            rng = q_rng if rng is None else rng.intersect(q_rng)
        df = source.factory(spark)
        for clause in q.wheres or []:
            df = df.where(clause)
        if q.selects is not None:
            exprs = [f"({expr}) AS {name}" for name, expr in q.selects.items()]
            if q.time_column:
                exprs.append(f"({q.time_column}) AS {TIME_COLUMN}")
            elif TIME_COLUMN in df.columns:
                exprs.insert(0, TIME_COLUMN)
            if spec.column in df.columns and spec.column not in (q.selects or {}):
                exprs.insert(0, spec.column)
            df = df.selectExpr(*exprs)
        elif q.time_column:
            df = df.withColumn(TIME_COLUMN, F.expr(q.time_column))
        if TIME_COLUMN in df.columns:
            dtype = dict(df.dtypes)[TIME_COLUMN]
            if dtype.startswith("timestamp"):
                df = df.withColumn(
                    TIME_COLUMN, (F.unix_micros(F.col(TIME_COLUMN).cast("timestamp")) / 1000).cast("long")
                )
            elif dtype != "bigint":
                df = df.withColumn(TIME_COLUMN, F.col(TIME_COLUMN).cast("long"))
        if spec.column not in df.columns and TIME_COLUMN in df.columns:
            df = df.withColumn(
                spec.column,
                F.date_format(F.timestamp_millis(F.col(TIME_COLUMN)), "yyyy-MM-dd"),
            )
        if TIME_COLUMN not in df.columns and spec.column in df.columns:
            # snapshot rows without event time: ts = end of their partition
            # day (reference: dsBasedTimestamp, GroupBy.scala:693-697)
            df = df.withColumn(TIME_COLUMN, _ds_based_ts(spec))
        if rng is not None and spec.column in df.columns:
            for clause in rng.where_clauses(spec.column):
                df = df.where(clause)
        return df
    if isinstance(source, JoinSource):
        # chaining: materialize the upstream Join, then apply this source's
        # query DSL on its output (reference: replaceJoinSource,
        # GroupBy.scala:412-477)
        from chronon_spark.operators.snapshot_join import compute_join

        upstream = compute_join(spark, source.join, rng, spec)
        return scan_source(
            spark,
            DataFrameSource(lambda s, df=upstream: df, query=source.query),
            rng,
            spec,
        )
    if isinstance(source, ModelTransformSource):
        # fourth Source union arm (thrift/api.thrift:192): inner sources
        # unioned, enriched with model outputs in one Arrow pass, then
        # this source's Query DSL applies over the ENRICHED columns
        from chronon_spark.operators.model_transforms import scan_model_transforms

        enriched = scan_model_transforms(spark, source, rng, spec)
        return scan_source(
            spark,
            DataFrameSource(lambda s, df=enriched: df, query=source.query),
            rng,
            spec,
        )
    if isinstance(source, EventSource):
        if source.is_cumulative:
            # the LATEST partition carries full history — scan only it and
            # re-derive ds from event time (reference: getIntersectedRange,
            # GroupBy.scala:631-645)
            df = _load_table(spark, source.table)
            part_col = source.query.partition_column or spec.column
            if part_col in df.columns:
                latest = df.agg(F.max(part_col).alias("m")).collect()[0]["m"]
                df = df.where(F.col(part_col) == latest).drop(part_col)
            return scan_source(
                spark,
                DataFrameSource(lambda s, df=df: df, query=source.query),
                rng,
                spec,
            )
        return scan_df(spark, source.table, source.query, rng, spec)
    if isinstance(source, EntitySource):
        df = scan_df(spark, source.snapshot_table, source.query, rng, spec)
        if TIME_COLUMN not in df.columns and spec.column in df.columns:
            df = df.withColumn(TIME_COLUMN, _ds_based_ts(spec))
        return df
    raise TypeError(f"unsupported source type: {type(source)}")


def _ds_based_ts(spec: PartitionSpec):
    """End-of-partition-day epoch millis (dsBasedTimestamp)."""
    return (
        (F.unix_date(F.to_date(F.col(spec.column))) + 1).cast("long") * 86_400_000 - 1
    )
