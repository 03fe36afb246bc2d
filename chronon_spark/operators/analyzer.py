"""Conf analysis: feature-schema metadata + pre-flight validation for
GroupBy / Join definitions, WITHOUT running the backfill.

Reference parity: `spark/.../Analyzer.scala`:
  * ``analyze_group_by``    — Analyzer.analyzeGroupBy:160-230: resolve the
    source schema (a plan-only scan — no job runs), emit one
    AggregationMetadata row per output feature (name, column type,
    operation, window, input column, group-by name) and the key schema.
  * ``analyze_join``        — Analyzer.analyzeJoin:231-330: per-part
    metadata with prefixes, plus the validation sweep — key presence /
    dtype match between left and each GroupBy (runSchemaValidation:
    371-388) and sampled timestamp sanity checks on the left
    (runTimestampChecks:459-488: null-ts count + epoch-millis range
    check over a bounded 100-row sample).
  * ``aggregation_metadata_df`` — the metadata as a DataFrame, the shape
    the reference logs and its hub exports.

The hot-key half of the reference's Analyzer lives in
``chronon_spark.operators.stats.skew_keys``; pass ``skew_detection=True``
here to run it on the join's left keys.

Everything here is schema-plane work: the only data-touching action is
the bounded 100-row timestamp sample, mirroring the reference.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronon_spark.api import GroupBy, Join, TIME_COLUMN
from chronon_spark.operators.temporal_join import output_sql_type
from chronon_spark.partitions import DEFAULT_SPEC, PartitionSpec
from chronon_spark.sources.scan import scan_source

# reference Analyzer.scala:473-476 — valid unix-millis window
_TS_MIN = 31_536_000_000       # 1971-01-01
_TS_MAX = 4_102_473_599_999    # 2099-12-31


@dataclass
class AggregationMetadata:
    """Analyzer.AggregationMetadata (Analyzer.scala:129-158)."""

    name: str
    column_type: str
    operation: Optional[str] = None
    window: Optional[str] = None
    input_column: Optional[str] = None
    group_by: Optional[str] = None


def _source_schema(spark: SparkSession, gb: GroupBy, spec: PartitionSpec) -> dict:
    """Column -> Spark SQL type of the (first) resolved source scan.
    Plan-only: builds the scan DataFrame and reads .dtypes, no action."""
    return dict(scan_source(spark, gb.sources[0], None, spec).dtypes)


def analyze_group_by(
    spark: SparkSession,
    gb: GroupBy,
    prefix: str = "",
    spec: PartitionSpec = DEFAULT_SPEC,
) -> tuple[list[AggregationMetadata], dict[str, str]]:
    """(aggregation metadata, key schema) for one GroupBy conf."""
    schema = _source_schema(spark, gb, spec)
    key_schema = {k: schema.get(k, "<missing>") for k in gb.key_columns}
    parts = gb.aggregation_parts()
    if parts:
        meta = [
            AggregationMetadata(
                name=f"{prefix}{p.output_name}",
                column_type=output_sql_type(p, schema[p.input_column]),
                operation=p.operation.value,
                window=p.window.suffix if p.window is not None else "unbounded",
                input_column=p.input_column,
                group_by=gb.name,
            )
            for p in parts
        ]
    else:
        # no-agg passthrough: every non-key selected column is a feature
        # (Analyzer.scala:221-224 falls back to the output schema)
        meta = [
            AggregationMetadata(
                name=f"{prefix}{c}", column_type=t,
                operation="no_operation", window="unbounded",
                input_column=c, group_by=gb.name,
            )
            for c, t in schema.items()
            if c not in gb.key_columns and c not in (TIME_COLUMN, spec.column)
        ]
    return meta, key_schema


def run_timestamp_checks(df: DataFrame, sample: int = 100) -> dict[str, str]:
    """Analyzer.runTimestampChecks: bounded-sample sanity of the ts column
    (all-null detection + epoch-millis range)."""
    if TIME_COLUMN not in df.columns:
        return {"noTsColumn": "No Timestamp Column"}
    row = (
        df.limit(min(sample, 100))
        .agg(
            F.sum(
                F.when(F.col(TIME_COLUMN).isNull(), F.lit(0)).otherwise(F.lit(1))
            ).alias("notNullCount"),
            F.sum(
                F.when(
                    F.col(TIME_COLUMN).between(_TS_MIN, _TS_MAX), F.lit(0)
                ).otherwise(F.lit(1))
            ).alias("badRangeCount"),
        )
        .collect()[0]
    )
    return {
        "notNullCount": str(row["notNullCount"]),
        "badRangeCount": str(row["badRangeCount"]),
    }


def validate_timestamp_checks(checks: dict[str, str], name: str) -> None:
    """Analyzer.validateTimestampChecks: raise on all-null or
    out-of-range millis."""
    if "noTsColumn" in checks:
        return
    if checks["notNullCount"] == "0":
        raise ValueError(
            f"[{name}] ts column is null for all sampled rows — "
            "check the time_column expression"
        )
    if checks["badRangeCount"] != "0":
        raise ValueError(
            f"[{name}] {checks['badRangeCount']} sampled ts values outside "
            "the valid epoch-millis range [1971-01-01, 2099-12-31] — "
            "the time_column is probably seconds or a date"
        )


def _schema_validation(
    left: dict[str, str], right: dict[str, str], right_to_left: dict[str, str]
) -> list[tuple[str, str]]:
    """runSchemaValidation (Analyzer.scala:371-388): key presence both
    sides + dtype equality, as (key, error) pairs."""
    errors = []
    for right_key, left_key in right_to_left.items():
        if left_key not in left:
            errors.append((left_key, (
                f"left side of the join doesn't contain the key {left_key}; "
                f"available: [{', '.join(left)}]")))
        elif right_key not in right:
            errors.append((right_key, (
                f"right side doesn't contain the key {right_key}; "
                f"available: [{', '.join(right)}]")))
        elif left[left_key] != right[right_key]:
            errors.append((left_key, (
                f"join key '{left_key}' has mismatched types — left "
                f"{left[left_key]} vs right {right[right_key]}")))
    return errors


def analyze_join(
    spark: SparkSession,
    join: Join,
    spec: PartitionSpec = DEFAULT_SPEC,
    skew_detection: bool = False,
    validation_assert: bool = False,
) -> dict:
    """Full pre-flight analysis of a Join conf.

    Returns {"agg_metadata": [...], "left_schema": {...},
    "key_errors": [(key, msg)], "timestamp_checks": {...},
    "skew_keys": DataFrame | None}.  With ``validation_assert`` raises on
    any key error (the reference's validationAssert flag)."""
    left_df = scan_source(spark, join.left, None, spec)
    left_schema = dict(left_df.dtypes)
    checks = run_timestamp_checks(left_df)
    validate_timestamp_checks(checks, f"join/{join.name}")

    agg_meta: list[AggregationMetadata] = []
    key_errors: list[tuple[str, str]] = []
    for part in join.join_parts:
        meta, gb_keys = analyze_group_by(
            spark, part.group_by, prefix=part.full_prefix() + "_", spec=spec
        )
        agg_meta.extend(meta)
        key_errors.extend(
            _schema_validation(left_schema, gb_keys, part.right_to_left_keys())
        )
    if validation_assert and key_errors:
        raise ValueError(
            "join schema validation failed:\n- "
            + "\n- ".join(f"{k}: {m}" for k, m in key_errors)
        )
    skew = None
    if skew_detection:
        from chronon_spark.operators.stats import skew_keys as _sk

        left_keys = sorted({
            lk for part in join.join_parts
            for lk in part.right_to_left_keys().values()
            if lk in left_schema
        })
        if left_keys:
            skew = _sk(left_df, left_keys, k=10)
    return {
        "agg_metadata": agg_meta,
        "left_schema": left_schema,
        "key_errors": key_errors,
        "timestamp_checks": checks,
        "skew_keys": skew,
    }


def aggregation_metadata_df(spark: SparkSession, join: Join,
                            spec: PartitionSpec = DEFAULT_SPEC) -> DataFrame:
    """Join feature metadata as a DataFrame (the reference's logged /
    hub-exported shape)."""
    res = analyze_join(spark, join, spec)
    rows = [
        (m.name, m.column_type, m.operation, m.window, m.input_column, m.group_by)
        for m in res["agg_metadata"]
    ]
    return spark.createDataFrame(
        rows,
        schema=("name string, column_type string, operation string, "
                "window string, input_column string, group_by string"),
    )
