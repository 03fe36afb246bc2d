"""Snapshot-accuracy join parts: left rows enriched with features "as of
end of yesterday" — the (EVENTS, EVENTS, SNAPSHOT) and (*, ENTITIES)
topologies of the reference's dispatch (JoinPartJob.scala:216-246).

Semantics (reference: JoinBase.joinWithLeft:99-111, JoinUtils.shiftDays):
a left row at time ts joins the snapshot feature row of partition
ds = date(ts) - 1 day: "features as of the end of yesterday". Implemented
as a plain equi-join on (keys, date) against the DENSE daily snapshot
table — Catalyst picks broadcast/SMJ, AQE handles skew; no custom kernel.

At scale: the snapshot side is |keys| x |days| (already aggregated), so
this join is usually broadcastable per-day or a cheap shuffled hash join;
the expensive windowing work happened once in the snapshot GroupBy and is
shared by every left row of the day.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronon_spark.api import (
    PARTITION_COLUMN,
    TIME_COLUMN,
    GroupBy,
    Join,
    JoinPart,
)
from chronon_spark.operators.groupby import compute_snapshot_groupby
from chronon_spark.partitions import DEFAULT_SPEC, PartitionRange, PartitionSpec

TS_DS = "ts_ds"  # date-of-ts helper (reference: Constants.TimePartitionColumn)


def _left_date_range(left_df: DataFrame, spec: PartitionSpec) -> PartitionRange:
    row = left_df.agg(
        F.min(PARTITION_COLUMN).alias("lo"), F.max(PARTITION_COLUMN).alias("hi")
    ).collect()[0]
    return PartitionRange(row["lo"], row["hi"], spec)


def compute_snapshot_join_part(
    spark: SparkSession,
    left_df: DataFrame,
    join_part: JoinPart,
    rng: Optional[PartitionRange] = None,
    spec: PartitionSpec = DEFAULT_SPEC,
) -> DataFrame:
    """Enrich left rows with the GroupBy's end-of-previous-day snapshot
    values. The snapshot is computed DENSE over [left_min - 1, left_max - 1]
    so a key with in-window events but none on a given day still has a row
    (otherwise window tails would read as null)."""
    gb = join_part.group_by
    left_rng = rng if rng is not None and rng.start else _left_date_range(left_df, spec)
    snap_rng = PartitionRange(
        spec.before(left_rng.start), spec.before(left_rng.end), spec
    )
    snap = compute_snapshot_groupby(spark, gb, snap_rng, spec, dense=True)

    key_map = join_part.right_to_left_keys()  # gb key -> left col
    prefix = join_part.full_prefix() + "_"
    feature_cols = [p.output_name for p in gb.aggregation_parts()]
    right = snap.select(
        *[F.col(k).alias(f"__rk_{k}") for k in gb.key_columns],
        F.col(PARTITION_COLUMN).alias("__snap_ds"),
        *[F.col(c).alias(prefix + c) for c in feature_cols],
    )

    out = left_df.withColumn(
        TS_DS, F.date_format(F.timestamp_millis(F.col(TIME_COLUMN)), "yyyy-MM-dd")
    )
    cond = F.col("__snap_ds") == F.date_format(
        F.date_sub(F.to_date(F.col(TS_DS)), 1), "yyyy-MM-dd"
    )
    for k in gb.key_columns:
        cond = cond & (F.col(key_map[k]) == F.col(f"__rk_{k}"))
    out = out.join(right, cond, "left")
    return out.drop(TS_DS, "__snap_ds", *[f"__rk_{k}" for k in gb.key_columns])


def compute_join(
    spark: SparkSession,
    join: Join,
    rng: Optional[PartitionRange] = None,
    spec: PartitionSpec = DEFAULT_SPEC,
) -> DataFrame:
    """Full join with per-part accuracy dispatch (the reference's
    JoinPartJob algorithm table): TEMPORAL parts -> sawtooth cogroup;
    SNAPSHOT parts -> end-of-yesterday snapshot equi-join; no-agg parts ->
    plain left join on keys (+ derivations at the end)."""
    from chronon_spark.api import Accuracy
    from chronon_spark.operators.temporal_join import (
        _apply_skew_filter,
        compute_temporal_join_part,
    )
    from chronon_spark.sources.scan import scan_source

    left_df = scan_source(spark, join.left, rng, spec)
    left_df = _apply_skew_filter(left_df, join)
    out = left_df
    for jp in join.join_parts:
        gb = jp.group_by
        if not gb.aggregations:
            out = _no_agg_join_part(spark, out, jp, rng, spec)
        elif gb.inferred_accuracy() == Accuracy.TEMPORAL:
            out = compute_temporal_join_part(spark, out, jp, rng, spec)
        else:
            out = compute_snapshot_join_part(spark, out, jp, rng, spec)
    if join.derivations:
        from chronon_spark.api import apply_derivations
        from chronon_spark.operators.temporal_join import _join_ensure_keys

        ensure = list(join.row_ids or []) or _join_ensure_keys(join, left_df)
        out = apply_derivations(out, join.derivations, ensure)
    return out


def _no_agg_join_part(
    spark: SparkSession,
    left_df: DataFrame,
    join_part: JoinPart,
    rng: Optional[PartitionRange],
    spec: PartitionSpec,
) -> DataFrame:
    """No-aggregation GroupBy = raw feature columns joined by key
    (reference: NoAggTest): latest row per key as of end of yesterday.

    For an entity snapshot source this is the previous day's snapshot row;
    for simplicity and dominant use we take the latest snapshot partition
    <= left max date - 1."""
    from chronon_spark.operators.groupby import _union_sources

    gb = join_part.group_by
    right = _union_sources(spark, gb, rng, spec)
    key_map = join_part.right_to_left_keys()
    prefix = join_part.full_prefix() + "_"
    value_cols = [
        c for c in right.columns
        if c not in gb.key_columns + [PARTITION_COLUMN, TIME_COLUMN]
    ]
    latest = right.groupBy(*gb.key_columns).agg(
        *[F.max_by(F.col(c), F.col(PARTITION_COLUMN)).alias(prefix + c) for c in value_cols]
    ).select(
        *[F.col(k).alias(f"__rk_{k}") for k in gb.key_columns],
        *[prefix + c for c in value_cols],
    )
    cond = None
    for k in gb.key_columns:
        c = F.col(key_map[k]) == F.col(f"__rk_{k}")
        cond = c if cond is None else (cond & c)
    joined = left_df.join(latest, cond, "left")
    return joined.drop(*[f"__rk_{k}" for k in gb.key_columns])
