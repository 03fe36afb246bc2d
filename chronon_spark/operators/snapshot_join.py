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
    EntitySource,
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
    # resolve the date range ONCE against the raw left scan: per-part range
    # probes (and the mid-size semi filter's probe.count) must never execute
    # the accumulated chained plan with earlier parts' Arrow kernels in it
    if rng is None or not rng.start:
        if PARTITION_COLUMN in left_df.columns:
            rng = _left_date_range(left_df, spec)
    hash_fields: dict = {}
    combos: list = []
    if join.bootstrap_parts:
        from chronon_spark.operators.bootstrap import (
            collect_combos,
            compute_bootstrap_table,
        )

        out, hash_fields = compute_bootstrap_table(spark, left_df, join, rng, spec)
        # one collect on the un-chained bootstrap table; per-part covering
        # sets are then pure-Python filters over these combos
        if hash_fields:
            combos = collect_combos(out)
    else:
        out = left_df

    for jp in join.join_parts:
        gb = jp.group_by
        is_mutation_part = gb.inferred_accuracy() == Accuracy.TEMPORAL and any(
            isinstance(s, EntitySource) and s.mutation_table for s in gb.sources
        )
        if not gb.aggregations:
            compute_fn = lambda df, jp=jp: _no_agg_join_part(spark, df, jp, rng, spec)
        elif is_mutation_part:
            from chronon_spark.operators.mutations import (
                compute_temporal_entity_join_part,
            )

            compute_fn = lambda df, jp=jp: compute_temporal_entity_join_part(
                spark, df, jp, rng, spec
            )
        elif gb.inferred_accuracy() == Accuracy.TEMPORAL:
            compute_fn = lambda df, jp=jp: compute_temporal_join_part(
                spark, df, jp, rng, spec, skew_keys=join.skew_keys,
                probe_df=left_df,
            )
        else:
            compute_fn = lambda df, jp=jp: compute_snapshot_join_part(
                spark, df, jp, rng, spec
            )
        if hash_fields and gb.aggregations:
            out = _bootstrapped_part(out, jp, hash_fields, combos, compute_fn)
        else:
            out = compute_fn(out)
    if join.bootstrap_parts:
        from chronon_spark.operators.bootstrap import MATCHED_HASHES

        out = out.drop(MATCHED_HASHES)
    if join.derivations:
        from chronon_spark.api import apply_derivations
        from chronon_spark.operators.temporal_join import _join_ensure_keys

        ensure = list(join.row_ids or []) or _join_ensure_keys(join, left_df)
        out = apply_derivations(out, join.derivations, ensure)
    return out


def _bootstrapped_part(
    out: DataFrame, join_part: JoinPart, hash_fields: dict,
    all_combos: list, compute_fn
) -> DataFrame:
    """Covering-set split for one join part (reference: Join.computeRange
    :264-285): rows whose matched bootstrap combo fully covers the part's
    output keep their values; only the uncovered remainder is computed,
    with bootstrap values coalescing OVER computed ones. `all_combos` was
    collected once from the bootstrap table before any part was chained."""
    from chronon_spark.operators.bootstrap import (
        covering_combos,
        covering_filter,
    )

    prefix = join_part.full_prefix() + "_"
    part_cols = [prefix + p.output_name
                 for p in join_part.group_by.aggregation_parts()]
    present = [c for c in part_cols if c in out.columns]
    if not present:
        return compute_fn(out)
    combos = covering_combos(all_combos, hash_fields, part_cols)
    cov = covering_filter(combos)
    uncovered = out.where(~cov)
    unc = uncovered
    for c in present:
        unc = unc.withColumnRenamed(c, f"__bs_{c}")
    computed = compute_fn(unc)
    for c in present:
        computed = computed.withColumn(
            c, F.coalesce(F.col(f"__bs_{c}"), F.col(c))
        ).drop(f"__bs_{c}")
    if not combos:
        return computed
    covered = out.where(cov)
    return computed.unionByName(covered)


def _no_agg_join_part(
    spark: SparkSession,
    left_df: DataFrame,
    join_part: JoinPart,
    rng: Optional[PartitionRange],
    spec: PartitionSpec,
) -> DataFrame:
    """No-aggregation GroupBy = raw feature columns joined by key
    (reference: NoAggTest): for each left row, the latest snapshot
    partition whose ds <= date(left ts) - 1 ("end of yesterday"), carried
    forward per key so sparse snapshot tables still resolve — with zero
    leakage from same-day or future partitions.

    Physical plan (scale-safe, no theta join): dedupe right to one row per
    (key, ds); union snapshot rows with the left's distinct probe dates;
    one `last(ignorenulls)` carry-forward window per key; equi-join the
    left on (keys, date(ts)-1). Snapshot side is |keys| x |days| so the
    final join is broadcast/cheap."""
    from pyspark.sql import Window as W

    from chronon_spark.operators.groupby import _union_sources

    gb = join_part.group_by
    key_map = join_part.right_to_left_keys()
    prefix = join_part.full_prefix() + "_"
    keys = gb.key_columns

    left_rng = rng if rng is not None and rng.start else _left_date_range(left_df, spec)
    # scan nothing after end-of-yesterday of the left's max date
    scan_rng = PartitionRange(None, spec.before(left_rng.end), spec)
    right = _union_sources(spark, gb, scan_rng, spec)
    value_cols = [
        c for c in right.columns
        if c not in keys + [PARTITION_COLUMN, TIME_COLUMN]
    ]
    # one row per (key, snapshot day): latest by ts when present, else max
    # value-struct for determinism
    packed = F.struct(*[F.col(c) for c in value_cols])
    if TIME_COLUMN in right.columns:
        per_day_snap = F.max_by(packed, F.coalesce(F.col(TIME_COLUMN), F.lit(0)))
    else:
        per_day_snap = F.max(packed)
    snap_rows = right.groupBy(*keys, PARTITION_COLUMN).agg(
        per_day_snap.alias("__snap")
    ).select(*keys, F.col(PARTITION_COLUMN).alias("__d"), "__snap",
             F.lit(0).alias("__ord"))

    # probe rows: the left's distinct (key, date(ts) - 1) needs
    if TIME_COLUMN in left_df.columns:
        left_date = F.date_sub(F.to_date(F.timestamp_millis(F.col(TIME_COLUMN))), 1)
    else:
        left_date = F.date_sub(F.to_date(F.col(PARTITION_COLUMN)), 1)
    need_ds = F.date_format(left_date, "yyyy-MM-dd")
    nonnull_keys = F.lit(True)
    for k in keys:
        nonnull_keys = nonnull_keys & F.col(k).isNotNull()
    probes = (
        left_df.select(
            *[F.col(key_map[k]).alias(k) for k in keys], need_ds.alias("__d")
        )
        .where(nonnull_keys)
        .distinct()
    )
    snap_type = snap_rows.schema["__snap"].dataType.simpleString()
    probe_rows = probes.select(
        *keys, "__d", F.expr(f"CAST(NULL AS {snap_type})").alias("__snap"),
        F.lit(1).alias("__ord"),
    )

    # carry-forward: at equal ds, snapshots (__ord=0) sort before probes so
    # the ds == left_date - 1 partition IS visible to the probe
    w = (
        W.partitionBy(*keys)
        .orderBy("__d", "__ord")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = (
        snap_rows.unionByName(probe_rows)
        .withColumn("__filled", F.last("__snap", ignorenulls=True).over(w))
        .where(F.col("__ord") == 1)
        .select(
            *[F.col(k).alias(f"__rk_{k}") for k in keys],
            F.col("__d").alias("__need_ds"),
            *[F.col("__filled")[c].alias(prefix + c) for c in value_cols],
        )
    )
    out = left_df.withColumn("__need_ds_l", need_ds)
    cond = F.col("__need_ds_l") == F.col("__need_ds")
    for k in keys:
        cond = cond & (F.col(key_map[k]) == F.col(f"__rk_{k}"))
    joined = out.join(filled, cond, "left")
    return joined.drop(
        "__need_ds_l", "__need_ds", *[f"__rk_{k}" for k in keys]
    )
