"""Table comparison job: row-level diff + per-column drift metrics.

Reference parity: `spark/.../stats/CompareBaseJob.scala:32-190` +
`CompareMetrics.scala:38-133`.

  * ``check_consistency`` — the schema gate (CompareBaseJob.
    checkConsistency): field-count parity (left may be wider only in
    migration mode), mapped-column presence + dtype equality, unique
    mapping, keys present on both sides, and at least one time-ish key.
  * ``comparison_df`` — the full-outer join on the keys with non-key
    columns suffixed ``_left`` / ``_right`` (CompareBaseJob.compare
    steps 3-4).  The join shuffles both sides on the key columns once;
    callers comparing a small "right" (e.g. a sampled regression run)
    can pre-``broadcast`` it.
  * ``compare_metrics`` — CompareMetrics.buildMetrics re-expressed as
    ONE native aggregate over the comparison frame, unpivoted to a long
    row per compared column: universal metrics (both_null / left_null /
    right_null / mismatch / total) for every column, plus SMAPE and an
    exact diff-percentile profile for numeric columns.  The reference
    feeds the same boolean/absolute-difference expressions through its
    RowAggregator with KLL percentile sketches; percentiles here are
    exact-pinned (the engine-wide oracle strategy), with the
    ``approx_percentile`` one-pass variant behind ``exact=False``.

Scale shape: one key-shuffle for the join, one partial-aggregated
reduction to a single row per metric set — post-shuffle state is
O(columns x percentile points), never O(rows).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chronon_spark.api import PARTITION_COLUMN, TIME_COLUMN

LEFT_SUFFIX = "_left"
RIGHT_SUFFIX = "_right"

# reference Constants.ReservedColumns time elements (checkConsistency's
# "one of the key columns is a time column" gate)
_TIME_KEYS = (TIME_COLUMN, PARTITION_COLUMN, "date_key", "date", "datestamp")

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)

DIFF_PERCENTILES = (0.05, 0.5, 0.95)


def check_consistency(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    mapping: Optional[dict[str, str]] = None,
    migration_check: bool = False,
) -> None:
    """Raise ValueError listing every schema inconsistency (reference:
    CompareBaseJob.checkConsistency — same checks, same leniency: in
    migration mode the left side may carry extra columns)."""
    mapping = mapping or {}
    lf = {f.name: f.dataType for f in left.schema.fields}
    rf = {f.name: f.dataType for f in right.schema.fields}
    errors: list[str] = []
    size_ok = len(lf) >= len(rf) if migration_check else len(lf) == len(rf)
    if not size_ok:
        errors.append(
            f"inconsistent field counts; left: {len(lf)}, right: {len(rf)}"
        )
    reverse = {v: k for k, v in mapping.items()}
    if len(reverse) != len(mapping):
        errors.append(f"mapping values contain duplicates: {mapping}")
    for rname, rtype in rf.items():
        lname = reverse.get(rname, rname)
        if lname in lf:
            if lf[lname] != rtype:
                errors.append(
                    f"dtype mismatch for '{lname}': left {lf[lname]}, right {rtype}"
                )
        elif not migration_check:
            errors.append(f"left column missing for right '{rname}' (as '{lname}')")
    if not set(mapping).issubset(lf):
        errors.append(f"mapping keys not all in left: {sorted(set(mapping) - set(lf))}")
    if not set(mapping.values()).issubset(rf):
        errors.append(
            f"mapping values not all in right: {sorted(set(mapping.values()) - set(rf))}"
        )
    for side, fields in (("left", lf), ("right", rf)):
        miss = [k for k in keys if k not in fields]
        if miss:
            errors.append(f"keys missing on {side}: {miss}")
    if not any(k in _TIME_KEYS for k in keys):
        errors.append(
            f"no time column among keys {list(keys)} (need one of {_TIME_KEYS})"
        )
    if errors:
        raise ValueError("compare consistency check failed:\n- " + "\n- ".join(errors))


def comparison_df(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    mapping: Optional[dict[str, str]] = None,
) -> DataFrame:
    """Full-outer key join with _left/_right suffixed value columns.

    ``mapping`` renames left columns to their right-side counterparts
    before suffixing, so mapped pairs land as name_left / name_right
    under the RIGHT name (the reference resolves mapping at metric
    build; renaming up front gives the same pairs with simpler plans).
    """
    mapping = mapping or {}
    lsel = []
    for f in left.schema.fields:
        c = f.name
        if c in keys:
            lsel.append(F.col(c))
        else:
            lsel.append(F.col(c).alias(f"{mapping.get(c, c)}{LEFT_SUFFIX}"))
    rsel = [
        F.col(c) if c in keys else F.col(c).alias(f"{c}{RIGHT_SUFFIX}")
        for c in right.columns
    ]
    return left.select(*lsel).join(right.select(*rsel), list(keys), "full")


def compare_metrics(
    cmp_df: DataFrame,
    value_columns: Sequence[str],
    numeric_columns: Sequence[str] = (),
    percentiles: Sequence[float] = DIFF_PERCENTILES,
    exact: bool = True,
) -> DataFrame:
    """Long metrics frame: one row per compared column.

    Columns: column, total, both_null, left_null, right_null, mismatch,
    smape, diff_p{...} (NULL for non-numeric).  Expressions follow
    CompareMetrics.buildMetrics: mismatch counts only rows where BOTH
    sides are non-null and differ; SMAPE is averaged over non-null pairs
    with the 0/0 guard -> 0.
    """
    aggs = [F.count(F.lit(1)).alias("total")]
    for c in value_columns:
        lc, rc = F.col(f"{c}{LEFT_SUFFIX}"), F.col(f"{c}{RIGHT_SUFFIX}")
        aggs.append(F.sum((lc.isNull() & rc.isNull()).cast("long")).alias(f"{c}__bn"))
        aggs.append(F.sum((lc.isNull() & rc.isNotNull()).cast("long")).alias(f"{c}__ln"))
        aggs.append(F.sum((lc.isNotNull() & rc.isNull()).cast("long")).alias(f"{c}__rn"))
        aggs.append(
            F.sum((lc.isNotNull() & rc.isNotNull() & (lc != rc)).cast("long"))
            .alias(f"{c}__mm")
        )
        if c in numeric_columns:
            ld, rd = lc.cast("double"), rc.cast("double")
            denom = F.abs(ld) + F.abs(rd)
            smape = F.when(denom != 0.0, F.abs(ld - rd) * 2 / denom).otherwise(0.0)
            aggs.append(F.avg(smape).alias(f"{c}__smape"))
            plist = ", ".join(repr(float(p)) for p in percentiles)
            fn = "percentile" if exact else "approx_percentile"
            aggs.append(
                F.expr(
                    f"{fn}(CAST(`{c}{LEFT_SUFFIX}` AS DOUBLE)"
                    f" - CAST(`{c}{RIGHT_SUFFIX}` AS DOUBLE), array({plist}))"
                ).alias(f"{c}__dp")
            )

    wide = cmp_df.groupBy().agg(*aggs)

    def null_d():
        return F.lit(None).cast("double")

    pnames = [f"diff_p{f'{p:.2f}'.replace('0.', '').ljust(2, '0')}" for p in percentiles]
    structs = []
    for c in value_columns:
        num = c in numeric_columns
        entry = [
            F.lit(c).alias("column"),
            F.col(f"{c}__bn").alias("both_null"),
            F.col(f"{c}__ln").alias("left_null"),
            F.col(f"{c}__rn").alias("right_null"),
            F.col(f"{c}__mm").alias("mismatch"),
            (F.col(f"{c}__smape") if num else null_d()).alias("smape"),
        ]
        for i, pn in enumerate(pnames):
            entry.append((F.col(f"{c}__dp")[i] if num else null_d()).alias(pn))
        structs.append(F.struct(*entry))
    exploded = wide.select("total", F.explode(F.array(*structs)).alias("__m"))
    return exploded.select(
        F.col("__m.column").alias("column"),
        F.col("total"),
        *[F.col(f"__m.{n}").alias(n)
          for n in ["both_null", "left_null", "right_null", "mismatch", "smape"] + pnames],
    )


def compare_tables(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    mapping: Optional[dict[str, str]] = None,
    migration_check: bool = False,
    percentiles: Sequence[float] = DIFF_PERCENTILES,
    exact: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """CompareJob analog: returns (comparison_df, metrics_df).

    Runs the consistency gate, builds the suffixed full-outer comparison
    frame, and computes the per-column metric summary over the RIGHT
    side's value columns (the comparison basis, as the reference prunes
    the left to the right's schema in migration mode)."""
    check_consistency(left, right, keys, mapping, migration_check)
    if migration_check:
        # reference CompareBaseJob.scala:124-139: prune left-only columns
        # so migration comparisons are schema-symmetric
        mapping = mapping or {}
        rcols = set(right.columns)
        keep = [
            c for c in left.columns
            if c in keys or mapping.get(c, c) in rcols
        ]
        left = left.select(*keep)
    cdf = comparison_df(left, right, keys, mapping)
    value_cols = [c for c in right.columns if c not in keys]
    rnum = {
        f.name for f in right.schema.fields if isinstance(f.dataType, _NUMERIC_TYPES)
    }
    metrics = compare_metrics(
        cdf, value_cols, [c for c in value_cols if c in rnum], percentiles, exact
    )
    return cdf, metrics
