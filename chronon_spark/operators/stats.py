"""Feature-statistics and key-skew analysis jobs.

Reference parity:
  * ``feature_stats``  — the batch analog of `spark/.../stats/
    StatsCompute.scala:37-120` + `aggregator/.../row/StatsGenerator.
    scala:35-141`: for every non-key value column compute a null count /
    null rate against a shared ``total`` row count, and for numeric
    columns the zero count, min/max/avg/variance, unique count and a
    percentile profile.  The reference builds these as a RowAggregator
    over IsNull/IsZero/Raw/One input transforms with KLL percentile and
    CPC unique sketches; this engine expresses the same metrics as ONE
    native ``groupBy().agg`` (every metric is a Catalyst aggregate, so
    map-side partial aggregation applies) and then unpivots the wide row
    with ``stack`` into the long (column, metric...) shape the stats
    store serves.  Sketch ops are exact-pinned (exact percentile /
    countDistinct) — the engine-wide oracle strategy used for
    APPROX_UNIQUE_COUNT; at 100 TB flip ``exact=False`` to switch those
    two columns to ``approx_percentile`` / ``approx_count_distinct``
    (one pass, mergeable partials, no sort).  Note the exact mode's cost
    shape: one countDistinct PER column compiles to an Expand-based
    multi-distinct plan (input amplified ~(columns+1)x before the
    shuffle) and exact percentile is a sort-based aggregate — both fine
    for the oracle gate, both replaced by single-pass mergeable partials
    under ``exact=False``, which is the setting to run at scale.
  * ``skew_keys`` — the analog of `spark/.../Analyzer.scala:68-113
    skewKeys`: per key column, the top-k most frequent stringified key
    values (NULL keys count under the literal 'NULL', as the reference's
    COALESCE does).  The reference runs a sampled Misra-Gries ItemsSketch
    with NO_FALSE_POSITIVES; this engine melts all key columns into one
    (column, value) stream with ``stack`` and counts exactly — one
    shuffle TOTAL for any number of key columns (the reference pays one
    treeAggregate pass; we pay one hash aggregate), then a per-column
    rank window over the already-tiny count table.  ``sample_fraction``
    reproduces the reference's sampled estimate mode (counts scaled by
    1/fraction) when an exact pass is too expensive.

Scale shape: both jobs are single-shuffle plans whose post-shuffle state
is bounded by (distinct keys) or (columns x partitions), never by row
count; percentile is the only sort-based aggregate and is gated behind
``exact``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chronon_spark.api import PARTITION_COLUMN, TIME_COLUMN

# reference StatsGenerator.ignoreColumns (StatsGenerator.scala:45)
IGNORE_COLUMNS = (TIME_COLUMN, PARTITION_COLUMN, "date_key", "date", "datestamp")

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)

DEFAULT_PERCENTILES = (0.05, 0.25, 0.5, 0.75, 0.95)


def _is_numeric(dt: T.DataType) -> bool:
    return isinstance(dt, _NUMERIC_TYPES)


def _pct_name(p: float) -> str:
    return "p" + f"{p:.2f}".replace("0.", "").ljust(2, "0")


def feature_stats(
    df: DataFrame,
    keys: Sequence[str] = (),
    partition_col: Optional[str] = None,
    percentiles: Sequence[float] = DEFAULT_PERCENTILES,
    exact: bool = True,
) -> DataFrame:
    """Per-column stats in long form, optionally as a per-partition series.

    Output schema: [partition_col?], column, total, null_count, null_rate,
    zero_count, min_value, max_value, avg_value, variance, unique_count,
    p_{pct...}.  Non-numeric columns carry NULL for the numeric-only
    metrics (min/max/avg/var/zero/percentiles), exactly as the
    reference's buildMetrics splits anyTransforms vs numericTransforms
    (StatsGenerator.scala:100-141).  ``variance`` is the population
    variance, matching Operation.VARIANCE.
    """
    skip = set(keys) | set(IGNORE_COLUMNS)
    if partition_col:
        skip.add(partition_col)
    fields = [f for f in df.schema.fields if f.name not in skip]
    if not fields:
        raise ValueError("feature_stats: no value columns left after exclusions")

    aggs = [F.count(F.lit(1)).alias("total")]
    for f in fields:
        c, q = f.name, F.col(f.name)
        aggs.append(F.sum(q.isNull().cast("long")).alias(f"{c}__null"))
        if exact:
            aggs.append(F.countDistinct(q).alias(f"{c}__uniq"))
        else:
            aggs.append(F.approx_count_distinct(q).alias(f"{c}__uniq"))
        if _is_numeric(f.dataType):
            d = q.cast("double")
            aggs.append(F.sum((d == 0).cast("long")).alias(f"{c}__zero"))
            aggs.append(F.min(d).alias(f"{c}__min"))
            aggs.append(F.max(d).alias(f"{c}__max"))
            aggs.append(F.avg(d).alias(f"{c}__avg"))
            aggs.append(F.var_pop(d).alias(f"{c}__var"))
            plist = ", ".join(repr(float(p)) for p in percentiles)
            fn = "percentile" if exact else "approx_percentile"
            aggs.append(
                F.expr(f"{fn}(CAST(`{c}` AS DOUBLE), array({plist}))").alias(f"{c}__pct")
            )

    grouped = df.groupBy(partition_col) if partition_col else df.groupBy()
    wide = grouped.agg(*aggs)

    # unpivot: one struct literal per analyzed column -> stack -> long rows
    def null_d():
        return F.lit(None).cast("double")

    stack_cols = []
    for f in fields:
        c = f.name
        num = _is_numeric(f.dataType)
        entry = [
            F.lit(c).alias("column"),
            F.col(f"{c}__null").alias("null_count"),
            (F.col(f"{c}__null") / F.col("total")).alias("null_rate"),
            F.col(f"{c}__uniq").alias("unique_count"),
            (F.col(f"{c}__zero") if num else F.lit(None).cast("long")).alias("zero_count"),
            (F.col(f"{c}__min") if num else null_d()).alias("min_value"),
            (F.col(f"{c}__max") if num else null_d()).alias("max_value"),
            (F.col(f"{c}__avg") if num else null_d()).alias("avg_value"),
            (F.col(f"{c}__var") if num else null_d()).alias("variance"),
        ]
        for i, p in enumerate(percentiles):
            entry.append(
                (F.col(f"{c}__pct")[i] if num else null_d()).alias(_pct_name(p))
            )
        stack_cols.append(F.struct(*entry))

    lead = [partition_col] if partition_col else []
    metric_names = [
        "null_count", "null_rate", "unique_count", "zero_count",
        "min_value", "max_value", "avg_value", "variance",
    ] + [_pct_name(p) for p in percentiles]
    exploded = wide.select(*lead, "total", F.explode(F.array(*stack_cols)).alias("__m"))
    return exploded.select(
        *lead,
        F.col("__m.column").alias("column"),
        F.col("total"),
        *[F.col(f"__m.{m}").alias(m) for m in metric_names],
    )


def skew_keys(
    df: DataFrame,
    key_cols: Sequence[str],
    k: int = 10,
    sample_fraction: Optional[float] = None,
    seed: int = 42,
) -> DataFrame:
    """Top-k most frequent values per key column: (col_name, key_value, cnt).

    Exact by default; ``sample_fraction`` switches to the reference's
    sampled-estimate mode (Analyzer.scala:90,112 — counts scaled by
    1/fraction).  Ties are broken deterministically by key_value ASC so
    the result is oracle-stable.  NULL keys are counted under the
    literal 'NULL' string, matching the reference's COALESCE(col,'NULL').
    """
    assert key_cols, "skew_keys: no key columns specified"
    missing = [c for c in key_cols if c not in df.columns]
    if missing:
        raise ValueError(f"skew_keys: columns not in frame: {missing}")
    src = df
    scale = 1.0
    if sample_fraction is not None and sample_fraction < 1.0:
        src = df.sample(fraction=sample_fraction, seed=seed)
        scale = 1.0 / sample_fraction

    pairs = []
    for c in key_cols:
        pairs.append(f"'{c}'")
        pairs.append(f"COALESCE(CAST(`{c}` AS STRING), 'NULL')")
    melted = src.select(
        F.expr(f"stack({len(key_cols)}, {', '.join(pairs)}) AS (col_name, key_value)")
    )
    counts = melted.groupBy("col_name", "key_value").agg(
        F.count(F.lit(1)).alias("__raw_cnt")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("col_name").orderBy(
        F.col("__raw_cnt").desc(), F.col("key_value").asc()
    )
    return (
        counts.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .select(
            "col_name",
            "key_value",
            (F.col("__raw_cnt") * F.lit(scale)).cast("long").alias("cnt"),
        )
    )
