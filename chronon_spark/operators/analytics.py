"""Row-sequence analytics over keyed event streams: lag/lead and gap-based
sessionization.

These are north_rule extensions beyond the reference's operator surface
(the reference has no sessionization — SURVEY.md §2.3); both are pure
Catalyst window functions: one shuffle on the key, everything else
whole-stage-codegen. At 100TB the shuffle is the same (key, ts) hash
partitioning every other operator in this engine uses, so stages reuse
the exchange.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from chronon_spark.api import TIME_COLUMN


def with_lag_lead(
    df: DataFrame,
    keys: Sequence[str],
    value_columns: Sequence[str],
    offsets: Sequence[int] = (1,),
    time_col: str = TIME_COLUMN,
) -> DataFrame:
    """Add {col}_lag_{n} / {col}_lead_{n} columns per key ordered by time.

    Deterministic ordering: ties on `time_col` are broken by the remaining
    columns is NOT done — callers needing total order should pass a unique
    time column or pre-dedupe. One shuffle on `keys`.
    """
    w = W.partitionBy(*keys).orderBy(time_col)
    for c in value_columns:
        for n in offsets:
            df = df.withColumn(f"{c}_lag_{n}", F.lag(c, n).over(w))
            df = df.withColumn(f"{c}_lead_{n}", F.lead(c, n).over(w))
    return df


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    gap_millis: int,
    time_col: str = TIME_COLUMN,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids per key: a new session starts when the
    time since the previous event strictly exceeds ``gap_millis``.

    session_id is 0-based per key, computed as a cumulative sum of
    new-session flags over a (key, ts) window — one shuffle, no UDFs.
    """
    w = W.partitionBy(*keys).orderBy(time_col)
    prev = F.lag(time_col).over(w)
    new_session = F.when(
        prev.isNull() | ((F.col(time_col) - prev) > F.lit(gap_millis)), F.lit(1)
    ).otherwise(F.lit(0))
    df = df.withColumn("__new_session", new_session)
    df = df.withColumn(
        session_col,
        F.sum("__new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        - F.lit(1),
    )
    return df.drop("__new_session")


def session_stats(
    df: DataFrame,
    keys: Sequence[str],
    gap_millis: int,
    time_col: str = TIME_COLUMN,
    agg_columns: Optional[dict[str, str]] = None,
) -> DataFrame:
    """Sessionize then aggregate one row per session: event count, start/end
    ts, duration, plus optional extra aggregates (name -> SQL agg expr)."""
    s = sessionize(df, keys, gap_millis, time_col)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(time_col).alias("session_start_ts"),
        F.max(time_col).alias("session_end_ts"),
        (F.max(time_col) - F.min(time_col)).alias("session_duration_ms"),
    ]
    for name, expr in (agg_columns or {}).items():
        aggs.append(F.expr(expr).alias(name))
    return s.groupBy(*keys, "session_id").agg(*aggs)
