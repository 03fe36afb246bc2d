"""Structured Streaming surface: the same GroupBy definitions served over
a stream (reference context: spark/.../streaming/GroupBy.scala — the
reference decodes Kafka and writes per-event IRs to a KV store; our batch
engine has no KV store, so the streaming surface materializes windowed
aggregates directly with watermarked event-time windows).

Design (idiomatic Structured Streaming):
  * source: any readStream DataFrame (kafka / rate / file); the GroupBy's
    Query DSL applies identically (selectExpr / where are stream-safe).
  * windowed aggregation: `F.window(ts, window)` tumbling/sliding windows +
    watermark for late-data bounds — Spark manages state eviction.
  * custom stateful ops (session windows with arbitrary gap logic) use
    applyInPandasWithState — the streaming analog of our batch sawtooth
    kernel (same per-key arrays, incremental state).

Only operations with mergeable IRs are allowed (same restriction as the
reference's streaming path): sum/count/avg/min/max — the monoid subset.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chronon_spark.api import Aggregation, GroupBy, Operation, TIME_COLUMN

_STREAM_FNS = {
    Operation.SUM: F.sum,
    Operation.COUNT: F.count,
    Operation.AVERAGE: F.avg,
    Operation.MIN: F.min,
    Operation.MAX: F.max,
}


def stream_groupby(
    stream_df: DataFrame,
    group_by: GroupBy,
    watermark: str = "10 minutes",
    slide: Optional[str] = None,
) -> DataFrame:
    """Windowed streaming aggregation of a GroupBy definition.

    stream_df: a streaming DataFrame already carrying the key columns and
    an event-time `ts` TIMESTAMP column (apply the Query DSL upstream with
    selectExpr — it is identical for streams). Every windowed
    AggregationPart becomes a watermarked sliding window aggregate; the
    result streams (key, window_start, window_end, features).
    """
    parts = group_by.aggregation_parts()
    if not parts:
        raise ValueError("streaming GroupBy requires aggregations")
    unsupported = [p for p in parts if p.operation not in _STREAM_FNS]
    if unsupported:
        raise NotImplementedError(
            f"streaming supports mergeable-IR ops only; got "
            f"{[p.operation.value for p in unsupported]}"
        )
    windows = {p.window for p in parts}
    if len(windows) != 1 or None in windows:
        raise NotImplementedError(
            "one bounded window per streaming GroupBy (start one query per window)"
        )
    w = next(iter(windows))
    dur = f"{w.millis // 1000} seconds"
    slide_dur = slide or dur

    df = stream_df.withWatermark(TIME_COLUMN, watermark)
    aggs = [
        _STREAM_FNS[p.operation](F.col(p.input_column)).alias(p.output_name)
        for p in parts
    ]
    out = df.groupBy(
        *group_by.key_columns, F.window(F.col(TIME_COLUMN), dur, slide_dur)
    ).agg(*aggs)
    return out.select(
        *group_by.key_columns,
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[p.output_name for p in parts],
    )


def stream_sessionize(
    stream_df: DataFrame,
    keys: list[str],
    gap_seconds: int,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming session windows via Spark's native session_window —
    gap-based sessions with watermarked state eviction (the streaming
    analog of operators/analytics.sessionize)."""
    df = stream_df.withWatermark(TIME_COLUMN, watermark)
    return (
        df.groupBy(*keys, F.session_window(F.col(TIME_COLUMN), f"{gap_seconds} seconds"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(TIME_COLUMN).alias("session_start"),
            F.max(TIME_COLUMN).alias("session_end"),
        )
        .select(
            *keys,
            F.col("session_window.start").alias("window_start"),
            F.col("session_window.end").alias("window_end"),
            "n_events", "session_start", "session_end",
        )
    )
