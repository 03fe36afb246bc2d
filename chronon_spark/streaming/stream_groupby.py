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

import numpy as np
import pandas as pd
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


def stream_stateful_groupby(
    stream_df: DataFrame,
    group_by: GroupBy,
    timeout_minutes: Optional[int] = None,
) -> DataFrame:
    """Custom stateful streaming GroupBy via applyInPandasWithState —
    LIFETIME (unbounded-window) running features per key, including ops
    the native streaming aggregates CANNOT express (LAST_K's ordered
    recent-values list, FIRST/LAST by event time).

    Per micro-batch, each key folds its new events into a compact
    per-part IR held in Spark-managed state (count/sum for AVG, running
    min/max, (ts, value) top-k arrays for LAST_K — constant-size state
    per key, the same IR shapes as the batch engine's agg_registry) and
    emits one updated feature row. Cross-batch event-time ordering is
    handled by keeping ts alongside values in state, so late events in a
    later micro-batch land in the right LAST_K position.

    Supported ops: COUNT, SUM, AVERAGE, MIN, MAX, FIRST, LAST, LAST_K —
    aggregations must be unbounded (window None). `timeout_minutes`
    evicts idle keys via processing-time timeout (unbounded state
    otherwise — the reference's streaming path has the KV store TTL for
    this).

    reference context: spark/.../streaming/GroupBy.scala maintains
    per-event IRs for a KV store; this materializes the same IR fold as
    a streaming DataFrame instead.
    """
    import pyspark.sql.types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    parts = group_by.aggregation_parts()
    if not parts:
        raise ValueError("streaming GroupBy requires aggregations")
    supported = {
        Operation.COUNT, Operation.SUM, Operation.AVERAGE, Operation.MIN,
        Operation.MAX, Operation.FIRST, Operation.LAST, Operation.LAST_K,
    }
    bad = [p for p in parts if p.operation not in supported or p.window is not None]
    if bad:
        raise NotImplementedError(
            "stream_stateful_groupby supports unbounded COUNT/SUM/AVERAGE/"
            f"MIN/MAX/FIRST/LAST/LAST_K; got {[p.output_name for p in bad]}"
        )

    keys = group_by.key_columns
    key_fields = [f for f in stream_df.schema.fields if f.name in keys]

    # state per part: (count, sum, min, max, first_ts, first_v, ts_list, v_list)
    state_fields, out_fields = [], list(key_fields)
    for p in parts:
        n = p.output_name
        state_fields += [
            T.StructField(f"{n}__cnt", T.LongType()),
            T.StructField(f"{n}__sum", T.DoubleType()),
            T.StructField(f"{n}__min", T.DoubleType()),
            T.StructField(f"{n}__max", T.DoubleType()),
            T.StructField(f"{n}__fts", T.LongType()),
            T.StructField(f"{n}__fv", T.DoubleType()),
            T.StructField(f"{n}__kts", T.ArrayType(T.LongType())),
            T.StructField(f"{n}__kv", T.ArrayType(T.DoubleType())),
        ]
        if p.operation == Operation.COUNT:
            out_fields.append(T.StructField(n, T.LongType()))
        elif p.operation == Operation.LAST_K:
            out_fields.append(T.StructField(n, T.ArrayType(T.DoubleType())))
        else:
            out_fields.append(T.StructField(n, T.DoubleType()))
    state_schema = T.StructType(state_fields)
    out_schema = T.StructType(out_fields)
    part_specs = [
        (p.output_name, p.input_column, p.operation,
         int(p.arg_map.get("k", 10)) if p.operation == Operation.LAST_K else 0)
        for p in parts
    ]
    n_state_per_part = 8

    def fold(key, pdfs, state: GroupState):
        if timeout_minutes is not None and state.hasTimedOut:
            state.remove()
            return
        st = list(state.get) if state.exists else [
            v for _ in part_specs for v in (0, 0.0, None, None, None, None, [], [])
        ]
        for pdf in pdfs:
            ts = pdf[TIME_COLUMN].astype("int64").to_numpy() // 1_000_000 \
                if str(pdf[TIME_COLUMN].dtype).startswith("datetime") \
                else pdf[TIME_COLUMN].to_numpy()
            for i, (name, col, op, k) in enumerate(part_specs):
                b = i * n_state_per_part
                vals = pdf[col].to_numpy(dtype="float64")
                ok = ~np.isnan(vals)
                v, t = vals[ok], ts[ok]
                if len(v) == 0:
                    continue
                st[b + 0] = int(st[b + 0]) + len(v)
                st[b + 1] = float(st[b + 1]) + float(v.sum())
                mn, mx = float(v.min()), float(v.max())
                st[b + 2] = mn if st[b + 2] is None else min(st[b + 2], mn)
                st[b + 3] = mx if st[b + 3] is None else max(st[b + 3], mx)
                j0 = int(np.argmin(t))
                if st[b + 4] is None or int(t[j0]) < st[b + 4]:
                    st[b + 4], st[b + 5] = int(t[j0]), float(v[j0])
                kk = max(k, 1)
                all_ts = np.concatenate([np.asarray(st[b + 6], dtype="int64"), t])
                all_v = np.concatenate([np.asarray(st[b + 7], dtype="float64"), v])
                order = np.argsort(-all_ts, kind="stable")[:kk]
                st[b + 6] = [int(x) for x in all_ts[order]]
                st[b + 7] = [float(x) for x in all_v[order]]
        state.update(tuple(st))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        row = dict(zip(keys, key))
        for i, (name, col, op, k) in enumerate(part_specs):
            b = i * n_state_per_part
            if op == Operation.COUNT:
                row[name] = int(st[b + 0])
            elif op == Operation.SUM:
                row[name] = float(st[b + 1])
            elif op == Operation.AVERAGE:
                row[name] = float(st[b + 1]) / st[b + 0] if st[b + 0] else None
            elif op == Operation.MIN:
                row[name] = st[b + 2]
            elif op == Operation.MAX:
                row[name] = st[b + 3]
            elif op == Operation.FIRST:
                row[name] = st[b + 5]
            elif op == Operation.LAST:
                row[name] = st[b + 7][0] if st[b + 7] else None
            elif op == Operation.LAST_K:
                row[name] = list(st[b + 7])
        yield pd.DataFrame([row])

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return stream_df.groupBy(*keys).applyInPandasWithState(
        fold, out_schema, state_schema, "update", timeout
    )
