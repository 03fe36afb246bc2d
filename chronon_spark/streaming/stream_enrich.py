"""Streaming feature serving: enrich a live event stream with the latest
batch-computed feature rows from the warehouse — the Spark-native analog
of the reference's online serving path (Fetcher + KV store fed by daily
batch uploads; reference context: online/.../Fetcher.scala, spark
uploads in GroupByUpload.scala). We have no KV store, so serving is a
stream-static join re-resolved per micro-batch:

  * the static side is `warehouse.read(feature_table)` evaluated INSIDE
    foreachBatch — each micro-batch sees the warehouse's CURRENT snapshot
    log, so a nightly backfill commit is picked up by the very next batch
    (exactly the "daily batch upload refreshes the online store" contract;
    a plan-time static join would pin the file list forever).
  * each key serves its LATEST partition row (max ds <= the serving
    cutoff), i.e. end-of-yesterday snapshot accuracy — identical
    semantics to the batch snapshot join.
  * the stream side stays append-only: left join, no stream-side state,
    checkpoint/resume handled by Structured Streaming.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def latest_feature_rows(
    features: DataFrame,
    keys: Sequence[str],
    ds_col: str = "ds",
    max_ds: Optional[str] = None,
) -> DataFrame:
    """One row per key: the newest partition <= max_ds (serving cutoff).
    Shape note: feature tables are |keys| x |days|; the row_number prune
    runs on the micro-batch executor side and is one shuffle of the
    feature table — at scale, point `features` at a pre-pruned recent
    window (e.g. warehouse.read(table, last_n_days) — partition pruning
    makes this a small scan)."""
    if max_ds is not None:
        features = features.where(F.col(ds_col) <= max_ds)
    rn = F.row_number().over(
        W.partitionBy(*keys).orderBy(F.col(ds_col).desc())
    )
    return (
        features.withColumn("_rn", rn).where(F.col("_rn") == 1).drop("_rn")
    )


def enrich_stream(
    stream_df: DataFrame,
    warehouse,
    feature_table: str,
    keys: Sequence[str],
    output_dir: str,
    checkpoint_dir: str,
    ds_col: str = "ds",
    feature_prefix: str = "",
):
    """foreachBatch serving join. Returns the DataStreamWriter (call
    .trigger(availableNow=True).start() or .start() on it).

    Every micro-batch: re-read the feature table through the snapshot log
    (picking up any backfill commit since the last batch), collapse to
    latest-row-per-key, left-join onto the batch's events, append to
    `output_dir`. The feature columns may be prefixed to avoid collisions.
    """
    feat_cols: Optional[list[str]] = None

    def _serve(batch_df: DataFrame, epoch_id: int) -> None:
        nonlocal feat_cols
        feats = latest_feature_rows(
            warehouse.read(feature_table), keys, ds_col=ds_col
        ).drop(ds_col)
        if feature_prefix:
            for c in feats.columns:
                if c not in keys:
                    feats = feats.withColumnRenamed(c, feature_prefix + c)
        out = batch_df.join(feats, list(keys), "left")
        out.write.mode("append").parquet(output_dir)

    return (
        stream_df.writeStream.foreachBatch(_serve)
        .option("checkpointLocation", checkpoint_dir)
    )


# ---------------------------------------------------------------------------
# Sawtooth serving: batch IR (end of yesterday) + streaming day tail
# ---------------------------------------------------------------------------
_MERGEABLE = {"count", "sum", "min", "max"}


def stream_sawtooth_serve(
    stream_df: DataFrame,
    warehouse,
    batch_table: str,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    output_dir: str,
    checkpoint_dir: str,
    ds_col: str = "ds",
):
    """The reference's online sawtooth split (GroupByUpload batch IRs +
    streaming per-event tail, merged by the Fetcher at request time),
    re-expressed in Structured Streaming:

      * batch side: `batch_table` holds one IR row per key as of END OF
        YESTERDAY (any groupby_backfill output — latest ds row is used).
      * tail side: a native streaming aggregation over today's events
        keeps per-key running partials in Spark state (update-on-change,
        watermark-free lifetime-of-day state — the tail resets when the
        nightly batch job advances and the stream restarts on the new day,
        exactly the reference's daily IR handoff).
      * merge: every micro-batch full-outer-joins the UPDATED tail
        partials with the batch IRs and rewrites the serving table —
        count/sum add, min/max fold, so served = exact aggregate over
        (history + today-so-far), the sawtooth head included.

    aggs: (out_name, op, stream_value_col) with op in {count,sum,min,max};
    `batch_table` must carry a column named `out_name` per agg (the batch
    IR). Returns the DataStreamWriter."""
    for _, op, _ in aggs:
        if op not in _MERGEABLE:
            raise ValueError(f"op {op} is not mergeable for streaming tails")

    tail_exprs = []
    for name, op, col in aggs:
        fn = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}[op]
        tail_exprs.append(fn(F.col(col)).alias(f"_tail_{name}"))
    tail = stream_df.groupBy(*keys).agg(*tail_exprs)

    def _merge(batch_df: DataFrame, epoch_id: int) -> None:
        feats = latest_feature_rows(
            warehouse.read(batch_table), keys, ds_col=ds_col
        ).drop(ds_col)
        merged = feats.join(batch_df, list(keys), "full_outer")
        for name, op, _ in aggs:
            b, t = F.col(name), F.col(f"_tail_{name}")
            if op in ("count", "sum"):
                val = F.coalesce(b, F.lit(0)) + F.coalesce(t, F.lit(0))
            elif op == "min":
                val = F.least(F.coalesce(b, t), F.coalesce(t, b))
            else:
                val = F.greatest(F.coalesce(b, t), F.coalesce(t, b))
            merged = merged.withColumn(name, val)
        merged.select(*keys, *[n for n, _, _ in aggs]).write.mode(
            "overwrite"
        ).parquet(output_dir)

    return (
        tail.writeStream.outputMode("complete")
        .foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
    )
