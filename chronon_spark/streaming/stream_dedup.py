"""Streaming exact dedup — the continuous-ingestion stage of the corpus
pipeline: as documents arrive, keep only the first occurrence of each
fingerprint, with a running duplicate count. The batch engine's
operators/dedup.py answers "dedup this corpus"; this answers "keep the
corpus deduped as it grows" without re-scanning what was already
ingested — per-fingerprint state lives in Spark's state store, sized by
DISTINCT fingerprints, not rows seen.

Determinism contract (what makes this oracle-checkable): the survivor of
a fingerprint is the (ts, id)-minimum over ALL rows ever seen, not the
arrival-order first. State keeps the running minimum; a micro-batch that
changes a fingerprint's state (new fingerprint, better minimum, or more
duplicates counted) emits the updated row, so the LAST emission per
fingerprint — the one with the highest n_seen — always carries the
global minimum, independent of how the stream was batched. Replaying the
same files at any maxFilesPerTrigger yields the same final state.

reference context: the reference's streaming path (Flink/Kafka ->
per-event IRs in a KV store) has no dedup surface; this applies its
IR-in-state discipline (spark/.../streaming/GroupBy.scala) to the
training-data problem the brief adds.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame


def stream_dedup(
    stream_df: DataFrame,
    fp_col: str,
    id_col: str,
    ts_col: str = "ts",
    timeout_minutes: Optional[int] = None,
) -> DataFrame:
    """First-seen filter per fingerprint over a stream.

    Input: a streaming DataFrame with (fp_col: long, id_col: long,
    ts_col: long). NULL fingerprints are dropped (the engine-wide
    null-key convention). Output (update mode): one row per fingerprint
    per micro-batch that changed it — (fp, first_id, first_ts, n_seen),
    where (first_ts, first_id) is the running (ts, id)-lexicographic
    minimum and n_seen the total rows observed. `timeout_minutes` evicts
    idle fingerprints via processing-time timeout (bounded state for
    time-partitioned corpora; unbounded otherwise, the same trade the
    reference delegates to KV-store TTLs).

    Scale shape: state is O(distinct fingerprints) x 24 bytes; each
    micro-batch shuffles once on the fingerprint (the same key the batch
    dedup shuffles on), and the per-group fold is a numpy argmin over
    the batch's rows — no sort, no python loop per row.
    """
    import numpy as np
    import pyspark.sql.types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("fp", T.LongType()),
        T.StructField("first_id", T.LongType()),
        T.StructField("first_ts", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("ts", T.LongType()),
        T.StructField("id", T.LongType()),
        T.StructField("n", T.LongType()),
    ])

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if timeout_minutes is not None and state.hasTimedOut:
            state.remove()
            return
        best_ts, best_id, n = state.get if state.exists else (None, None, 0)
        new_rows = 0
        for pdf in pdfs:
            ts = pdf[ts_col].to_numpy(dtype="int64")
            ids = pdf[id_col].to_numpy(dtype="int64")
            if len(ts) == 0:
                continue
            new_rows += len(ts)
            # batch minimum under (ts, id) lexicographic order
            j_cands = np.flatnonzero(ts == ts.min())
            j = j_cands[np.argmin(ids[j_cands])]
            if best_ts is None or (int(ts[j]), int(ids[j])) < (best_ts, best_id):
                best_ts, best_id = int(ts[j]), int(ids[j])
        if new_rows == 0:
            return
        n = int(n) + new_rows
        state.update((best_ts, best_id, n))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            [{"fp": int(key[0]), "first_id": best_id,
              "first_ts": best_ts, "n_seen": n}]
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    clean = stream_df.where(f"{fp_col} IS NOT NULL")
    return clean.groupBy(fp_col).applyInPandasWithState(
        fold, out_schema, state_schema, "update", timeout
    )
