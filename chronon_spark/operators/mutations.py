"""Temporal-entity features: mutation replay over end-of-day snapshots —
the (EVENTS, ENTITIES, TEMPORAL) topology.

Semantics (reference: spark/.../GroupBy.scala:180-281 `temporalEntities`,
aggregator/.../windowing/SawtoothMutationAggregator.scala:44-160):

  For a left query row (keys, T) on day D:
    state = entity rows of snapshot partition D-1 ("end of yesterday")
          + day-D mutations with mutation_ts < T
            (is_before = false -> insert/after-image, sign +1;
             is_before = true  -> delete/before-image,  sign -1)
    feature = aggregate over state rows whose entity timestamp satisfies
      ts >= round(T - window, hop) AND ts < T     (windowed)
      no ts constraint                            (unbounded)
    i.e. the sawtooth tail (round DOWN to the hop boundary,
    Resolution.scala:38-48) with an EXCLUSIVE head — entity semantics
    differ from events here: `updateIr` tests `row.ts < queryTs`
    (SawtoothMutationAggregator.scala:124-127) while the events kernel is
    head-inclusive.

Where the reference walks per-row mutable IRs with invertible aggregators
(`windowedAggregator(i).delete`), this engine replays the signed multiset
inside an Arrow cogroup kernel — which also makes NON-invertible ops
(min/max/first/last/k-ops/histogram/percentile) exact under deletion,
something per-IR delete cannot do.

Physical plan / scale: the cogroup key is pmod(xxhash64(keys..., query
day), buckets) — the day is part of the hash, so one entity's history
never concentrates in one task: a group holds exactly (snapshot rows of
day D-1) + (mutations of day D) + (queries of day D) per key — state is
bounded by one day regardless of backfill length, and hot keys spread
across days. The snapshot scan prunes to partitions [Dmin-1, Dmax-1] and
the mutation scan to [Dmin, Dmax] (pushed-down ds predicates).
"""

from __future__ import annotations

from collections import Counter
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronon_spark.api import (
    MUTATION_TIME_COLUMN,
    PARTITION_COLUMN,
    REVERSAL_COLUMN,
    TIME_COLUMN,
    AggregationPart,
    EntitySource,
    GroupBy,
    JoinPart,
    Operation,
    sawtooth_hop_millis,
)
from chronon_spark.operators.sawtooth import _naive_one
from chronon_spark.operators.temporal_join import (
    _emit,
    _empty_feature,
    _np_col,
    _segment_codes,
    output_sql_type,
)
from chronon_spark.partitions import DEFAULT_SPEC, PartitionRange, PartitionSpec

DAY_MS = 86_400_000
_QDAY = "__qday"


def replay_aggregate(
    event_ts: np.ndarray,
    event_vals: dict[str, np.ndarray],
    mut_ts: np.ndarray,
    signs: np.ndarray,
    query_ts: np.ndarray,
    parts: list[AggregationPart],
) -> dict[str, np.ndarray]:
    """Per-(key, day) signed-multiset replay.

    event_ts: entity-row timestamps (long). mut_ts: NaN for snapshot rows
    (visible from the start of the day), else the mutation time. signs:
    +1 insert / -1 delete. Rows need NOT be sorted. Returns
    output_name -> object array aligned with query_ts.
    """
    nq = len(query_ts)
    out: dict[str, np.ndarray] = {
        p.output_name: np.full(nq, None, dtype=object) for p in parts
    }
    if len(event_ts) == 0:
        for p in parts:
            out[p.output_name][:] = [_replay_empty(p)] * nq
        return out
    ets = event_ts.astype(np.int64, copy=False)
    mts = mut_ts.astype(np.float64, copy=False)
    is_snap = np.isnan(mts)
    # stable order for FIRST/LAST ties: (ts, snapshot-first, mutation_ts)
    order = np.lexsort((np.where(is_snap, -np.inf, mts), ~is_snap, ets))
    for i in range(nq):
        T = int(query_ts[i])
        visible = is_snap | (mts < T)
        for part in parts:
            w = part.window
            if w is None:
                wmask = visible
            else:
                hop = sawtooth_hop_millis(w)
                tail = ((T - w.millis) // hop) * hop
                wmask = visible & (ets >= tail) & (ets < T)
            sel_idx = order[wmask[order]]
            vals = event_vals[part.input_column]
            if part.bucket is not None:
                bvals = event_vals[part.bucket]
                out[part.output_name][i] = _replay_bucketed(
                    part, sel_idx, ets, vals, bvals, signs
                )
            else:
                out[part.output_name][i] = _replay_one(part, sel_idx, ets, vals, signs)
    return out


def _replay_empty(part: AggregationPart):
    if part.bucket is not None:
        return {}
    op = part.operation
    if op in (Operation.COUNT, Operation.UNIQUE_COUNT, Operation.APPROX_UNIQUE_COUNT):
        return 0
    if op in (Operation.FIRST_K, Operation.LAST_K, Operation.TOP_K,
              Operation.BOTTOM_K, Operation.UNIQUE_TOP_K):
        return []
    if op in (Operation.HISTOGRAM, Operation.APPROX_FREQUENT_K,
              Operation.APPROX_HEAVY_HITTERS_K):
        return {}
    return None


def _expand_multiset(
    sel_idx: np.ndarray, ets: np.ndarray, vals: np.ndarray, signs: np.ndarray
) -> list:
    """Net multiset keyed by (entity ts, value): a before-image cancels ONE
    instance of the identical row (reference deletes by row identity).
    Returns the surviving values in time order."""
    net: Counter = Counter()
    keyed: list = []
    for j in sel_idx:
        v = vals[j]
        if v is None or (isinstance(v, float) and v != v):
            continue
        k = (int(ets[j]), _mkey(v))
        keyed.append((k, v, int(signs[j])))
        net[k] += int(signs[j])
    remaining = dict(net)
    survivors = []
    # walk time-ordered; emit each row while its net count lasts
    emitted: Counter = Counter()
    for k, v, sgn in keyed:
        if sgn < 0:
            continue
        if emitted[k] < remaining.get(k, 0):
            survivors.append(v)
            emitted[k] += 1
    return survivors


def _mkey(v):
    return v if not isinstance(v, float) else round(v, 12)


def _replay_one(part: AggregationPart, sel_idx, ets, vals, signs):
    op = part.operation
    # invertible fast path: signed accumulation, no multiset expansion
    if op in (Operation.SUM, Operation.COUNT, Operation.AVERAGE,
              Operation.VARIANCE, Operation.SKEW, Operation.KURTOSIS):
        s = signs[sel_idx].astype(np.float64)
        v = np.array(
            [np.nan if vals[j] is None or (isinstance(vals[j], float) and vals[j] != vals[j])
             else float(vals[j]) for j in sel_idx],
            dtype=np.float64,
        )
        nn = ~np.isnan(v)
        n = float(np.sum(s[nn]))
        if op == Operation.COUNT:
            return int(round(n))
        if n <= 0:
            return None
        sv = v[nn] * s[nn]
        s1 = float(np.sum(sv))
        if op == Operation.SUM:
            return s1
        if op == Operation.AVERAGE:
            return s1 / n
        s2 = float(np.sum(sv * v[nn]))
        mu = s1 / n
        m2 = s2 / n - mu * mu
        if op == Operation.VARIANCE:
            return max(m2, 0.0) if n >= 1 else None
        s3 = float(np.sum(sv * v[nn] ** 2))
        if op == Operation.SKEW:
            if n < 3 or m2 <= 0:
                return None
            m3 = s3 / n - 3 * mu * (s2 / n) + 2 * mu**3
            return m3 / m2**1.5
        s4 = float(np.sum(sv * v[nn] ** 3))
        if n < 4 or m2 <= 0:
            return None
        m4 = s4 / n - 4 * mu * (s3 / n) + 6 * mu * mu * (s2 / n) - 3 * mu**4
        return m4 / (m2 * m2) - 3.0
    # everything else: exact net-multiset replay
    survivors = _expand_multiset(sel_idx, ets, vals, signs)
    return _naive_one(part, survivors)


def _replay_bucketed(part: AggregationPart, sel_idx, ets, vals, bvals, signs):
    sub = AggregationPart(part.input_column, part.operation, dict(part.arg_map),
                          part.window)
    per_b: dict[str, list] = {}
    for j in sel_idx:
        b = bvals[j]
        if b is None:
            continue
        per_b.setdefault(str(b), []).append(j)
    out = {}
    for b, idxs in sorted(per_b.items()):
        v = _replay_one(sub, np.array(idxs, dtype=np.int64), ets, vals, signs)
        if v is None or (isinstance(v, float) and v != v):
            continue
        if part.operation in (Operation.COUNT, Operation.UNIQUE_COUNT) and int(v) == 0:
            continue
        if isinstance(v, list) and not v:
            continue
        out[b] = v
    return out


def temporal_entity_features(
    left_df: DataFrame,
    snapshot_df: DataFrame,
    mutation_df: DataFrame,
    left_keys: list[str],
    right_keys: list[str],
    parts: list[AggregationPart],
    prefix: str = "",
    time_col: str = TIME_COLUMN,
    buckets: Optional[int] = None,
) -> DataFrame:
    """Enrich left rows with mutation-replayed point-in-time features.

    snapshot_df: keys + ts + value cols + ds (partition d = state at end
    of day d). mutation_df: keys + ts + value cols + mutation_ts +
    is_before. All left columns pass through.
    """
    spark = left_df.sparkSession
    if buckets is None:
        buckets = int(
            spark.conf.get(
                "spark.chronon.join.buckets",
                str(8 * int(spark.conf.get("spark.sql.shuffle.partitions", "32"))),
            )
        )
    right_types = dict(snapshot_df.dtypes)
    input_cols = sorted(
        {p.input_column for p in parts} | {p.bucket for p in parts if p.bucket}
    )
    feature_fields = [
        (f"{prefix}{p.output_name}", output_sql_type(p, right_types[p.input_column]))
        for p in parts
    ]

    # snapshot partition d serves queries of day d+1
    snap = snapshot_df.select(
        *right_keys,
        F.col(TIME_COLUMN).alias(TIME_COLUMN),
        *input_cols,
        (F.unix_date(F.to_date(F.col(PARTITION_COLUMN))).cast("long") + 1).alias(_QDAY),
        F.lit(None).cast("double").alias("__mut_ts"),
        F.lit(1).cast("int").alias("__sign"),
    )
    mut = mutation_df.select(
        *right_keys,
        F.col(TIME_COLUMN).alias(TIME_COLUMN),
        *input_cols,
        F.expr(f"{MUTATION_TIME_COLUMN} DIV {DAY_MS}").alias(_QDAY),
        F.col(MUTATION_TIME_COLUMN).cast("double").alias("__mut_ts"),
        F.when(F.col(REVERSAL_COLUMN).cast("boolean"), F.lit(-1))
        .otherwise(F.lit(1)).alias("__sign"),
    )
    right = snap.unionByName(mut)

    left_q = left_df.withColumn(_QDAY, F.expr(f"{time_col} DIV {DAY_MS}"))
    left_cols = [f.name for f in left_df.schema.fields]
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in left_df.schema.fields]
        + [f"`{n}` {t}" for n, t in feature_fields]
    )
    lkey_exprs = [
        F.col(lk).cast(right_types[rk]) for lk, rk in zip(left_keys, right_keys)
    ]
    l_bucket = F.pmod(F.xxhash64(*lkey_exprs, F.col(_QDAY)), F.lit(buckets))
    r_bucket = F.pmod(
        F.xxhash64(*[F.col(k) for k in right_keys], F.col(_QDAY)), F.lit(buckets)
    )
    seg_l = list(left_keys) + [_QDAY]
    seg_r = list(right_keys) + [_QDAY]
    seg_types = [right_types[rk] for rk in right_keys] + ["bigint"]

    def kernel(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if len(lpdf) == 0:
            return pd.DataFrame(columns=left_cols + [n for n, _ in feature_fields])
        nq = len(lpdf)
        out = lpdf[left_cols].copy().reset_index(drop=True)
        if len(rpdf) == 0:
            for (name, sql_type), part in zip(feature_fields, parts):
                out[name] = _empty_feature(part, sql_type, nq)
            return out
        lcode, rcode = _segment_codes(lpdf, rpdf, seg_l, seg_r, seg_types)
        lts = lpdf[time_col].to_numpy().astype(np.int64)
        rts = rpdf[TIME_COLUMN].to_numpy().astype(np.int64)
        lorder = np.argsort(lcode, kind="stable")
        rorder = np.argsort(rcode, kind="stable")
        lcode_s, lts_s = lcode[lorder], lts[lorder]
        rcode_s = rcode[rorder]
        mut_ts = rpdf["__mut_ts"].to_numpy(dtype=np.float64)[rorder]
        signs = rpdf["__sign"].to_numpy(dtype=np.int64)[rorder]
        rts_s = rts[rorder]
        evals = {c: _np_col(rpdf, c, right_types[c])[rorder] for c in input_cols}
        outs = {
            name: np.full(nq, None, dtype=object) for name, _ in feature_fields
        }
        bounds = np.flatnonzero(np.diff(lcode_s, prepend=lcode_s[0] - 1))
        bounds = np.append(bounds, nq)
        for seg in range(len(bounds) - 1):
            s, e = bounds[seg], bounds[seg + 1]
            code = lcode_s[s]
            r0 = np.searchsorted(rcode_s, code, side="left")
            r1 = np.searchsorted(rcode_s, code, side="right")
            feats = replay_aggregate(
                rts_s[r0:r1],
                {c: v[r0:r1] for c, v in evals.items()},
                mut_ts[r0:r1],
                signs[r0:r1],
                lts_s[s:e],
                parts,
            )
            pos = lorder[s:e]
            for (name, _), part in zip(feature_fields, parts):
                outs[name][pos] = feats[part.output_name]
        for (name, sql_type), part in zip(feature_fields, parts):
            out[name] = _emit(outs[name], sql_type)
        return out

    grouped = left_q.groupBy(l_bucket.alias("__bucket")).cogroup(
        right.groupBy(r_bucket.alias("__bucket"))
    )
    return grouped.applyInPandas(kernel, schema=out_schema)


def _mutation_scan(
    spark: SparkSession,
    source: EntitySource,
    rng: Optional[PartitionRange],
    spec: PartitionSpec,
) -> DataFrame:
    """Scan the mutation table with the source's Query DSL, preserving
    mutation_ts / is_before (reference: mutationDfFn, same selects as the
    snapshot plus the mutation metadata columns)."""
    from dataclasses import replace

    from chronon_spark.sources.scan import scan_df

    from chronon_spark.sources.scan import _load_table

    q = source.query
    if q.selects is not None:
        selects = dict(q.selects)
        selects.setdefault(MUTATION_TIME_COLUMN, MUTATION_TIME_COLUMN)
        selects.setdefault(REVERSAL_COLUMN, REVERSAL_COLUMN)
        q = replace(q, selects=selects)
    # Mutation tables partition by MUTATION day, not row-event day: prune
    # on ds only when the table physically has it; otherwise scan unpruned
    # and range-filter on mutation_ts (a pushed-down long predicate) — the
    # row ts of a before-image may be arbitrarily old and must survive.
    part_col = q.partition_column or spec.column
    has_ds = part_col in _load_table(spark, source.mutation_table).columns
    df = scan_df(spark, source.mutation_table, q, rng if has_ds else None, spec)
    if rng is not None and not has_ds:
        if rng.start is not None:
            df = df.where(F.col(MUTATION_TIME_COLUMN) >= spec.epoch_millis(rng.start))
        if rng.end is not None:
            df = df.where(
                F.col(MUTATION_TIME_COLUMN) < spec.epoch_millis(spec.after(rng.end))
            )
    return df


def compute_temporal_entity_join_part(
    spark: SparkSession,
    left_df: DataFrame,
    join_part: JoinPart,
    rng: Optional[PartitionRange] = None,
    spec: PartitionSpec = DEFAULT_SPEC,
) -> DataFrame:
    """One (EVENTS, ENTITIES, TEMPORAL) join part.

    Snapshot scan prunes to [left_min - 1, left_max - 1] (each query day D
    reads partition D-1); mutation scan prunes to [left_min, left_max]."""
    from chronon_spark.operators.snapshot_join import _left_date_range
    from chronon_spark.sources.scan import scan_source

    gb = join_part.group_by
    srcs = [s for s in gb.sources if isinstance(s, EntitySource) and s.mutation_table]
    assert len(srcs) == 1, "temporal-entity GroupBy needs one EntitySource with a mutation_table"
    src = srcs[0]
    left_rng = rng if rng is not None and rng.start else _left_date_range(left_df, spec)
    snap_rng = PartitionRange(spec.before(left_rng.start), spec.before(left_rng.end), spec)
    snap = scan_source(spark, src, snap_rng, spec)
    mut = _mutation_scan(spark, src, left_rng, spec)

    key_map = join_part.right_to_left_keys()
    left_keys = [key_map[k] for k in gb.key_columns]
    prefix = join_part.full_prefix() + "_"
    return temporal_entity_features(
        left_df, snap, mut, left_keys, gb.key_columns,
        gb.aggregation_parts(), prefix,
    )


def naive_entity_replay(
    snapshot_rows: list[dict],
    mutation_rows: list[dict],
    query: tuple,
    part: AggregationPart,
    value_col: str,
) -> object:
    """Brute-force oracle for tests (analog of the reference's
    MutationsTest expected-value computation): recompute one query from
    the raw snapshot + mutation rows with exact window predicates."""
    T, qday = query
    day0 = qday * DAY_MS
    rows = []  # (ts, value, sign, order)
    for r in snapshot_rows:
        if r[PARTITION_COLUMN] == DEFAULT_SPEC.of_epoch_millis(day0 - DAY_MS):
            rows.append((r[TIME_COLUMN], r[value_col], 1))
    for m in mutation_rows:
        if day0 <= m[MUTATION_TIME_COLUMN] < day0 + DAY_MS and m[MUTATION_TIME_COLUMN] < T:
            rows.append((m[TIME_COLUMN], m[value_col], -1 if m[REVERSAL_COLUMN] else 1))
    w = part.window
    if w is not None:
        hop = sawtooth_hop_millis(w)
        tail = ((T - w.millis) // hop) * hop
        rows = [r for r in rows if tail <= r[0] < T]
    net: Counter = Counter()
    rep: dict = {}
    for ts, v, sgn in rows:
        if v is not None:
            k = (ts, _mkey(v))
            net[k] += sgn
            rep.setdefault(k, v)
    survivors = [
        rep[(ts, mk)] for ts, mk in sorted(
            (k for k, n in net.items() for _ in range(max(n, 0))),
        )
    ]
    return _naive_one(part, survivors)
