"""Distribution-drift metrics between two slices of a feature table.

Reference parity: `online/.../stats/DriftMetrics.scala` +
`AssignIntervals.scala` (the distance math, ported exactly — PSI /
Jensen-Shannon / Hellinger over percentile profiles and categorical
histograms, including the reference's conventions: zero-bin epsilon 1e-5
for PSI, fractional interval assignment for percentile projections, and
the LOW / MODERATE / SEVERE thresholds) and `spark/.../stats/drift/
Summarizer.scala` (the summary side: per-slice percentile arrays for
numeric columns and value histograms for categoricals, computed as
native Spark aggregates).

Split of labor mirrors the reference: Spark reduces each slice to a
per-column SUMMARY TILE (O(columns x percentile-points), independent of
row count — this is the part that must scale), and the drift distances
run on the collected tiles (the reference's TileDriftCalculator runs
them on fetched tiles outside Spark for the same reason: the tile set is
tiny).  ``drift_summary`` therefore collects two rows per column and
computes distances driver-side — a bounded action, like the reference's.

Percentile tiles use the exact ``percentile`` aggregate (the engine-wide
exact-pin strategy; the reference uses KLL sketches) with
``exact=False`` switching to ``approx_percentile`` for the one-pass
sketch path at scale.  Histogram tiles cap at ``max_categories`` by
frequency (ties broken by value) so a high-cardinality string column
cannot blow up the tile — the trimmed mass lands in an ``__other__``
bucket on BOTH sides, keeping the distance well-defined.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)

# reference DriftMetrics.thresholds
THRESHOLDS = {
    "jensen_shannon": (0.05, 0.15),
    "hellinger": (0.05, 0.15),
    "psi": (0.1, 0.2),
}

DEFAULT_PERCENTILES = tuple(i / 20 for i in range(21))  # p0, p5, ..., p100


def assign_intervals(ptiles: np.ndarray, breaks: np.ndarray) -> np.ndarray:
    """Port of AssignIntervals.on (AssignIntervals.scala:16-58): project
    equally-spaced percentile points onto `breaks`, assigning each
    inter-percentile interval fractionally to the break cells it spans.
    Returns len(breaks)-1 interval masses."""
    ptiles = np.asarray(ptiles, dtype=np.float64)
    breaks = np.asarray(breaks, dtype=np.float64)
    p_len, b_len = len(ptiles), len(breaks)
    arr = np.zeros(b_len - 1)
    i = 0
    prev = breaks[0]
    while i < p_len and ptiles[i] < breaks[0]:
        i += 1
    for b_index in range(1, b_len):
        b = breaks[b_index]
        result = 0.0
        while i < p_len and ptiles[i] < b:
            if i == 0:
                fraction = 0.0
            elif ptiles[i] == ptiles[i - 1]:
                fraction = 1.0
            else:
                fraction = (ptiles[i] - prev) / (ptiles[i] - ptiles[i - 1])
            result += fraction
            prev = ptiles[i]
            i += 1
        if i <= 0 or i >= p_len:
            fraction = 0.0
        else:
            fraction = (b - prev) / (ptiles[i] - ptiles[i - 1])
        result += fraction
        prev = b
        arr[b_index - 1] = result
    return arr


def _kl_term(a: float, b: float) -> float:
    return a * math.log(a / b) if a > 0 and b > 0 else 0.0


def _jsd_term(a: float, b: float) -> float:
    m = (a + b) * 0.5
    return (_kl_term(a, m) + _kl_term(b, m)) * 0.5


def _hellinger_term(a: float, b: float) -> float:
    return (math.sqrt(a) - math.sqrt(b)) ** 2 * 0.5


def _psi_term(a: float, b: float) -> float:
    af = 1e-5 if a == 0.0 else a
    bf = 1e-5 if b == 0.0 else b
    return (bf - af) * math.log(bf / af)


_TERM_FUNCS = {
    "jensen_shannon": _jsd_term,
    "hellinger": _hellinger_term,
    "psi": _psi_term,
}


def percentile_distance(a: Sequence[float], b: Sequence[float], metric: str) -> float:
    """DriftMetrics.percentileDistance: union-break projection of the two
    percentile arrays -> normalized interval masses -> summed term."""
    func = _TERM_FUNCS[metric]
    breaks = np.unique(np.concatenate([a, b]))
    if len(breaks) < 2:
        return 0.0
    ap = assign_intervals(np.asarray(a), breaks)
    bp = assign_intervals(np.asarray(b), breaks)
    an = ap / ap.sum() if ap.sum() else ap
    bn = bp / bp.sum() if bp.sum() else bp
    return float(sum(func(x, y) for x, y in zip(an, bn)))


def histogram_distance(a: dict, b: dict, metric: str) -> float:
    """DriftMetrics.histogramDistance: term over the KEY UNION with the
    missing side read as mass 0."""
    func = _TERM_FUNCS[metric]
    a_sum = float(sum(a.values())) or 1.0
    b_sum = float(sum(b.values())) or 1.0
    return float(sum(
        func(a.get(k, 0) / a_sum, b.get(k, 0) / b_sum)
        for k in set(a) | set(b)
    ))


def severity(score: float, metric: str) -> str:
    moderate, severe = THRESHOLDS[metric]
    if score < moderate:
        return "LOW"
    if score < severe:
        return "MODERATE"
    return "SEVERE"


def _histogram_tile(
    df: DataFrame, column: str, max_categories: int
) -> dict:
    counts = (
        df.where(F.col(column).isNotNull())
        .groupBy(F.col(column).cast("string").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("v").asc())
        .limit(max_categories + 1)
        .collect()
    )
    total = df.where(F.col(column).isNotNull()).count()
    tile = {r["v"]: r["c"] for r in counts[:max_categories]}
    rest = total - sum(tile.values())
    if rest > 0:
        tile["__other__"] = rest
    return tile


def _percentile_tiles(
    df: DataFrame, columns: Sequence[str],
    percentiles: Sequence[float], exact: bool,
) -> dict[str, Optional[list[float]]]:
    plist = ", ".join(repr(float(p)) for p in percentiles)
    fn = "percentile" if exact else "approx_percentile"
    aggs = [
        F.expr(f"{fn}(CAST(`{c}` AS DOUBLE), array({plist}))").alias(c)
        for c in columns
    ]
    row = df.groupBy().agg(*aggs).collect()[0]
    return {c: (list(row[c]) if row[c] is not None else None) for c in columns}


def drift_summary(
    baseline: DataFrame,
    comparison: DataFrame,
    columns: Optional[Sequence[str]] = None,
    metrics: Sequence[str] = ("jensen_shannon", "psi", "hellinger"),
    percentiles: Sequence[float] = DEFAULT_PERCENTILES,
    max_categories: int = 1000,
    exact: bool = True,
) -> list[dict]:
    """Per-column drift between two slices (e.g. yesterday's partition vs
    a baseline week).  Numeric columns compare percentile profiles;
    other columns compare value histograms.  Returns a list of dicts
    (column, kind, metric, score, severity) — tile-sized, not row-sized.
    """
    if columns is None:
        columns = [c for c in baseline.columns if c in set(comparison.columns)]
    types = {f.name: f.dataType for f in baseline.schema.fields}
    num_cols = [c for c in columns if isinstance(types[c], _NUMERIC_TYPES)]
    cat_cols = [c for c in columns if c not in num_cols]

    out: list[dict] = []
    if num_cols:
        base_t = _percentile_tiles(baseline, num_cols, percentiles, exact)
        comp_t = _percentile_tiles(comparison, num_cols, percentiles, exact)
        for c in num_cols:
            a, b = base_t[c], comp_t[c]
            for m in metrics:
                score = (
                    percentile_distance(a, b, m)
                    if a is not None and b is not None else None
                )
                out.append({
                    "column": c, "kind": "percentile", "metric": m,
                    "score": score,
                    "severity": severity(score, m) if score is not None else None,
                })
    for c in cat_cols:
        a = _histogram_tile(baseline, c, max_categories)
        b = _histogram_tile(comparison, c, max_categories)
        for m in metrics:
            score = histogram_distance(a, b, m)
            out.append({
                "column": c, "kind": "histogram", "metric": m,
                "score": score, "severity": severity(score, m),
            })
    return out


def drift_summary_df(spark, *args, **kwargs) -> DataFrame:
    """`drift_summary` as a DataFrame (column, kind, metric, score,
    severity) for sink/oracle consumption."""
    rows = drift_summary(*args, **kwargs)
    schema = ("column string, kind string, metric string, "
              "score double, severity string")
    return spark.createDataFrame(rows, schema=schema)
