"""Drift metrics (reference: online/.../stats/DriftMetrics.scala,
AssignIntervals.scala; scenarios mirror DriftMetricsTest /
AssignIntervalsTest)."""

import math

import numpy as np
import pytest
from pyspark.sql import Row

from chronon_spark.operators.drift import (
    assign_intervals,
    drift_summary,
    drift_summary_df,
    histogram_distance,
    percentile_distance,
    severity,
)


def test_assign_intervals_reference_case():
    # AssignIntervalsTest.scala:10-21 — fractional assignment incl. the
    # repeated-percentile (6,6,6) and out-of-range tails
    ptiles = np.array([1, 4, 6, 6, 6, 8, 9], dtype=float)
    breaks = np.array([0, 1, 2, 3, 5, 6, 7, 8, 9, 10], dtype=float)
    expected = [0.0, 1 / 3, 1 / 3, 1 / 3 + 1 / 2, 1 / 2, 2.5, 0.5, 1.0, 0.0]
    got = assign_intervals(ptiles, breaks)
    assert np.allclose(got, expected)


def _inverse_erf(x: float) -> float:
    # Winitzki approximation (public formula, also used by the reference's
    # DriftMetricsTest to build Gaussian percentile fixtures)
    a = 0.147
    sign = 1 if x >= 0 else -1
    ax = abs(x)
    ln1x2 = math.log(1 - ax * ax)
    t = 2 / (math.pi * a) + ln1x2 / 2
    return sign * math.sqrt(math.sqrt(t * t - ln1x2 / a) - t)


def _gaussian_percentiles(mean: float, var: float, breaks: int = 20):
    std = math.sqrt(var)
    pts = []
    for i in range(breaks + 1):
        p = 0.01 if i == 0 else (0.99 if i == breaks else i / breaks)
        pts.append(mean + std * math.sqrt(2) * _inverse_erf(2 * p - 1))
    return pts


# Scenario bands follow DriftMetricsTest's low/moderate/severe structure.
# The shift magnitudes are recalibrated: the reference test builds its
# Gaussian fixtures with a buggy inverse-erf (DriftMetricsTest.scala:27-35
# computes sqrt(sqrt(t) - ln/a) instead of Winitzki's sqrt(sqrt(t^2 - ln/a)
# - t)), so its bands only hold for those distorted percentiles. With
# correct Gaussians: ~0.07σ shift -> LOW, ~1σ -> MODERATE, 2σ / big
# variance change -> SEVERE under the same JSD/Hellinger thresholds.
@pytest.mark.parametrize(
    "mean_b,var_b,lo,hi",
    [
        (101.0, 225.0, 0.0, 0.05),    # low drift
        (115.0, 225.0, 0.05, 0.16),   # moderate: ~1σ mean shift
        (130.0, 225.0, 0.16, 10.0),   # severe: 2σ mean shift
        (112.0, 64.0, 0.15, 10.0),    # severe: mean + variance shift
    ],
)
def test_percentile_distance_scenarios(mean_b, var_b, lo, hi):
    a = _gaussian_percentiles(100.0, 225.0)
    b = _gaussian_percentiles(mean_b, var_b)
    for metric in ("jensen_shannon", "hellinger"):
        d = percentile_distance(a, b, metric)
        assert lo <= d <= hi, (metric, d)
    # monotone in shift: severe > moderate > low
    mid = _gaussian_percentiles(115.0, 225.0)
    low = _gaussian_percentiles(101.0, 225.0)
    for metric in ("jensen_shannon", "hellinger", "psi"):
        assert (percentile_distance(a, low, metric)
                < percentile_distance(a, mid, metric)
                < percentile_distance(a, _gaussian_percentiles(130.0, 225.0), metric))


def test_identical_distributions_zero():
    a = _gaussian_percentiles(50.0, 25.0)
    for metric in ("jensen_shannon", "hellinger", "psi"):
        assert percentile_distance(a, list(a), metric) == pytest.approx(0.0)
        assert histogram_distance({"x": 5, "y": 5}, {"x": 5, "y": 5}, metric) == (
            pytest.approx(0.0)
        )


def test_histogram_distance_union_keys():
    # key union with missing side read as 0 (DriftMetrics.scala:45-84);
    # hellinger of disjoint histograms = max = 1.0
    d = histogram_distance({"a": 10}, {"b": 10}, "hellinger")
    assert d == pytest.approx(1.0)
    # psi substitutes 1e-5 for empty bins — finite, large
    d_psi = histogram_distance({"a": 10}, {"b": 10}, "psi")
    assert 10 < d_psi < 100


def test_severity_thresholds():
    assert severity(0.04, "jensen_shannon") == "LOW"
    assert severity(0.1, "jensen_shannon") == "MODERATE"
    assert severity(0.2, "jensen_shannon") == "SEVERE"
    assert severity(0.15, "psi") == "MODERATE"
    assert severity(0.25, "psi") == "SEVERE"


def test_drift_summary_end_to_end(spark):
    rng = np.random.default_rng(11)
    base = spark.createDataFrame(
        [Row(v=float(x), cat=("a" if i % 4 else "b"))
         for i, x in enumerate(rng.normal(100, 15, 400))]
    )
    # same marginal shapes -> LOW everywhere
    same = spark.createDataFrame(
        [Row(v=float(x), cat=("a" if i % 4 else "b"))
         for i, x in enumerate(rng.normal(100, 15, 400))]
    )
    shifted = spark.createDataFrame(
        [Row(v=float(x), cat=("a" if i % 2 else "b"))
         for i, x in enumerate(rng.normal(160, 15, 400))]
    )
    low = {(r["column"], r["metric"]): r for r in drift_summary(base, same)}
    assert low[("v", "jensen_shannon")]["severity"] == "LOW"
    assert low[("v", "jensen_shannon")]["kind"] == "percentile"
    assert low[("cat", "jensen_shannon")]["kind"] == "histogram"
    hi = {(r["column"], r["metric"]): r for r in drift_summary(base, shifted)}
    assert hi[("v", "jensen_shannon")]["severity"] == "SEVERE"
    assert hi[("v", "psi")]["score"] > low[("v", "psi")]["score"]
    assert hi[("cat", "jensen_shannon")]["score"] > low[("cat", "jensen_shannon")]["score"]
    df = drift_summary_df(spark, base, shifted)
    assert df.count() == 6  # 2 columns x 3 metrics


def test_histogram_tile_caps_cardinality(spark):
    rows = [Row(k=f"k{i:04d}") for i in range(50)] * 3 + [Row(k="hot")] * 100
    df = spark.createDataFrame(rows)
    out = drift_summary(df, df, max_categories=10)
    # identical slices stay zero-distance even through the __other__ trim
    assert all(r["score"] == pytest.approx(0.0) for r in out)
