"""Sawtooth kernel vs brute-force naive oracle — the analog of the
reference's SawtoothAggregatorTest / NaiveAggregator comparison
(aggregator/src/test/.../SawtoothAggregatorTest.scala:50-120,
NaiveAggregator.scala:26-57). Random event streams with null injection,
random query timestamps (including exact-tie timestamps), every operator.
"""

import math

import numpy as np
import pytest

from chronon_spark.api import AggregationPart, Operation, TimeUnit, Window
from chronon_spark.operators.sawtooth import naive_aggregate, sawtooth_aggregate

RNG = np.random.default_rng(42)

WINDOWS = [
    None,  # unbounded / lifetime
    Window(30, TimeUnit.DAYS),  # 1d hops
    Window(2, TimeUnit.DAYS),  # 1h hops
    Window(3, TimeUnit.HOURS),  # 5min hops
]

NUMERIC_OPS = [
    Operation.COUNT,
    Operation.SUM,
    Operation.AVERAGE,
    Operation.VARIANCE,
    Operation.SKEW,
    Operation.KURTOSIS,
    Operation.MIN,
    Operation.MAX,
    Operation.FIRST,
    Operation.LAST,
    Operation.UNIQUE_COUNT,
]
SEQ_OPS = [
    Operation.FIRST_K,
    Operation.LAST_K,
    Operation.TOP_K,
    Operation.BOTTOM_K,
    Operation.UNIQUE_TOP_K,
]


def _gen_events(n=400, null_rate=0.15, span_days=60):
    base = 1704067200000  # 2024-01-01
    ts = np.sort(RNG.integers(0, span_days * 86_400_000, size=n)) + base
    vals = np.round(RNG.uniform(-100, 100, size=n), 2)
    vals[RNG.random(n) < null_rate] = np.nan
    return ts.astype(np.int64), vals


def _gen_queries(event_ts, nq=150):
    base, hi = int(event_ts[0]), int(event_ts[-1])
    qs = RNG.integers(base - 86_400_000, hi + 86_400_000, size=nq)
    # force exact ties with event timestamps — boundary inclusion
    # (reference: SawtoothUdfSpec.scala:256-259 "include events with the
    # same timestamp as the query")
    ties = RNG.choice(event_ts, size=10, replace=False)
    return np.sort(np.concatenate([qs, ties])).astype(np.int64)


def _isnull(x):
    """kernel convention: NaN in float arrays == null (converted to SQL
    NULL at the Arrow boundary, temporal_join._emit)."""
    if x is None:
        return True
    try:
        return math.isnan(float(x))
    except (TypeError, ValueError):
        return False


def _close(a, b, tol=1e-6):
    if _isnull(a) or _isnull(b):
        return _isnull(a) and _isnull(b)
    fa, fb = float(a), float(b)
    return abs(fa - fb) <= tol * max(1.0, abs(fa), abs(fb))


@pytest.mark.parametrize("window", WINDOWS, ids=lambda w: str(w) if w else "inf")
def test_numeric_ops_vs_naive(window):
    ets, vals = _gen_events()
    qts = _gen_queries(ets)
    parts = [AggregationPart("v", op, window=window) for op in NUMERIC_OPS]
    fast = sawtooth_aggregate(ets, {"v": vals}, qts, parts)
    slow = naive_aggregate(ets, {"v": vals}, qts, parts)
    for p in parts:
        f, s = fast[p.output_name], slow[p.output_name]
        for i in range(len(qts)):
            assert _close(f[i], s[i]), (
                f"{p.output_name}[{i}] T={qts[i]}: fast={f[i]} naive={s[i]}"
            )


@pytest.mark.parametrize("window", WINDOWS, ids=lambda w: str(w) if w else "inf")
def test_sequence_ops_vs_naive(window):
    ets, vals = _gen_events(n=300)
    qts = _gen_queries(ets, nq=80)
    parts = [AggregationPart("v", op, arg_map={"k": 5}, window=window) for op in SEQ_OPS]
    fast = sawtooth_aggregate(ets, {"v": vals}, qts, parts)
    slow = naive_aggregate(ets, {"v": vals}, qts, parts)
    for p in parts:
        f, s = fast[p.output_name], slow[p.output_name]
        for i in range(len(qts)):
            fl = [round(float(x), 6) for x in (f[i] or [])]
            sl = [round(float(x), 6) for x in (s[i] or [])]
            if p.operation in (Operation.TOP_K, Operation.BOTTOM_K, Operation.UNIQUE_TOP_K):
                pass  # order fully determined by value
            assert fl == sl, f"{p.output_name}[{i}]: {fl} != {sl}"


def test_histogram_vs_naive():
    ets, _ = _gen_events(n=300)
    cats = RNG.choice(np.array(["a", "b", "c", None], dtype=object), size=300)
    qts = _gen_queries(ets, nq=60)
    for args in ({}, {"k": 2}):
        parts = [AggregationPart("c", Operation.HISTOGRAM, arg_map=args, window=Window(7))]
        fast = sawtooth_aggregate(ets, {"c": cats}, qts, parts)
        slow = naive_aggregate(ets, {"c": cats}, qts, parts)
        name = parts[0].output_name
        for i in range(len(qts)):
            assert dict(fast[name][i]) == dict(slow[name][i])


def test_string_first_last():
    ets, _ = _gen_events(n=200)
    cats = RNG.choice(np.array(["x", "y", "z", None], dtype=object), size=200)
    qts = _gen_queries(ets, nq=50)
    parts = [
        AggregationPart("c", Operation.FIRST, window=Window(7)),
        AggregationPart("c", Operation.LAST, window=Window(7)),
    ]
    fast = sawtooth_aggregate(ets, {"c": cats}, qts, parts)
    slow = naive_aggregate(ets, {"c": cats}, qts, parts)
    for p in parts:
        for i in range(len(qts)):
            assert fast[p.output_name][i] == slow[p.output_name][i]


def test_tail_boundary_is_hop_rounded():
    """Window tail = floor((T - w) / hop) * hop — an event exactly at the
    rounded tail IS included; one just before it is NOT."""
    w = Window(2, TimeUnit.DAYS)  # hop = 1h
    hop = 3_600_000
    T = 1704067200000 + 5 * 86_400_000 + 1234  # arbitrary query ts
    tail = ((T - w.millis) // hop) * hop
    ets = np.array([tail - 1, tail, T], dtype=np.int64)
    vals = np.array([100.0, 10.0, 1.0])
    parts = [AggregationPart("v", Operation.SUM, window=w)]
    out = sawtooth_aggregate(ets, {"v": vals}, np.array([T], dtype=np.int64), parts)
    assert out[parts[0].output_name][0] == pytest.approx(11.0)


def test_head_inclusive_of_query_ts():
    """Events at exactly ts == T are included (head-inclusive)."""
    T = 1704067200000
    ets = np.array([T - 10, T, T + 1], dtype=np.int64)
    vals = np.array([1.0, 2.0, 4.0])
    parts = [AggregationPart("v", Operation.SUM, window=Window(1, TimeUnit.HOURS))]
    out = sawtooth_aggregate(ets, {"v": vals}, np.array([T], dtype=np.int64), parts)
    assert out[parts[0].output_name][0] == pytest.approx(3.0)


def test_empty_window_results():
    ets = np.array([1704067200000], dtype=np.int64)
    vals = np.array([5.0])
    qts = np.array([1704067200000 - 86_400_000], dtype=np.int64)  # before all events
    parts = [
        AggregationPart("v", Operation.COUNT, window=Window(1)),
        AggregationPart("v", Operation.SUM, window=Window(1)),
        AggregationPart("v", Operation.LAST_K, arg_map={"k": 3}, window=Window(1)),
    ]
    out = sawtooth_aggregate(ets, {"v": vals}, qts, parts)
    assert out["v_count_1d"][0] == 0
    assert _isnull(out["v_sum_1d"][0])
    assert out["v_last3_1d"][0] == []


def test_percentile_and_approx_unique_vs_naive():
    ets, vals = _gen_events(n=300)
    qts = _gen_queries(ets, nq=60)
    parts = [
        AggregationPart("v", Operation.APPROX_PERCENTILE,
                        arg_map={"percentiles": [0.25, 0.5, 0.95]}, window=Window(7)),
        AggregationPart("v", Operation.APPROX_UNIQUE_COUNT, window=Window(7)),
    ]
    fast = sawtooth_aggregate(ets, {"v": vals}, qts, parts)
    slow = naive_aggregate(ets, {"v": vals}, qts, parts)
    for p in parts:
        for i in range(len(qts)):
            f, s = fast[p.output_name][i], slow[p.output_name][i]
            if isinstance(s, list):
                assert [round(x, 9) for x in f] == [round(x, 9) for x in s]
            else:
                assert _close(f, s), f"{p.output_name}[{i}]"


def test_range_kth_matches_naive_sort_randomized():
    """Wavelet-tree range-kth vs brute-force sorted-slice indexing, with
    duplicates, NaNs, empty windows, and multi-percentile k's."""
    import numpy as np

    from chronon_spark.operators.sawtooth import _range_kth

    rng = np.random.default_rng(42)
    for trial in range(5):
        n = int(rng.integers(1, 400))
        vals = rng.choice([1.0, 2.0, 2.0, 7.5, np.nan, -3.0, 100.0], size=n)
        nq = 200
        s = rng.integers(0, n + 1, nq)
        e = np.minimum(n, s + rng.integers(0, n + 1, nq))
        pct = [0.25, 0.5, 0.9, 1.0]
        nn = np.concatenate(([0], np.cumsum(~np.isnan(vals))))
        m = nn[e] - nn[s]
        P = len(pct)
        m_rep = np.repeat(m, P)
        p_tile = np.tile(np.array(pct), nq)
        ks = np.maximum(1, np.ceil(p_tile * m_rep)).astype(np.int64) - 1
        ks = np.where(m_rep > 0, np.minimum(ks, m_rep - 1), -1)
        got = _range_kth(
            vals, np.repeat(s, P), np.repeat(e, P), ks
        ).reshape(nq, P)
        for i in range(nq):
            seg = vals[s[i]:e[i]]
            seg = np.sort(seg[~np.isnan(seg)])
            for j, p in enumerate(pct):
                if len(seg) == 0:
                    assert np.isnan(got[i, j])
                else:
                    exp = seg[max(1, int(np.ceil(p * len(seg)))) - 1]
                    assert got[i, j] == exp, (trial, i, p, exp, got[i, j])


def test_bucketed_zero_windows_omit_stale_buckets():
    """Buckets/map-keys whose events all fell out of the window must be
    ABSENT from the output map, not present as 0 / {} — count-shaped ops
    (APPROX_UNIQUE_COUNT) and dict-shaped ops (HISTOGRAM and the
    frequent-k family) previously leaked stale history buckets."""
    ts = np.array([1000, 2000, 10_000_000], dtype=np.int64)
    vals = {"v": np.array([3.0, 4.0, 3.0]),
            "cat": np.array(["b", "b", "a"], dtype=object)}
    q = np.array([10_000_001], dtype=np.int64)
    for op in (Operation.APPROX_UNIQUE_COUNT, Operation.COUNT,
               Operation.HISTOGRAM):
        # (APPROX_FREQUENT_K/HEAVY_HITTERS dispatch through the same
        # HISTOGRAM kernel branch — groupby.py routes them with a k trim)
        p = AggregationPart(
            "v", op, window=Window(1, TimeUnit.HOURS), bucket="cat")
        got = sawtooth_aggregate(ts, vals, q, [p])[p.output_name]
        want = naive_aggregate(ts, vals, q, [p])[p.output_name]
        assert list(got) == list(want), op
        assert "b" not in got[0], op  # the stale bucket stays absent
