"""Bucketed aggregations (map<bucket,value> outputs) and list auto-explode
— kernel vs naive oracle, snapshot vs golden SQL, temporal end-to-end.
reference: BucketedColumnAggregator / VectorDispatcher."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from chronon_spark.api import (
    Aggregation,
    AggregationPart,
    DataFrameSource,
    GroupBy,
    Operation,
    TimeUnit,
    Window,
)
from chronon_spark.operators.sawtooth import naive_aggregate, sawtooth_aggregate

BASE = 1704067200000
DAY = 86_400_000
RNG = np.random.default_rng(31)


def _events(n=300):
    ts = np.sort(RNG.integers(0, 30 * DAY, size=n)) + BASE
    vals = np.round(RNG.uniform(0, 100, n), 2)
    vals[RNG.random(n) < 0.1] = np.nan
    cats = RNG.choice(np.array(["a", "b", "c", None], dtype=object), size=n)
    return ts.astype(np.int64), vals, cats


@pytest.mark.parametrize("op", [Operation.SUM, Operation.COUNT, Operation.AVERAGE,
                                Operation.MAX, Operation.LAST])
@pytest.mark.parametrize("window", [None, Window(7)], ids=["inf", "7d"])
def test_bucketed_kernel_vs_naive(op, window):
    ets, vals, cats = _events()
    qts = np.sort(RNG.integers(ets[0], ets[-1], size=80)).astype(np.int64)
    parts = [AggregationPart("v", op, window=window, bucket="cat")]
    ev = {"v": vals, "cat": cats}
    fast = sawtooth_aggregate(ets, ev, qts, parts)
    slow = naive_aggregate(ets, ev, qts, parts)
    name = parts[0].output_name
    assert name.endswith("_by_cat")
    for i in range(len(qts)):
        fm, sm = fast[name][i], slow[name][i]
        assert set(fm) == set(sm), f"q{i}: {fm} vs {sm}"
        for b in fm:
            assert fm[b] == pytest.approx(sm[b], rel=1e-9), f"q{i}/{b}"


def test_array_autoexplode_kernel_vs_naive():
    n = 200
    ets = (np.sort(RNG.integers(0, 20 * DAY, size=n)) + BASE).astype(np.int64)
    lists = np.empty(n, dtype=object)
    for i in range(n):
        k = int(RNG.integers(0, 4))
        lists[i] = None if RNG.random() < 0.1 else [float(x) for x in RNG.uniform(0, 10, k)]
    qts = np.sort(RNG.integers(ets[0], ets[-1], size=60)).astype(np.int64)
    parts = [
        AggregationPart("xs", Operation.SUM, window=Window(7)),
        AggregationPart("xs", Operation.COUNT, window=Window(7)),
        AggregationPart("xs", Operation.AVERAGE, window=None),
    ]
    fast = sawtooth_aggregate(ets, {"xs": lists}, qts, parts, array_inputs={"xs"})
    slow = naive_aggregate(ets, {"xs": lists}, qts, parts, array_inputs={"xs"})
    for p in parts:
        for i in range(len(qts)):
            fv, sv = fast[p.output_name][i], slow[p.output_name][i]
            if sv is None:
                assert fv is None or (isinstance(fv, float) and fv != fv)
            else:
                assert fv == pytest.approx(sv, rel=1e-9), f"{p.output_name}[{i}]"


def test_snapshot_bucketed_vs_golden(spark):
    rows = [
        (
            int(RNG.integers(0, 8)),
            int(BASE + RNG.integers(0, 20 * DAY)),
            float(round(RNG.uniform(0, 50), 2)),
            str(RNG.choice(["x", "y", "z"])),
        )
        for _ in range(1500)
    ]
    df = spark.createDataFrame(rows, "user_id int, ts long, value double, cat string")
    df = df.withColumn("ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd"))
    df.createOrReplaceTempView("bk_events")
    gb = GroupBy(
        sources=[DataFrameSource(lambda s: df)],
        key_columns=["user_id"],
        aggregations=[
            Aggregation("value", Operation.SUM, windows=[Window(7)], buckets=["cat"]),
            Aggregation("value", Operation.COUNT, windows=[Window(7)]),
        ],
        name="g",
    )
    from chronon_spark.operators.groupby import compute_snapshot_groupby

    out = compute_snapshot_groupby(spark, gb)
    assert "value_sum_7d_by_cat" in out.columns
    golden = spark.sql(f"""
        WITH days AS (SELECT DISTINCT user_id, ds FROM bk_events)
        SELECT d.user_id, d.ds, e.cat,
               SUM(CASE WHEN e.ts >= CAST(unix_date(to_date(d.ds)) AS BIGINT)*{DAY} - {6 * DAY}
                         AND e.ts <  CAST(unix_date(to_date(d.ds)) AS BIGINT)*{DAY} + {DAY}
                        THEN e.value END) AS s
        FROM days d JOIN bk_events e ON d.user_id = e.user_id
        GROUP BY d.user_id, d.ds, e.cat
    """)
    expect: dict = {}
    for r in golden.collect():
        if r["s"] is not None:
            expect.setdefault((r["user_id"], r["ds"]), {})[r["cat"]] = r["s"]
    got = {
        (r["user_id"], r["ds"]): dict(r["value_sum_7d_by_cat"] or {})
        for r in out.collect()
    }
    assert set(got) == set(expect)
    for k in got:
        assert set(got[k]) == set(expect[k]), f"{k}: {got[k]} vs {expect[k]}"
        for b in got[k]:
            assert got[k][b] == pytest.approx(expect[k][b]), f"{k}/{b}"


def test_temporal_bucketed_end_to_end(spark):
    rows = [
        (1, BASE + i * 3_600_000, float(i), ["p", "q"][i % 2]) for i in range(48)
    ]
    right = spark.createDataFrame(rows, "user_id int, ts long, value double, cat string")
    left = spark.createDataFrame(
        [(1, BASE + 47 * 3_600_000)], "user_id int, ts long"
    )
    from chronon_spark.operators.temporal_join import temporal_features

    parts = [AggregationPart("value", Operation.COUNT, window=Window(1), bucket="cat")]
    out = temporal_features(left, right, ["user_id"], ["user_id"], parts).collect()[0]
    m = dict(out["value_count_1d_by_cat"])
    # window [floor((T-1d)/1h)*1h, T] = exactly 25 hourly events (head incl.)
    assert m["p"] + m["q"] == 25


def test_snapshot_autoexplode(spark):
    rows = [
        (1, BASE + 1000, [1.0, 2.0]),
        (1, BASE + 2000, [3.0]),
        (1, BASE + DAY, None),
        (1, BASE + DAY + 1, [4.0, 5.0]),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts long, xs array<double>")
    df = df.withColumn("ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd"))
    gb = GroupBy(
        sources=[DataFrameSource(lambda s: df)],
        key_columns=["user_id"],
        aggregations=[
            Aggregation("xs", Operation.AVERAGE, windows=[Window(7)]),
            Aggregation("xs", Operation.COUNT, windows=[Window(7)]),
        ],
        name="g",
    )
    from chronon_spark.operators.groupby import compute_snapshot_groupby

    out = {r["ds"]: r for r in compute_snapshot_groupby(spark, gb).collect()}
    # avg of [1,2,3] = 2 on day 1; avg of [1,2,3,4,5] = 3 on day 2
    assert out["2024-01-01"]["xs_average_7d"] == pytest.approx(2.0)
    assert out["2024-01-01"]["xs_count_7d"] == 3
    assert out["2024-01-02"]["xs_average_7d"] == pytest.approx(3.0)
    assert out["2024-01-02"]["xs_count_7d"] == 5


def test_mapcol_kernel_vs_naive_and_temporal(spark):
    """map<string,double> input aggregates per map-key (MapColumnAggregator)."""
    n = 150
    ets = (np.sort(RNG.integers(0, 10 * DAY, size=n)) + BASE).astype(np.int64)
    dicts = np.empty(n, dtype=object)
    for i in range(n):
        d = {}
        for k in ("a", "b", "c"):
            if RNG.random() < 0.6:
                d[k] = float(round(RNG.uniform(0, 10), 2))
        dicts[i] = d if d or RNG.random() < 0.8 else None
    qts = np.sort(RNG.integers(ets[0], ets[-1], size=40)).astype(np.int64)
    parts = [AggregationPart("m", Operation.SUM, window=Window(7))]
    fast = sawtooth_aggregate(ets, {"m": dicts}, qts, parts, map_inputs={"m"})
    name = parts[0].output_name
    # naive per-key oracle
    from chronon_spark.api import sawtooth_hop_millis
    hop = sawtooth_hop_millis(Window(7))
    for i, T in enumerate(qts):
        lo = ((int(T) - Window(7).millis) // hop) * hop
        expect = {}
        for t, d in zip(ets, dicts):
            if d is None or not (lo <= t <= T):
                continue
            for k, v in d.items():
                expect[k] = expect.get(k, 0.0) + v
        got = fast[name][i]
        assert set(got) == set(expect)
        for k in got:
            assert got[k] == pytest.approx(expect[k])

    # end-to-end through the temporal join
    right = spark.createDataFrame(
        [(1, int(t), d) for t, d in zip(ets, dicts)],
        "user_id int, ts long, m map<string,double>",
    )
    left = spark.createDataFrame([(1, int(qts[-1]))], "user_id int, ts long")
    from chronon_spark.operators.temporal_join import temporal_features
    row = temporal_features(left, right, ["user_id"], ["user_id"], parts).collect()[0]
    assert dict(row[name]) == pytest.approx(fast[name][-1])


def test_snapshot_mapcol(spark):
    rows = [
        (1, BASE + 1000, {"x": 1.0, "y": 2.0}),
        (1, BASE + 2000, {"x": 3.0}),
        (1, BASE + DAY + 1, {"y": 10.0}),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts long, m map<string,double>")
    df = df.withColumn("ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd"))
    gb = GroupBy(
        sources=[DataFrameSource(lambda s: df)],
        key_columns=["user_id"],
        aggregations=[Aggregation("m", Operation.SUM, windows=[Window(7)])],
        name="g",
    )
    from chronon_spark.operators.groupby import compute_snapshot_groupby
    out = {r["ds"]: dict(r["m_sum_7d"]) for r in compute_snapshot_groupby(spark, gb).collect()}
    assert out["2024-01-01"] == pytest.approx({"x": 4.0, "y": 2.0})
    assert out["2024-01-02"] == pytest.approx({"x": 4.0, "y": 12.0})
