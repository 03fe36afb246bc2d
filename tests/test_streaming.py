"""Structured Streaming surface tests: the same GroupBy over a stream,
executed with an in-memory source/sink (availableNow semantics)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from chronon_spark.api import Aggregation, GroupBy, DataFrameSource, Operation, TimeUnit, Window
from chronon_spark.streaming.stream_groupby import stream_groupby, stream_sessionize

BASE = 1704067200000


@pytest.fixture()
def stream_input(spark, tmp_path):
    """File-source stream: deterministic events written as parquet."""
    rng = np.random.default_rng(41)
    rows = [
        (int(rng.integers(0, 5)), int(BASE + i * 60_000), float(round(rng.uniform(0, 10), 2)))
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "user_id int, ts_ms long, value double")
    src_dir = str(tmp_path / "stream_src")
    df.repartition(4).write.parquet(src_dir)
    stream = (
        spark.readStream.schema("user_id int, ts_ms long, value double")
        .parquet(src_dir)
        .selectExpr("user_id", "timestamp_millis(ts_ms) AS ts", "value")
    )
    return stream, rows


def _run_stream(out, tmp_path, name):
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_groupby_matches_batch(spark, stream_input, tmp_path):
    stream, rows = stream_input
    gb = GroupBy(
        sources=[], key_columns=["user_id"],
        aggregations=[
            Aggregation("value", Operation.SUM, windows=[Window(1, TimeUnit.HOURS)]),
            Aggregation("value", Operation.COUNT, windows=[Window(1, TimeUnit.HOURS)]),
        ],
        name="sg",
    )
    out = stream_groupby(stream, gb, watermark="5 minutes")
    _run_stream(out, tmp_path, "sg_out")
    got = {
        (r["user_id"], r["window_start"]): (r["value_sum_1h"], r["value_count_1h"])
        for r in spark.sql("SELECT * FROM sg_out").collect()
    }
    assert got
    # batch equivalent: tumbling 1h windows
    import collections

    expect = collections.defaultdict(lambda: [0.0, 0])
    for u, ts_ms, v in rows:
        w = ts_ms // 3_600_000 * 3_600_000
        expect[(u, w)][0] += v
        expect[(u, w)][1] += 1
    assert len(got) == len(expect)
    for (u, wstart), (s, c) in got.items():
        key = (u, int(wstart.timestamp() * 1000))
        assert key in expect
        assert s == pytest.approx(expect[key][0])
        assert c == expect[key][1]


def test_stream_sessionize_runs(spark, stream_input, tmp_path):
    stream, rows = stream_input
    out = stream_sessionize(stream, ["user_id"], gap_seconds=300)
    _run_stream(out, tmp_path, "ss_out")
    res = spark.sql("SELECT * FROM ss_out").collect()
    assert res
    total = sum(r["n_events"] for r in res)
    assert total == len(rows)


def test_stream_rejects_non_mergeable_ops(spark, stream_input):
    stream, _ = stream_input
    gb = GroupBy(
        sources=[], key_columns=["user_id"],
        aggregations=[Aggregation("value", Operation.LAST_K, arg_map={"k": 3},
                                  windows=[Window(1, TimeUnit.HOURS)])],
        name="bad",
    )
    with pytest.raises(NotImplementedError):
        stream_groupby(stream, gb)


def test_stream_stateful_groupby_matches_batch(spark, tmp_path):
    """applyInPandasWithState custom stateful op: state must fold
    correctly ACROSS micro-batches (maxFilesPerTrigger=1 forces several),
    including the event-time-ordered LAST_K list that native streaming
    aggregates cannot express."""
    from chronon_spark.streaming.stream_groupby import stream_stateful_groupby

    rng = np.random.default_rng(47)
    rows = [
        (int(rng.integers(0, 4)), int(BASE + i * 60_000), float(round(rng.uniform(0, 10), 2)))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "user_id int, ts_ms long, value double")
    src_dir = str(tmp_path / "stateful_src")
    df.repartition(4).write.parquet(src_dir)
    stream = (
        spark.readStream.schema("user_id int, ts_ms long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .selectExpr("user_id", "timestamp_millis(ts_ms) AS ts", "value")
    )
    gb = GroupBy(
        sources=[], key_columns=["user_id"],
        aggregations=[
            Aggregation("value", Operation.COUNT),
            Aggregation("value", Operation.AVERAGE),
            Aggregation("value", Operation.MIN),
            Aggregation("value", Operation.LAST),
            Aggregation("value", Operation.LAST_K, arg_map={"k": 5}),
        ],
        name="stateful",
    )
    out = stream_stateful_groupby(stream, gb)
    q = (
        out.writeStream.format("memory").queryName("stateful_out")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    res = spark.sql("SELECT * FROM stateful_out").collect()
    assert len(res) > 4, "expected updates from multiple micro-batches"
    # final state per key = the row with the highest count (monotone)
    final = {}
    for r in res:
        if r["user_id"] not in final or r["value_count"] > final[r["user_id"]]["value_count"]:
            final[r["user_id"]] = r
    import collections
    by_key = collections.defaultdict(list)
    for u, ts_ms, v in rows:
        by_key[u].append((ts_ms, v))
    assert set(final) == set(by_key)
    for u, evs in by_key.items():
        evs.sort()
        vals = [v for _, v in evs]
        r = final[u]
        assert r["value_count"] == len(vals)
        assert r["value_average"] == pytest.approx(sum(vals) / len(vals))
        assert r["value_min"] == pytest.approx(min(vals))
        assert r["value_last"] == pytest.approx(vals[-1])
        assert list(r["value_last5"]) == pytest.approx(vals[-5:][::-1])


def test_stream_stateful_rejects_windowed_parts(spark, tmp_path):
    from chronon_spark.streaming.stream_groupby import stream_stateful_groupby

    df = spark.createDataFrame([(1, BASE, 1.0)], "user_id int, ts_ms long, value double")
    src_dir = str(tmp_path / "w_src")
    df.write.parquet(src_dir)
    stream = (
        spark.readStream.schema("user_id int, ts_ms long, value double")
        .parquet(src_dir)
        .selectExpr("user_id", "timestamp_millis(ts_ms) AS ts", "value")
    )
    gb = GroupBy(
        sources=[], key_columns=["user_id"],
        aggregations=[Aggregation("value", Operation.SUM, windows=[Window(1, TimeUnit.HOURS)])],
        name="w",
    )
    with pytest.raises(NotImplementedError):
        stream_stateful_groupby(stream, gb)


def test_stream_enrich_serves_latest_warehouse_commit(spark, tmp_path):
    """Online-serving analog: per-micro-batch join against the CURRENT
    warehouse snapshot — a backfill commit between runs is picked up by
    the next batch, each key serving its newest ds row."""
    import os

    from chronon_spark.sources.catalog import ParquetWarehouse
    from chronon_spark.streaming.stream_enrich import (
        enrich_stream, latest_feature_rows,
    )

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    # v1 feature snapshot: two days, keys 0..2
    v1 = spark.createDataFrame(
        [(u, ds, float(u * 10 + d)) for u in range(3)
         for d, ds in enumerate(["2024-01-01", "2024-01-02"])],
        "user_id int, ds string, score double",
    )
    wh.insert_overwrite(v1, "feats")

    src_dir = str(tmp_path / "events")
    os.makedirs(src_dir)
    spark.createDataFrame(
        [(u, 1) for u in range(3)], "user_id int, seq int"
    ).coalesce(1).write.mode("append").parquet(src_dir)

    stream = spark.readStream.schema("user_id int, seq int").parquet(src_dir)
    out_dir = str(tmp_path / "served")
    ck = str(tmp_path / "ck")
    w = enrich_stream(stream, wh, "feats", ["user_id"], out_dir, ck,
                      feature_prefix="f_")
    q = w.trigger(availableNow=True).start()
    q.awaitTermination(120)

    got1 = {(r["user_id"], r["seq"]): r["f_score"]
            for r in spark.read.parquet(out_dir).collect()}
    # latest ds = 2024-01-02 -> score u*10 + 1
    assert got1 == {(u, 1): float(u * 10 + 1) for u in range(3)}

    # nightly backfill commits day 3 for keys 0,1 only
    v2 = spark.createDataFrame(
        [(0, "2024-01-03", 777.0), (1, "2024-01-03", 888.0)],
        "user_id int, ds string, score double",
    )
    wh.insert_overwrite(v2, "feats")
    spark.createDataFrame(
        [(u, 2) for u in range(3)], "user_id int, seq int"
    ).coalesce(1).write.mode("append").parquet(src_dir)

    q = enrich_stream(stream, wh, "feats", ["user_id"], out_dir, ck,
                      feature_prefix="f_").trigger(availableNow=True).start()
    q.awaitTermination(120)

    got2 = {(r["user_id"], r["seq"]): r["f_score"]
            for r in spark.read.parquet(out_dir).collect()}
    assert got2[(0, 2)] == 777.0 and got2[(1, 2)] == 888.0
    assert got2[(2, 2)] == 21.0          # key 2 still served from day 2
    for u in range(3):                   # run-1 outputs untouched
        assert got2[(u, 1)] == float(u * 10 + 1)

    # latest_feature_rows serving cutoff (batch-side check)
    cut = latest_feature_rows(wh.read("feats"), ["user_id"],
                              max_ds="2024-01-02")
    assert {r["user_id"]: r["score"] for r in cut.collect()} == {
        0: 1.0, 1: 11.0, 2: 21.0,
    }


def test_stream_sawtooth_serve_merges_batch_ir_and_day_tail(spark, tmp_path):
    """Sawtooth online serving: batch IRs as of yesterday + streaming
    same-day tail; served values == exact aggregate over history+today,
    updated as the day streams in (two micro-batches checked)."""
    import os

    from chronon_spark.sources.catalog import ParquetWarehouse
    from chronon_spark.streaming.stream_enrich import stream_sawtooth_serve

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    # batch IRs per key as of end of yesterday (lifetime count/sum/max)
    batch = spark.createDataFrame(
        [(0, "2024-01-02", 10, 100.0, 9.5),
         (1, "2024-01-02", 4, 40.0, 8.0)],
        "user_id int, ds string, n long, total double, top double",
    )
    wh.insert_overwrite(batch, "irs")

    src_dir = str(tmp_path / "day")
    os.makedirs(src_dir)
    out_dir = str(tmp_path / "serving")
    ck = str(tmp_path / "ck")
    stream = spark.readStream.schema("user_id int, value double").parquet(src_dir)
    aggs = [("n", "count", "value"), ("total", "sum", "value"),
            ("top", "max", "value")]

    def run():
        q = stream_sawtooth_serve(
            stream, wh, "irs", ["user_id"], aggs, out_dir, ck
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)
        return {r["user_id"]: (r["n"], r["total"], r["top"])
                for r in spark.read.parquet(out_dir).collect()}

    # micro-batch 1: key 0 gets 2 events, NEW key 2 appears intraday
    spark.createDataFrame(
        [(0, 5.0), (0, 3.0), (2, 7.0)], "user_id int, value double"
    ).coalesce(1).write.mode("append").parquet(src_dir)
    got = run()
    assert got[0] == (12, 108.0, 9.5)   # 10+2, 100+8, max(9.5, 5)
    assert got[1] == (4, 40.0, 8.0)     # untouched key served from batch
    assert got[2] == (1, 7.0, 7.0)      # tail-only key

    # micro-batch 2: the tail keeps accumulating (streaming state)
    spark.createDataFrame(
        [(1, 99.0)], "user_id int, value double"
    ).coalesce(1).write.mode("append").parquet(src_dir)
    got = run()
    assert got[0] == (12, 108.0, 9.5)
    assert got[1] == (5, 139.0, 99.0)   # 4+1, 40+99, max(8, 99)
    assert got[2] == (1, 7.0, 7.0)

    # rejects non-mergeable ops
    import pytest as _pytest
    with _pytest.raises(ValueError):
        stream_sawtooth_serve(stream, wh, "irs", ["user_id"],
                              [("x", "last", "value")], out_dir, ck)


def test_stream_dedup_matches_batch_across_microbatches(spark, tmp_path):
    """Streaming first-seen dedup: survivor per fingerprint = global
    (ts, id)-minimum, INDEPENDENT of micro-batch boundaries
    (maxFilesPerTrigger=1 forces several); n_seen counts every
    duplicate; NULL fingerprints are dropped."""
    from chronon_spark.streaming.stream_dedup import stream_dedup

    rng = np.random.default_rng(53)
    rows = []
    for i in range(500):
        fp = int(rng.integers(0, 40))  # heavy duplication
        rows.append((None if i % 97 == 13 else fp, i,
                     int(BASE + int(rng.integers(0, 10_000)) * 1000)))
    df = spark.createDataFrame(rows, "fp long, event_id long, ts long")
    src_dir = str(tmp_path / "dedup_src")
    df.repartition(5).write.parquet(src_dir)
    stream = (
        spark.readStream.schema("fp long, event_id long, ts long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = stream_dedup(stream, "fp", "event_id", "ts")
    q = (
        out.writeStream.format("memory").queryName("sdedup_out")
        .outputMode("update").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(180)
    res = spark.sql("SELECT * FROM sdedup_out").collect()
    assert len(res) > 40, "expected updates from multiple micro-batches"
    final = {}
    for r in res:  # last emission per fp carries the highest n_seen
        if r["fp"] not in final or r["n_seen"] > final[r["fp"]]["n_seen"]:
            final[r["fp"]] = r
    import collections

    expect = collections.defaultdict(list)
    for fp, eid, ts in rows:
        if fp is not None:
            expect[fp].append((ts, eid))
    assert set(final) == set(expect)
    for fp, evs in expect.items():
        ts, eid = min(evs)
        r = final[fp]
        assert (r["first_ts"], r["first_id"]) == (ts, eid), fp
        assert r["n_seen"] == len(evs)


def test_stream_dedup_timeout_mode_processes_and_keeps_serving(spark, tmp_path):
    """timeout_minutes wires a processing-time timeout. Note the runtime
    consequence: the query stays ACTIVE after draining (Spark keeps it
    alive to fire pending state timeouts), so this mode is for continuous
    streams — drain with processAllAvailable() and stop explicitly."""
    from chronon_spark.streaming.stream_dedup import stream_dedup

    df = spark.createDataFrame(
        [(1, 1, BASE), (1, 2, BASE + 1000)], "fp long, event_id long, ts long"
    )
    src_dir = str(tmp_path / "dedup_ttl_src")
    df.write.parquet(src_dir)
    stream = (
        spark.readStream.schema("fp long, event_id long, ts long")
        .parquet(src_dir)
    )
    out = stream_dedup(stream, "fp", "event_id", "ts", timeout_minutes=10)
    q = (
        out.writeStream.format("memory").queryName("sdedup_ttl")
        .outputMode("update").trigger(availableNow=True).start()
    )
    try:
        import time

        deadline = time.time() + 120
        res = []
        while time.time() < deadline:
            res = spark.sql("SELECT * FROM sdedup_ttl").collect()
            if res:
                break
            time.sleep(2)
    finally:
        q.stop()
    assert len(res) == 1
    assert res[0]["first_id"] == 1 and res[0]["n_seen"] == 2
