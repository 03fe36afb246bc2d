"""Snapshot-log + incremental-refresh tests: the warehouse's Iceberg-style
commit log (added/removed files per insert_overwrite), time travel,
incremental append scans, and snapshot-range-driven downstream refresh
(north rule: "incremental backfill over Iceberg snapshot ranges")."""

import pytest
from pyspark.sql import functions as F

from chronon_spark.api import (
    Aggregation,
    EventSource,
    GroupBy,
    Operation,
    Query,
    Window,
)
from chronon_spark.plans.backfill import (
    groupby_affected_days,
    groupby_backfill,
    incremental_refresh,
)
from chronon_spark.sources.catalog import ParquetWarehouse

BASE = 1704067200000  # 2024-01-01
DAY = 86_400_000


@pytest.fixture()
def wh(spark, tmp_path):
    return ParquetWarehouse(spark, str(tmp_path / "warehouse"))


def _day_rows(spark, days: dict[str, list[tuple[int, float]]]):
    """days: ds -> [(user_id, value)]; ts = noon of ds."""
    rows = []
    for ds, items in days.items():
        day_idx = (int(ds[8:10]) - 1)
        ts = BASE + day_idx * DAY + DAY // 2
        for uid, v in items:
            rows.append((uid, ts, float(v), ds))
    return spark.createDataFrame(rows, "user_id int, ts long, value double, ds string")


def test_snapshot_log_records_commits(spark, wh):
    df1 = _day_rows(spark, {"2024-01-01": [(1, 10.0)], "2024-01-02": [(1, 20.0)]})
    wh.insert_overwrite(df1, "t")
    df2 = _day_rows(spark, {"2024-01-03": [(2, 30.0)]})
    wh.insert_overwrite(df2, "t")

    snaps = wh.snapshots("t")
    assert [s["snapshot_id"] for s in snaps] == [1, 2]
    assert snaps[0]["parent_id"] is None and snaps[1]["parent_id"] == 1
    assert snaps[0]["partitions"] == ["2024-01-01", "2024-01-02"]
    assert snaps[1]["partitions"] == ["2024-01-03"]
    assert snaps[1]["added_files"] and not snaps[1]["removed_files"]
    assert wh.latest_snapshot_id("t") == 2

    # dynamic overwrite of an existing partition removes its old files
    df3 = _day_rows(spark, {"2024-01-02": [(9, 99.0)]})
    wh.insert_overwrite(df3, "t")
    s3 = wh.snapshots("t")[-1]
    assert s3["partitions"] == ["2024-01-02"]
    assert s3["added_files"] and s3["removed_files"]


def test_time_travel_and_incremental_scan(spark, wh):
    wh.insert_overwrite(
        _day_rows(spark, {"2024-01-01": [(1, 10.0)], "2024-01-02": [(1, 20.0)]}), "t"
    )
    wh.insert_overwrite(_day_rows(spark, {"2024-01-03": [(2, 30.0)]}), "t")
    wh.insert_overwrite(_day_rows(spark, {"2024-01-02": [(9, 99.0)]}), "t")

    # VERSION AS OF 1: the original two days, pre-rewrite
    v1 = wh.read_at("t", 1).orderBy("ds").collect()
    assert [(r["ds"], r["user_id"], r["value"]) for r in v1] == [
        ("2024-01-01", 1, 10.0), ("2024-01-02", 1, 20.0)]
    # VERSION AS OF 2 includes the appended day
    assert wh.read_at("t", 2).count() == 3
    # latest: day 2 rewritten
    v3 = {(r["ds"], r["user_id"]) for r in wh.read_at("t", 3).collect()}
    assert v3 == {("2024-01-01", 1), ("2024-01-02", 9), ("2024-01-03", 2)}
    assert wh.read_at("t", 3).count() == wh.read("t").count()

    # incremental append scan (1, 2]: only the appended day
    inc = wh.read_incremental("t", 1, 2).collect()
    assert [(r["ds"], r["user_id"]) for r in inc] == [("2024-01-03", 2)]
    # (1, 3]: appended day + current content of the rewritten partition
    inc2 = {(r["ds"], r["user_id"]) for r in wh.read_incremental("t", 1).collect()}
    assert inc2 == {("2024-01-03", 2), ("2024-01-02", 9)}
    # (3, 3] is empty but keeps the schema
    empty = wh.read_incremental("t", 3)
    assert empty.count() == 0 and "user_id" in empty.columns

    assert wh.changed_partitions("t", 0) == ["2024-01-01", "2024-01-02", "2024-01-03"]
    assert wh.changed_partitions("t", 1, 2) == ["2024-01-03"]
    assert wh.changed_partitions("t", 2) == ["2024-01-02"]


def test_expire_snapshots_gc(spark, wh):
    wh.insert_overwrite(
        _day_rows(spark, {"2024-01-01": [(1, 10.0)], "2024-01-02": [(1, 20.0)]}), "t"
    )
    wh.insert_overwrite(_day_rows(spark, {"2024-01-02": [(9, 99.0)]}), "t")
    current = {(r["ds"], r["user_id"]) for r in wh.read("t").collect()}
    n_dead = wh.expire_snapshots("t")
    assert n_dead > 0  # the replaced day-2 file(s) were deleted
    # current reads unchanged; log collapsed to one snapshot at the same id
    assert {(r["ds"], r["user_id"]) for r in wh.read("t").collect()} == current
    snaps = wh.snapshots("t")
    assert len(snaps) == 1 and snaps[0]["operation"] == "expire"
    assert wh.latest_snapshot_id("t") == 2
    assert wh.partitions("t") == ["2024-01-01", "2024-01-02"]
    # expiring again is a no-op
    assert wh.expire_snapshots("t") == 0


def test_compact_rewrites_fragmented_partitions(spark, wh):
    """Three commits fragment day 1 into 3 live files; compact must
    coalesce to 1 file/partition with identical rows, keep pre-compact
    versions readable, and let expire GC the replaced files."""
    for v in (1.0, 2.0, 3.0):
        wh.insert_overwrite(
            _day_rows(spark, {"2024-01-01": [(int(v), v)],
                              "2024-01-02": [(int(v) + 10, v)]}), "t")
    # each commit OVERWRITES both partitions, so liveness stays 1 file each
    # — append a second file to day 1 via a direct union commit instead
    cur = wh.read("t")
    before_rows = {(r["ds"], r["user_id"], r["value"]) for r in cur.collect()}
    # fragment: write day-1-only commits that UNION prior day-1 content
    extra = _day_rows(spark, {"2024-01-01": [(99, 9.9)]})
    day1 = wh.read("t").where(F.col("ds") == "2024-01-01")
    frag_df = day1.unionByName(extra).repartition(3)
    wh.insert_overwrite(frag_df, "t")
    before_rows = {(r["ds"], r["user_id"], r["value"])
                   for r in wh.read("t").collect()}
    live_day1 = [f for f in wh._live_files("t") if "2024-01-01" in f]
    assert len(live_day1) >= 2, "fixture must be fragmented"
    pre_compact = wh.latest_snapshot_id("t")

    rep = wh.compact("t", min_files=2)
    assert rep["partitions"] == ["2024-01-01"]
    assert rep["files_after"] == 1 and rep["files_before"] == len(live_day1)
    after_rows = {(r["ds"], r["user_id"], r["value"])
                  for r in wh.read("t").collect()}
    assert after_rows == before_rows
    # time travel to the pre-compact version still works
    assert wh.read_at("t", pre_compact).count() == len(before_rows)
    # expire physically drops the replaced fragments
    assert wh.expire_snapshots("t") >= len(live_day1)
    assert {(r["ds"], r["user_id"], r["value"])
            for r in wh.read("t").collect()} == before_rows
    # idempotent: nothing fragmented anymore
    assert wh.compact("t", min_files=2)["partitions"] == []


def test_snapshot_log_model_based(spark, wh):
    """Randomized commit sequence vs a pure-Python model: after every
    commit, read()/partitions() match the model's current state and
    read_at() reproduces every PRIOR version exactly; a mid-sequence
    expire keeps current state intact."""
    import random

    rng = random.Random(13)
    model: dict[str, list[tuple[int, float]]] = {}  # ds -> rows
    history: list[dict] = []
    all_ds = [f"2024-01-{d:02d}" for d in range(1, 6)]

    def check_current():
        got = {}
        for r in wh.read("m").collect():
            got.setdefault(r["ds"], []).append((r["user_id"], r["value"]))
        model_norm = {ds: sorted(rows) for ds, rows in model.items() if rows}
        got_norm = {ds: sorted(rows) for ds, rows in got.items()}
        assert got_norm == model_norm
        assert wh.partitions("m") == sorted(model_norm)

    for step in range(8):
        n_parts = rng.randint(1, 3)
        days = rng.sample(all_ds, n_parts)
        commit = {
            ds: [(rng.randint(0, 99), round(rng.uniform(0, 10), 3))
                 for _ in range(rng.randint(1, 4))]
            for ds in days
        }
        wh.insert_overwrite(_day_rows(spark, commit), "m")
        for ds, rows in commit.items():
            model[ds] = list(rows)
        history.append({ds: sorted(rows) for ds, rows in model.items() if rows})
        check_current()
        if step == 4:
            wh.expire_snapshots("m")
            check_current()
            # versions before the expiry point are gone by design;
            # truncate the reproducible history to the surviving snapshot
            history = history[-1:]

    # time travel reproduces every surviving version
    base = wh.latest_snapshot_id("m") - (len(history) - 1)
    for i, want in enumerate(history):
        got = {}
        for r in wh.read_at("m", base + i).collect():
            got.setdefault(r["ds"], []).append((r["user_id"], r["value"]))
        assert {ds: sorted(v) for ds, v in got.items()} == want, f"version {i}"


def _upstream(spark, wh, mutate: bool = False):
    days = {
        f"2024-01-{d:02d}": [(1, 10.0 * d), (2, 5.0 * d)] for d in range(1, 13)
    }
    if mutate:
        days["2024-01-04"] = [(1, 1000.0), (2, 2000.0), (3, 7.0)]
    wh.insert_overwrite(_day_rows(spark, days if not mutate
                                  else {"2024-01-04": days["2024-01-04"]}), "up")


def _job(spark, wh, windows=(3,), name="inc"):
    gb = GroupBy(
        sources=[EventSource(wh.path("up"), Query(
            selects={"user_id": "user_id", "value": "value"}, time_column="ts"))],
        key_columns=["user_id"],
        aggregations=[Aggregation("value", Operation.SUM,
                                  windows=[Window(w) for w in windows])],
        name=name,
    )
    return groupby_backfill(spark, wh, gb, f"{name}_out", step_days=30), gb


def test_incremental_refresh_recomputes_stale_partitions(spark, wh):
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    _upstream(spark, wh)
    job, gb = _job(spark, wh)
    rep0 = incremental_refresh(job, "up", "2024-01-02", "2024-01-12",
                               affected_days=groupby_affected_days(gb))
    assert rep0.refreshed == [] and rep0.backfill.rows_written > 0
    before = {(r["user_id"], r["ds"]): r["value_sum_3d"]
              for r in wh.read("inc_out").collect()}

    # rewrite one upstream day, then refresh: output days [04, 06] (3d
    # window) must be recomputed, everything else untouched
    _upstream(spark, wh, mutate=True)
    job2, _ = _job(spark, wh)
    rep = incremental_refresh(job2, "up", "2024-01-02", "2024-01-12",
                              affected_days=groupby_affected_days(gb))
    assert rep.changed_upstream == ["2024-01-04"]
    refreshed_ds = sorted(d for r in rep.refreshed for d in r.partitions())
    assert refreshed_ds == ["2024-01-04", "2024-01-05", "2024-01-06"]
    assert rep.backfill.steps == []  # no holes — refresh only

    after = {(r["user_id"], r["ds"]): r["value_sum_3d"]
             for r in wh.read("inc_out").collect()}
    # exact equality with a from-scratch recompute on the mutated upstream
    fresh_wh = ParquetWarehouse(spark, wh.root + "_fresh")
    fresh_days = {f"2024-01-{d:02d}": [(1, 10.0 * d), (2, 5.0 * d)]
                  for d in range(1, 13)}
    fresh_days["2024-01-04"] = [(1, 1000.0), (2, 2000.0), (3, 7.0)]
    fresh_wh.insert_overwrite(_day_rows(spark, fresh_days), "up")
    fjob, _ = _job(spark, fresh_wh)
    fjob.run("2024-01-02", "2024-01-12")
    expected = {(r["user_id"], r["ds"]): r["value_sum_3d"]
                for r in fresh_wh.read("inc_out").collect()}
    assert after == expected

    # untouched partitions kept their values (not recomputed to new ones —
    # they were equal anyway; check the manifest instead)
    man = job2.manifest().where(
        (F.col("output_table") == "inc_out") & (F.col("status") == "refreshed")
    )
    assert {r["ds"] for r in man.collect()} == set(refreshed_ds)
    # days outside the affected window unchanged
    for k in before:
        if k[1] not in refreshed_ds:
            assert after[k] == before[k]

    # idempotence: nothing changed upstream -> refresh is a no-op
    rep2 = incremental_refresh(job2, "up", "2024-01-02", "2024-01-12",
                               affected_days=groupby_affected_days(gb))
    assert rep2.refreshed == [] and rep2.backfill.steps == []
    assert rep2.changed_upstream == []


def test_unbounded_window_invalidates_all_later_days(spark, wh):
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    _upstream(spark, wh)
    gb = GroupBy(
        sources=[EventSource(wh.path("up"), Query(
            selects={"user_id": "user_id", "value": "value"}, time_column="ts"))],
        key_columns=["user_id"],
        aggregations=[Aggregation("value", Operation.SUM)],  # lifetime
        name="life",
    )
    assert groupby_affected_days(gb) is None
    job = groupby_backfill(spark, wh, gb, "life_out", step_days=30)
    incremental_refresh(job, "up", "2024-01-02", "2024-01-08",
                        affected_days=groupby_affected_days(gb))
    _upstream(spark, wh, mutate=True)
    job2 = groupby_backfill(spark, wh, gb, "life_out", step_days=30)
    rep = incremental_refresh(job2, "up", "2024-01-02", "2024-01-08",
                              affected_days=None)
    refreshed_ds = sorted(d for r in rep.refreshed for d in r.partitions())
    assert refreshed_ds == [f"2024-01-{d:02d}" for d in range(4, 9)]


def test_cascading_incremental_refresh(spark, wh):
    """Two-level pipeline: raw -> groupby table -> derived table. A rewrite
    of one raw day must cascade — level 1 recomputes its affected window
    off raw's snapshot log, and level 2 recomputes off LEVEL 1's snapshot
    log (the refresh writes are commits too) — ending equal to a
    from-scratch rebuild."""
    from chronon_spark.plans.backfill import BackfillJob

    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")

    def build(w):
        job, gb = _job(spark, w)  # 3d-window sum -> inc_out
        incremental_refresh(job, "up", "2024-01-02", "2024-01-12", affected_days=3)
        # level 2: daily per-ds total over inc_out (depends 1:1 on its ds)
        l2 = BackfillJob(
            spark, w, "l2_out",
            compute=lambda rng: w.read("inc_out", rng).groupBy("ds").agg(
                F.round(F.sum("value_sum_3d"), 6).alias("daily_total")),
            config=gb, job_name="l2", step_days=30,
        )
        incremental_refresh(l2, "inc_out", "2024-01-02", "2024-01-12",
                            affected_days=1)
        return job, gb, l2

    _upstream(spark, wh)
    job, gb, l2 = build(wh)
    _upstream(spark, wh, mutate=True)  # rewrite raw day 04
    job2, _ = _job(spark, wh)
    incremental_refresh(job2, "up", "2024-01-02", "2024-01-12", affected_days=3)
    l2b = BackfillJob(
        spark, wh, "l2_out",
        compute=lambda rng: wh.read("inc_out", rng).groupBy("ds").agg(
            F.round(F.sum("value_sum_3d"), 6).alias("daily_total")),
        config=gb, job_name="l2", step_days=30,
    )
    rep2 = incremental_refresh(l2b, "inc_out", "2024-01-02", "2024-01-12",
                               affected_days=1)
    # level 2 saw exactly the partitions level 1 rewrote
    assert sorted(rep2.changed_upstream) == [
        "2024-01-04", "2024-01-05", "2024-01-06"]

    # equality with a from-scratch pipeline on the mutated raw
    fresh = ParquetWarehouse(spark, wh.root + "_cascade_fresh")
    _upstream(spark, fresh)
    fresh.insert_overwrite(
        _day_rows(spark, {"2024-01-04": [(1, 1000.0), (2, 2000.0), (3, 7.0)]}),
        "up")
    build(fresh)
    got = {r["ds"]: r["daily_total"] for r in wh.read("l2_out").collect()}
    want = {r["ds"]: r["daily_total"] for r in fresh.read("l2_out").collect()}
    assert got == want


def test_affected_days_helper():
    def mk(windows):
        return GroupBy(
            sources=[EventSource("x", Query(selects={"v": "v"}, time_column="ts"))],
            key_columns=["k"],
            aggregations=[Aggregation("v", Operation.SUM, windows=windows)],
            name="h",
        )

    assert groupby_affected_days(mk([Window(7)])) == 7
    assert groupby_affected_days(mk([Window(7), Window(30)])) == 30
    assert groupby_affected_days(mk(None)) is None


def test_commit_conflict_rebases_and_retries(spark, wh, monkeypatch):
    """Optimistic concurrency: a writer whose pre-commit log read is
    stale must NOT clobber the interleaved commit — it rebases against
    the new tip and takes the next snapshot id; nothing is lost."""
    wh.insert_overwrite(
        _day_rows(spark, {"2024-01-01": [(1, 1.0)], "2024-01-02": [(2, 2.0)]}),
        "t",
    )
    tip = wh.latest_snapshot_id("t")

    # writer B commits day-2 new content while writer A (below) is
    # mid-flight with a stale view of the log
    orig = ParquetWarehouse.latest_snapshot_id
    state = {"stale_reads": 2}

    def stale(self, table):
        real = orig(self, table)
        if state["stale_reads"] > 0:
            state["stale_reads"] -= 1
            return real - 1  # pretend the interleaved commit didn't happen
        return real

    wh.insert_overwrite(_day_rows(spark, {"2024-01-02": [(9, 9.0)]}), "t")
    b_tip = wh.latest_snapshot_id("t")
    assert b_tip == tip + 1

    monkeypatch.setattr(ParquetWarehouse, "latest_snapshot_id", stale)
    wh.insert_overwrite(_day_rows(spark, {"2024-01-01": [(7, 7.0)]}), "t")
    monkeypatch.setattr(ParquetWarehouse, "latest_snapshot_id", orig)

    # A's commit landed AFTER B's (exclusive create forced the retry)
    assert wh.latest_snapshot_id("t") == b_tip + 1
    sids = [s["snapshot_id"] for s in wh.snapshots("t")]
    assert sids == sorted(set(sids)), "no clobbered/duplicate snapshot ids"
    got = {(r["ds"], r["user_id"], r["value"])
           for r in wh.read("t").collect()}
    # BOTH interleaved writes survive: B's day-2 row and A's day-1 row
    assert got == {("2024-01-01", 7, 7.0), ("2024-01-02", 9, 9.0)}


def test_commit_rebase_preserves_other_partition_writes(spark, wh):
    """Writers to DIFFERENT partitions never remove each other's files:
    the replaced set is recomputed against the commit-time tip."""
    wh.insert_overwrite(
        _day_rows(spark, {"2024-01-01": [(1, 1.0)], "2024-01-02": [(2, 2.0)]}),
        "t",
    )
    # two sequential overwrites standing in for racers (the rebase path
    # computes removals at commit time either way)
    wh.insert_overwrite(_day_rows(spark, {"2024-01-01": [(11, 11.0)]}), "t")
    wh.insert_overwrite(_day_rows(spark, {"2024-01-02": [(22, 22.0)]}), "t")
    got = {(r["ds"], r["user_id"]) for r in wh.read("t").collect()}
    assert got == {("2024-01-01", 11), ("2024-01-02", 22)}
    last = wh.snapshots("t")[-1]
    # the day-2 commit replaced ONLY day-2 files
    assert all("2024-01-02" in f for f in last["removed_files"])


def test_expire_retain_last_keeps_recent_versions(spark, wh):
    """expire_snapshots(retain_last=2): the newest two versions stay
    byte-identical via time travel, older versions' exclusive files are
    physically gone, and current reads are untouched."""
    for v in (1.0, 2.0, 3.0):
        wh.insert_overwrite(
            _day_rows(spark, {"2024-01-01": [(int(v), v)]}), "t")
    snaps = wh.snapshots("t")
    assert len(snaps) >= 3
    sid_v2, sid_v3 = snaps[-2]["snapshot_id"], snaps[-1]["snapshot_id"]
    v2_rows = {(r["user_id"], r["value"])
               for r in wh.read_at("t", sid_v2).collect()}
    v3_rows = {(r["user_id"], r["value"])
               for r in wh.read_at("t", sid_v3).collect()}

    deleted = wh.expire_snapshots("t", retain_last=2)
    assert deleted >= 1  # v1's exclusive file gone
    assert {(r["user_id"], r["value"]) for r in wh.read("t").collect()} == v3_rows
    assert {(r["user_id"], r["value"])
            for r in wh.read_at("t", sid_v2).collect()} == v2_rows
    assert {(r["user_id"], r["value"])
            for r in wh.read_at("t", sid_v3).collect()} == v3_rows
    # log rebased: oldest entry is the baseline at v2's id
    assert wh.snapshots("t")[0]["snapshot_id"] == sid_v2
    assert wh.snapshots("t")[0]["operation"] == "expire"
    # idempotent second expire with same retention deletes nothing
    assert wh.expire_snapshots("t", retain_last=2) == 0


def test_read_at_expired_snapshot_raises(spark, wh):
    for v in (1.0, 2.0, 3.0):
        wh.insert_overwrite(
            _day_rows(spark, {"2024-01-01": [(int(v), v)]}), "t")
    sid_v1 = wh.snapshots("t")[0]["snapshot_id"]
    wh.expire_snapshots("t", retain_last=2)
    with pytest.raises(ValueError, match="expired"):
        wh.read_at("t", sid_v1)


def test_recover_partition_column_uri_encoded_paths(spark, tmp_path):
    """Paths with spaces: input_file_name() is URI-percent-encoded while
    mapping keys are raw filesystem paths — the decode bridge must match
    them (previously every such file recovered NULL ds silently)."""
    import os

    from chronon_spark.sources.catalog import recover_partition_column

    loc = str(tmp_path / "my table" / "ds=2024 01")
    os.makedirs(loc)
    spark.createDataFrame([(1,), (2,)], "id long").coalesce(1) \
        .write.mode("overwrite").parquet(loc)
    f = [os.path.join(loc, x) for x in os.listdir(loc)
         if x.endswith(".parquet")][0]
    df = spark.read.parquet(loc)
    out = recover_partition_column(df, {f: "2024 01"}, "ds")
    assert set(r["ds"] for r in out.collect()) == {"2024 01"}
    # large-map (join) path too
    big = {f: "2024 01"}
    big.update({f"/nonexistent/p{i}.parquet": "x" for i in range(70)})
    out2 = recover_partition_column(df, big, "ds")
    assert set(r["ds"] for r in out2.collect()) == {"2024 01"}


def test_concurrent_threaded_commits_both_land(spark, wh):
    """Two THREADS of one process committing to the same table: the
    pid-only tmp name previously collided (one thread could publish the
    other's payload); now each commit lands with its own content."""
    import threading

    wh.insert_overwrite(_day_rows(spark, {"2024-01-01": [(1, 1.0)]}), "tt")
    errs = []

    def commit(tag):
        try:
            wh._commit_snapshot("tt", f"op-{tag}", [f"f-{tag}"], [])
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=commit, args=(i,)) for i in range(4)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    snaps = wh.snapshots("tt")
    assert [s["snapshot_id"] for s in snaps] == list(range(1, 6))
    added = [f for s in snaps[1:] for f in s["added_files"]]
    assert sorted(added) == [f"f-{i}" for i in range(4)]


def test_expiry_keeps_log_replay_consistent_mid_rewrite(spark, wh):
    """The expiry baseline carries removed_files for every pre-cut file it
    does not re-add, so a replay that still sees the old prefix (the
    mid-rewrite window) yields exactly the retained state."""
    import json as _json
    import os

    for i, ds in enumerate(["2024-01-01", "2024-01-02", "2024-01-01"]):
        wh.insert_overwrite(_day_rows(spark, {ds: [(i, float(i))]}), "ex")
    want = {(r["ds"], r["user_id"], r["value"])
            for r in wh.read("ex").collect()}
    wh.expire_snapshots("ex", retain_last=1, grace_seconds=0)
    sdir = wh._snapshot_dir("ex")
    snaps = wh.snapshots("ex")
    assert len(snaps) == 1 and snaps[0]["operation"] == "expire"
    # replay-exactness invariant: baseline adds ∪ removes covers every
    # file any pre-cut snapshot referenced
    base = snaps[0]
    assert set(base["added_files"]).isdisjoint(base["removed_files"])
    assert {(r["ds"], r["user_id"], r["value"])
            for r in wh.read("ex").collect()} == want
