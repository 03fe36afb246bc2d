"""Persistable mergeable sketch IRs (reference parity:
SimpleAggregators.scala:400-491 CPC unique, :499-585 KLL percentile —
bounded binary partials persisted to IR tables and merged across jobs).

The numpy KLL is validated against exact quantiles (rank-error bound),
its serde round-trips bit-exactly, and the Spark IR tables demonstrate
the cross-JOB workflow: two jobs each build partials over half the date
range, a third merges the unioned IR tables and matches a single-pass
computation over the full range.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from chronon_spark.operators.sketches import (
    KLL,
    FrequentStrings,
    merge_frequent_irs,
    merge_quantile_irs,
    merge_unique_irs,
    write_frequent_ir,
    write_quantile_ir,
    write_unique_ir,
)


def exact_q(vals: np.ndarray, p: float) -> float:
    """Engine-pinned convention: value at rank max(1, ceil(p*n))."""
    s = np.sort(vals)
    return float(s[max(1, int(np.ceil(p * len(s)))) - 1])


class TestKLLUnit:
    def test_exact_when_small(self):
        sk = KLL(k=200)
        vals = np.arange(100, dtype=np.float64)
        sk.update_many(vals)
        for p in (0.1, 0.5, 0.9, 0.99):
            assert sk.quantile(p) == exact_q(vals, p)

    def test_rank_error_bounded(self):
        rng = np.random.default_rng(7)
        vals = rng.lognormal(0, 2, size=200_000)
        sk = KLL(k=200)
        sk.update_many(vals)
        s = np.sort(vals)
        for p in (0.05, 0.25, 0.5, 0.75, 0.95):
            est = sk.quantile(p)
            # rank of the estimate must be within ~3/k of p
            rank = np.searchsorted(s, est) / len(s)
            assert abs(rank - p) < 3.0 / 200, (p, rank)

    def test_serde_roundtrip_bit_exact(self):
        rng = np.random.default_rng(11)
        sk = KLL(k=64)
        sk.update_many(rng.normal(size=5000))
        blob = sk.to_bytes()
        sk2 = KLL.from_bytes(blob)
        assert sk2.n == sk.n
        assert sk2.to_bytes() == blob
        for p in (0.1, 0.5, 0.9):
            assert sk2.quantile(p) == sk.quantile(p)

    def test_merge_matches_union(self):
        rng = np.random.default_rng(3)
        a, b = rng.normal(size=50_000), rng.normal(3, 1, size=50_000)
        ska, skb = KLL(k=200), KLL(k=200)
        ska.update_many(a)
        skb.update_many(b)
        merged = ska.merge(skb)
        assert merged.n == 100_000
        s = np.sort(np.concatenate([a, b]))
        for p in (0.25, 0.5, 0.75):
            rank = np.searchsorted(s, merged.quantile(p)) / len(s)
            assert abs(rank - p) < 4.0 / 200

    def test_empty_and_single(self):
        sk = KLL()
        assert sk.quantile(0.5) is None
        sk.update(42.0)
        assert sk.quantile(0.5) == 42.0
        rt = KLL.from_bytes(sk.to_bytes())
        assert rt.quantile(0.99) == 42.0


@pytest.fixture(scope="module")
def events(spark):
    rng = np.random.default_rng(19)
    n = 40_000
    pdf = pd.DataFrame(
        {
            "user_id": rng.integers(0, 50, n),
            "value": rng.lognormal(1, 1.5, n),
            "ds": np.where(
                rng.random(n) < 0.5, "2024-01-0" + pd.Series(rng.integers(1, 5, n)).astype(str),
                "2024-01-0" + pd.Series(rng.integers(5, 9, n)).astype(str),
            ),
        }
    )
    return spark.createDataFrame(pdf), pdf


class TestQuantileIRTable:
    def test_cross_job_merge_matches_single_pass(self, spark, events):
        df, pdf = events
        # job 1 and job 2 backfill DISJOINT date ranges independently
        job1 = write_quantile_ir(df.where(F.col("ds") < "2024-01-05"), ["user_id"], "value", k=256)
        job2 = write_quantile_ir(df.where(F.col("ds") >= "2024-01-05"), ["user_id"], "value", k=256)
        # a later job merges the persisted IR tables (round-trip through
        # parquet-style binary payloads is exactly what union carries)
        merged = merge_quantile_irs(job1.unionByName(job2), ["user_id"], [0.5, 0.95]).toPandas()
        assert len(merged) == pdf["user_id"].nunique()
        for _, row in merged.iterrows():
            vals = pdf.loc[pdf.user_id == row.user_id, "value"].to_numpy()
            for pct, col in ((0.5, "p50"), (0.95, "p95")):
                s = np.sort(vals)
                rank = np.searchsorted(s, row[col], side="right") / len(s)
                assert abs(rank - pct) < 0.05, (row.user_id, pct, rank)

    def test_ir_is_bounded(self, spark, events):
        df, _ = events
        ir = write_quantile_ir(df, ["user_id"], "value", k=64).toPandas()
        # every payload bounded: ~k anchors per level chain, 8B each
        assert ir["kll_ir"].map(len).max() < 64 * 8 * 6

    def test_exact_in_small_regime(self, spark):
        pdf = pd.DataFrame({"user_id": [1] * 20, "value": list(range(20)), "ds": ["2024-01-01"] * 20})
        ir = write_quantile_ir(spark.createDataFrame(pdf), ["user_id"], "value", k=256)
        out = merge_quantile_irs(ir, ["user_id"], [0.5]).toPandas()
        assert out.loc[0, "p50"] == exact_q(np.arange(20), 0.5)


class TestUniqueIRTable:
    def test_cross_job_hll_union(self, spark, events):
        df, pdf = events
        job1 = write_unique_ir(df.where(F.col("ds") < "2024-01-05"), ["user_id"], "value")
        job2 = write_unique_ir(df.where(F.col("ds") >= "2024-01-05"), ["user_id"], "value")
        got = merge_unique_irs(job1.unionByName(job2), ["user_id"]).toPandas()
        truth = pdf.groupby("user_id")["value"].nunique()
        for _, row in got.iterrows():
            t = truth[row.user_id]
            assert abs(row.unique_estimate - t) / t < 0.1, (row.user_id, row.unique_estimate, t)


class TestDataSketchesWireFormat:
    """Apache DataSketches KLL-doubles layout (the reference's `KllSketch`
    IR serde, SimpleAggregators.scala:545-585). No datasketches bindings
    ship in this container, so the known-good fixtures below are assembled
    byte-by-byte from the published layout (datasketches-java
    KllPreambleUtil.java) — every field spelled out."""

    def test_parse_handbuilt_full_fixture(self):
        import struct

        # full format: k=200, n=4, one level holding [1,2,3,4]
        payload = (
            struct.pack(
                "<BBBBHBB",
                5,    # preamble_ints (full)
                1,    # serial_version (empty/full)
                15,   # family id = KLL
                2,    # flags: LEVEL_ZERO_SORTED
                200,  # k
                8,    # m
                0,    # unused
            )
            + struct.pack("<QHBB", 4, 200, 1, 0)  # n, min_k, num_levels, unused
            + struct.pack("<I", 0)                # levels[0] offset
            + struct.pack("<dd", 1.0, 4.0)        # min_item, max_item
            + struct.pack("<4d", 1.0, 2.0, 3.0, 4.0)
        )
        sk = KLL.from_datasketches_bytes(payload)
        assert sk.n == 4 and sk.k == 200
        assert sk.quantile(0.5) == 2.0 and sk.quantile(1.0) == 4.0

    def test_parse_handbuilt_two_level_fixture(self):
        import struct

        # two levels: level0=[5.0] (weight 1), level1=[1.0, 9.0] (weight 2)
        # -> weighted stream of n=5: {1,1,5,9,9}
        payload = (
            struct.pack("<BBBBHBB", 5, 1, 15, 2, 128, 8, 0)
            + struct.pack("<QHBB", 5, 128, 2, 0)
            + struct.pack("<II", 7, 8)  # nonzero base offset: free space at front
            + struct.pack("<dd", 1.0, 9.0)
            + struct.pack("<3d", 5.0, 1.0, 9.0)
        )
        sk = KLL.from_datasketches_bytes(payload)
        assert sk.n == 5
        assert [len(l) for l in sk.levels] == [1, 2]
        assert sk.quantile(0.5) == 5.0  # rank 3 of {1,1,5,9,9}
        assert sk.quantile(0.2) == 1.0

    def test_parse_handbuilt_empty_and_single(self):
        import struct

        empty = struct.pack("<BBBBHBB", 2, 1, 15, 1 | 2, 200, 8, 0)
        sk = KLL.from_datasketches_bytes(empty)
        assert sk.n == 0 and sk.quantile(0.5) is None

        single = struct.pack("<BBBBHBB", 2, 2, 15, 4 | 2, 200, 8, 0) + struct.pack("<d", 7.5)
        sk = KLL.from_datasketches_bytes(single)
        assert sk.n == 1 and sk.quantile(0.5) == 7.5

    def test_roundtrip_preserves_quantiles(self):
        rng = np.random.default_rng(23)
        sk = KLL(k=128)
        sk.update_many(rng.lognormal(0, 2, size=50_000))
        rt = KLL.from_datasketches_bytes(sk.to_datasketches_bytes())
        assert rt.n == sk.n and rt.k == sk.k
        for p in (0.05, 0.5, 0.95):
            assert rt.quantile(p) == sk.quantile(p)
        # emitted payload is itself a valid full-format frame
        blob = sk.to_datasketches_bytes()
        assert blob[0] == 5 and blob[1] == 1 and blob[2] == 15

    def test_roundtrip_empty_and_single(self):
        assert KLL.from_datasketches_bytes(KLL(64).to_datasketches_bytes()).n == 0
        one = KLL(64)
        one.update(3.25)
        rt = KLL.from_datasketches_bytes(one.to_datasketches_bytes())
        assert rt.n == 1 and rt.quantile(0.5) == 3.25

    def test_format_sniffing_merges_mixed_tables(self, spark, events):
        """An IR table written in the DataSketches layout unions with an
        engine-layout table; merge_quantile_irs sniffs per payload."""
        df, pdf = events
        job1 = write_quantile_ir(
            df.where(F.col("ds") < "2024-01-05"), ["user_id"], "value",
            k=256, wire_format="datasketches",
        )
        job2 = write_quantile_ir(
            df.where(F.col("ds") >= "2024-01-05"), ["user_id"], "value",
            k=256, wire_format="engine",
        )
        merged = merge_quantile_irs(
            job1.unionByName(job2), ["user_id"], [0.5]
        ).toPandas()
        assert len(merged) == pdf["user_id"].nunique()
        for _, row in merged.iterrows():
            vals = np.sort(pdf.loc[pdf.user_id == row.user_id, "value"].to_numpy())
            rank = np.searchsorted(vals, row.p50, side="right") / len(vals)
            assert abs(rank - 0.5) < 0.05, (row.user_id, rank)

    def test_rejects_foreign_family(self):
        import struct

        hll = struct.pack("<BBBBHBB", 2, 1, 6, 1, 200, 8, 0)  # family 6 = HLL
        with pytest.raises(ValueError, match="family"):
            KLL.from_datasketches_bytes(hll)


class TestFrequentItemsWireFormat:
    """Apache DataSketches ItemsSketch<String> + ArrayOfStringsSerDe
    layout — the exact payload the reference's FrequentItems aggregator
    persists (SimpleAggregators.scala:400-500). Fixtures hand-assembled
    byte-by-byte from datasketches-java frequencies/PreambleUtil.java,
    same strategy as the KLL fixtures above."""

    def test_parse_handbuilt_fixture(self):
        import struct

        # non-empty: lgMax=6, lgCur=3, 2 active items {a:5, bc:2},
        # offset=1, streamLength=9 — every field spelled out
        buf = struct.pack("<BBBBBBH", 4, 1, 10, 6, 3, 0, 0)
        buf += struct.pack("<IIQQ", 2, 0, 9, 1)      # active, _, n, offset
        buf += struct.pack("<qq", 5, 2)              # stored counts
        buf += struct.pack("<I", 1) + b"a"           # ArrayOfStringsSerDe
        buf += struct.pack("<I", 2) + b"bc"
        sk = FrequentStrings.from_datasketches_bytes(buf)
        assert sk.counts == {"a": 5, "bc": 2}
        assert (sk.offset, sk.n, sk.lg_max) == (1, 9, 6)
        # NO_FALSE_NEGATIVES bounds: estimate = stored + offset
        assert sk.estimate("a") == 6 and sk.lower_bound("a") == 5
        assert sk.estimate("missing") == 0

    def test_parse_handbuilt_empty(self):
        import struct

        buf = struct.pack("<BBBBBBH", 1, 1, 10, 7, 3, 4, 0)  # EMPTY flag
        sk = FrequentStrings.from_datasketches_bytes(buf)
        assert sk.counts == {} and sk.n == 0 and sk.lg_max == 7

    def test_roundtrip_bit_exact(self):
        sk = FrequentStrings(6)
        for item, w in [("x", 40), ("y", 7), ("züm", 3), ("w", 1)]:
            sk.update(item, w)
        raw = sk.to_datasketches_bytes()
        back = FrequentStrings.from_datasketches_bytes(raw)
        assert back.counts == sk.counts
        assert (back.offset, back.n) == (sk.offset, sk.n)
        assert back.to_datasketches_bytes() == raw
        empty = FrequentStrings(5)
        assert FrequentStrings.from_datasketches_bytes(
            empty.to_datasketches_bytes()).counts == {}

    def test_all_purged_serializes_empty_like_java(self):
        # ItemsSketch.toByteArray keys EMPTY on numActive == 0, not on
        # streamLength: equal-count updates that purge everything must
        # produce the 1-long EMPTY preamble, byte-identical to java
        sk = FrequentStrings(3)
        for i in range(7):
            sk.update(f"i{i}")
        assert sk.counts == {} and sk.offset > 0 and sk.n == 7
        raw = sk.to_datasketches_bytes()
        assert raw[0] == 1 and raw[5] & 4  # preLongs=1, EMPTY flag
        back = FrequentStrings.from_datasketches_bytes(raw)
        assert back.counts == {} and back.n == 0

    def test_reference_sizing_rule(self):
        # SimpleAggregators.scala:404-412: mapSize=10 -> ceil(10/0.375)=27
        # -> next power of two 32 -> lg 5
        assert FrequentStrings.for_map_size(10).lg_max == 5
        assert FrequentStrings.for_map_size(128).lg_max == 9  # 342 -> 512

    def test_bounds_hold_under_purging(self):
        rng = np.random.default_rng(7)
        # zipf-ish stream far wider than the map: purges must fire
        items = [f"i{v}" for v in rng.zipf(1.3, 20_000) if v < 5_000]
        sk = FrequentStrings(4)  # cap 12 — tiny on purpose
        truth: dict = {}
        for it in items:
            sk.update(it)
            truth[it] = truth.get(it, 0) + 1
        assert sk.offset > 0 and sk.n == len(items)
        for it, stored in sk.counts.items():
            # stored <= true <= stored + offset (no false negatives)
            assert stored <= truth[it] <= stored + sk.offset, it
        # survivors after heavy purging are genuinely heavy
        top_truth = sorted(truth.values())[-1]
        assert max(sk.counts.values()) + sk.offset >= top_truth

    def test_merge_matches_union_in_exact_regime(self):
        a, b = FrequentStrings(8), FrequentStrings(8)
        truth: dict = {}
        for sk, stream in ((a, "abcabca"), (b, "ccbbbdd")):
            for ch in stream:
                sk.update(ch)
                truth[ch] = truth.get(ch, 0) + 1
        merged = a.merge(FrequentStrings.from_datasketches_bytes(
            b.to_datasketches_bytes()))
        assert merged.offset == 0  # no purge -> exact
        assert merged.frequent_items() == truth
        assert merged.frequent_items(map_size=2) == {"b": 5, "c": 4}

    def test_roundtrip_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        items = st.dictionaries(
            st.text(min_size=1, max_size=12),  # full unicode incl. multibyte
            st.integers(min_value=1, max_value=2**40),
            min_size=0, max_size=24)

        @settings(max_examples=150, deadline=None)
        @given(items, st.integers(0, 2**30), st.integers(6, 12))
        def check(counts, offset, lg_max):
            sk = FrequentStrings(lg_max)
            sk.counts = dict(counts)
            sk.offset = offset
            sk.n = sum(counts.values()) + offset * max(1, len(counts))
            raw = sk.to_datasketches_bytes()
            back = FrequentStrings.from_datasketches_bytes(raw)
            if not counts:
                # java parity: numActive == 0 serializes as EMPTY
                # (n/offset intentionally dropped, like ItemsSketch)
                assert raw[0] == 1 and back.counts == {} and back.n == 0
            else:
                assert back.counts == sk.counts
                assert (back.offset, back.n, back.lg_max) == (
                    sk.offset, sk.n, sk.lg_max)
            # re-serialization is byte-stable and consumes every byte
            assert back.to_datasketches_bytes() == raw

        check()

    def test_ir_table_cross_job_merge(self, spark):
        pdf = pd.DataFrame({
            "user_id": [1] * 8 + [2] * 6,
            "item": list("aabbbcdd") + list("xxxyyz"),
            "ds": ["2024-01-01"] * 4 + ["2024-01-02"] * 4
                  + ["2024-01-01"] * 3 + ["2024-01-02"] * 3,
        })
        df = spark.createDataFrame(pdf)
        job1 = write_frequent_ir(df.where("ds = '2024-01-01'"),
                                 ["user_id"], "item", map_size=16)
        job2 = write_frequent_ir(df.where("ds = '2024-01-02'"),
                                 ["user_id"], "item", map_size=16)
        got = merge_frequent_irs(job1.unionByName(job2), ["user_id"], k=2)
        rows = {(r.user_id, r.item): r.estimate for r in got.collect()}
        # exact regime (map >> distinct): top-2 per key by true count,
        # the a/d tie at count 2 broken by item DESC (finalize order)
        assert rows == {(1, "b"): 3, (1, "d"): 2, (2, "x"): 3, (2, "y"): 2}
