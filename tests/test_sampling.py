"""Deterministic sampling / splitting / mixing / packing / decontamination.

Membership checks are EXACT: a pure-Python replica of the cross-engine
rolling hash predicts every row's bucket, so tests assert the precise
surviving set, not statistical bounds."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from chronon_spark.operators.dedup import decontaminate
from chronon_spark.operators.sampling import (
    BUCKETS,
    hash_bucket,
    hash_split,
    pack_sequences,
    stratified_sample,
    weighted_mix,
)

FP_MOD = 1_000_000_007
FP_BASE = 131


def py_bucket(ident, salt: str) -> int:
    h = 0
    for ch in f"{ident}:{salt}":
        h = (h * FP_BASE + ord(ch)) % FP_MOD
    return h % BUCKETS


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"doc text {i} " + "word " * (i % 7), ["en", "de", "fr"][i % 3])
            for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_hash_bucket_matches_python_replica(spark, docs):
    got = {
        r["doc_id"]: r["b"]
        for r in docs.select(
            "doc_id", hash_bucket(F.col("doc_id"), "s1").alias("b")
        ).collect()
    }
    assert got == {i: py_bucket(i, "s1") for i in range(300)}


def test_hash_split_exact_and_stable(spark, docs):
    out = hash_split(docs, "doc_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)])
    got = {r["doc_id"]: r["split"] for r in out.collect()}

    def expect(i):
        b = py_bucket(i, "split")
        return "train" if b < 8000 else ("val" if b < 9000 else "test")

    assert got == {i: expect(i) for i in range(300)}
    # deterministic across invocations
    again = {r["doc_id"]: r["split"] for r in
             hash_split(docs, "doc_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)]).collect()}
    assert again == got


def test_hash_split_rejects_bad_fractions(docs):
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", [("a", 0.5), ("b", 0.1)])


def test_stratified_sample_exact_membership(spark, docs):
    fr = {"en": 0.5, "de": 0.1}
    out = stratified_sample(docs, "lang", fr, "doc_id", salt="s2",
                            default_fraction=0.25)
    got = sorted(r["doc_id"] for r in out.collect())
    langs = ["en", "de", "fr"]
    want = sorted(
        i for i in range(300)
        if py_bucket(i, "s2") < round(fr.get(langs[i % 3], 0.25) * BUCKETS)
    )
    assert got == want


def test_weighted_mix_repetition_semantics(spark, docs):
    a = docs.where("doc_id < 100")
    b = docs.where("doc_id >= 100")
    out = weighted_mix([("a", a, 2.3), ("b", b, 0.5)], "doc_id", salt="m")
    counts = {
        (r["doc_id"]): r["cnt"]
        for r in out.groupBy("doc_id").agg(F.count("*").alias("cnt")).collect()
    }
    for i in range(100):  # source a: 2 full copies + 30% fractional
        want = 2 + (1 if py_bucket(i, "m:a") < 3000 else 0)
        assert counts.get(i, 0) == want, i
    for i in range(100, 300):  # source b: 50% single sample
        want = 1 if py_bucket(i, "m:b") < 5000 else 0
        assert counts.get(i, 0) == want, i
    # copies are labeled 0..k
    lab = out.where("doc_id < 100").groupBy("mix_copy").count().collect()
    assert {r["mix_copy"] for r in lab} == {0, 1, 2}


def _naive_pack(tokens, budget):
    bins, b, acc = [], 0, 0
    for t in tokens:
        if acc + t > budget and acc > 0:
            b += 1
            acc = 0
        bins.append(b)
        acc += t
    return bins


@pytest.mark.parametrize("budget", [100, 512, 10_000])
def test_pack_sequences_matches_naive_fold(spark, budget):
    rng = np.random.RandomState(3)
    rows = []
    for k in ("a", "b", "c"):
        toks = rng.randint(1, 300, size=200)
        toks[::37] = budget + 50  # oversized docs get their own bin
        rows += [(k, i, int(t)) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, "k string, doc_id long, tokens long")
    out = pack_sequences(df, "doc_id", "tokens", budget, key_col="k")
    got = {(r["pack_key"], r["id"]): r["bin"] for r in out.collect()}
    for k in ("a", "b", "c"):
        toks = [t for kk, i, t in rows if kk == k]
        want = _naive_pack(toks, budget)
        for i, wb in enumerate(want):
            assert got[(k, i)] == wb, (k, i)
    # no bin over budget unless it is a singleton oversized doc
    sums = out.groupBy("pack_key", "bin").agg(
        F.sum("tokens").alias("s"), F.count("*").alias("n")).collect()
    for r in sums:
        assert r["s"] <= budget or r["n"] == 1


def test_pack_boundary_exact_fit(spark):
    # acc + t == budget fits (strict > opens a bin)
    df = spark.createDataFrame(
        [("k", 0, 60), ("k", 1, 40), ("k", 2, 1)], "k string, doc_id long, tokens long"
    )
    out = {r["id"]: r["bin"] for r in
           pack_sequences(df, "doc_id", "tokens", 100, key_col="k").collect()}
    assert out == {0: 0, 1: 0, 2: 1}


def test_decontaminate_planted_overlap(spark):
    marker = "zqxjkvbnmpwrtyu_unique_marker_phrase"
    train = spark.createDataFrame(
        [
            (0, f"clean document about sorting algorithms alpha beta"),
            (1, f"this one contains the {marker} inside its body"),
            (2, f"another clean text entirely disjoint vocabulary"),
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, f"benchmark question mentioning {marker} verbatim")],
        "doc_id long, text string",
    )
    out = decontaminate(train, eval_df, "doc_id", "text", n=20)
    got = {r["doc_id"]: (r["contaminated"], r["eval_overlap"]) for r in out.collect()}
    assert got[1][0] and got[1][1] > 0
    assert not got[0][0] and got[0][1] == 0
    assert not got[2][0] and got[2][1] == 0
    # min_overlap raises the bar
    strict = decontaminate(train, eval_df, "doc_id", "text", n=20,
                           min_overlap=got[1][1] + 1)
    assert not {r["doc_id"]: r["contaminated"] for r in strict.collect()}[1]


def test_shingle_fp_np_matches_catalyst_for_long_n(spark):
    """n > 8 overflow fix: numpy shingle fingerprints == Catalyst running
    mod, bit for bit."""
    from chronon_spark.operators.dedup import shingle_fps, with_shingle_fps_arrow

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(80)
    native = docs.select(
        F.col("doc_id").alias("id"),
        F.array_sort(shingle_fps(F.col("text"), 20)).alias("sh"),
    )
    arrow = with_shingle_fps_arrow(docs, "doc_id", "text", 20).select(
        "id", F.array_sort("sh").alias("sh2")
    )
    assert native.join(arrow, "id").where("sh != sh2").count() == 0


def test_sampling_plans_are_scan_stage(spark, docs):
    """The zero-shuffle claims, plan-asserted: split/sample/mix compile to
    scans + projections/filters/union — no Exchange anywhere."""
    plans = {
        "split": hash_split(docs, "doc_id"),
        "sample": stratified_sample(docs, "lang", {"en": 0.5}, "doc_id"),
        "mix": weighted_mix(
            [("a", docs.where("doc_id < 150"), 1.5),
             ("b", docs.where("doc_id >= 150"), 0.5)],
            "doc_id",
        ),
    }
    for name, df in plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, (name, plan[:500])


def test_curate_corpus_invariants(spark):
    """Composed pipeline sanity: every cluster has exactly one canonical
    (the min id), survivors are uncontaminated and above their lang's
    median quality, and split labels are the deterministic hash cut."""
    from chronon_spark.operators.corpus import curate_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = curate_corpus(
        docs.where("doc_id % 50 != 0"), docs.where("doc_id % 50 = 0")
    ).collect()
    assert out
    by_cluster = {}
    for r in out:
        assert r["eval_overlap"] < 3
        by_cluster.setdefault(r["cluster_id"], []).append(r)
        assert r["split"] == (
            "train" if py_bucket(r["doc_id"], "split") < 9000
            else "val" if py_bucket(r["doc_id"], "split") < 9500 else "test"
        )
    for cid, members in by_cluster.items():
        canon = [m for m in members if m["is_canonical"]]
        assert len(canon) == 1 and canon[0]["doc_id"] == cid == min(
            m["doc_id"] for m in members
        )


def test_weighted_mix_rejects_plan_blowup_epochs(docs):
    with pytest.raises(ValueError):
        weighted_mix([("a", docs, 33.0)], "doc_id")


# ---------------------------------------------------------------- budget


def _naive_budget(rows, budget):
    """Python replica of the naive prefix rule the oracle runs."""
    kept = set()
    by_src: dict = {}
    for i, src, tok in rows:
        by_src.setdefault(src, []).append((py_bucket(i, "budget"), i, tok))
    for src, lst in by_src.items():
        cum = 0
        for _, i, tok in sorted(lst):
            cum += tok
            if cum <= budget:
                kept.add(i)
    return kept


def _budget_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens long"
    )


def test_token_budget_matches_naive_prefix(spark):
    from chronon_spark.operators.sampling import token_budget_sample

    rng = np.random.default_rng(3)
    rows = [(i, f"s{i % 5}", int(rng.integers(0, 40))) for i in range(400)]
    df = _budget_df(spark, rows)
    for budget in (0, 37, 150, 10_000):
        got = {
            r["doc_id"]
            for r in token_budget_sample(df, budget, "n_tokens").collect()
        }
        assert got == _naive_budget(rows, budget), budget


def test_token_budget_zero_token_docs_at_exact_boundary(spark):
    """A doc with 0 tokens whose prefix lands EXACTLY on the budget is
    kept (cumulative stays == budget) — the <= vs < edge in the
    two-phase bucket plan."""
    from chronon_spark.operators.sampling import token_budget_sample

    rows = [(i, "s", t) for i, t in [(1, 5), (2, 5), (3, 0), (4, 7), (5, 0)]]
    # budget equal to some prefix sum in hash order
    order = sorted((py_bucket(i, "budget"), i, t) for i, t, in
                   [(r[0], r[2]) for r in rows])
    prefix = 0
    for k, (_, i, t) in enumerate(order):
        prefix += t
        if t > 0 and k < len(order) - 1:
            budget = prefix
            break
    df = _budget_df(spark, rows)
    got = {r["doc_id"] for r in
           token_budget_sample(df, budget, "n_tokens").collect()}
    assert got == _naive_budget(rows, budget)
    # every zero-token doc whose prefix is <= budget must be present
    cum = 0
    for _, i, t in order:
        cum += t
        if t == 0 and cum <= budget:
            assert i in got


def test_token_budget_keeps_all_when_budget_exceeds_total(spark):
    from chronon_spark.operators.sampling import token_budget_sample

    rows = [(i, f"s{i % 3}", 10) for i in range(30)]
    out = token_budget_sample(_budget_df(spark, rows), 1_000, "n_tokens")
    assert out.count() == 30
    assert set(out.columns) == {"doc_id", "source", "n_tokens"}


# ---------------------------------------------------------------- chunking


def test_chunk_documents_boundaries_and_overlap(spark):
    from chronon_spark.operators.sampling import chunk_documents

    text = " ".join(f"w{i}" for i in range(25))
    docs = spark.createDataFrame(
        [(1, text), (2, "a b"), (3, "   "), (4, None), (5, "x " * 8)],
        "doc_id long, text string",
    )
    out = sorted(
        ((r["doc_id"], r["chunk_idx"], r["n_chunk_tokens"], r["chunk_text"])
         for r in chunk_documents(docs, 10, overlap=2).collect())
    )
    # doc 1: 25 tokens, step 8 -> chunks at 0/8/16, tail has 9
    assert [(d, i, n) for d, i, n, _ in out if d == 1] == [
        (1, 0, 10), (1, 1, 10), (1, 2, 9)]
    chunks1 = {i: t for d, i, _, t in out if d == 1}
    assert chunks1[0].split() == [f"w{i}" for i in range(10)]
    assert chunks1[1].split() == [f"w{i}" for i in range(8, 18)]
    assert chunks1[2].split() == [f"w{i}" for i in range(16, 25)]
    # overlap: last 2 tokens of chunk 0 open chunk 1
    assert chunks1[0].split()[-2:] == chunks1[1].split()[:2]
    # short doc -> one chunk; blank/NULL docs -> no rows
    assert [(d, i, n) for d, i, n, _ in out if d == 2] == [(2, 0, 2)]
    assert not any(d in (3, 4) for d, _, _, _ in out)
    # trailing-whitespace doc: trim first, 8 tokens -> one chunk
    assert [(d, i, n) for d, i, n, _ in out if d == 5] == [(5, 0, 8)]


def test_chunk_documents_rejects_bad_overlap(spark):
    from chronon_spark.operators.sampling import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, 10, overlap=10)
    with pytest.raises(ValueError):
        chunk_documents(docs, 10, overlap=-1)


def test_chunk_documents_zero_shuffle_plan(spark):
    """The chunk plan must stay scan-stage: no Exchange anywhere."""
    from chronon_spark.operators.sampling import chunk_documents

    docs = spark.createDataFrame(
        [(i, "tok " * 50) for i in range(10)], "doc_id long, text string"
    )
    plan = chunk_documents(docs, 16, overlap=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
