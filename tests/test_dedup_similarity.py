"""Dedup + similarity operator tests: planted duplicates, recall vs exact
oracles, determinism."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    """Synthetic docs with PLANTED near-duplicates: pairs (i, i+500) share
    most of their text with a small edit."""
    rng = np.random.default_rng(3)
    words = ["spark", "feature", "engine", "window", "join", "event", "image",
             "caption", "data", "pipeline", "batch", "stream", "key", "value"]
    rows = []
    for i in range(60):
        n = int(rng.integers(20, 40))
        toks = [words[int(rng.integers(0, len(words)))] for _ in range(n)]
        text = " ".join(toks)
        rows.append((i, text))
        if i < 20:  # plant a near-dup: drop last 2 tokens, add one
            rows.append((i + 500, " ".join(toks[:-2] + ["extra"])))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_first_and_counts(spark):
    from chronon_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "a")], "id long, t string"
    )
    out = {r["t"]: r for r in exact_dedup(df, ["t"], "id").collect()}
    assert out["a"]["id"] == 1 and out["a"]["dup_count"] == 3
    assert out["b"]["id"] == 3 and out["b"]["dup_count"] == 1
    last = {r["t"]: r for r in exact_dedup(df, ["t"], "id", keep="last").collect()}
    assert last["a"]["id"] == 4


def test_ngram_jaccard_finds_planted_pairs(spark, corpus):
    from chronon_spark.operators.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(corpus, "doc_id", "text", n=8, threshold=0.5).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    planted = {(i, i + 500) for i in range(20)}
    assert planted <= found, f"missing planted pairs: {planted - found}"


def test_minhash_recall_vs_exact(spark, corpus):
    from chronon_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(corpus, "doc_id", "text", n=8, threshold=0.5).collect()
    }
    mh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(corpus, "doc_id", "text", n=8, threshold=0.5).collect()
    }
    # verified candidates are a SUBSET of exact pairs (no false positives)...
    assert mh <= exact
    # ...with high recall at j >= 0.5 (P(miss) < 1e-3 per pair at r=4,b=16)
    assert len(mh) >= 0.9 * len(exact)


def test_simhash_near_vs_far(spark):
    from chronon_spark.operators.dedup import simhash64_py

    a = simhash64_py("the quick brown fox jumps over the lazy dog " * 3)
    b = simhash64_py("the quick brown fox jumps over the lazy cat " * 3)
    c = simhash64_py("completely unrelated content about query engines!!")

    def ham(x, y):
        return bin((x ^ y) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert ham(a, b) <= 16 < ham(a, c)  # near-dup clearly below unrelated


def test_simhash_pairs_match_bruteforce(spark, corpus):
    """Banded candidate generation must find EVERY pair within the hamming
    budget (pigeonhole guarantee) — compare against the quadratic scan."""
    from chronon_spark.operators.dedup import simhash64_py, simhash_pairs

    rows = corpus.collect()
    hashes = {r["doc_id"]: simhash64_py(r["text"]) for r in rows}

    def ham(x, y):
        return bin((x ^ y) & 0xFFFFFFFFFFFFFFFF).count("1")

    ids = sorted(hashes)
    expected = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if ham(hashes[a], hashes[b]) <= 6
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(corpus, "doc_id", "text", max_hamming=6).collect()
    }
    assert got == expected


def test_bruteforce_topk_matches_numpy(spark):
    from chronon_spark.operators.similarity import brute_force_topk

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(200, 16)).astype(np.float64)
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(200)], "vec_id long, embedding array<double>"
    )
    qs = [(0, vecs[0].tolist()), (7, vecs[7].tolist())]
    out = brute_force_topk(df, qs, k=5).collect()
    Vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    for qid in (0, 7):
        sims = Vn @ Vn[qid]
        expect = set(np.argsort(-sims)[:5].tolist())
        got = {r["vec_id"] for r in out if r["query_id"] == qid}
        assert got == expect
        # self always rank 1
        top = [r for r in out if r["query_id"] == qid and r["rank"] == 1][0]
        assert top["vec_id"] == qid and top["cosine"] == pytest.approx(1.0, abs=1e-6)


def test_lsh_topk_recall_on_clustered_data(spark):
    """LSH ANN must achieve high recall when true neighbors are close
    (clustered data — the realistic near-dup regime)."""
    from chronon_spark.operators.similarity import brute_force_topk, lsh_topk

    rng = np.random.default_rng(9)
    centers = rng.normal(size=(10, 16)) * 3
    vecs = np.vstack([
        centers[i % 10] + rng.normal(size=16) * 0.3 for i in range(300)
    ])
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(300)], "vec_id long, embedding array<double>"
    )
    qs = [(0, vecs[0].tolist()), (5, vecs[5].tolist())]
    bf = {(r["query_id"], r["vec_id"]) for r in brute_force_topk(df, qs, k=10).collect()}
    ann = {(r["query_id"], r["vec_id"])
           for r in lsh_topk(df, qs, k=10, planes=10, probes=3).collect()}
    recall = len(bf & ann) / len(bf)
    assert recall >= 0.8, f"recall {recall}"


def test_embedding_neardup_planted(spark):
    from chronon_spark.operators.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(13)
    base = rng.normal(size=(50, 16))
    rows = [(i, base[i].tolist()) for i in range(50)]
    # plant near-dups: tiny perturbations of vectors 0..9
    for i in range(10):
        rows.append((i + 100, (base[i] + rng.normal(size=16) * 0.01).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = embedding_neardup_pairs(df, "vec_id", "embedding", threshold=0.98, planes=8)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    planted = {(i, i + 100) for i in range(10)}
    assert planted <= found


def test_hyperplane_sketch_high_dim(spark):
    """dim-512 sketch: the Arrow matmul path keeps the plan flat (one UDF
    node, no planes x dim Catalyst unroll) and recall holds; NULL/ragged
    vectors sketch to NULL instead of crashing."""
    from chronon_spark.operators.dedup import embedding_neardup_pairs
    from chronon_spark.operators.similarity import hyperplane_bits

    rng = np.random.default_rng(31)
    dim = 512
    base = rng.normal(size=(40, dim))
    rows = [(i, base[i].tolist()) for i in range(40)]
    for i in range(8):  # planted near-dups
        rows.append((i + 100, (base[i] + rng.normal(size=dim) * 0.005).tolist()))
    rows.append((999, None))            # null vector
    rows.append((998, [1.0, 2.0]))      # ragged vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    sk = df.select(hyperplane_bits(F.col("embedding"), dim, 16).alias("bits"))
    plan = sk._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 4000, "sketch plan should be one UDF node, not an unroll"
    got = {r["vec_id"]: r["bits"] for r in df.select(
        "vec_id", hyperplane_bits(F.col("embedding"), dim, 16).alias("bits")).collect()}
    assert got[999] is None and got[998] is None

    pairs = embedding_neardup_pairs(
        df.where(F.col("vec_id") < 500), "vec_id", "embedding",
        threshold=0.99, planes=8, dim=dim)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert {(i, i + 100) for i in range(8)} <= found


def test_embedding_neardup_bucket_cap(spark):
    """A degenerate cluster (identical sketch bucket) larger than
    max_bucket is dropped instead of going quadratic."""
    from chronon_spark.operators.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(17)
    v = rng.normal(size=8)
    rows = [(i, (v + rng.normal(size=8) * 1e-6).tolist()) for i in range(30)]
    rows += [(100, rng.normal(size=8).tolist()), (101, rng.normal(size=8).tolist())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = embedding_neardup_pairs(
        df, "vec_id", "embedding", threshold=0.9, planes=8, dim=8, max_bucket=10)
    got = pairs.collect()
    # the 30-row degenerate bucket (435 pairs) was dropped entirely
    assert not any(r["id_a"] < 100 and r["id_b"] < 100 for r in got)


def test_ivf_topk_full_probe_equals_brute_force(spark):
    """nprobe >= n_centroids probes every cell, so IVF must reproduce the
    exact brute-force ranking bit-for-bit (the driver oracle's regime)."""
    from chronon_spark.operators.similarity import brute_force_topk, ivf_topk

    rng = np.random.default_rng(17)
    vecs = rng.normal(size=(250, 16)).astype(np.float64)
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(250)], "vec_id long, embedding array<double>"
    )
    qs = [(0, vecs[0].tolist()), (3, vecs[3].tolist())]
    bf = [tuple(r) for r in brute_force_topk(df, qs, k=8).orderBy("query_id", "rank").collect()]
    fu = [tuple(r) for r in ivf_topk(df, qs, k=8, n_centroids=12, nprobe=12)
          .orderBy("query_id", "rank").collect()]
    assert bf == fu


def test_ivf_topk_recall_on_clustered_data(spark):
    """Partial probe (the scale path) keeps high recall on clustered
    data: neighbors of a query concentrate in the query's nearest cells."""
    from chronon_spark.operators.similarity import brute_force_topk, ivf_topk

    rng = np.random.default_rng(21)
    centers = rng.normal(size=(10, 16)) * 3
    vecs = np.vstack([
        centers[i % 10] + rng.normal(size=16) * 0.3 for i in range(300)
    ])
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(300)], "vec_id long, embedding array<double>"
    )
    qs = [(0, vecs[0].tolist()), (5, vecs[5].tolist())]
    bf = {(r["query_id"], r["vec_id"]) for r in brute_force_topk(df, qs, k=10).collect()}
    ann = {(r["query_id"], r["vec_id"])
           for r in ivf_topk(df, qs, k=10, n_centroids=20, nprobe=4).collect()}
    recall = len(bf & ann) / len(bf)
    assert recall >= 0.8, f"recall {recall}"


def test_kmeans_centroids_deterministic():
    from chronon_spark.operators.similarity import kmeans_centroids

    rng = np.random.default_rng(3)
    X = rng.normal(size=(400, 8))
    C1 = kmeans_centroids(X, 16, iters=10, seed=7)
    C2 = kmeans_centroids(X, 16, iters=10, seed=7)
    assert np.array_equal(C1, C2)
    assert np.allclose(np.linalg.norm(C1, axis=1), 1.0)


@pytest.mark.parametrize("local_threshold", [2_000_000, 0])
def test_connected_components_chain(spark, local_threshold):
    """Both tiers: the driver union-find gate (default) and the
    distributed large-star/small-star rounds (gate disabled)."""
    from chronon_spark.operators.dedup import connected_components

    # path graph 1-2-3-4-5-6: min label must propagate the full diameter
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)] + [(10, 11)], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(
            pairs, local_threshold=local_threshold
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 10: 10, 11: 10}


def test_connected_components_tiers_agree(spark):
    """Random graph: the local numpy tier and the distributed star tier
    produce identical labels (incl. string ids)."""
    from chronon_spark.operators.dedup import connected_components

    rng = np.random.default_rng(11)
    edges = [
        (f"d{int(a):03d}", f"d{int(b):03d}")
        for a, b in rng.integers(0, 120, size=(300, 2))
        if a != b
    ]
    pairs = spark.createDataFrame(edges, "id_a string, id_b string")
    local = {
        r["id"]: r["cluster_id"] for r in connected_components(pairs).collect()
    }
    dist = {
        r["id"]: r["cluster_id"]
        for r in connected_components(pairs, local_threshold=0).collect()
    }
    assert local == dist


def test_resolve_duplicate_clusters(spark):
    from chronon_spark.operators.dedup import resolve_duplicate_clusters

    df = spark.createDataFrame(
        [(i, f"doc{i}") for i in [1, 2, 3, 7, 8, 9]], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    out = resolve_duplicate_clusters(df, pairs, "doc_id").collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["cluster_id"] == 1 and by_id[1]["is_canonical"]
    assert by_id[3]["cluster_id"] == 1 and not by_id[3]["is_canonical"]
    assert by_id[8]["cluster_id"] == 7 and not by_id[8]["is_canonical"]
    # 9 appears in no pair: singleton, canonical
    assert by_id[9]["cluster_id"] == 9 and by_id[9]["is_canonical"]
    keep = [r["doc_id"] for r in out if r["is_canonical"]]
    assert sorted(keep) == [1, 7, 9]


def test_hamming_pairs_property_vs_bruteforce(spark):
    """Property test (hypothesis): for arbitrary 64-bit hash populations —
    including adversarial near-collision clusters — banded hamming_pairs
    equals numpy brute force at every radius 0..3 (recall AND precision 1)."""
    from hypothesis import given, settings, strategies as st

    from chronon_spark.operators.dedup import hamming_pairs

    i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
    # mix free-range hashes with perturbations of a shared base so small
    # hamming distances actually occur
    @st.composite
    def hash_pop(draw):
        base = draw(i64)
        n = draw(st.integers(min_value=2, max_value=24))
        out = []
        for i in range(n):
            if draw(st.booleans()):
                bits = draw(st.sets(st.integers(0, 63), max_size=3))
                u = base & (2**64 - 1)
                for b in bits:
                    u ^= 1 << b
                out.append(u - (1 << 64) if u >= (1 << 63) else u)
            else:
                out.append(draw(i64))
        return out

    @settings(max_examples=8, deadline=None)
    @given(pop=hash_pop(), max_h=st.integers(min_value=0, max_value=3))
    def run(pop, max_h):
        df = spark.createDataFrame(
            [(f"id{i:03d}", h) for i, h in enumerate(pop)], "id string, h long"
        )
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in hamming_pairs(df, "id", "h", max_h).collect()
        }
        ids = [f"id{i:03d}" for i in range(len(pop))]
        expect = set()
        for i in range(len(pop)):
            for j in range(i + 1, len(pop)):
                d = bin((pop[i] ^ pop[j]) & (2**64 - 1)).count("1")
                if d <= max_h:
                    a, b = sorted((ids[i], ids[j]))
                    expect.add((a, b, d))
        assert got == expect

    run()


def test_hamming_clusters_equiv_pairs_path(spark):
    """hamming_clusters (distinct-value banding + value-graph CC, no
    row-level pairs) must equal resolve_duplicate_clusters over
    hamming_pairs on populations with heavy exact-duplication."""
    import numpy as np

    from chronon_spark.operators.dedup import (
        hamming_clusters,
        hamming_pairs,
        resolve_duplicate_clusters,
    )

    rng = np.random.default_rng(17)
    base = [int(rng.integers(-2**63, 2**63 - 1)) for _ in range(10)]
    rows = []
    i = 0
    for b in base:
        for _ in range(int(rng.integers(1, 6))):  # exact duplicates
            rows.append((f"r{i:03d}", b)); i += 1
        if rng.random() < 0.7:  # a 1-bit neighbor
            u = (b & (2**64 - 1)) ^ (1 << int(rng.integers(0, 64)))
            rows.append((f"r{i:03d}", u - (1 << 64) if u >= (1 << 63) else u)); i += 1
    df = spark.createDataFrame(rows, "id string, h long")
    got = {
        (r["id"], r["cluster_id"], r["is_canonical"])
        for r in hamming_clusters(df, "id", "h", max_hamming=2).collect()
    }
    pairs = hamming_pairs(df, "id", "h", max_hamming=2)
    expect = {
        (r["id"], r["cluster_id"], r["is_canonical"])
        for r in resolve_duplicate_clusters(df, pairs, "id")
        .select("id", "cluster_id", "is_canonical").collect()
    }
    assert got == expect and len(got) == len(rows)


def test_incremental_minhash_matches_exact_cross_pairs(spark):
    """Incremental (batch vs corpus) dedup == brute-force cross-pair
    Jaccard at these banding parameters, including via a persisted
    signature index."""
    from chronon_spark.operators.dedup import (
        minhash_lsh_pairs_incremental, signature_index, shingle_fps_np,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    new = docs.where("doc_id % 10 = 0")
    corpus = docs.where("doc_id % 10 != 0")

    got = sorted(
        (r["new_id"], r["corpus_id"], r["jaccard"])
        for r in minhash_lsh_pairs_incremental(
            new, corpus, "doc_id", "text", n=8, threshold=0.3
        ).collect()
    )

    # brute force in python
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    sh = {i: set(shingle_fps_np(t, 8).tolist()) for i, t in rows}
    want = []
    for i in sh:
        if i % 10 != 0:
            continue
        for j in sh:
            if j % 10 == 0:
                continue
            inter = len(sh[i] & sh[j])
            jac = inter / (len(sh[i]) + len(sh[j]) - inter)
            if jac >= 0.3:
                want.append((i, j, round(jac + 1e-9, 6)))
    assert got == sorted(want)

    # identical through a persisted index (text never re-read)
    idx = signature_index(corpus, "doc_id", "text", n=8)
    via_idx = sorted(
        (r["new_id"], r["corpus_id"], r["jaccard"])
        for r in minhash_lsh_pairs_incremental(
            new, idx, "doc_id", "text", n=8, threshold=0.3,
            corpus_is_index=True,
        ).collect()
    )
    assert via_idx == got


def test_incremental_hamming_matches_brute_force(spark):
    """Batch-vs-corpus pigeonhole banding == brute-force cross-pair
    hamming (recall 1 by construction, verified exactly)."""
    import numpy as np

    from chronon_spark.operators.dedup import hamming_pairs_incremental

    rng = np.random.RandomState(11)
    base = rng.randint(-(2**62), 2**62, size=60, dtype=np.int64)
    rows = [(i, int(h)) for i, h in enumerate(base)]
    # plant near-dups of corpus rows inside the batch (flip <= 2 bits)
    for k, (src, flips) in enumerate([(1, 1), (7, 2), (13, 0)]):
        h = int(base[src])
        for b in range(flips):
            h ^= 1 << (3 * b + 5)
        rows.append((100 + k, h))
    df = spark.createDataFrame(rows, "id long, h long")
    new = df.where("id >= 100 OR id % 10 = 0")
    corpus = df.where("id < 100 AND id % 10 != 0")
    got = sorted(
        (r["new_id"], r["corpus_id"], r["hamming"])
        for r in hamming_pairs_incremental(
            new, corpus, "id", "h", max_hamming=2
        ).collect()
    )
    nd = {r[0]: r[1] for r in new.collect()}
    cd = {r[0]: r[1] for r in corpus.collect()}
    want = sorted(
        (a, b, bin((ha ^ hb) & (2**64 - 1)).count("1"))
        for a, ha in nd.items() for b, hb in cd.items()
        if bin((ha ^ hb) & (2**64 - 1)).count("1") <= 2
    )
    assert got == want and len(want) >= 2


def test_duplicate_spans_planted(spark):
    """Exact substring dedup: planted verbatim boilerplate is found as
    merged maximal spans; unique text yields none; within-doc repeats
    count toward min_count."""
    from chronon_spark.operators.dedup import duplicate_spans

    boiler = "SUBSCRIBE TO OUR NEWSLETTER FOR DAILY UPDATES AND MORE!"  # 55
    docs = spark.createDataFrame(
        [
            (0, "a" * 10 + boiler + "unique tail zero 0000"),
            (1, "prefix one 11111 " + boiler + " done"),
            (2, "totally unique text with no duplication at all here xyz"),
            (3, "selfrep " + boiler + " mid " + boiler),  # two hits, one doc
        ],
        "doc_id long, text string",
    )
    out = duplicate_spans(docs, "doc_id", "text", n=50, min_count=2)
    rows = {r["doc_id"]: (r["span_start"], r["span_end"], r["dup_grams"])
            for r in out.collect()}
    assert 2 not in rows
    # doc 0: boiler starts at pos 11 (1-based); 55-char boiler has 6
    # positions of 50-grams -> merged span [11, 11+5+50) = [11, 66)
    assert rows[0] == (11, 66, 6)
    # doc 1's span starts at the space BEFORE the boiler (the space-
    # prefixed gram also occurs in doc 3's second occurrence)
    assert rows[1][0] == 17
    # doc 3 has two separated occurrences -> two spans
    d3 = [r for r in out.collect() if r["doc_id"] == 3]
    assert len(d3) == 2

    # sanity vs brute force on the corpus fixture
    real = duplicate_spans(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        "doc_id", "text", n=50,
    )
    grams = {}
    for r in spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).collect():
        t = r["text"] or ""
        for i in range(len(t) - 49):
            grams.setdefault(t[i:i + 50], []).append((r["doc_id"], i + 1))
    marked = {}
    for g, occ in grams.items():
        if len(occ) >= 2:
            for d, p in occ:
                marked.setdefault(d, set()).add(p)
    want = {}
    for d, ps in marked.items():
        spans, cur = [], None
        for p in sorted(ps):
            if cur and p <= cur[1]:
                cur[1] = max(cur[1], p + 50)
                cur[2] += 1
            else:
                cur = [p, p + 50, 1]
                spans.append(cur)
        want[d] = {tuple(sp) for sp in spans}
    got = {}
    for r in real.collect():
        got.setdefault(r["doc_id"], set()).add(
            (r["span_start"], r["span_end"], r["dup_grams"])
        )
    assert got == want


def test_duplicate_spans_keep_first(spark):
    """keep_first: the globally first occurrence of each duplicated gram
    (by id, pos) stays unmarked; only later occurrences become spans."""
    from chronon_spark.operators.dedup import duplicate_spans

    boiler = "REPEATED BOILERPLATE SEGMENT THAT IS FIFTY CHARS X"  # 50
    assert len(boiler) == 50
    docs = spark.createDataFrame(
        [(0, "A" * 5 + boiler), (1, "B" * 9 + boiler), (2, "C" * 3 + boiler)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["span_start"], r["span_end"])
           for r in duplicate_spans(docs, "doc_id", "text", n=50,
                                    keep_first=True).collect()}
    assert 0 not in out          # first occurrence kept clean
    assert out[1] == (10, 60) and out[2] == (4, 54)
    # default policy marks all three
    allm = {r["doc_id"] for r in
            duplicate_spans(docs, "doc_id", "text", n=50).collect()}
    assert allm == {0, 1, 2}


def test_remove_spans_surgery(spark):
    """remove_spans cuts exactly the [start, end) ranges; untouched docs
    pass through; removed_chars accounts the surgery."""
    from chronon_spark.operators.dedup import duplicate_spans, remove_spans

    boiler = "REPEATED BOILERPLATE SEGMENT THAT IS FIFTY CHARS X"
    docs = spark.createDataFrame(
        [(0, "head " + boiler + " tail"),
         (1, boiler + "-middle-" + boiler),
         (2, "clean document")],
        "doc_id long, text string",
    )
    spans = duplicate_spans(docs, "doc_id", "text", n=50, min_count=2)
    out = {r["doc_id"]: (r["text"], r["removed_chars"])
           for r in remove_spans(docs, spans, "doc_id", "text").collect()}
    assert out[2] == ("clean document", 0)
    assert boiler not in out[0][0] and out[0][0].startswith("head ")
    assert out[0][0].endswith(" tail")
    assert boiler not in out[1][0] and "-middle-" in out[1][0]
    for d in (0, 1):
        orig = {0: "head " + boiler + " tail",
                1: boiler + "-middle-" + boiler}[d]
        assert out[d][1] == len(orig) - len(out[d][0])
        assert out[d][1] > 0


def test_duplicate_spans_randomized_high_collision(spark):
    """Randomized sweep on a 3-letter alphabet with n=5: heavy genuine
    duplication, overlapping merges, whole-doc dups — engine must equal
    the string-exact brute force on every doc."""
    import numpy as np

    from chronon_spark.operators.dedup import duplicate_spans

    rng = np.random.RandomState(17)
    alphabet = np.array(list("ab "))
    docs = [(i, "".join(rng.choice(alphabet, size=rng.randint(0, 40))))
            for i in range(40)]
    docs += [(100, docs[3][1]), (101, docs[3][1])]  # whole-doc dups
    df = spark.createDataFrame(docs, "doc_id long, text string")
    n = 5
    got = {}
    for r in duplicate_spans(df, "doc_id", "text", n=n).collect():
        got.setdefault(r["doc_id"], set()).add(
            (r["span_start"], r["span_end"], r["dup_grams"]))

    grams = {}
    for d, t in docs:
        for i in range(len(t) - n + 1):
            grams.setdefault(t[i:i + n], []).append((d, i + 1))
    marked = {}
    for g, occ in grams.items():
        if len(occ) >= 2:
            for d, p in occ:
                marked.setdefault(d, set()).add(p)
    want = {}
    for d, ps in marked.items():
        spans, cur = [], None
        for p in sorted(ps):
            if cur and p <= cur[1]:
                cur[1] = max(cur[1], p + n)
                cur[2] += 1
            else:
                cur = [p, p + n, 1]
                spans.append(cur)
        want[d] = {tuple(sp) for sp in spans}
    assert got == want
