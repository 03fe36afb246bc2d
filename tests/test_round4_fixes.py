"""Regression tests for the round-3 ADVICE findings:

1. insert_overwrite stages into a per-writer dir — a concurrent writer's
   staged files are never clobbered by another writer's cleanup
2. expire_snapshots never reaps young UNreferenced files (a concurrent
   writer's moved-but-uncommitted data), while committed-and-superseded
   files die regardless of age
3. zorder_column caps bits so no interleaved bit reaches the int64 sign
   bit (4 cols x 16 bits would) — keys stay non-negative
4. pack_sequences preserves non-numeric ids (no silent cast-to-NULL)
5. minhash_lsh_pairs_incremental(corpus_is_index=True) fails loudly on a
   signature-length mismatch instead of degenerating to all-pairs
"""

import os
import time

import pytest
from pyspark.sql import functions as F

from chronon_spark.operators.dedup import (
    minhash_lsh_pairs_incremental,
    signature_index,
)
from chronon_spark.operators.sampling import pack_sequences
from chronon_spark.sources.catalog import ParquetWarehouse, zorder_column


@pytest.fixture()
def wh(spark, tmp_path):
    return ParquetWarehouse(spark, str(tmp_path / "warehouse"))


def _df(spark, ds: str, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id"), F.lit(ds).alias("ds")
    )


def test_stage_dir_is_per_writer(spark, wh):
    wh.insert_overwrite(_df(spark, "2024-01-01", 0, 10), "t")
    # simulate another writer mid-stage: its unique stage dir + file
    foreign = os.path.join(wh.path("t"), "_stage.99999.deadbeef")
    os.makedirs(os.path.join(foreign, "ds=2024-01-02"))
    marker = os.path.join(foreign, "ds=2024-01-02", "part-foreign.parquet")
    open(marker, "w").write("x")
    wh.insert_overwrite(_df(spark, "2024-01-01", 10, 20), "t")
    # this writer's commit must not have deleted the other writer's stage
    assert os.path.exists(marker)
    # and no leftover stage dirs of our own
    own = [
        d for d in os.listdir(wh.path("t"))
        if d.startswith("_stage") and "deadbeef" not in d
    ]
    assert own == []


def test_expire_grace_protects_inflight_files(spark, wh):
    wh.insert_overwrite(_df(spark, "2024-01-01", 0, 10), "t")
    wh.insert_overwrite(_df(spark, "2024-01-01", 10, 20), "t")
    root = wh.path("t")
    # an unreferenced file, as left by a concurrent writer between its
    # file moves and its snapshot commit
    inflight = os.path.join(root, "ds=2024-01-01", "part-inflight.parquet")
    open(inflight, "w").write("x")
    deleted = wh.expire_snapshots("t", retain_last=1)
    # superseded committed files die even though they are brand new ...
    assert deleted > 0
    # ... but the young uncommitted file survives the grace window
    assert os.path.exists(inflight)
    # backdate it past the grace window -> reaped as a true orphan
    old = time.time() - 7200
    os.utime(inflight, (old, old))
    wh.insert_overwrite(_df(spark, "2024-01-01", 20, 30), "t")
    wh.expire_snapshots("t", retain_last=1)
    assert not os.path.exists(inflight)


def test_zorder_four_columns_nonnegative(spark):
    df = spark.range(0, 1000).select(
        F.col("id").cast("double").alias("a"),
        (999 - F.col("id")).cast("double").alias("b"),
        (F.col("id") % 7).cast("double").alias("c"),
        (F.col("id") % 11).cast("double").alias("d"),
    )
    z = df.withColumn(
        "z",
        zorder_column(
            [("a", 0, 999), ("b", 0, 999), ("c", 0, 6), ("d", 0, 10)],
            bits=16,
        ),
    )
    mn, mx = z.agg(F.min("z"), F.max("z")).first()
    assert mn >= 0
    # still a real multi-level key, not collapsed to a constant
    assert z.select("z").distinct().count() > 100


def test_pack_sequences_keeps_string_ids(spark):
    df = spark.createDataFrame(
        [(f"img_{i:04d}", 40) for i in range(10)], "doc string, toks long"
    )
    out = pack_sequences(df, "doc", "toks", budget=100).orderBy("id")
    rows = out.collect()
    assert [r.id for r in rows] == [f"img_{i:04d}" for i in range(10)]
    # budget 100 / 40-token docs -> 2 per bin, walked in id order
    assert [r.bin for r in rows] == [0, 0, 1, 1, 2, 2, 3, 3, 4, 4]


def test_incremental_index_hash_count_mismatch_raises(spark):
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " + str(i))
         for i in range(6)],
        "doc_id long, text string",
    )
    idx = signature_index(docs, "doc_id", "text", n=3, num_hashes=32)
    with pytest.raises(ValueError, match="32 hashes"):
        minhash_lsh_pairs_incremental(
            docs, idx, "doc_id", "text",
            num_hashes=64, bands=16, corpus_is_index=True,
        ).collect()
