"""Phase probe for the curate workload: times each stage of
curate_images separately (decode+gate checkpoint, distinct-value banding
pair generation, connected components, label expansion + final join) so
fixed floors are attributable. Run pinned, machine otherwise idle:

    taskset -c 0-15 python tools/curate_probe.py --cpus 16 \
        --input .fixtures/images_n480000_s7.parquet
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--input", required=True)
    args = ap.parse_args()

    from chronon_spark.session import build_session
    from chronon_spark.operators.multimodal import extract_pixel_features
    from chronon_spark.operators.text import token_count
    from chronon_spark.operators.dedup import (
        hamming_pairs, connected_components,
    )
    from pyspark.sql import functions as F

    spark = build_session(
        master=f"local[{args.cpus}]", shuffle_partitions=2 * args.cpus + 1
    )
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
    images = spark.read.parquet(args.input).cache()
    n = images.count()
    print(f"input rows: {n}")

    def phase(label, fn):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        print(f"{label}: {dt:.2f}s")
        return out

    # warm the python worker pool + JIT once
    feats = extract_pixel_features(images, passthrough=("w", "h", "caption"))
    phase("warmup decode pass", lambda: feats.count())

    kept = feats.where(
        F.col("decode_ok") & (F.col("w") >= 48) & (F.col("h") >= 48)
        & (token_count(F.col("caption")) >= 8)
    ).select(
        "image_id", F.col("phash_check").alias("phash_decoded"),
        "w", "h", "caption", "brightness", "contrast",
    )
    kept = phase(
        "decode+gate -> repartition + localCheckpoint",
        lambda: kept.repartition(args.cpus).localCheckpoint(),
    )
    print("  kept rows:", kept.count())

    src = kept.select(F.col("image_id").alias("id"),
                      F.col("phash_decoded").alias("__h"))
    vals = src.select("__h").distinct()
    vpairs = hamming_pairs(vals, "__h", "__h", 2, None)
    vpairs_c = phase("banding pairs (cache+count)", lambda: vpairs.cache())
    print("  value pairs:", phase("  count", lambda: vpairs_c.count()))

    vcomp = phase("connected components", lambda: connected_components(vpairs_c))

    def expand():
        labeled = (
            src.join(vcomp.withColumnRenamed("id", "__h"), "__h", "left")
            .select("id", F.coalesce("cluster_id", F.col("__h")).alias("__vc"))
        )
        canon = labeled.groupBy("__vc").agg(F.min("id").alias("cluster_id"))
        out = labeled.join(canon, "__vc").select(
            F.col("id").alias("image_id"), "cluster_id",
            (F.col("id") == F.col("cluster_id")).alias("is_canonical"),
        )
        final = kept.join(out, "image_id")
        return final.where("is_canonical").count()

    print("  canonical:", phase("expand + final join + count", expand))
    spark.stop()


if __name__ == "__main__":
    main()
