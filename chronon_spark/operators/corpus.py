"""The composed text-curation pipeline — what a training-data team runs
end-to-end over a raw 100 TB document corpus:

    quality gate  ->  eval-set decontamination  ->  near-dup clustering
                  ->  canonical selection        ->  train/val/test split

Each stage is an already-verified primitive (text.quality_percentile_gate,
dedup.decontaminate, dedup.minhash_lsh_pairs, dedup.resolve_duplicate_
clusters, sampling.hash_split); this module owns the composition order and
the column contract. Scale shape is the sum of its parts: one window
shuffle (quality rank), one broadcast sweep (decontamination), the banded
LSH join (bounded buckets), the min-label cluster rounds, and a
scan-stage split projection. The raw text column is read by exactly two
Arrow passes (shingling for the sweep + signatures) and never shuffled.

The image analog is multimodal.curate_images; both feed hash_split, so
image and text corpora agree on split membership for shared ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate_corpus(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    min_quality_percentile: float = 0.5,
    decontaminate_n: int = 20,
    decontaminate_min_overlap: int = 3,
    dedup_n: int = 8,
    dedup_threshold: float = 0.3,
) -> DataFrame:
    """Returns every surviving (quality-gated, uncontaminated) document
    with its near-dup `cluster_id`, `is_canonical` flag (min-id keep
    rule), and deterministic `split` label. `SELECT * WHERE is_canonical`
    is the training corpus; dropped documents simply don't appear
    (auditable against the input by id)."""
    from chronon_spark.operators.dedup import (
        decontaminate,
        minhash_lsh_pairs,
        resolve_duplicate_clusters,
    )
    from chronon_spark.operators.sampling import hash_split
    from chronon_spark.operators.text import quality_percentile_gate

    gated = quality_percentile_gate(
        docs, text_col, group_col=group_col,
        min_percentile=min_quality_percentile,
    )
    # `clean` feeds THREE consumers (signature pass, cluster join, output
    # projection) — persist it so the quality window + decontamination
    # sweep run once, not once per consumer. Survivors are a fraction of
    # the corpus and spill to disk if they don't fit; a production-scale
    # run materializes each stage through the warehouse (BackfillJob)
    # instead, which also buys resume.
    clean = (
        decontaminate(
            gated, eval_df, id_col, text_col,
            n=decontaminate_n, min_overlap=decontaminate_min_overlap,
        )
        .where(~F.col("contaminated"))
        .persist()
    )
    pairs = minhash_lsh_pairs(
        clean, id_col, text_col, n=dedup_n, threshold=dedup_threshold
    )
    resolved = resolve_duplicate_clusters(clean, pairs, id_col)
    return hash_split(resolved, id_col).select(
        id_col, group_col, "quality", "eval_overlap",
        "cluster_id", "is_canonical", "split",
    )
