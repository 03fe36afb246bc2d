"""Deterministic sampling, splitting, dataset mixing and sequence packing —
the training-data side of the corpus pipeline.

Everything here is driven by ONE cross-engine-stable hash (the polynomial
rolling hash from operators/text.py, reproducible in any SQL engine), so
sample membership is a pure function of (row id, salt): re-runs, backfills
and other engines agree row-for-row — the property a 100 TB pipeline needs
to resume, audit, and decontaminate without a recorded RNG state.

Scale shape: split/sample/mix are scan-stage projections and filters (zero
shuffles, zero driver actions); packing shuffles once on the pack key and
folds each group in a single Arrow pass.

Reference provenance: the reference has no sampling surface (its scope ends
at feature serving); these follow its determinism discipline (semantic
hashing, engine-portable fingerprints — api/Extensions.scala semanticHash)
applied to the corpus-preparation ops a training pipeline runs upstream.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import FP_BASE, FP_MOD

BUCKETS = 10_000  # sampling resolution: basis points


def _bps(fraction: float) -> int:
    """Fraction -> integer basis-point threshold. Python's round() is
    half-EVEN (banker's rounding): a fraction landing exactly on a half
    basis point (e.g. 0.00025 -> 2, not 3) rounds to the even bp. Any
    engine re-deriving thresholds from fractions must use the same rule
    or split membership disagrees at the boundary bucket."""
    return int(round(fraction * BUCKETS))


def hash_bucket(id_col: Column, salt: str, buckets: int = BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets) from (id, salt).

    The rolling hash runs over `"<id>:<salt>"` chars — pure codegen
    (aggregate over split), no UDF, engine-portable. Different salts give
    independent bucketings, so a split salt and a sample salt never
    correlate. NULL ids hash to a NULL bucket: samplers drop such rows
    (comparison is never true) and hash_split labels them with the last
    split — key-quality gating belongs upstream."""
    key = F.concat(id_col.cast("string"), F.lit(":" + salt))
    fp = F.aggregate(
        F.split(key, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * FP_BASE + F.ascii(ch)) % FP_MOD,
    )
    return (fp % buckets).cast("int")


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: Sequence[tuple[str, float]] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
    salt: str = "split",
) -> DataFrame:
    """Assign every row a split label by hash bucket — the deterministic
    train/val/test cut. Fractions must sum to 1 (+-1 bp rounding); the
    label is a closed-form function of the id, so a doc can never migrate
    between splits across runs or engines (eval-set hygiene)."""
    total = sum(_bps(f) for _, f in splits)
    if not BUCKETS - 1 <= total <= BUCKETS + 1:
        raise ValueError(f"split fractions sum to {total / BUCKETS}, want 1.0")
    bucket = hash_bucket(F.col(id_col), salt)
    expr = F.lit(splits[-1][0])  # remainder absorbs rounding slack
    edge = 0
    cases = []
    for name, frac in splits[:-1]:
        edge += _bps(frac)
        cases.append((edge, name))
    for edge, name in reversed(cases):
        expr = F.when(bucket < edge, F.lit(name)).otherwise(expr)
    return df.withColumn("bucket", bucket).withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    salt: str = "sample",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows: row survives iff
    hash_bucket(id) < fraction[stratum] * 10000. Exact-membership analog
    of df.sampleBy — but reproducible across runs/engines and backfill
    steps (no RNG seed to lose). Pure scan-stage filter: zero shuffles."""
    bucket = hash_bucket(F.col(id_col), salt)
    thresh = F.lit(_bps(default_fraction))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == value, F.lit(_bps(frac))
        ).otherwise(thresh)
    return df.where(bucket < thresh)


def weighted_mix(
    sources: Sequence[tuple[str, DataFrame, float]],
    id_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Weighted dataset mixing by repetition factor (the LLM-corpus
    "epochs" recipe): a source with weight e contributes floor(e) full
    copies plus a deterministic hash-sample of the fractional remainder.
    Output rows carry (mix_source, mix_copy); copies are identical by
    design — downstream shuffling/packing interleaves them.

    Union of scans: no shuffle, no driver action; each fractional copy is
    a scan-stage filter salted per source so sources sample independently.
    """
    out = None
    for name, df, epochs in sources:
        if epochs < 0:
            raise ValueError(f"negative epochs for {name}")
        if epochs > 32:
            # each full copy is one more unioned scan branch in the plan;
            # past a few dozen the planner cost outweighs any mixing value
            raise ValueError(
                f"epochs {epochs} for {name} exceeds 32 — repeat at the "
                "training-loader level instead of the plan level"
            )
        full = int(epochs)
        frac = epochs - full
        copies = []
        for c in range(full):
            copies.append(
                df.withColumn("mix_source", F.lit(name)).withColumn(
                    "mix_copy", F.lit(c)
                )
            )
        frac_bps = _bps(frac)
        if frac_bps > 0:
            bucket = hash_bucket(F.col(id_col), f"{salt}:{name}")
            copies.append(
                df.where(bucket < frac_bps)
                .withColumn("mix_source", F.lit(name))
                .withColumn("mix_copy", F.lit(full))
            )
        for c in copies:
            out = c if out is None else out.unionByName(c)
    if out is None:
        raise ValueError("no sources")
    return out


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    key_col: Optional[str] = None,
) -> DataFrame:
    """Greedy sequence packing: within each pack key (shard), walk docs in
    id order and open a new bin whenever adding the next doc would exceed
    `budget` tokens (a doc larger than the budget gets a bin of its own).
    Returns (key, id, tokens, bin) — the (shard, bin) pair is the training
    sequence a packer concatenates.

    Packing is inherently a sequential fold, so it runs per key group in
    one Arrow pass (applyInPandas after a single shuffle on the key); keys
    are the parallelism unit, exactly how production packers shard. A
    `key_col` is required at scale — passing None packs the whole frame in
    one group and is only for small corpora.
    """
    import pandas as pd

    # keep the id at its ORIGINAL type: casting e.g. 'img_0001' to long
    # yields NULL for every row, collapsing the id-order walk to an
    # arbitrary order and destroying the returned identifier
    id_type = df.schema[id_col].dataType.simpleString()
    keyed = df.select(
        (F.col(key_col) if key_col else F.lit("__all__")).alias("pack_key"),
        F.col(id_col).alias("id"),
        # NULL token counts pack as 0 (doc rides along free) rather than
        # poisoning the cumulative sums with NaN
        F.coalesce(F.col(token_col).cast("long"), F.lit(0)).alias("tokens"),
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
        toks = pdf["tokens"].to_numpy()
        cs = np.cumsum(toks)
        n = len(toks)
        bins = np.zeros(n, dtype=np.int64)
        start, b = 0, 0
        # one iteration PER BIN (searchsorted finds the maximal prefix
        # fitting the budget), not per doc — the fold is O(bins log docs)
        while start < n:
            base = cs[start - 1] if start else 0
            end = int(np.searchsorted(cs, base + budget, side="right"))
            if end == start:  # single doc larger than the budget
                end = start + 1
            bins[start:end] = b
            b += 1
            start = end
        pdf["bin"] = bins
        return pdf

    return keyed.groupBy("pack_key").applyInPandas(
        fold, schema=f"pack_key string, id {id_type}, tokens long, bin long"
    )


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    tokens_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "budget",
) -> DataFrame:
    """Cap per-group token mass at `budget_tokens`: walk each group's rows
    in deterministic hash order — (hash_bucket(id, salt), id) — and keep
    the prefix whose cumulative token count stays <= budget. The
    per-source budget knob of a data-mixture recipe ("at most 50B tokens
    of crawl, 10B of code"), reproducible across runs, engines and
    backfill steps like every sampler here.

    Scale shape (why this is NOT one window cumsum): a naive
    `sum over (partition by source order by hash, id)` globally sorts
    every row of a source inside one task — a 30 TB source is one
    executor's problem. Instead:

      1. aggregate token sums per (group, bucket) — map-side-combined
         groupBy, output <= 10k rows per group;
      2. cumsum THAT (tiny window) to find each group's boundary bucket
         and the budget remaining when it starts;
      3. rows in buckets strictly below the boundary pass with no sort at
         all; ONLY the boundary bucket's rows (~1/10000 of the group)
         sort by id to consume the remainder.

    The kept set is identical to the naive prefix rule — prefix sums are
    monotone, so "cumulative <= budget" is decidable bucket-wise — and
    the only full-data ops are one partial agg and one broadcast join.
    """
    bucket = hash_bucket(F.col(id_col), salt).alias("__bk")
    rows = df.select("*", bucket)
    per_bucket = rows.groupBy(group_col, "__bk").agg(
        F.sum(tokens_col).alias("__bt")
    )
    from pyspark.sql.window import Window

    wcum = (
        Window.partitionBy(group_col)
        .orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per_bucket.select(
        group_col, "__bk", (F.sum("__bt").over(wcum) - F.col("__bt")).alias("__before")
    )
    # whole-bucket verdicts: __before + __bt <= budget -> all kept;
    # __before >= budget -> all dropped; else boundary (remainder sort)
    verdicts = cum.select(
        group_col, "__bk", "__before",
        # <= not <: a bucket whose predecessors consumed EXACTLY the
        # budget can still contribute zero-token rows under the naive
        # prefix rule (cumulative stays == budget); the doc-level filter
        # below keeps only that zero-token prefix
        (F.col("__before") <= F.lit(budget_tokens)).alias("__touch"),
    )
    # verdicts is bounded by (#groups x 10k buckets) — small for typical
    # budget recipes, but NOT forcibly broadcast: at extreme group
    # cardinality (per-domain budgets over millions of domains) a forced
    # broadcast would collect it to the driver; AQE picks broadcast vs
    # shuffle join from the actual size
    joined = rows.join(
        verdicts, [group_col, "__bk"], "inner"
    ).filter(F.col("__touch"))
    wdoc = (
        Window.partitionBy(group_col, "__bk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept = joined.withColumn(
        "__cum", F.col("__before") + F.sum(tokens_col).over(wdoc)
    ).filter(F.col("__cum") <= F.lit(budget_tokens))
    return kept.drop("__bk", "__before", "__touch", "__cum")


def chunk_documents(
    df: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into token-bounded chunks on whitespace-token
    boundaries with optional overlap — the context-window prep stage
    (embedding pipelines, long-doc training): chunk i covers tokens
    [i*(max_tokens-overlap), i*(max_tokens-overlap) + max_tokens).

    Chunk text is the space-rejoin of the token slice (the standard
    tokenize-rejoin trade: original whitespace runs collapse). Token-less
    documents produce no rows.

    Scale shape: pure scan-stage projection + posexplode — ZERO shuffles,
    no UDFs; the explode multiplies rows by ~n/(max-overlap) inside the
    scan stage, so downstream consumers (packing, embedding) partition
    the already-chunked stream however they need.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"need 0 <= overlap({overlap}) < max_tokens({max_tokens})")
    step = max_tokens - overlap
    c = F.col(text_col)
    toks = F.when(
        F.length(F.trim(c)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(c), r"\s+"))
    n = F.size(toks)
    # ceil((n - overlap) / step), min 1 for any non-empty doc — small-int
    # double division is exact below 2^53 and mirrors the SQL oracle
    n_chunks = F.greatest(
        F.lit(1), F.floor((n - F.lit(overlap) + F.lit(step - 1)) / F.lit(step))
    ).cast("int")
    base = df.select(
        F.col(id_col), toks.alias("__toks"), n.alias("__n"),
        n_chunks.alias("__k"),
    ).where(F.col("__n") > 0)
    exploded = base.select(
        id_col, "__toks", "__n",
        F.posexplode(F.sequence(F.lit(0), F.col("__k") - 1)).alias(
            "chunk_idx", "__start_chunk"),
    )
    start = F.col("chunk_idx") * step
    return exploded.select(
        id_col,
        "chunk_idx",
        F.least(F.lit(max_tokens), F.col("__n") - start).alias("n_chunk_tokens"),
        F.array_join(
            F.slice(F.col("__toks"), start + 1, max_tokens), " "
        ).alias("chunk_text"),
    )
