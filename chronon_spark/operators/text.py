"""Text analysis for large-scale training-data pipelines: token counting,
quality scoring, language-ID, and document fingerprinting.

All hot-path expressions are native `pyspark.sql.functions` (JVM-side,
whole-stage codegen) — no Python UDFs. Every function returns Column
expressions so they compose into a single projection over a 100TB scan
(column-pruned, predicate-pushed, zero shuffles).

These operators extend the reference's surface (a feature platform needs
them for document corpora); they are not in rajkiran2190/chronon itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small per-language stopword marker sets for the n-gram/stopword heuristic
# language-ID. Deliberately tiny + word-boundary-anchored so the same regex
# runs identically under Java regex (Spark) and RE2 (DuckDB oracle).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "that"],
    "de": ["der", "und", "die", "das", "nicht", "ist"],
    "fr": ["le", "la", "et", "les", "des", "est"],
    "es": ["el", "los", "que", "y", "en", "una"],
}


def token_count(col: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count: words + digit runs + punctuation marks each
    count separately (a cheap stand-in for BPE tokenizers)."""
    return F.coalesce(
        F.length(F.regexp_replace(col, r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", "#"))
        - F.length(F.regexp_replace(
            F.regexp_replace(col, r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", "#"), "#", "")),
        F.lit(0),
    ).cast("long")


def char_class_ratios(col: Column) -> dict[str, Column]:
    """alpha / digit / punct / space ratios over total chars (0 when empty)."""
    n = F.length(col).cast("double")

    def ratio(pattern: str) -> Column:
        kept = F.length(F.regexp_replace(col, pattern, ""))
        return F.when(n > 0, (n - kept) / n).otherwise(F.lit(0.0))

    return {
        "alpha_ratio": ratio(r"[A-Za-z]"),
        "digit_ratio": ratio(r"[0-9]"),
        "punct_ratio": ratio(r"[^A-Za-z0-9\s]"),
        "space_ratio": ratio(r"\s"),
    }


def stopword_count(col: Column, words: list[str]) -> Column:
    """Number of stopword occurrences (case-insensitive, word-bounded)."""
    pattern = r"(?i)\b(" + "|".join(words) + r")\b"
    return F.coalesce(F.regexp_count(col, F.lit(pattern)), F.lit(0)).cast("long")


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0, 1]: length band + alpha share +
    moderate punctuation + stopword presence. Deterministic, engine-native."""
    ratios = char_class_ratios(col)
    toks = token_count(col).cast("double")
    sw = stopword_count(col, LANG_MARKERS["en"]).cast("double")
    length_term = F.least(toks / F.lit(20.0), F.lit(1.0))
    alpha_term = ratios["alpha_ratio"]
    punct_term = F.lit(1.0) - F.least(ratios["punct_ratio"] * 4, F.lit(1.0))
    sw_term = F.least(sw / F.greatest(toks, F.lit(1.0)) * 5, F.lit(1.0))
    return (length_term + alpha_term + punct_term + sw_term) / 4


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts."""
    return {lang: stopword_count(col, words) for lang, words in LANG_MARKERS.items()}


def lang_id(col: Column) -> Column:
    """argmax language by marker hits; 'und' (undetermined) when all zero.
    Ties break by language-code order (deterministic)."""
    scores = lang_scores(col)
    pairs = F.array(*[
        F.struct(scores[lang].alias("hits"), F.lit(lang).alias("lang"))
        for lang in sorted(LANG_MARKERS)
    ])
    best = F.array_max(pairs)  # struct compare: hits first, then lang
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


FP_MOD = 1_000_000_007
FP_BASE = 131


def fingerprint(col: Column) -> Column:
    """Deterministic polynomial rolling hash of the raw text:
    h = fold(h * 131 + ascii(char)) mod 1e9+7.

    Pure SQL (aggregate over split chars) so any engine reproduces it —
    the cross-engine-stable document id for dedup bookkeeping.
    """
    chars = F.split(col, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * FP_BASE + F.ascii(ch)) % FP_MOD,
    )


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All text features as one projection (single pass over the scan)."""
    c = F.col(text_col)
    ratios = char_class_ratios(c)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_subtokens"),
        ratios["alpha_ratio"].alias("alpha_ratio"),
        ratios["digit_ratio"].alias("digit_ratio"),
        ratios["punct_ratio"].alias("punct_ratio"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fp"),
    )


def quality_percentile_gate(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = None,
    min_percentile: float = 0.5,
) -> DataFrame:
    """Keep documents at or above the per-group quality percentile — the
    standard corpus quality gate ("drop the worst X% per language").

    Determinism across engines: quality is rounded to 6dp BEFORE ranking
    (bit-equal in Spark and the SQL oracle), and percent_rank depends only
    on the rank of the rounded value, so tied documents share a rank in
    every engine. One shuffle on the group column; at 100 TB prefer a
    two-pass variant (approx threshold per group, then a scan-stage
    filter) if a full per-group sort is too hot — the exact window form
    is the verification baseline.

    Edge semantics (identical in Spark and DuckDB, pinned by the oracle):
    a singleton group's only row has percent_rank 0.0 and is DROPPED for
    any min_percentile > 0 — percentile gating needs a population; route
    tiny groups around the gate if they must survive.
    """
    from pyspark.sql.window import Window as W

    q = F.round(quality_score(F.col(text_col)) + F.lit(1e-9), 6)
    parts = [group_col] if group_col else [F.lit(1)]
    w = W.partitionBy(*parts).orderBy(F.col("quality"))
    return (
        df.withColumn("quality", q)
        .withColumn("q_rank", F.round(F.percent_rank().over(w) + F.lit(1e-9), 6))
        .where(F.col("q_rank") >= min_percentile)
    )


def repetition_metrics(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    Table A1 'repetition removal'):

      * top{2,3,4}_char_frac — the largest character coverage achieved by
        any single REPEATED word n-gram: max over grams with count >= 2 of
        count * len(gram), divided by len(text); 0 when nothing repeats.
        Defined via the MAX of the product (not "the most frequent gram")
        so ties cannot make engines disagree, and restricted to repeats so
        one long unique gram in a short doc never fires the flag.
      * dup5_frac — fraction of word 5-gram occurrences that are repeats:
        (occurrences - distinct) / occurrences.
      * repetitive — the published-threshold flag (0.20 / 0.18 / 0.16 for
        top-2/3/4, 0.15 for dup5): the corpus-filter predicate.

    One Arrow pass; per-doc counting is np.unique over that doc's gram
    array (bounded by doc length, no corpus-wide state). The DuckDB
    oracle recomputes everything from raw text with window slices.
    """
    import numpy as np
    from typing import Iterator

    import pandas as pd

    def part(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = {"id": [], "top2": [], "top3": [], "top4": [], "dup5": []}
            for i, t in zip(pdf["id"], pdf["txt"]):
                t = t or ""
                words = t.split()
                L = max(len(t), 1)
                # factorize words -> int ids; n-gram counting is then
                # np.unique over the strided id matrix — exact and fully
                # vectorized, no per-gram string building
                _, ids = np.unique(np.array(words, dtype=object),
                                   return_inverse=True)
                wl = np.fromiter((len(w) for w in words), dtype=np.int64,
                                 count=len(words))
                cum = np.concatenate(([0], np.cumsum(wl)))
                tops = {}
                for n in (2, 3, 4):
                    if len(words) < n:
                        tops[n] = 0.0
                        continue
                    M = np.lib.stride_tricks.sliding_window_view(ids, n)
                    _, first, counts = np.unique(
                        M, axis=0, return_index=True, return_counts=True
                    )
                    rep = counts >= 2
                    if not rep.any():
                        tops[n] = 0.0
                        continue
                    glen = cum[first + n] - cum[first] + (n - 1)
                    tops[n] = float((counts[rep] * glen[rep]).max()) / L
                if len(words) < 5:
                    dup5 = 0.0
                else:
                    M5 = np.lib.stride_tricks.sliding_window_view(ids, 5)
                    total = len(M5)
                    dup5 = (total - len(np.unique(M5, axis=0))) / total
                rows["id"].append(i)
                rows["top2"].append(tops[2])
                rows["top3"].append(tops[3])
                rows["top4"].append(tops[4])
                rows["dup5"].append(dup5)
            if rows["id"]:
                yield pd.DataFrame(rows)

    out = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("txt")
    ).mapInPandas(
        part, schema="id long, top2 double, top3 double, top4 double, dup5 double"
    )
    r = lambda c: F.round(F.col(c) + F.lit(1e-9), 6)  # noqa: E731
    return out.select(
        F.col("id").alias(id_col),
        r("top2").alias("top2_char_frac"),
        r("top3").alias("top3_char_frac"),
        r("top4").alias("top4_char_frac"),
        r("dup5").alias("dup5_frac"),
        (
            (F.col("top2") > 0.20) | (F.col("top3") > 0.18)
            | (F.col("top4") > 0.16) | (F.col("dup5") > 0.15)
        ).alias("repetitive"),
    )


# PII patterns chosen to parse identically under Java regex (Spark) and
# RE2 (DuckDB oracle): no lookaround, no backreferences.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{1,3}[- ]\(?\d{2,4}\)?[- ]\d{3,4}[- ]?\d{2,4}\b", "<PHONE>"),
]


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4-style PII scrub: emails, IPv4s and phone-shaped numbers replaced
    by typed placeholder tokens, applied as a fixed cascade (email -> ip
    -> phone, each counted on the text the previous stage produced so
    counts sum to replacements made). Pure codegen regexp expressions —
    scan-stage, zero shuffles, composable into any corpus projection.

    Deliberately conservative patterns (precision over recall — a false
    redaction destroys clean training text); the pattern list is the
    extension point."""
    cur = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(
            F.coalesce(F.regexp_count(cur, F.lit(pat)), F.lit(0))
            .cast("long").alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, token)
    return df.select(
        "*", *counts, cur.alias(f"{text_col}_redacted")
    )


def _lm_tokens(col: Column) -> Column:
    """Lowercased alphanumeric word tokens — the unigram-LM alphabet.
    Pure split/filter expressions, reproduced verbatim by the DuckDB
    oracle (string_split_regex + list_filter), so token identity is
    cross-engine-stable like every other hash in this package."""
    return F.filter(
        F.split(F.lower(col), r"[^a-z0-9]+"), lambda t: t != ""
    )


def unigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    top_v: int | None = None,
) -> DataFrame:
    """Perplexity-style quality scoring (the CCNet/Gopher "LM filter"
    stage of a training-data pipeline, self-trained): fit an add-alpha
    unigram language model ON the corpus itself, then score every
    document as bits per token under that model. High bits/token =
    improbable token stream = boilerplate, lists, mojibake; the classic
    cheap proxy for the KenLM perplexity gate.

        p(t) = (count(t) + alpha) / (N + alpha * (V + 1))
        bits_per_token(doc) = -mean(log2 p(t_i))

    Unseen/capped tokens score at the count=0 floor (the "+1" vocab slot).

    Scale shape: ONE groupBy over exploded tokens builds the model
    (map-side combined — the shuffle carries (token, count) partials, not
    token instances); `top_v` caps the table to the most frequent tokens
    (deterministic count-desc/token-asc order) so the scoring join
    BROADCASTS at any corpus size — dropped tail tokens score as unseen,
    the standard restricted-vocab LM trade. Scoring is the broadcast join
    + one per-doc aggregation: two shuffles end-to-end, none of them over
    raw text. Zero UDFs anywhere.

    Returns one row per input row: id, n_lm_tokens, bits_per_token
    (NULL for token-less documents).
    """
    import numpy as np

    toks = df.select(F.col(id_col), _lm_tokens(F.col(text_col)).alias("__t"))
    exploded = toks.select(id_col, F.explode("__t").alias("token"))
    counts = exploded.groupBy("token").agg(F.count("*").alias("c"))
    # N and V are model constants: tiny 2-value aggregate, broadcast
    tot = counts.agg(
        F.sum("c").alias("N"), F.count("*").alias("V")
    ).collect()[0]
    n_total, v_total = int(tot["N"] or 0), int(tot["V"] or 0)
    denom = n_total + alpha * (v_total + 1)
    if top_v is not None:
        # orderBy+limit compiles to TakeOrderedAndProject — a DISTRIBUTED
        # top-k (per-partition heaps merged at the driver), unlike a
        # global row_number window which would sort the whole vocab in
        # one task; (count desc, token asc) keeps the cut deterministic
        counts = counts.orderBy(F.desc("c"), F.asc("token")).limit(top_v)
    vocab = counts.select(
        "token", (F.log((F.col("c") + F.lit(alpha)) / F.lit(denom))).alias("__lp")
    )
    floor_lp = float(np.log(alpha / denom)) if denom > 0 else 0.0
    scored = (
        exploded.join(F.broadcast(vocab), "token", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_lm_tokens"),
            (-F.avg(F.coalesce(F.col("__lp"), F.lit(floor_lp)))
             / float(np.log(2.0))).alias("bits_per_token"),
        )
    )
    return df.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_lm_tokens", F.lit(0)).alias("n_lm_tokens"),
        "bits_per_token",
    )
