"""Text-analysis operator tests: deterministic feature extraction."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "The quick brown fox and the lazy dog. It is that simple, to be sure."),
        (1, "der hund und die katze, das ist nicht gut"),
        (2, "12345 67890 !!!"),
        (3, ""),
        (4, "   "),
        (5, "le chat et la maison les des est"),
        (6, "word"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_counts(spark, docs):
    from chronon_spark.operators.text import token_count

    out = {r["doc_id"]: r["n"] for r in docs.select("doc_id", token_count(F.col("text")).alias("n")).collect()}
    assert out[0] == 15
    assert out[2] == 3
    assert out[3] == 0
    assert out[4] == 0
    assert out[6] == 1


def test_lang_id(spark, docs):
    from chronon_spark.operators.text import lang_id

    out = {r["doc_id"]: r["l"] for r in docs.select("doc_id", lang_id(F.col("text")).alias("l")).collect()}
    assert out[0] == "en"
    assert out[1] == "de"
    assert out[5] == "fr"
    assert out[2] == "und"
    assert out[3] == "und"


def test_fingerprint_matches_python(spark, docs):
    from chronon_spark.operators.text import FP_BASE, FP_MOD, fingerprint

    def py_fp(t):
        h = 0
        for ch in t:
            h = (h * FP_BASE + ord(ch)) % FP_MOD
        return h

    out = {r["doc_id"]: r["fp"] for r in docs.select("doc_id", fingerprint(F.col("text")).alias("fp")).collect()}
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    for i, t in rows.items():
        assert out[i] == py_fp(t), f"doc {i}"


def test_ratios_and_quality_bounds(spark, docs):
    from chronon_spark.operators.text import char_class_ratios, quality_score

    ratios = char_class_ratios(F.col("text"))
    out = docs.select(
        "doc_id",
        ratios["alpha_ratio"].alias("a"),
        ratios["digit_ratio"].alias("d"),
        quality_score(F.col("text")).alias("q"),
    ).collect()
    for r in out:
        assert 0.0 <= r["a"] <= 1.0
        assert 0.0 <= r["d"] <= 1.0
        assert 0.0 <= r["q"] <= 1.0
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[2]["d"] > 0.5  # digit-heavy doc
    assert by_id[0]["q"] > by_id[2]["q"]  # prose beats number noise


def test_repetition_metrics_gopher_rules(spark):
    """Gopher repetition signals vs a direct python reference; the
    published-threshold flag fires on planted repetitive docs only."""
    from chronon_spark.operators.text import repetition_metrics

    docs = spark.createDataFrame(
        [
            (0, "buy now " * 30),                      # extreme repetition
            (1, "a genuinely varied sentence with many distinct words "
                "covering different topics and no repeats at all"),
            (2, "alpha beta gamma " + "delta epsilon " * 12),
            (3, ""),
            (4, "one two"),                            # shorter than 5-gram
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           repetition_metrics(docs, "doc_id", "text").collect()}

    def ref(t):
        words = t.split()
        L = max(len(t), 1)
        vals = {}
        for n in (2, 3, 4):
            grams = [" ".join(words[j:j + n])
                     for j in range(max(len(words) - n + 1, 0))]
            if not grams:
                vals[n] = 0.0
                continue
            from collections import Counter
            c = Counter(grams)
            reps = [cnt * len(g) for g, cnt in c.items() if cnt >= 2]
            vals[n] = (max(reps) / L) if reps else 0.0
        g5 = [" ".join(words[j:j + 5])
              for j in range(max(len(words) - 4, 0))]
        dup5 = 0.0 if not g5 else (len(g5) - len(set(g5))) / len(g5)
        return vals[2], vals[3], vals[4], dup5

    for r in docs.collect():
        e2, e3, e4, e5 = ref(r["text"])
        got = out[r["doc_id"]]
        assert got["top2_char_frac"] == round(e2 + 1e-9, 6), r["doc_id"]
        assert got["top3_char_frac"] == round(e3 + 1e-9, 6)
        assert got["top4_char_frac"] == round(e4 + 1e-9, 6)
        assert got["dup5_frac"] == round(e5 + 1e-9, 6)
    assert out[0]["repetitive"] and out[2]["repetitive"]
    assert not out[1]["repetitive"] and not out[3]["repetitive"]


def test_redact_pii_planted(spark):
    from chronon_spark.operators.text import redact_pii

    docs = spark.createDataFrame(
        [
            (0, "contact john.doe+spam@example.co.uk or call +1-415 555-0199"),
            (1, "server at 192.168.1.254 responded"),
            (2, "clean text with number 42 and nothing private"),
            (3, "two mails: a@b.io c.d@e-f.org; ip 10.0.0.1"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert out[0]["n_email"] == 1 and "<EMAIL>" in out[0]["text_redacted"]
    assert out[0]["n_phone"] == 1 and "<PHONE>" in out[0]["text_redacted"]
    assert "john.doe" not in out[0]["text_redacted"]
    assert out[1]["n_ip"] == 1 and "<IP>" in out[1]["text_redacted"]
    assert out[2]["text_redacted"] == out[2]["text"]
    assert (out[2]["n_email"], out[2]["n_ip"], out[2]["n_phone"]) == (0, 0, 0)
    assert out[3]["n_email"] == 2 and out[3]["n_ip"] == 1


def test_unigram_lm_scores_hand_computed(spark):
    import math

    from chronon_spark.operators.text import unigram_lm_scores

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "---"), (4, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in unigram_lm_scores(docs).collect()}
    # corpus: a=2 b=2 c=1 -> N=5 V=3, denom = 5 + 0.5*4 = 7
    denom = 7.0
    lp = {t: math.log((c + 0.5) / denom) for t, c in
          {"a": 2, "b": 2, "c": 1}.items()}
    exp1 = -(2 * lp["a"] + lp["b"]) / 3 / math.log(2)
    exp2 = -(lp["b"] + lp["c"]) / 2 / math.log(2)
    assert abs(out[1]["bits_per_token"] - exp1) < 1e-12
    assert abs(out[2]["bits_per_token"] - exp2) < 1e-12
    assert out[1]["n_lm_tokens"] == 3 and out[2]["n_lm_tokens"] == 2
    # token-less docs (punctuation-only, NULL): zero tokens, NULL score
    for d in (3, 4):
        assert out[d]["n_lm_tokens"] == 0
        assert out[d]["bits_per_token"] is None


def test_unigram_lm_top_v_cap_scores_tail_as_unseen(spark):
    import math

    from chronon_spark.operators.text import unigram_lm_scores

    docs = spark.createDataFrame(
        [(1, "x x x x"), (2, "y y"), (3, "z")],
        "doc_id long, text string",
    )
    # top_v=1 keeps only 'x' (count 4); y and z score at the count-0 floor
    out = {r["doc_id"]: r for r in
           unigram_lm_scores(docs, top_v=1).collect()}
    denom = 7 + 0.5 * 4  # N=7, V=3 -> 9.0 (constants use the FULL vocab)
    floor = -math.log(0.5 / denom) / math.log(2)
    assert abs(out[2]["bits_per_token"] - floor) < 1e-12
    assert abs(out[3]["bits_per_token"] - floor) < 1e-12
    assert out[1]["bits_per_token"] < floor
