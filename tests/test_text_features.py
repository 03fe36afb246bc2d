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
