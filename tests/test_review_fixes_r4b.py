"""Pins for the late-round-4 review findings on the dedup / multimodal /
sampling surface:

1. simhash64_np is bit-identical to the simhash64_py reference (the
   vectorized kernel dedups windows by CONTENT, not fingerprint, so the
   DuckDB oracle parity is preserved exactly).
2. minhash banding is derived from the threshold by default (bands=None)
   and invalid explicit bands fail loudly instead of degenerating the
   band keys (empty-slice all-pairs blowup).
3. One corrupt or NULL payload never fails a multimodal decode job:
   image / video / audio / resize all emit decode_ok=false rows.
4. curate_images keeps decoded NULL-caption rows when the caption gate
   is disabled, and works on tables with no caption column at all.
5. duplicate_spans preserves string document ids.
6. embedding_neardup_pairs returns an empty pair frame (not a crash)
   for empty / all-null-vector inputs.
"""
import random

import numpy as np
import pytest

from chronon_spark.operators.dedup import (
    _auto_bands,
    duplicate_spans,
    embedding_neardup_pairs,
    minhash_lsh_pairs,
    simhash64_np,
    simhash64_py,
)


# ---------------------------------------------------------------------------
# 1. vectorized simhash == python reference
# ---------------------------------------------------------------------------
def test_simhash_np_matches_py_reference():
    rng = random.Random(42)
    pools = [
        "abcdefgh ",
        "the quick brown fox αβγδ 汉字テスト",
        "aaaaaaaaab",  # heavy repeats -> distinct-shingle dedup matters
    ]
    cases = ["", "a", "ab", "abc", None]
    for _ in range(60):
        pool = rng.choice(pools)
        cases.append("".join(rng.choice(pool) for _ in range(rng.randint(1, 80))))
    for n in (3, 5, 10):  # n=10 exercises the >8 per-column mod path
        for t in cases:
            assert simhash64_np(t, n) == simhash64_py(t, n), (n, t)


def test_simhash_np_counts_duplicate_shingle_once():
    # 'abcabcabc' has shingles {abc, bca, cab} each appearing multiple
    # times; both implementations must dedup on shingle CONTENT.
    assert simhash64_np("abcabcabcabc", 3) == simhash64_py("abcabcabcabc", 3)


# ---------------------------------------------------------------------------
# 2. threshold-matched banding + validation
# ---------------------------------------------------------------------------
def test_auto_bands_matches_threshold():
    # classic 0.8 operating point keeps the textbook 16 bands (r=4)
    assert _auto_bands(64, 0.8) == 16
    # at 0.3 the fixed 16 bands would catch only ~12% of threshold
    # pairs; auto-banding must widen to r=2
    assert _auto_bands(64, 0.3) == 32
    # recall at the threshold is >= 0.95 for the chosen banding
    for t in (0.2, 0.3, 0.5, 0.8, 0.9):
        b = _auto_bands(64, t)
        r = 64 // b
        assert 1 - (1 - t**r) ** b >= 0.95 or b == 64


def test_invalid_bands_raise(spark):
    df = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    with pytest.raises(ValueError, match="divisor"):
        minhash_lsh_pairs(df, "doc_id", "text", num_hashes=64, bands=128)
    with pytest.raises(ValueError, match="divisor"):
        minhash_lsh_pairs(df, "doc_id", "text", num_hashes=64, bands=10)


# ---------------------------------------------------------------------------
# 3. corrupt / NULL payloads -> decode_ok=false rows, never a failed job
# ---------------------------------------------------------------------------
def _img_rows(spark):
    from chronon_spark.fixtures import encode_image

    pix = np.full((4, 4, 3), 128, dtype=np.uint8)
    return spark.createDataFrame(
        [
            ("ok", encode_image(pix, "rgb8"), 4, 4, "rgb8", "fine"),
            ("nullb", None, 4, 4, "rgb8", "null payload"),
            ("webp", b"\x00\x01", 4, 4, "webp", None),
        ],
        "image_id string, bytes binary, w int, h int, fmt string, caption string",
    )


def test_pixel_features_null_bytes_row(spark):
    from chronon_spark.operators.multimodal import extract_pixel_features

    rows = {r["image_id"]: r for r in extract_pixel_features(_img_rows(spark)).collect()}
    assert rows["ok"]["decode_ok"] is True
    assert rows["nullb"]["decode_ok"] is False
    assert rows["webp"]["decode_ok"] is False


def test_resize_images_survives_bad_rows(spark):
    from chronon_spark.operators.multimodal import resize_images

    out = {r["image_id"]: r for r in resize_images(_img_rows(spark), 2, 2).collect()}
    assert out["ok"]["decode_ok"] is True and len(out["ok"]["bytes"]) == 2 * 2 * 3
    assert out["nullb"]["decode_ok"] is False and out["nullb"]["bytes"] is None
    assert out["webp"]["decode_ok"] is False


def test_video_features_null_bytes_row(spark):
    from chronon_spark.operators.multimodal import extract_video_features

    df = spark.createDataFrame(
        [("v0", None, 4, 4, 2, "vraw")],
        "video_id string, bytes binary, w int, h int, n_frames int, fmt string",
    )
    [r] = extract_video_features(df).collect()
    assert r["decode_ok"] is False


def test_audio_features_corrupt_and_null_rows(spark):
    from chronon_spark.operators.multimodal import extract_audio_features

    pcm = (np.sin(np.arange(64)) * 1000).astype("<i2").tobytes()
    df = spark.createDataFrame(
        [
            ("ok", pcm, 16000, "pcm16"),
            ("odd", pcm[:-1], 16000, "pcm16"),  # truncated: odd byte count
            ("nullb", None, 16000, "pcm16"),
            ("mp3", b"\xff\xfb", 16000, "mp3"),
        ],
        "audio_id string, bytes binary, sr int, fmt string",
    )
    rows = {r["audio_id"]: r for r in extract_audio_features(df).collect()}
    assert rows["ok"]["decode_ok"] is True
    for bad in ("odd", "nullb", "mp3"):
        assert rows[bad]["decode_ok"] is False, bad


# ---------------------------------------------------------------------------
# 4. curate_images caption handling
# ---------------------------------------------------------------------------
def test_curate_images_null_caption_kept_when_gate_disabled(spark):
    from chronon_spark.fixtures import encode_image
    from chronon_spark.operators.multimodal import curate_images

    pix = np.full((4, 4, 3), 100, dtype=np.uint8)
    df = spark.createDataFrame(
        [
            ("a", encode_image(pix, "rgb8"), 4, 4, "rgb8", None),
            ("b", encode_image(pix + 50, "rgb8"), 4, 4, "rgb8", "two words"),
        ],
        "image_id string, bytes binary, w int, h int, fmt string, caption string",
    )
    ids = {r["image_id"] for r in curate_images(df).collect()}
    assert ids == {"a", "b"}  # NULL caption must NOT silently drop 'a'
    # but the gate still applies when enabled
    ids2 = {r["image_id"] for r in curate_images(df, min_caption_tokens=1).collect()}
    assert ids2 == {"b"}


def test_curate_images_without_caption_column(spark):
    from chronon_spark.fixtures import encode_image
    from chronon_spark.operators.multimodal import curate_images

    pix = np.full((4, 4, 3), 100, dtype=np.uint8)
    df = spark.createDataFrame(
        [("a", encode_image(pix, "rgb8"), 4, 4, "rgb8")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    assert curate_images(df).count() == 1
    with pytest.raises(ValueError, match="caption"):
        curate_images(df, min_caption_tokens=1)


# ---------------------------------------------------------------------------
# 5. string ids through duplicate_spans
# ---------------------------------------------------------------------------
def test_duplicate_spans_string_ids(spark):
    boiler = "x" * 60
    df = spark.createDataFrame(
        [("img_a", "A" + boiler), ("img_b", "B" + boiler), ("img_c", "unique text")],
        "image_id string, text string",
    )
    spans = duplicate_spans(df, "image_id", "text", n=50).collect()
    got = {r["image_id"] for r in spans}
    assert got == {"img_a", "img_b"}
    assert all(isinstance(r["image_id"], str) for r in spans)


# ---------------------------------------------------------------------------
# 6. empty / all-null embedding input
# ---------------------------------------------------------------------------
def test_embedding_neardup_empty_input(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert embedding_neardup_pairs(empty, "vec_id", "embedding").count() == 0
    allnull = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id long, embedding array<double>"
    )
    assert embedding_neardup_pairs(allnull, "vec_id", "embedding").count() == 0
