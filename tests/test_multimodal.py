"""Image fixture + multimodal operator tests — the input_hint invariants:
decoded-pixel parity (PSNR >= 40dB for the lossy format), caption
equality, phash integrity, Arrow-batched feature extraction.
"""

import numpy as np
import pytest

from chronon_spark.fixtures import (
    decode_image,
    encode_image,
    gen_caption,
    gen_image_rows,
    gen_pixels,
    ensure_image_fixture,
    phash64,
)
from chronon_spark.operators.multimodal import (
    extract_pixel_features,
    psnr,
    resize_images,
    with_image_features,
)


def test_rgb8_roundtrip_lossless():
    rng = np.random.default_rng(1)
    pix = gen_pixels(rng, 64, 48)
    assert np.array_equal(decode_image(encode_image(pix, "rgb8"), 64, 48, "rgb8"), pix)


def test_half_codec_psnr_above_40db():
    """The lossy format must stay above the input_hint's 40dB bar on the
    synthetic (smooth) content."""
    for i in range(20):
        rng = np.random.default_rng(100 + i)
        pix = gen_pixels(rng, 64, 48)
        dec = decode_image(encode_image(pix, "half"), 64, 48, "half")
        assert psnr(pix, dec) >= 40.0, f"image {i}: {psnr(pix, dec):.1f}dB"


def test_fixture_determinism_and_captions():
    a = gen_image_rows(30, seed=7)
    b = gen_image_rows(30, seed=7)
    for ra, rb in zip(a, b):
        assert ra["caption"] == rb["caption"]  # captions exact
        assert ra["bytes"] == rb["bytes"]
        assert ra["phash"] == rb["phash"]


def test_fixture_has_duplicate_phashes():
    rows = gen_image_rows(200, seed=42)
    phashes = [r["phash"] for r in rows]
    assert len(set(phashes)) < len(phashes)  # re-captures share phash


def test_phash_robust_to_lossy_encode():
    rng = np.random.default_rng(5)
    pix = gen_pixels(rng, 64, 48)
    dec = decode_image(encode_image(pix, "half"), 64, 48, "half")
    a, b = phash64(pix), phash64(dec)
    assert bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1") <= 4


def test_extract_pixel_features_matches_numpy(spark):
    path = ensure_image_fixture(n=60, seed=9, out_dir="/tmp/chronon_fixtures_test")
    df = spark.read.parquet(path)
    feats = {r["image_id"]: r for r in extract_pixel_features(df).collect()}
    rows = gen_image_rows(60, seed=9)
    assert len(feats) == 60
    for r in rows[:10]:
        pix = decode_image(r["bytes"], r["w"], r["h"], r["fmt"])
        f = feats[r["image_id"]]
        assert f["decode_ok"]
        assert f["phash_check"] == r["phash"]
        assert f["brightness"] == pytest.approx(pix.astype(np.float64).mean(), rel=1e-9)
        assert f["r_mean"] == pytest.approx(pix[:, :, 0].mean(), rel=1e-9)


def test_unknown_codec_yields_decode_failed_row(spark):
    df = spark.createDataFrame(
        [("x", bytearray(b"\xff\xd8\xff"), 10, 10, "jpeg")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    row = extract_pixel_features(df).collect()[0]
    assert row["decode_ok"] is False and row["brightness"] is None


def test_resize_shapes(spark):
    path = ensure_image_fixture(n=10, seed=9, out_dir="/tmp/chronon_fixtures_test")
    df = spark.read.parquet(path)
    out = resize_images(df, 16, 16).collect()
    for r in out:
        assert r["w"] == 16 and r["h"] == 16
        assert len(r["bytes"]) == 16 * 16 * 3


def test_with_image_features_join(spark):
    path = ensure_image_fixture(n=40, seed=9, out_dir="/tmp/chronon_fixtures_test")
    df = spark.read.parquet(path)
    out = with_image_features(df)
    assert out.count() == 40
    assert out.where("phash_check = phash").count() == 40  # integrity
