"""image_quality metrics: hand-computed values on engineered inputs
(never via image_quality_np itself), content-class separation, and the
Spark operator against fixture sidecars."""

import numpy as np
from pyspark.sql import functions as F

from chronon_spark.operators.multimodal import image_quality, image_quality_np


def test_flat_image_hand_values():
    pix = np.full((8, 8, 3), 100, dtype=np.uint8)
    m = image_quality_np(pix)
    assert m["laplacian_var"] == 0.0
    assert m["entropy_bits"] == 0.0
    assert str(m["entropy_bits"]) == "0.0"     # canonicalized, not -0.0
    assert m["colorfulness"] == 0.0
    assert m["saturation"] == 0.0
    assert m["clip_frac"] == 0.0


def test_checkerboard_laplacian_hand_value():
    # gray checkerboard 0/255: interior 4-neighbour laplacian is
    # +-4*255 alternating -> variance = (4*255)^2, mean 0
    pix = np.zeros((8, 8, 3), dtype=np.uint8)
    pix[(np.add.outer(np.arange(8), np.arange(8)) % 2) == 1] = 255
    m = image_quality_np(pix)
    assert abs(m["laplacian_var"] - (4 * 255.0) ** 2) < 1e-9
    # two equally-likely gray levels -> exactly 1 bit
    assert abs(m["entropy_bits"] - 1.0) < 1e-12
    # every pixel is at a rail
    assert m["clip_frac"] == 1.0
    # grayscale -> zero colorfulness and saturation
    assert m["colorfulness"] == 0.0
    assert m["saturation"] == 0.0


def test_pure_red_colorfulness_hand_value():
    # R=255,G=0,B=0 everywhere: rg=255 const, yb=127.5 const ->
    # var 0, colorfulness = 0.3*sqrt(255^2+127.5^2); saturation = 1
    pix = np.zeros((4, 4, 3), dtype=np.uint8)
    pix[:, :, 0] = 255
    m = image_quality_np(pix)
    exp = 0.3 * np.sqrt(255.0 ** 2 + 127.5 ** 2)
    assert abs(m["colorfulness"] - exp) < 1e-9
    assert m["saturation"] == 1.0


def test_half_clip_fraction():
    pix = np.zeros((4, 4, 3), dtype=np.uint8)
    pix[:2] = 128
    assert image_quality_np(pix)["clip_frac"] == 0.5


def test_blur_reduces_laplacian():
    from chronon_spark.fixtures import _box_blur

    rng = np.random.default_rng(7)
    pix = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    sharp = image_quality_np(pix)["laplacian_var"]
    blurred = image_quality_np(_box_blur(pix, 5))["laplacian_var"]
    assert blurred < sharp / 10


def test_spark_operator_matches_sidecars(spark):
    from chronon_spark.fixtures import ensure_quality_fixture

    imgs = spark.read.parquet(ensure_quality_fixture(n=200, seed=131))
    out = image_quality(
        imgs, passthrough=("q_lap", "q_ent", "q_col", "q_sat", "q_clip",
                           "q_ok"))
    rows = out.collect()
    assert len(rows) == 200
    n_bad = 0
    for r in rows:
        assert r.decode_ok == r.q_ok
        if not r.decode_ok:
            n_bad += 1
            assert r.laplacian_var is None and r.entropy_bits is None
            continue
        for got, want in [(r.laplacian_var, r.q_lap),
                          (r.entropy_bits, r.q_ent),
                          (r.colorfulness, r.q_col),
                          (r.saturation, r.q_sat),
                          (r.clip_frac, r.q_clip)]:
            assert got == want          # same formula, same pixels: exact
    assert n_bad > 0                     # fixture plants corrupt rows
    # the plan is a single scan-stage pass: no shuffle (Exchange) nodes
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_resize_kernels_hand_math():
    from chronon_spark.operators.multimodal import (
        _resize_area,
        _resize_bilinear,
        _resize_nearest,
    )

    # area 2:1 on even dims == exact block mean (the 'half' codec)
    rng = np.random.default_rng(31)
    pix = rng.integers(0, 256, (8, 12, 3), dtype=np.uint8)
    half = pix.astype(np.float64).reshape(4, 2, 6, 2, 3).mean(axis=(1, 3))
    got = _resize_area(pix, 6, 4)
    assert np.array_equal(got, np.round(half).astype(np.uint8))
    # area is mean-preserving for ANY output geometry
    got2 = _resize_area(pix, 5, 3).astype(np.float64)
    assert abs(got2.mean() - pix.astype(np.float64).mean()) < 1.0
    # bilinear preserves an affine ramp in the interior (half-pixel
    # centers map exactly onto source sample positions at 2:1)
    ramp = np.repeat(
        np.repeat((np.arange(16, dtype=np.uint8) * 16)[None, :, None]
                  .repeat(3, axis=2)[:, :, None, :].reshape(1, 16, 1, 3),
        8, axis=0), 1, axis=2).reshape(8, 16, 3)
    up = _resize_bilinear(ramp, 32, 8)
    # interior columns step by exactly 8 along the doubled ramp
    diffs = np.diff(up[4, 2:30, 0].astype(np.int64))
    assert set(diffs.tolist()) == {8}
    # nearest on identity geometry is the identity
    assert np.array_equal(_resize_nearest(pix, 12, 8), pix)
    assert np.array_equal(_resize_bilinear(pix, 12, 8), pix)
    assert np.array_equal(_resize_area(pix, 12, 8), pix)


def test_resize_spark_operator_methods(spark):
    from pyspark.sql import functions as F

    from chronon_spark.fixtures import ensure_quality_fixture
    from chronon_spark.operators.multimodal import resize_images

    imgs = spark.read.parquet(ensure_quality_fixture(n=60, seed=131))
    for method in ("nearest", "bilinear", "area"):
        out = resize_images(imgs, 16, 16, method=method)
        ok = out.where(F.col("decode_ok"))
        n = ok.count()
        assert n > 0
        r = ok.select(F.length("bytes").alias("l"), "w", "h").first()
        assert r.l == 16 * 16 * 3 and r.w == 16 and r.h == 16
    import pytest as _pytest

    with _pytest.raises(ValueError):
        resize_images(imgs, 8, 8, method="lanczos9")


def test_letterbox_hand_math(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from chronon_spark.operators.multimodal import letterbox_images

    # a 20x10 image into a 16x16 box: scale 0.8 -> inner 16x8, pad_y 4
    pix = np.arange(20 * 10 * 3, dtype=np.uint8).reshape(10, 20, 3)
    df = spark.createDataFrame(pd.DataFrame({
        "image_id": ["a", "bad"],
        "bytes": [pix.tobytes(), b"\x00\x01"],
        "w": [20, 20], "h": [10, 10], "fmt": ["rgb8", "rgb8"],
    }))
    rows = {r.image_id: r for r in
            letterbox_images(df, 16, 16, method="nearest",
                             pad_rgb=(7, 8, 9)).collect()}
    r = rows["a"]
    assert r.decode_ok and r.w == 16 and r.h == 16
    assert abs(r.scale - 0.8) < 1e-12 and r.pad_x == 0 and r.pad_y == 4
    canvas = np.frombuffer(r.bytes, dtype=np.uint8).reshape(16, 16, 3)
    # pad rows carry exactly the pad color
    assert (canvas[:4] == np.array([7, 8, 9])).all()
    assert (canvas[12:] == np.array([7, 8, 9])).all()
    # inner region is the nearest-resized source (top-left pixel kept)
    assert (canvas[4, 0] == pix[0, 0]).all()
    bad = rows["bad"]
    assert not bad.decode_ok and bad.bytes is None and bad.scale is None
