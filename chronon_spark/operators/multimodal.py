"""Multimodal (image/audio/video) column operators.

Payload columns are opaque `binary` with typed metadata (w, h, fmt). All
decode / feature-extract / resize run as Arrow-batched pandas UDFs over
`mapInPandas` — binary never round-trips through Python row objects, and
the per-batch loop is numpy-vectorized per image.

Engine-native codecs ('rgb8', 'half' — see fixtures.py) decode for real.
External codecs (jpeg/png/webp, audio, video) are STUBBED behind
`NotImplementedError` — the container ships no PIL/libjpeg/ffmpeg — but
the Spark-side plumbing (schema, batching, partitioning, UDF signatures)
is identical to what a real decoder drops into.

Scale notes: feature extraction is scan-shaped (no shuffle); Arrow batch
size is bounded via spark.sql.execution.arrow.maxRecordsPerBatch so a
batch of 4K images x ~12KB stays well inside executor memory. Downstream
GroupBys shuffle only the extracted scalar features, never the bytes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chronon_spark.fixtures import decode_image as _decode_native
from chronon_spark.fixtures import phash64

NATIVE_FORMATS = ("rgb8", "half")


def decode_image(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Decode one image to (h, w, 3) uint8."""
    if fmt in NATIVE_FORMATS:
        return _decode_native(data, w, h, fmt)
    # STUB: external codecs need PIL/libjpeg — not present in this
    # container. A real deployment implements this branch with
    # PIL.Image.open(io.BytesIO(data)); everything downstream is unchanged.
    raise NotImplementedError(
        f"codec '{fmt}' requires an external image library (PIL) — "
        f"not available in this environment"
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


PIXEL_FEATURE_SCHEMA = (
    "image_id string, phash_check long, brightness double, contrast double, "
    "r_mean double, g_mean double, b_mean double, edge_energy double, "
    "aspect double, decode_ok boolean"
)


def extract_pixel_features(
    df: DataFrame, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """Decode + pixel-derived features in one Arrow pass.

    Input columns: image_id, bytes, w, h, fmt. Output one row per image:
    recomputed phash (integrity check vs the stored column), brightness,
    per-channel means, contrast (grayscale std), edge energy (mean
    gradient magnitude), aspect ratio. Unknown codecs yield
    decode_ok=false rows instead of failing the job.

    `passthrough` columns of the input are carried through the Arrow
    batch unchanged (pandas column slice, no per-row work) and appended
    to the output. This FUSES the decode stage with downstream
    consumers: carrying (entity key, ts, payload) through decode lets
    the pixel features ride an as-of join's probe side directly —
    decode -> cogroup in two stages with no image_id merge join and no
    shuffle of the binary column at all.
    """
    pt_fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    pt_schema = "".join(f", `{c}` {pt_fields[c]}" for c in passthrough)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("image_id", "phash_check", "brightness",
                                   "contrast", "r_mean", "g_mean", "b_mean",
                                   "edge_energy", "aspect", "decode_ok")}
            for iid, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                out["image_id"].append(iid)
                try:
                    pix = decode_image(data, int(w), int(h), fmt)
                except NotImplementedError:
                    for k in ("phash_check",):
                        out[k].append(None)
                    for k in ("brightness", "contrast", "r_mean", "g_mean",
                              "b_mean", "edge_energy", "aspect"):
                        out[k].append(None)
                    out["decode_ok"].append(False)
                    continue
                g = pix.astype(np.float64).mean(axis=2)
                gy, gx = np.gradient(g)
                out["phash_check"].append(phash64(pix))
                out["brightness"].append(float(g.mean()))
                out["contrast"].append(float(g.std()))
                out["r_mean"].append(float(pix[:, :, 0].mean()))
                out["g_mean"].append(float(pix[:, :, 1].mean()))
                out["b_mean"].append(float(pix[:, :, 2].mean()))
                out["edge_energy"].append(float(np.hypot(gx, gy).mean()))
                out["aspect"].append(float(w) / float(h))
                out["decode_ok"].append(True)
            res = pd.DataFrame(out)
            for c in passthrough:
                res[c] = pdf[c].reset_index(drop=True)
            yield res

    in_cols = list(dict.fromkeys(
        ["image_id", "bytes", "w", "h", "fmt"] + list(passthrough)
    ))
    return df.select(*in_cols).mapInPandas(
        batches, schema=PIXEL_FEATURE_SCHEMA + pt_schema
    )


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize; emits re-encoded 'rgb8' bytes. Same
    mapInPandas shape a real resampler (PIL.resize) would use."""
    schema = "image_id string, bytes binary, w int, h int, fmt string"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"image_id": [], "bytes": [], "w": [], "h": [], "fmt": []}
            for iid, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                pix = decode_image(data, int(w), int(h), fmt)
                yi = (np.arange(out_h) * h // out_h).astype(np.int64)
                xi = (np.arange(out_w) * w // out_w).astype(np.int64)
                res = pix[yi][:, xi]
                rows["image_id"].append(iid)
                rows["bytes"].append(res.tobytes())
                rows["w"].append(out_w)
                rows["h"].append(out_h)
                rows["fmt"].append("rgb8")
            yield pd.DataFrame(rows)

    return df.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        batches, schema=schema
    )


def sample_frames(df: DataFrame, every_n: int) -> DataFrame:
    """Video frame-sampling STUB: the container has no video codec. The
    real implementation maps (video_bytes) -> rows of (frame_idx, frame
    bytes) with this exact mapInPandas signature."""
    raise NotImplementedError(
        "video decode requires ffmpeg/pyav — not available in this environment"
    )


def with_image_features(images: DataFrame) -> DataFrame:
    """The image table enriched with pixel features — single scan-shaped
    stage: every non-payload input column is carried through the decode
    UDF as a passthrough, so there is NO image_id merge join and NO
    shuffle (the r2 version joined two 480k-row frames instead)."""
    extra = tuple(c for c in images.columns if c != "image_id")
    return extract_pixel_features(images, passthrough=extra)
