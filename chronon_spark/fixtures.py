"""Deterministic synthetic image+caption fixture — the BASELINE.json
`input_hint` table, synthesized at small scale for tests/benchmarks:

  (image_id: string, bytes: binary, w: int32, h: int32, fmt: string,
   caption: string, phash: int64, ts: long, ds: string)

Two engine-decodable formats (no image libs in this container):
  * 'rgb8'  — raw interleaved RGB uint8, lossless.
  * 'half'  — 2x2 block-mean downsample stored at half resolution; decode
    upsamples by pixel replication. A deterministic stand-in for a lossy
    codec: smooth synthetic content keeps PSNR >= 40dB (asserted in tests),
    matching the input_hint's lossy-format bar.

Content is smooth gradients + low-frequency sinusoids parameterized by a
seeded RNG per image — fully reproducible from (seed, index).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

DAY_MS = 86_400_000
BASE_TS = 1704067200000  # 2024-01-01 UTC

CAPTION_SUBJECTS = ["a red fox", "two boats", "a mountain trail", "an old clock",
                    "the night sky", "a paper lantern", "a stone bridge", "wild horses"]
CAPTION_VERBS = ["resting near", "crossing", "overlooking", "floating above",
                 "hidden behind", "circling"]
CAPTION_PLACES = ["the river delta", "a quiet harbor", "the autumn forest",
                  "snowy peaks", "an empty plaza", "rolling dunes"]


def gen_pixels(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Smooth deterministic content: per-channel gradient + sinusoid."""
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w, 3))
    for c in range(3):
        a, b, fx, fy, ph = rng.uniform(0, 1, 5)
        img[:, :, c] = (
            96 + 64 * (a * x / w + (1 - a) * y / h)
            + 48 * b * np.sin(2 * np.pi * (fx * x / w + fy * y / h) + ph * 6.28)
        )
    return np.clip(img, 0, 255).astype(np.uint8)


def encode_image(pix: np.ndarray, fmt: str) -> bytes:
    h, w, _ = pix.shape
    if fmt == "rgb8":
        return pix.tobytes()
    if fmt == "half":
        ph = pix[: h - h % 2, : w - w % 2].astype(np.float64)
        small = (
            ph.reshape(h // 2, 2, w // 2, 2, 3).mean(axis=(1, 3))
        )
        return np.round(small).astype(np.uint8).tobytes()
    raise ValueError(f"unknown fmt {fmt}")


def decode_image(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Decode to (h, w, 3) uint8. Only the engine-native formats here —
    multimodal.decode_image handles the stubbed external codecs."""
    if fmt == "rgb8":
        return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    if fmt == "half":
        small = np.frombuffer(data, dtype=np.uint8).reshape(h // 2, w // 2, 3)
        return np.repeat(np.repeat(small, 2, axis=0), 2, axis=1)
    raise ValueError(f"unknown fmt {fmt}")


def phash64(pix: np.ndarray) -> int:
    """64-bit perceptual hash: 8x8 block-mean of grayscale, thresholded at
    the mean (deterministic, library-free)."""
    g = pix.astype(np.float64).mean(axis=2)
    h, w = g.shape
    bh, bw = h // 8, w // 8
    blocks = g[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).astype(np.uint64).ravel()
    val = int((bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
    return val - (1 << 64) if val >= (1 << 63) else val


def gen_caption(rng: np.random.Generator) -> str:
    s = CAPTION_SUBJECTS[int(rng.integers(0, len(CAPTION_SUBJECTS)))]
    v = CAPTION_VERBS[int(rng.integers(0, len(CAPTION_VERBS)))]
    p = CAPTION_PLACES[int(rng.integers(0, len(CAPTION_PLACES)))]
    return f"{s} {v} {p}"


def gen_image_rows(n: int, seed: int = 42, span_days: int = 30):
    """Yield fixture rows. ~15% of images are re-captured duplicates of an
    earlier image (same pixels/phash, later ts) — the dedup scenario."""
    sizes = [(32, 32), (64, 48), (48, 64), (80, 60)]
    rows = []
    for i in range(n):
        rng = np.random.default_rng(seed * 1_000_003 + i)
        if i > 10 and rng.random() < 0.15:
            src = int(rng.integers(0, i))
            srng = np.random.default_rng(seed * 1_000_003 + src)
            w, h = sizes[int(srng.integers(0, len(sizes)))]
            pix = gen_pixels(srng, w, h)
            caption = gen_caption(srng)
        else:
            w, h = sizes[int(rng.integers(0, len(sizes)))]
            pix = gen_pixels(rng, w, h)
            caption = gen_caption(rng)
        fmt = "rgb8" if rng.random() < 0.5 else "half"
        data = encode_image(pix, fmt)
        ts = BASE_TS + int(rng.integers(0, span_days * DAY_MS))
        rows.append({
            "image_id": f"img_{i:08d}",
            "bytes": data,
            "w": int(w),
            "h": int(h),
            "fmt": fmt,
            "caption": caption,
            "phash": phash64(decode_image(data, w, h, fmt)),
            "ts": ts,
        })
    return rows


def image_schema() -> str:
    return ("image_id string, bytes binary, w int, h int, fmt string, "
            "caption string, phash long, ts long")


def ensure_image_fixture(
    n: int = 500, seed: int = 42, out_dir: str = "/root/repo/.fixtures"
) -> str:
    """Write the fixture parquet (hive ds-partitioned single file) once;
    return the parquet path. Idempotent on (n, seed)."""
    path = os.path.join(out_dir, f"images_n{n}_s{seed}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = gen_image_rows(n, seed)
    ds = [
        __import__("datetime").datetime.utcfromtimestamp(r["ts"] / 1000).strftime("%Y-%m-%d")
        for r in rows
    ]
    table = pa.table({
        "image_id": [r["image_id"] for r in rows],
        "bytes": pa.array([r["bytes"] for r in rows], type=pa.binary()),
        "w": pa.array([r["w"] for r in rows], type=pa.int32()),
        "h": pa.array([r["h"] for r in rows], type=pa.int32()),
        "fmt": [r["fmt"] for r in rows],
        "caption": [r["caption"] for r in rows],
        "phash": pa.array([r["phash"] for r in rows], type=pa.int64()),
        "ts": pa.array([r["ts"] for r in rows], type=pa.int64()),
        "ds": ds,
    })
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path
