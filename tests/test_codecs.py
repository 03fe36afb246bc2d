"""From-scratch PNG / baseline-JPEG codec tests (chronon_spark/codecs.py)
and their integration with the fused decode pipeline."""

import struct
import zlib

import numpy as np
import pytest

from chronon_spark.codecs import (
    decode_jpeg,
    decode_png,
    encode_jpeg,
    encode_png,
)
from chronon_spark.fixtures import gen_pixels, phash64
from chronon_spark.operators.multimodal import psnr


def test_png_round_trip_exact():
    rng = np.random.default_rng(5)
    for w, h in [(64, 48), (33, 17), (8, 8), (1, 1), (2, 300)]:
        pix = gen_pixels(rng, w, h)
        assert np.array_equal(decode_png(encode_png(pix)), pix)
    noise = rng.integers(0, 256, (23, 31, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(noise)), noise)


def _png_with_filters(pix: np.ndarray, filters: list[int]) -> bytes:
    """Re-encode pixels using the given per-row filter types — what a
    real external encoder emits (our own encoder always uses 0)."""
    from chronon_spark.codecs import _png_chunk, _PNG_SIG

    h, w, _ = pix.shape
    bpp = 3
    prev = np.zeros(w * bpp, dtype=np.int64)
    out = bytearray()
    for r in range(h):
        line = pix[r].reshape(-1).astype(np.int64)
        f = filters[r % len(filters)]
        enc = line.copy()
        for x in range(w * bpp):
            a = line[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 1:
                enc[x] = (line[x] - a) % 256
            elif f == 2:
                enc[x] = (line[x] - b) % 256
            elif f == 3:
                enc[x] = (line[x] - ((a + b) >> 1)) % 256
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (line[x] - pred) % 256
        out.append(f)
        out += bytes(enc.astype(np.uint8))
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_decodes_all_filter_types():
    rng = np.random.default_rng(6)
    pix = rng.integers(0, 256, (12, 9, 3), dtype=np.uint8)
    for filters in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        data = _png_with_filters(pix, filters)
        assert np.array_equal(decode_png(data), pix), filters


def test_png_rejects_garbage():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")


def test_jpeg_smooth_content_psnr_over_40db():
    rng = np.random.default_rng(7)
    for w, h in [(64, 48), (48, 64), (80, 60), (32, 32)]:
        pix = gen_pixels(rng, w, h)
        enc = encode_jpeg(pix, quality=92)
        dec = decode_jpeg(enc)
        assert dec.shape == pix.shape
        assert psnr(pix, dec) >= 40.0
        # real compression, not a raw dump
        assert len(enc) < 0.25 * pix.nbytes


def test_jpeg_non_multiple_of_8_and_edge_content():
    rng = np.random.default_rng(8)
    pix = rng.integers(0, 256, (19, 37, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(pix, quality=75))
    assert dec.shape == pix.shape
    flat = np.full((24, 16, 3), 200, np.uint8)
    assert psnr(flat, decode_jpeg(encode_jpeg(flat, 90))) == float("inf")


def test_jpeg_quality_monotone():
    rng = np.random.default_rng(9)
    pix = gen_pixels(rng, 64, 64)
    p_low = psnr(pix, decode_jpeg(encode_jpeg(pix, 25)))
    p_high = psnr(pix, decode_jpeg(encode_jpeg(pix, 95)))
    assert p_high > p_low
    assert len(encode_jpeg(pix, 25)) < len(encode_jpeg(pix, 95))


def test_jpeg_phash_near_stable_at_q92():
    """Near-dup clustering needs the phash of a lossy re-encode to stay
    within the banding radius (hamming <= 2), not bit-identical."""
    rng = np.random.default_rng(10)
    for _ in range(5):
        pix = gen_pixels(rng, 64, 48)
        dec = decode_jpeg(encode_jpeg(pix, quality=92))
        ham = bin(
            (phash64(pix) & 0xFFFFFFFFFFFFFFFF)
            ^ (phash64(dec) & 0xFFFFFFFFFFFFFFFF)
        ).count("1")
        assert ham <= 2, ham


def test_real_fixture_pipeline_decodes(spark):
    """png/jpeg/gif/bmp flow through the fused Arrow decode pass: every
    row decode_ok, phash integrity holds, PSNR sidecar >= 40."""
    from chronon_spark.fixtures import ensure_real_image_fixture
    from chronon_spark.operators.multimodal import with_image_features

    from pyspark.sql import functions as F

    path = ensure_real_image_fixture(n=40, seed=11)
    images = spark.read.parquet(path)
    out = with_image_features(images).select(
        "decode_ok",
        (F.col("phash_check") == F.col("phash")).alias("pm"),
        (F.col("psnr_db") >= 40.0).alias("ok40"),
        "fmt",
    )
    rows = out.collect()
    assert len(rows) == 40
    assert all(r.decode_ok for r in rows)
    assert all(r.pm for r in rows)
    assert all(r.ok40 for r in rows)
    fmts = {r.fmt for r in rows}
    # v5 fixture mixes all six real interchange formats; at n=40 the
    # deterministic seed draws every one of them
    assert fmts == {"png", "jpeg", "gif", "bmp", "tiff", "webp"}


# ---------------------------------------------------------------------------
# chroma subsampling + restart markers (r4 codec completion: the dominant
# real-world JPEG layout is 4:2:0, often with DRI/RSTn)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("subsampling", ["420", "422", "440"])
def test_jpeg_subsampled_round_trip_psnr(subsampling):
    rng = np.random.default_rng(21)
    for w, h in [(32, 32), (64, 48), (48, 64), (80, 60)]:
        pix = gen_pixels(rng, w, h)
        enc = encode_jpeg(pix, quality=92, subsampling=subsampling)
        dec = decode_jpeg(enc)
        assert dec.shape == pix.shape
        assert psnr(pix, dec) >= 40.0
        # subsampling actually shrinks the stream vs 4:4:4
        assert len(enc) < len(encode_jpeg(pix, quality=92))


def test_jpeg_sof_declares_sampling_factors():
    """The 4:2:0 stream really is 4:2:0 on the wire: SOF0 carries Y=2x2,
    chroma=1x1 and the MCU count shrinks to 16x16 tiles."""
    pix = gen_pixels(np.random.default_rng(22), 48, 32)
    enc = encode_jpeg(pix, quality=90, subsampling="420")
    i = enc.find(b"\xff\xc0")
    assert i > 0
    # marker(2) len(2) precision(1) h(2) w(2) nc(1), then cid/samp/tq x3
    samp_y = enc[i + 11]
    samp_cb = enc[i + 14]
    assert samp_y == 0x22 and samp_cb == 0x11


def test_jpeg_restart_markers_round_trip_and_on_wire():
    rng = np.random.default_rng(23)
    pix = gen_pixels(rng, 80, 60)  # 420: 5x4 MCUs -> RSTs with interval 2
    for sub in ("444", "420"):
        enc = encode_jpeg(pix, quality=92, subsampling=sub, restart_interval=2)
        # DRI on the wire with the declared interval
        d = enc.find(b"\xff\xdd")
        assert d > 0 and struct.unpack(">H", enc[d + 4 : d + 6])[0] == 2
        # at least one RSTn in the entropy stream
        assert any(enc.find(bytes([0xFF, 0xD0 + k])) > d for k in range(8))
        dec = decode_jpeg(enc)
        assert dec.shape == pix.shape
        assert psnr(pix, dec) >= 40.0
        # restart segmentation must not change the pixels at all: the
        # same quantized coefficients decode identically either way
        assert np.array_equal(
            dec, decode_jpeg(encode_jpeg(pix, quality=92, subsampling=sub))
        )


def test_jpeg_restart_dc_prediction_resets():
    """A gradient image has strongly non-zero DC deltas across MCUs; if
    the decoder failed to reset predictors at RST boundaries the blocks
    after each marker would shift visibly. interval=1 maximizes resets."""
    pix = gen_pixels(np.random.default_rng(24), 64, 64)
    enc = encode_jpeg(pix, quality=92, restart_interval=1)
    assert psnr(pix, decode_jpeg(enc)) >= 40.0


def test_jpeg_subsampled_corrupt_inputs_raise():
    pix = gen_pixels(np.random.default_rng(25), 32, 32)
    enc = encode_jpeg(pix, quality=92, subsampling="420", restart_interval=2)
    for cut in (10, len(enc) // 2, len(enc) - 3):
        with pytest.raises(ValueError):
            decode_jpeg(enc[:cut])
    # RST markers without a DRI declaration must be rejected, not skipped
    no_dri = bytearray(enc)
    d = bytes(no_dri).find(b"\xff\xdd")
    del no_dri[d : d + 6]
    with pytest.raises(ValueError):
        decode_jpeg(bytes(no_dri))


# ---------------------------------------------------------------------------
# PNG completeness (r4: all five color types, 16-bit depth, tRNS, Adam7 —
# the layouts externally-produced PNGs actually use)
# ---------------------------------------------------------------------------

def _alpha_over_white(rgb, alpha):
    rgb = rgb.astype(np.int64)
    a = alpha.astype(np.int64)[:, :, None]
    return ((rgb * a + 255 * (255 - a) + 127) // 255).astype(np.uint8)


def test_png_grayscale_and_palette_round_trip():
    rng = np.random.default_rng(31)
    pix = gen_pixels(rng, 33, 17)
    g = np.repeat(pix[:, :, :1], 3, axis=2)
    assert np.array_equal(decode_png(encode_png(g, color_type=0)), g)
    q = (pix // 32) * 32  # <= 256 distinct colors
    assert np.array_equal(decode_png(encode_png(q, color_type=3)), q)
    with pytest.raises(ValueError):
        encode_png(pix, color_type=0)  # non-gray content must be rejected


def test_png_alpha_composites_over_white():
    rng = np.random.default_rng(32)
    pix = gen_pixels(rng, 21, 14)
    # opaque alpha is the identity
    assert np.array_equal(decode_png(encode_png(pix, color_type=6)), pix)
    alpha = rng.integers(0, 256, pix.shape[:2], dtype=np.uint8)
    dec = decode_png(encode_png(pix, color_type=6, alpha=alpha))
    assert np.array_equal(dec, _alpha_over_white(pix, alpha))
    g = np.repeat(pix[:, :, :1], 3, axis=2)
    dec = decode_png(encode_png(g, color_type=4, alpha=alpha))
    assert np.array_equal(dec, _alpha_over_white(g, alpha))


def test_png_adam7_interlace_round_trip_all_types():
    rng = np.random.default_rng(33)
    pix = gen_pixels(rng, 33, 17)
    g = np.repeat(pix[:, :, :1], 3, axis=2)
    q = (pix // 32) * 32
    for ct, im in [(2, pix), (0, g), (3, q), (6, pix)]:
        dec = decode_png(encode_png(im, color_type=ct, interlace=True))
        assert np.array_equal(dec, im), ct
    # degenerate geometries: every Adam7 pass-emptiness combination
    for w, h in [(1, 1), (2, 300), (300, 2), (8, 8), (9, 10), (7, 5)]:
        p2 = gen_pixels(rng, w, h)
        assert np.array_equal(
            decode_png(encode_png(p2, interlace=True)), p2), (w, h)


def _chunk(t, d):
    return (struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))


def test_png_16bit_hand_built_fixture_uses_high_byte():
    """Hand-assembled 16-bit truecolor PNG (never touches the encoder):
    the decoder must return the big-endian high byte per sample."""
    rng = np.random.default_rng(34)
    h, w = 5, 7
    hi = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    lo = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    samples = np.stack([hi, lo], axis=-1).reshape(h, w, 6)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), samples.reshape(h, -1)], axis=1
    ).tobytes()
    png = (b"\x89PNG\r\n\x1a\n"
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0))
           + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    assert np.array_equal(decode_png(png), hi)


def test_png_trns_palette_transparency_hand_built():
    """Palette PNG with a tRNS chunk: index 0 fully transparent (-> white
    after compositing), index 1 opaque."""
    idx = np.array([[0, 1], [1, 0]], np.uint8)
    raw = np.concatenate([np.zeros((2, 1), np.uint8), idx], axis=1).tobytes()
    png = (b"\x89PNG\r\n\x1a\n"
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
           + _chunk(b"PLTE", bytes([10, 20, 30, 40, 50, 60]))
           + _chunk(b"tRNS", bytes([0]))
           + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    dec = decode_png(png)
    assert tuple(dec[0, 0]) == (255, 255, 255)
    assert tuple(dec[0, 1]) == (40, 50, 60)
    assert tuple(dec[1, 0]) == (40, 50, 60)
    assert tuple(dec[1, 1]) == (255, 255, 255)


def test_png_new_layouts_reject_corrupt_input():
    pix = gen_pixels(np.random.default_rng(35), 16, 16)
    enc = encode_png((pix // 32) * 32, color_type=3, interlace=True)
    for cut in (12, len(enc) // 2):
        with pytest.raises(ValueError):
            decode_png(enc[:cut])
    # palette index out of range must raise, not wrap
    idx = np.array([[5]], np.uint8)
    raw = np.concatenate([np.zeros((1, 1), np.uint8), idx], axis=1).tobytes()
    png = (b"\x89PNG\r\n\x1a\n"
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0))
           + _chunk(b"PLTE", bytes([1, 2, 3]))
           + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(png)


# ---------------------------------------------------------------------------
# corruption-robustness property: at 10^12 web images some payload bytes
# WILL be garbage. Every mutation of a valid stream must either decode to a
# well-formed (h, w, 3) uint8 image (benign bit damage) or raise ValueError
# (-> decode_ok=false row) — never any other exception type, which would
# escape the integrity gate and kill the executor's Arrow batch.
# ---------------------------------------------------------------------------

def test_codec_fuzz_corrupt_bytes_never_escape_valueerror():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rng = np.random.default_rng(40)
    pix = gen_pixels(rng, 32, 24)
    q = (pix // 32) * 32
    streams = [
        encode_png(pix),
        encode_png(pix, interlace=True),
        encode_png(q, color_type=3),
        encode_png(pix, color_type=6),
        encode_jpeg(pix, quality=88),
        encode_jpeg(pix, quality=88, subsampling="420", restart_interval=2),
    ]

    @st.composite
    def mutation(draw):
        si = draw(st.integers(0, len(streams) - 1))
        base = bytearray(streams[si])
        kind = draw(st.sampled_from(
            ["flip", "truncate", "delete", "insert", "dims"]))
        if kind == "dims":
            # targeted attack: huge header dimensions must raise BEFORE
            # any allocation sized from them (executor-OOM vector)
            if si >= 4:  # JPEG: SOF0 h/w at marker+5
                i = bytes(base).find(b"\xff\xc0") + 5
            else:  # PNG: IHDR w/h right after the length+type bytes
                i = 16
            big = draw(st.integers(30_000, 65_535))
            base[i : i + 4] = struct.pack(">HH", big, big) if si >= 4 \
                else struct.pack(">I", draw(st.integers(2**20, 2**31 - 1)))
        elif kind == "flip":
            for _ in range(draw(st.integers(1, 8))):
                i = draw(st.integers(0, len(base) - 1))
                base[i] ^= draw(st.integers(1, 255))
        elif kind == "truncate":
            del base[draw(st.integers(0, len(base) - 1)):]
        elif kind == "delete":
            i = draw(st.integers(0, len(base) - 2))
            del base[i : i + draw(st.integers(1, 16))]
        else:
            i = draw(st.integers(0, len(base) - 1))
            base[i:i] = draw(st.binary(min_size=1, max_size=16))
        return si, bytes(base)

    @settings(max_examples=300, deadline=None)
    @given(mutation())
    def run(case):
        si, data = case
        decoder = decode_jpeg if si >= 4 else decode_png
        try:
            out = decoder(data)
        except ValueError:
            return  # the integrity gate's contract
        assert isinstance(out, np.ndarray)
        assert out.ndim == 3 and out.shape[2] == 3 and out.dtype == np.uint8

    run()


# ---------------------------------------------------------------------------
# allocation-budget guards: header-implied BYTES (not just pixels) must be
# rejected before any plane/coefficient allocation — a sub-MB payload must
# never drive a multi-GB working set
# ---------------------------------------------------------------------------

def test_png_byte_budget_rejects_high_bpp_header():
    """4096x4096 RGBA16 is only 16.7M px (under the pixel cap) but implies
    134 MB of raw samples and a ~5x unfilter working set — the byte budget
    must raise before the inflate/unfilter allocations."""
    png = (b"\x89PNG\r\n\x1a\n"
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4096, 4096, 16, 6, 0, 0, 0))
           + _chunk(b"IDAT", zlib.compress(b"\x00" * 64))
           + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="implausible decoded size"):
        decode_png(png)


def test_jpeg_block_budget_rejects_huge_sof():
    """A corrupt SOF claiming 8192x8192 at 4:4:4 implies 3.1M blocks; with a
    large-enough garbage entropy stream the old 2-bits-per-block floor would
    pass and float64 coefficients would reach ~1.6 GB. The block budget must
    raise first."""
    enc = bytearray(encode_jpeg(gen_pixels(np.random.default_rng(41), 16, 16)))
    sof = enc.find(b"\xff\xc0")
    assert sof > 0
    struct.pack_into(">HH", enc, sof + 5, 8192, 8192)
    # extend the entropy stream so the bits-per-block floor alone would pass
    end = enc.rfind(b"\xff\xd9")
    enc[end:end] = b"\x00" * (2 * (8192 // 8) ** 2 * 3 // 8 + 64)
    with pytest.raises(ValueError, match="implausible block count"):
        decode_jpeg(bytes(enc))


# ---------------------------------------------------------------------------
# tRNS on non-alpha layouts (color types 0 and 2): exact-match transparency
# composited over white, evaluated at SOURCE depth
# ---------------------------------------------------------------------------

def test_png_trns_truecolor_hand_built():
    """Truecolor PNG with a tRNS chunk (one 16-bit value per channel):
    pixels equal to the transparent color become white; others unchanged."""
    pix = np.array([[[10, 20, 30], [11, 20, 30]],
                    [[10, 20, 30], [99, 98, 97]]], np.uint8)
    raw = np.concatenate(
        [np.zeros((2, 1), np.uint8), pix.reshape(2, -1)], axis=1).tobytes()
    png = (b"\x89PNG\r\n\x1a\n"
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
           + _chunk(b"tRNS", struct.pack(">HHH", 10, 20, 30))
           + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    dec = decode_png(png)
    assert tuple(dec[0, 0]) == (255, 255, 255)
    assert tuple(dec[1, 0]) == (255, 255, 255)
    assert tuple(dec[0, 1]) == (11, 20, 30)
    assert tuple(dec[1, 1]) == (99, 98, 97)


def test_png_trns_gray16_matches_at_source_depth():
    """16-bit grayscale tRNS: the match is on the full 16-bit sample, so a
    pixel sharing only the high byte with the transparent value must NOT
    turn white (it downconverts to the same 8-bit gray otherwise)."""
    # samples: 0x1234 (transparent), 0x1235 (opaque, same high byte)
    samples = np.array([[[0x12, 0x34], [0x12, 0x35]]], np.uint8)
    raw = np.concatenate(
        [np.zeros((1, 1), np.uint8), samples.reshape(1, -1)], axis=1).tobytes()
    png = (b"\x89PNG\r\n\x1a\n"
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 16, 0, 0, 0, 0))
           + _chunk(b"tRNS", struct.pack(">H", 0x1234))
           + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    dec = decode_png(png)
    assert tuple(dec[0, 0]) == (255, 255, 255)
    assert tuple(dec[0, 1]) == (0x12, 0x12, 0x12)
