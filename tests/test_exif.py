"""EXIF/TIFF metadata codec (chronon_spark/exif_codec.py) and the
image_metadata / scrub_image_metadata operators: round trips in both
byte orders, hand-assembled spec blobs the assembler never emits,
in-place GPS surgery invariants, container walks, corruption matrix,
and a mutation-fuzz property (malformed input never escapes
ValueError, and a successful parse never returns garbage types)."""

import struct
import zlib

import numpy as np
import pytest

import chronon_spark.exif_codec as X
from chronon_spark.codecs import (
    decode_jpeg,
    decode_png,
    encode_bmp,
    encode_jpeg,
    encode_png,
)
from chronon_spark.fixtures import gen_pixels

FULL = {
    "make": "CamCo", "model": "X100", "orientation": 6,
    "datetime": "2026:08:21 10:00:00", "artist": "Alice A.",
    "software": "rawproc 1.2", "datetime_original": "2026:08:20 09:00:00",
    "gps": (37.774929, -122.419416),
}


@pytest.mark.parametrize("bo", ["II", "MM"])
def test_tiff_round_trip(bo):
    t = X.encode_exif(FULL, byte_order=bo)
    p = X.parse_exif_tiff(t)
    assert p["has_exif"] and p["make"] == "CamCo" and p["model"] == "X100"
    assert p["orientation"] == 6 and p["artist"] == "Alice A."
    assert p["datetime"] == "2026:08:21 10:00:00"
    assert p["gps_present"]
    # DMS rationals quantize seconds at 1/10000 -> ~3e-8 deg error
    assert abs(p["gps_lat"] - 37.774929) < 1e-4
    assert abs(p["gps_lon"] + 122.419416) < 1e-4


def test_gps_sign_quadrants():
    for lat, lon in [(10.5, 20.25), (-10.5, 20.25), (10.5, -20.25),
                     (-89.9, 179.9)]:
        p = X.parse_exif_tiff(X.encode_exif({"gps": (lat, lon)}))
        assert abs(p["gps_lat"] - lat) < 1e-4
        assert abs(p["gps_lon"] - lon) < 1e-4


def test_hand_assembled_big_endian_inline_values():
    """A minimal MM blob built byte-by-byte (never via the assembler):
    orientation inline, one out-of-line ASCII make."""
    make = b"Zorg\x00"
    # header(8) + count(2) + 2 entries(24) + next(4) = 38 -> make at 38
    blob = (b"MM" + struct.pack(">H", 42) + struct.pack(">I", 8)
            + struct.pack(">H", 2)
            + struct.pack(">HHI", X.TAG_MAKE, 2, len(make))
            + struct.pack(">I", 38)
            + struct.pack(">HHI", X.TAG_ORIENTATION, 3, 1)
            + struct.pack(">HH", 8, 0)           # SHORT packed left
            + struct.pack(">I", 0) + make)
    p = X.parse_exif_tiff(blob)
    assert p["make"] == "Zorg" and p["orientation"] == 8


def test_ifd_chain_loop_is_rejected():
    # IFD0 whose next-IFD pointer points back at itself
    blob = (b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
            + struct.pack("<H", 0) + struct.pack("<I", 8))
    with pytest.raises(ValueError):
        # the loop guard counts visited IFDs; a self-loop is caught by
        # the seen-set (silently stops) or the cap — either way no hang,
        # and a *fresh* offset chain past the cap must raise
        chain = bytearray(b"II" + struct.pack("<H", 42)
                          + struct.pack("<I", 8))
        at = 8
        for i in range(20):
            nxt = at + 6
            chain += struct.pack("<H", 0) + struct.pack("<I", nxt)
            at = nxt
        X.parse_exif_tiff(bytes(chain))
    # self-loop: must terminate without error (seen-set)
    X.parse_exif_tiff(blob)


def test_corruption_matrix():
    t = X.encode_exif(FULL)
    for mutant in [
        t[:6],                                   # truncated header
        b"XX" + t[2:],                           # bad byte order
        t[:2] + b"\x00\x00" + t[4:],             # bad magic
        t[:4] + struct.pack("<I", 10_000) + t[8:],   # IFD offset past EOF
        t[:8] + struct.pack("<H", 600) + t[10:],     # entry count > cap
    ]:
        with pytest.raises(ValueError):
            X.parse_exif_tiff(mutant)


def test_value_offset_past_eof_raises():
    make = b"CamCo\x00"
    blob = (b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
            + struct.pack("<H", 1)
            + struct.pack("<HHI", X.TAG_MAKE, 2, len(make))
            + struct.pack("<I", 9999)
            + struct.pack("<I", 0))
    with pytest.raises(ValueError):
        X.parse_exif_tiff(blob)


def _tiff_with_evil_gps(cnt, off):
    """Minimal II blob: IFD0 -> GPS pointer -> GPS IFD with ONE LONG
    entry of the given (count, out-of-line offset) pair."""
    # header(8) + ifd0: count(2)+entry(12)+next(4) = 26 -> gps ifd at 26
    gat = 26
    return bytearray(
        b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
        + struct.pack("<H", 1)
        + struct.pack("<HHII", X.TAG_GPS_IFD, 4, 1, gat)
        + struct.pack("<I", 0)
        + struct.pack("<H", 1)
        + struct.pack("<HHII", 0x0002, 4, cnt, off)  # GPSLatitude-ish
        + struct.pack("<I", 0)
        + b"\x00" * 64
    )


def test_scrub_rejects_huge_value_count_without_allocating():
    """A crafted count near 2^30 (total ~4 GiB) must raise the
    contractual ValueError, never attempt the allocation."""
    evil = _tiff_with_evil_gps(cnt=1 << 30, off=40)
    with pytest.raises(ValueError):
        X._neutralize_gps(bytearray(evil))


def test_scrub_rejects_out_of_range_offset_and_never_grows_buffer():
    """off+total past EOF must raise; bytearray slice-assign would GROW
    the buffer otherwise, breaking the length-preserving guarantee."""
    evil = _tiff_with_evil_gps(cnt=100, off=len(_tiff_with_evil_gps(0, 0)) - 8)
    n0 = len(evil)
    buf = bytearray(evil)
    with pytest.raises(ValueError):
        X._neutralize_gps(buf)
    assert len(buf) == n0  # raised BEFORE any write could grow it


def _jpeg_with_exif(fields=FULL, bo="II"):
    pix = gen_pixels(np.random.default_rng(3), 32, 32)
    return X.insert_jpeg_exif(encode_jpeg(pix, quality=92),
                              X.encode_exif(fields, byte_order=bo))


def _png_with_exif(fields=FULL, texts=None):
    pix = gen_pixels(np.random.default_rng(3), 32, 32)
    return X.insert_png_exif(encode_png(pix),
                             X.encode_exif(fields), texts=texts)


def test_jpeg_container_extract_and_scrub_all():
    j = _jpeg_with_exif()
    m = X.extract_exif(j, "jpeg")
    assert m["has_exif"] and m["gps_present"] and m["make"] == "CamCo"
    s = X.scrub_metadata(j, "jpeg", "all")
    m2 = X.extract_exif(s, "jpeg")
    assert not m2["has_exif"] and not m2["gps_present"]
    assert np.array_equal(decode_jpeg(s), decode_jpeg(j))  # pixels bit-same


def test_jpeg_gps_surgery_in_place():
    j = _jpeg_with_exif(bo="MM")
    s = X.scrub_metadata(j, "jpeg", "gps")
    assert len(s) == len(j)                      # nothing moved
    m = X.extract_exif(s, "jpeg")
    assert m["has_exif"] and not m["gps_present"]
    assert m["make"] == "CamCo" and m["artist"] == "Alice A."
    assert m["orientation"] == 6
    assert np.array_equal(decode_jpeg(s), decode_jpeg(j))
    # the GPS rationals are zeroed in the byte stream, not just unlinked:
    # the original lat degrees numerator (37) must no longer appear in
    # the APP1 payload's GPS region (spot-check: scrub twice is a no-op)
    assert X.scrub_metadata(s, "jpeg", "gps") == s


def test_png_container_extract_and_scrub():
    p = _png_with_exif(texts={"Author": "someone", "Comment": "x"})
    m = X.extract_exif(p, "png")
    assert m["has_exif"] and m["gps_present"] and m["txt_chunks"] == 2
    s_all = X.scrub_metadata(p, "png", "all")
    m2 = X.extract_exif(s_all, "png")
    assert not m2["has_exif"] and m2["txt_chunks"] == 0
    assert np.array_equal(decode_png(s_all), decode_png(p))
    s_gps = X.scrub_metadata(p, "png", "gps")
    m3 = X.extract_exif(s_gps, "png")
    assert m3["has_exif"] and not m3["gps_present"]
    assert m3["txt_chunks"] == 2 and m3["make"] == "CamCo"
    # in-place surgery re-CRCs the eXIf chunk: the full chunk walk (which
    # validates nothing about CRCs) AND the decoder must both still work
    assert np.array_equal(decode_png(s_gps), decode_png(p))


def test_no_exif_and_no_channel_formats():
    pix = gen_pixels(np.random.default_rng(4), 16, 16)
    for data, fmt in [(encode_jpeg(pix), "jpeg"), (encode_png(pix), "png"),
                      (encode_bmp(pix), "bmp")]:
        m = X.extract_exif(data, fmt)
        assert not m["has_exif"] and not m["gps_present"]
        assert X.scrub_metadata(data, fmt, "gps") == data


def test_scrub_all_keeps_non_metadata_app_segments():
    """APP0/JFIF must survive mode='all' (only APP1 + COM are PII)."""
    pix = gen_pixels(np.random.default_rng(5), 16, 16)
    j = encode_jpeg(pix)
    # hand-append a COM segment after SOI
    com = b"\xff\xfe" + struct.pack(">H", 12) + b"secret com"
    j2 = j[:2] + com + j[2:]
    assert X.extract_exif(j2, "jpeg")["txt_chunks"] == 1
    s = X.scrub_metadata(j2, "jpeg", "all")
    assert X.extract_exif(s, "jpeg")["txt_chunks"] == 0
    assert np.array_equal(decode_jpeg(s), decode_jpeg(j2))


def test_oversized_blob_rejected():
    with pytest.raises(ValueError):
        X.parse_exif_tiff(b"II" + b"\x00" * (X._MAX_TIFF + 10))


def test_fuzz_never_escapes_valueerror():
    """150 deterministic mutations of a full EXIF JPEG: parse either
    raises ValueError or returns a well-typed dict; scrub either raises
    ValueError or returns bytes."""
    j = _jpeg_with_exif()
    rng = np.random.default_rng(99)
    for i in range(150):
        b = bytearray(j)
        op = i % 3
        if op == 0:                              # bit flip
            pos = int(rng.integers(0, len(b)))
            b[pos] ^= 1 << int(rng.integers(0, 8))
        elif op == 1:                            # truncate
            b = b[: int(rng.integers(2, len(b)))]
        else:                                    # byte insert
            pos = int(rng.integers(0, len(b)))
            b = b[:pos] + bytes([int(rng.integers(0, 256))]) + b[pos:]
        for fn in (lambda d: X.extract_exif(bytes(d), "jpeg"),
                   lambda d: X.scrub_metadata(bytes(d), "jpeg", "all"),
                   lambda d: X.scrub_metadata(bytes(d), "jpeg", "gps")):
            try:
                out = fn(b)
            except ValueError:
                continue
            if isinstance(out, dict):
                assert isinstance(out["has_exif"], bool)
                lat = out["gps_lat"]
                assert lat is None or isinstance(lat, float)
            else:
                assert isinstance(out, bytes)


def test_spark_operator_end_to_end(spark):
    """Fixture sidecars through the Arrow pass: parse matches truth,
    gps scrub removes gps everywhere, all-scrub leaves clean containers
    with bit-identical pixels (phash pin)."""
    from pyspark.sql import functions as F

    from chronon_spark.fixtures import ensure_exif_fixture
    from chronon_spark.operators.multimodal import (
        extract_pixel_features,
        image_metadata,
        scrub_image_metadata,
    )

    imgs = spark.read.parquet(ensure_exif_fixture(n=300, seed=101))
    meta = image_metadata(
        imgs, passthrough=("x_parse_ok", "x_gps", "x_make", "x_artist"))
    rows = meta.collect()
    assert len(rows) == 300
    for r in rows:
        assert r.parse_ok == r.x_parse_ok
        if r.parse_ok:
            assert bool(r.gps_present) == bool(r.x_gps)
            assert r.make == r.x_make and r.artist == r.x_artist
        else:
            assert r.make is None and r.gps_lat is None
    scr = scrub_image_metadata(imgs, mode="gps",
                               passthrough=("fmt", "w", "h", "phash"))
    after = image_metadata(scr)
    assert after.where(F.col("gps_present")).count() == 0
    feats = extract_pixel_features(
        scrub_image_metadata(imgs, mode="all",
                             passthrough=("fmt", "w", "h", "phash")),
        passthrough=("phash",),
    )
    assert feats.where(~F.col("decode_ok")).count() == 0
    assert feats.where(F.col("phash_check") != F.col("phash")).count() == 0


def test_tiff_webp_scrub_fuzz_never_escapes():
    """Mutations of TIFF files and EXIF-bearing WebP containers through
    extract + both scrub modes: ValueError or a well-typed result,
    never any other exception — the integrity-gate contract for the
    two newest metadata channels."""
    from chronon_spark.tiff_codec import encode_tiff
    from chronon_spark.webp_codec import encode_webp

    pix = gen_pixels(np.random.default_rng(61), 20, 16)
    t = X.insert_tiff_exif(
        encode_tiff(pix, compression="lzw", rows_per_strip=5),
        {"make": "M", "artist": "A", "gps": (3.25, -4.5)})
    wpb = encode_webp(pix, exif_tiff=X.encode_exif(
        {"make": "M", "gps": (3.25, -4.5)}))
    rng = np.random.default_rng(62)
    for i in range(140):
        base, fmt = ((t, "tiff") if i % 2 else (wpb, "webp"))
        b = bytearray(base)
        op = i % 3
        if op == 0:
            pos = int(rng.integers(0, len(b)))
            b[pos] ^= 1 << int(rng.integers(0, 8))
        elif op == 1:
            b = b[: int(rng.integers(2, len(b)))]
        else:
            pos = int(rng.integers(0, len(b)))
            b = b[:pos] + bytes([int(rng.integers(0, 256))]) + b[pos:]
        for fn in (lambda d: X.extract_exif(bytes(d), fmt),
                   lambda d: X.scrub_metadata(bytes(d), fmt, "all"),
                   lambda d: X.scrub_metadata(bytes(d), fmt, "gps")):
            try:
                out = fn(b)
            except ValueError:
                continue
            assert isinstance(out, (dict, bytes))
