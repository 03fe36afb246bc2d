"""From-scratch baseline TIFF codec (chronon_spark/tiff_codec.py):
round-trip matrix, LZW early-change boundary sweep, PackBits, a
hand-assembled spec file that never touches the encoder, corruption
matrix, metadata-on-TIFF integration, and mutation fuzz."""

import struct

import numpy as np
import pytest

import chronon_spark.exif_codec as X
from chronon_spark.fixtures import gen_pixels
from chronon_spark.tiff_codec import (
    _lzw_decode_tiff,
    _lzw_encode_tiff,
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    encode_tiff,
)


def test_round_trip_matrix():
    rng = np.random.default_rng(11)
    for bo in ("II", "MM"):
        for comp in ("none", "lzw", "packbits"):
            for mode in ("rgb", "palette"):
                for rps in (None, 7):
                    pix = gen_pixels(rng, 31, 23)
                    if mode == "palette":
                        pix = (pix // 32) * 32
                    t = encode_tiff(pix, compression=comp, mode=mode,
                                    rows_per_strip=rps, byte_order=bo)
                    assert np.array_equal(decode_tiff(t), pix), (
                        bo, comp, mode, rps)


def test_gray_and_predictor():
    rng = np.random.default_rng(12)
    pix = gen_pixels(rng, 40, 28)
    t = encode_tiff(pix, compression="lzw", mode="gray", predictor=True,
                    rows_per_strip=8)
    g = np.round(pix.astype(np.float64).mean(axis=2)).astype(np.uint8)
    assert np.array_equal(decode_tiff(t), np.repeat(g[:, :, None], 3, axis=2))
    # predictor actually helps on smooth content (sanity that it's wired)
    t_nop = encode_tiff(pix, compression="lzw", mode="rgb")
    t_pred = encode_tiff(pix, compression="lzw", mode="rgb", predictor=True)
    assert len(t_pred) < len(t_nop)
    assert np.array_equal(decode_tiff(t_pred), pix)


def test_lzw_tail_boundary_sweep():
    """Every payload length 0..1200 over a small alphabet: streams that
    END exactly on a code-width boundary (the early-change off-by-one
    class) must round-trip."""
    rng = np.random.default_rng(13)
    base = bytes(rng.integers(0, 5, 1200, dtype=np.uint8))
    for n in range(0, 1200, 1):
        d = base[:n]
        assert _lzw_decode_tiff(_lzw_encode_tiff(d), n) == d, n


def test_lzw_table_reset():
    rng = np.random.default_rng(14)
    d = bytes(rng.integers(0, 256, 120_000, dtype=np.uint8))  # forces reset
    assert _lzw_decode_tiff(_lzw_encode_tiff(d), len(d)) == d


def test_packbits_spec_example():
    # the spec's canonical example (TIFF 6.0 §9)
    enc = bytes([0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA, 0x03,
                 0x80, 0x00, 0x2A, 0x22, 0xF7, 0xAA])
    dec = (b"\xaa\xaa\xaa\x80\x00\x2a\xaa\xaa\xaa\xaa\x80\x00\x2a\x22"
           + b"\xaa" * 10)
    assert _packbits_decode(enc, len(dec)) == dec
    # our encoder's output for that content round-trips too
    assert _packbits_decode(_packbits_encode(dec), len(dec)) == dec


def test_hand_assembled_minimal_tiff():
    """2x2 uncompressed RGB big-endian file built byte-by-byte."""
    pixels = bytes(range(12))
    ifd_at = 8 + 12
    nent = 8
    ifd = struct.pack(">H", nent)
    def e(tag, typ, cnt, val):
        return struct.pack(">HHI", tag, typ, cnt) + val
    ifd += e(256, 3, 1, struct.pack(">HH", 2, 0))       # width
    ifd += e(257, 3, 1, struct.pack(">HH", 2, 0))       # height
    bits_at = ifd_at + 2 + nent * 12 + 4
    ifd += e(258, 3, 3, struct.pack(">I", bits_at))
    ifd += e(259, 3, 1, struct.pack(">HH", 1, 0))       # none
    ifd += e(262, 3, 1, struct.pack(">HH", 2, 0))       # RGB
    ifd += e(273, 4, 1, struct.pack(">I", 8))           # strip at 8
    ifd += e(277, 3, 1, struct.pack(">HH", 3, 0))
    ifd += e(279, 4, 1, struct.pack(">I", 12))
    ifd += struct.pack(">I", 0)
    blob = (b"MM" + struct.pack(">H", 42) + struct.pack(">I", ifd_at)
            + pixels + ifd + struct.pack(">HHH", 8, 8, 8))
    dec = decode_tiff(blob)
    assert dec.shape == (2, 2, 3)
    assert dec.tobytes() == pixels


def test_whiteiszero_polarity():
    pix = np.full((4, 4, 3), 200, dtype=np.uint8)
    t = bytearray(encode_tiff(pix, mode="gray"))
    # flip photometric 1 -> 0 in place: find the entry (tag 262)
    bo = "<"
    (ifd_at,) = struct.unpack_from(bo + "I", t, 4)
    (n,) = struct.unpack_from(bo + "H", t, ifd_at)
    for i in range(n):
        pos = ifd_at + 2 + 12 * i
        (tag,) = struct.unpack_from(bo + "H", t, pos)
        if tag == 262:
            t[pos + 8:pos + 12] = struct.pack(bo + "I", 0)
    dec = decode_tiff(bytes(t))
    assert (dec == 255 - 200).all()


def test_corruption_matrix():
    pix = gen_pixels(np.random.default_rng(15), 16, 16)
    t = encode_tiff(pix, compression="lzw")
    muts = []
    b = bytearray(t)
    b[0:2] = b"XX"
    muts.append(bytes(b))                         # bad byte order
    muts.append(t[:20])                           # truncated
    b = bytearray(t)
    (ifd_at,) = struct.unpack_from("<I", t, 4)
    b[4:8] = struct.pack("<I", len(t) + 100)      # IFD past EOF
    muts.append(bytes(b))
    for m in muts:
        with pytest.raises(ValueError):
            decode_tiff(m)
    # unsupported compression tag
    b = bytearray(t)
    (n,) = struct.unpack_from("<H", b, ifd_at)
    for i in range(n):
        pos = ifd_at + 2 + 12 * i
        (tag,) = struct.unpack_from("<H", b, pos)
        if tag == 259:
            b[pos + 8:pos + 12] = struct.pack("<I", 7)   # JPEG-in-TIFF
    with pytest.raises(ValueError):
        decode_tiff(bytes(b))


def test_metadata_on_tiff_and_scrub():
    pix = gen_pixels(np.random.default_rng(16), 24, 24)
    t = encode_tiff(pix, compression="packbits", rows_per_strip=5)
    te = X.insert_tiff_exif(t, {"make": "CamCo", "artist": "Eve",
                                "orientation": 5, "gps": (12.5, -70.25),
                                "datetime_original": "2026:01:01 00:00:00"})
    assert np.array_equal(decode_tiff(te), pix)
    m = X.extract_exif(te, "tiff")
    assert m["has_exif"] and m["gps_present"] and m["artist"] == "Eve"
    sg = X.scrub_metadata(te, "tiff", "gps")
    m2 = X.extract_exif(sg, "tiff")
    assert m2["has_exif"] and not m2["gps_present"] and m2["make"] == "CamCo"
    assert np.array_equal(decode_tiff(sg), pix)
    sa = X.scrub_metadata(te, "tiff", "all")
    m3 = X.extract_exif(sa, "tiff")
    assert not m3["has_exif"] and m3["artist"] is None
    assert np.array_equal(decode_tiff(sa), pix)
    assert len(sa) == len(te)                     # in-place, length kept
    # plain file: no metadata reported, scrub is a no-op byte-wise
    assert not X.extract_exif(t, "tiff")["has_exif"]
    assert X.scrub_metadata(t, "tiff", "all") == t


def test_fuzz_never_escapes_valueerror():
    pix = gen_pixels(np.random.default_rng(17), 20, 20)
    variants = [encode_tiff(pix, compression=c, rows_per_strip=r)
                for c in ("none", "lzw", "packbits") for r in (None, 6)]
    rng = np.random.default_rng(18)
    for i in range(120):
        t = variants[i % len(variants)]
        b = bytearray(t)
        op = i % 3
        if op == 0:
            pos = int(rng.integers(0, len(b)))
            b[pos] ^= 1 << int(rng.integers(0, 8))
        elif op == 1:
            b = b[: int(rng.integers(4, len(b)))]
        else:
            pos = int(rng.integers(0, len(b)))
            b = b[:pos] + bytes([int(rng.integers(0, 256))]) + b[pos:]
        try:
            out = decode_tiff(bytes(b))
        except ValueError:
            continue
        assert out.dtype == np.uint8 and out.ndim == 3 and out.shape[2] == 3


def test_tiff_hypothesis_round_trip_property():
    """Randomized geometry x compression x mode x strip-size x byte
    order round trips (hypothesis drives the space; encode/decode must
    be exact for every combination)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        comp=st.sampled_from(["none", "lzw", "packbits"]),
        mode=st.sampled_from(["rgb", "gray", "palette"]),
        rps=st.one_of(st.none(), st.integers(1, 12)),
        pred=st.booleans(),
        bo=st.sampled_from(["II", "MM"]),
        seed=st.integers(0, 2**31 - 1),
    )
    def prop(w, h, comp, mode, rps, pred, bo, seed):
        from chronon_spark.fixtures import _quantize_to_palette

        rng = np.random.default_rng(seed)
        pix = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        if mode == "palette":
            pix = _quantize_to_palette(pix)   # adaptive: always <= 256
        t = encode_tiff(pix, compression=comp, mode=mode, predictor=pred,
                        rows_per_strip=rps, byte_order=bo)
        dec = decode_tiff(t)
        if mode == "gray":
            g = np.round(pix.astype(np.float64).mean(axis=2)).astype(
                np.uint8)
            assert np.array_equal(dec, np.repeat(g[:, :, None], 3, axis=2))
        else:
            assert np.array_equal(dec, pix)

    prop()
