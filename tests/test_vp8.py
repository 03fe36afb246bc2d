"""From-scratch VP8 lossy decoder (chronon_spark/vp8_codec.py): the
standard of evidence is BIT-EXACTNESS against libwebp — YUV planes and
RGB output — over real libwebp-encoded streams.

Two evidence tiers:
  1. a COMMITTED fixture (tests/data/vp8_lossy_fixture.npz) of real
     libwebp lossy streams + libwebp's own decoded RGB, so the
     bit-exact pin runs everywhere;
  2. a live battery against the system libwebp via the ctypes oracle
     (sizes x qualities, YUV + RGB), skipped where the lib is absent.

Plus malformed-input behavior and the real-world python.webp file
shipped with CPython (VP8X container, lossy payload).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from chronon_spark.fixtures import gen_pixels
from chronon_spark.vp8_codec import (
    VP8Error,
    decode_vp8_rgb,
    decode_vp8_yuv,
)
from chronon_spark.webp_codec import _riff_chunks, decode_webp

_FIXTURE = os.path.join(os.path.dirname(__file__), "data",
                        "vp8_lossy_fixture.npz")


def _payload(data: bytes) -> bytes:
    for tag, _s, ds, dl in _riff_chunks(data):
        if tag == b"VP8 ":
            return data[ds:ds + dl]
    raise AssertionError("no VP8 chunk")


def test_committed_fixture_bit_exact():
    z = np.load(_FIXTURE)
    n = int(z["n"])
    assert n >= 6
    for i in range(n):
        data = z[f"webp_{i}"].tobytes()
        ref = z[f"rgb_{i}"]
        out = decode_webp(data)
        assert np.array_equal(out, ref), f"fixture case {i}"


def test_real_world_python_webp():
    # CPython's test-data webp (VP8X + lossy VP8), if this interpreter
    # ships it
    import glob

    hits = glob.glob(
        "/root/.pyenv/versions/*/lib/python*/test/test_email/data/python.webp"
    )
    if not hits:
        pytest.skip("no python.webp on this system")
    data = open(hits[0], "rb").read()
    pix = decode_webp(data)
    assert pix.shape == (16, 16, 3)
    assert pix.std() > 1  # actual content, not a flat fill
    from libwebp_oracle import HAVE_LIBWEBP

    if HAVE_LIBWEBP:
        from libwebp_oracle import decode_rgba

        ref = decode_rgba(data)
        af = ref[:, :, 3:4].astype(np.float64) / 255.0
        expect = np.clip(np.round(ref[:, :, :3].astype(np.float64) * af
                                  + 255.0 * (1.0 - af)),
                         0, 255).astype(np.uint8)
        assert np.array_equal(pix, expect)  # alpha composited exactly


@pytest.mark.parametrize("seed,size,q", [
    (1, (64, 48), 95), (2, (80, 60), 10), (3, (33, 17), 50),
    (4, (7, 5), 75), (8, (17, 16), 30), (1, (16, 32), 100),
])
def test_live_libwebp_yuv_and_rgb_exact(seed, size, q):
    from libwebp_oracle import HAVE_LIBWEBP

    if not HAVE_LIBWEBP:
        pytest.skip("system libwebp not available")
    from libwebp_oracle import decode_rgb, decode_yuv, encode_lossy

    w, h = size
    pix = gen_pixels(np.random.default_rng(seed), w, h)
    data = encode_lossy(pix, quality=q)
    ry, ru, rv = decode_yuv(data)
    my, mu, mv = decode_vp8_yuv(_payload(data))
    assert np.array_equal(my, ry)
    assert np.array_equal(mu, ru)
    assert np.array_equal(mv, rv)
    assert np.array_equal(decode_vp8_rgb(_payload(data)), decode_rgb(data))


def test_content_classes_exact():
    from libwebp_oracle import HAVE_LIBWEBP

    if not HAVE_LIBWEBP:
        pytest.skip("system libwebp not available")
    from libwebp_oracle import decode_rgb, encode_lossy

    rng = np.random.default_rng(3)
    cases = [
        rng.integers(0, 256, (48, 64, 3), dtype=np.uint8),            # noise
        np.full((48, 48, 3), 200, np.uint8),                          # flat
        np.repeat(np.repeat(rng.integers(0, 256, (12, 16, 3),
                                         dtype=np.uint8), 4, 0), 4, 1),
        np.stack(np.meshgrid(np.arange(64) * 4 % 256,
                             np.arange(48) * 5 % 256)
                 + [np.full((48, 64), 99)], axis=2).astype(np.uint8),
    ]
    for pix in cases:
        for q in (20, 80):
            data = encode_lossy(pix, quality=q)
            assert np.array_equal(decode_webp(data), decode_rgb(data))


def test_malformed_inputs_raise():
    z = np.load(_FIXTURE)
    good = z["webp_0"].tobytes()
    payload = _payload(good)
    with pytest.raises(VP8Error):
        decode_vp8_yuv(payload[:8])                     # too short
    bad_sc = bytearray(payload)
    bad_sc[3] = 0x00                                    # start code
    with pytest.raises(VP8Error):
        decode_vp8_yuv(bytes(bad_sc))
    inter = bytearray(payload)
    inter[0] |= 1                                       # non-key frame
    with pytest.raises(VP8Error):
        decode_vp8_yuv(bytes(inter))
    # truncation must raise (VP8Error or ValueError), never crash or hang
    for cut in (12, 20, len(payload) // 2):
        with pytest.raises((VP8Error, ValueError, IndexError)):
            decode_vp8_yuv(payload[:cut])


def test_decode_image_routes_lossy_webp():
    """The multimodal decode operator path accepts lossy bytes."""
    from chronon_spark.operators.multimodal import decode_image

    z = np.load(_FIXTURE)
    data = z["webp_0"].tobytes()
    ref = z["rgb_0"]
    out = decode_image(data, ref.shape[1], ref.shape[0], "webp")
    assert np.array_equal(out, ref)


def test_mutation_fuzz_never_escapes_valueerror():
    """The integrity-gate contract extended to lossy WebP: 150
    mutations (bit flips, truncations, insertions) of real VP8 files
    either decode to a well-formed array or raise ValueError
    (VP8Error is one) — never crash, hang, or return garbage types."""
    z = np.load(_FIXTURE)
    base = [z["webp_0"].tobytes(), z["webp_2"].tobytes()]
    rng = np.random.default_rng(99)
    for i in range(150):
        data = bytearray(base[i % len(base)])
        mode = i % 3
        if mode == 0:
            for _ in range(int(rng.integers(1, 4))):
                data[int(rng.integers(12, len(data)))] ^= 1 << int(
                    rng.integers(0, 8))
        elif mode == 1:
            data = data[:int(rng.integers(8, len(data)))]
        else:
            pos = int(rng.integers(12, len(data)))
            data[pos:pos] = bytes(rng.integers(0, 256, 7, dtype=np.uint8))
        try:
            out = decode_webp(bytes(data))
        except (ValueError, NotImplementedError):
            continue
        assert isinstance(out, np.ndarray) and out.dtype == np.uint8
        assert out.ndim == 3 and out.shape[2] == 3


def test_alpha_chunk_lossy_composite():
    """VP8X + ALPH + VP8: the alpha plane (headerless-VP8L green
    channel) decodes and composites over white exactly like libwebp's
    RGBA output composited with the same formula."""
    from libwebp_oracle import HAVE_LIBWEBP

    if not HAVE_LIBWEBP:
        pytest.skip("system libwebp not available")
    from libwebp_oracle import decode_rgba, encode_lossy_rgba

    for seed, (w, h), q in [(5, (48, 32), 80), (7, (33, 17), 95),
                            (8, (80, 60), 30)]:
        rng = np.random.default_rng(seed)
        pix = gen_pixels(rng, w, h)
        alpha = rng.integers(0, 256, (h, w), dtype=np.uint8)
        data = encode_lossy_rgba(np.dstack([pix, alpha]), q)
        ref = decode_rgba(data)
        af = ref[:, :, 3:4].astype(np.float64) / 255.0
        expect = np.clip(np.round(ref[:, :, :3].astype(np.float64) * af
                                  + 255.0 * (1.0 - af)),
                         0, 255).astype(np.uint8)
        assert np.array_equal(decode_webp(data), expect), (seed, q)


def test_alpha_chunk_raw_filters():
    """Hand-built ALPH chunks, raw compression, all four prediction
    filters — the inverse filter is pinned against an independent
    forward pass."""
    import struct

    from chronon_spark.webp_codec import _decode_alpha

    rng = np.random.default_rng(11)
    w, h = 9, 6
    target = rng.integers(0, 256, (h, w), dtype=np.int64)
    for filt in range(4):
        # forward filter (container-spec predictors, borders from 0)
        res = np.zeros_like(target)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = 0
                elif y == 0:
                    pred = target[0, x - 1]
                elif x == 0:
                    pred = target[y - 1, 0]
                elif filt == 1:
                    pred = target[y, x - 1]
                elif filt == 2:
                    pred = target[y - 1, x]
                elif filt == 3:
                    pred = max(0, min(255, target[y, x - 1]
                                      + target[y - 1, x]
                                      - target[y - 1, x - 1]))
                else:
                    pred = 0 if (x, y) != (0, 0) else 0
                if filt == 0:
                    res[y, x] = target[y, x]
                else:
                    res[y, x] = (target[y, x] - pred) & 0xFF
        chunk = bytes([filt << 2]) + bytes(
            int(v) for v in res.reshape(-1))
        out = _decode_alpha(chunk, w, h)
        assert np.array_equal(out, target.astype(np.uint8)), filt
    with pytest.raises(ValueError):
        _decode_alpha(b"\x02" + b"\x00" * (w * h), w, h)  # reserved comp
    with pytest.raises(ValueError):
        _decode_alpha(bytes([0]) + b"\x01" * 5, w, h)     # truncated


def test_animated_lossy_frames_with_alpha():
    """ANMF frames carrying VP8 (+ALPH) payloads: a hand-assembled
    two-frame animation from real encoder chunks must composite each
    frame like the still path (frame 1 full-canvas lossy+alpha, frame 2
    an opaque lossy overwrite)."""
    import struct as st

    from libwebp_oracle import HAVE_LIBWEBP

    if not HAVE_LIBWEBP:
        pytest.skip("system libwebp not available")
    from libwebp_oracle import decode_rgba, encode_lossy, encode_lossy_rgba

    from chronon_spark.webp_codec import decode_webp_frames

    rng = np.random.default_rng(12)
    w, h = 32, 16
    pix1 = gen_pixels(rng, w, h)
    alpha1 = rng.integers(0, 256, (h, w), dtype=np.uint8)
    f1 = encode_lossy_rgba(np.dstack([pix1, alpha1]), 80)
    pix2 = gen_pixels(rng, w, h)
    f2 = encode_lossy(pix2, 80)

    def subchunks(webp):
        out = b""
        from chronon_spark.webp_codec import _riff_chunks
        for tag, _s, ds, dl in _riff_chunks(webp):
            if tag in (b"ALPH", b"VP8 "):
                body = webp[ds:ds + dl]
                out += tag + st.pack("<I", dl) + body
                if dl & 1:
                    out += b"\x00"
        return out

    def anmf(payload, blend_none):
        hdr = b""
        for v in (0, 0):                       # frame x/2, y/2
            hdr += st.pack("<I", v)[:3]
        hdr += st.pack("<I", w - 1)[:3] + st.pack("<I", h - 1)[:3]
        hdr += st.pack("<I", 40)[:3]           # duration
        hdr += bytes([0x02 if blend_none else 0x00])
        body = hdr + payload
        ch = b"ANMF" + st.pack("<I", len(body)) + body
        if len(body) & 1:
            ch += b"\x00"
        return ch

    vp8x = (b"VP8X" + st.pack("<I", 10)
            + bytes([0x02, 0, 0, 0])           # ANIM flag
            + st.pack("<I", w - 1)[:3] + st.pack("<I", h - 1)[:3])
    anim = b"ANIM" + st.pack("<I", 6) + st.pack("<I", 0xFFFFFFFF) + b"\x00\x00"
    chunks = vp8x + anim + anmf(subchunks(f1), False) + \
        anmf(subchunks(f2), True)
    data = b"RIFF" + st.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks

    frames = decode_webp_frames(data)
    assert frames.shape == (2, h, w, 3)
    ref1 = decode_rgba(f1)
    af = ref1[:, :, 3:4].astype(np.float64) / 255.0
    exp1 = np.clip(np.round(ref1[:, :, :3].astype(np.float64) * af
                            + 255.0 * (1.0 - af)), 0, 255).astype(np.uint8)
    assert np.array_equal(frames[0], exp1)
    from libwebp_oracle import decode_rgb

    assert np.array_equal(frames[1], decode_rgb(f2))
