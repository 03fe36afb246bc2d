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
