"""Test-only ctypes bridge to the system libwebp (ground-truth oracle).

The ENGINE's codecs stay from-scratch pure Python; this module exists so
tests can (a) generate REAL libwebp-encoded bitstreams — lossless VP8L
streams that use transforms/color-cache/meta-prefix the way an actual
encoder emits them, and lossy VP8 key frames — and (b) fetch libwebp's
own decoded pixels as the reference output. Skip tests gracefully when
the shared library is absent (`HAVE_LIBWEBP`)."""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_LIB = None
for _name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
    if not _name:
        continue
    try:
        _LIB = ctypes.CDLL(_name)
        break
    except OSError:
        continue

HAVE_LIBWEBP = _LIB is not None

if HAVE_LIBWEBP:
    _LIB.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
    _LIB.WebPEncodeLosslessRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    _LIB.WebPEncodeRGB.restype = ctypes.c_size_t
    _LIB.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    _LIB.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
    _LIB.WebPDecodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _LIB.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    _LIB.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _LIB.WebPFree.restype = None
    _LIB.WebPFree.argtypes = [ctypes.c_void_p]


def encode_lossless(pix: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> real libwebp VP8L lossless bytes."""
    h, w = pix.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LIB.WebPEncodeLosslessRGB(
        np.ascontiguousarray(pix).tobytes(), w, h, w * 3, ctypes.byref(out))
    if n == 0:
        raise RuntimeError("WebPEncodeLosslessRGB failed")
    data = ctypes.string_at(out, n)
    _LIB.WebPFree(out)
    return data


def encode_lossy(pix: np.ndarray, quality: float = 80.0) -> bytes:
    """(h, w, 3) uint8 -> real libwebp lossy VP8 bytes."""
    h, w = pix.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LIB.WebPEncodeRGB(
        np.ascontiguousarray(pix).tobytes(), w, h, w * 3,
        ctypes.c_float(quality), ctypes.byref(out))
    if n == 0:
        raise RuntimeError("WebPEncodeRGB failed")
    data = ctypes.string_at(out, n)
    _LIB.WebPFree(out)
    return data


def decode_rgb(data: bytes) -> np.ndarray:
    """libwebp's own decode -> (h, w, 3) uint8 (the reference pixels)."""
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = _LIB.WebPDecodeRGB(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        raise RuntimeError("WebPDecodeRGB failed")
    buf = ctypes.string_at(p, w.value * h.value * 3)
    _LIB.WebPFree(p)
    return np.frombuffer(buf, dtype=np.uint8).reshape(h.value, w.value, 3)


def decode_yuv(data: bytes):
    """libwebp decode to Y/U/V planes -> (y, u, v) uint8 arrays with
    shapes (h, w), (ceil(h/2), ceil(w/2)) x2 — the pre-RGB-conversion
    reference for the lossy pipeline."""
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    p = _LIB.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                           ctypes.byref(u), ctypes.byref(v),
                           ctypes.byref(stride), ctypes.byref(uv_stride))
    if not p:
        raise RuntimeError("WebPDecodeYUV failed")
    W, H = w.value, h.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    y_arr = np.frombuffer(
        ctypes.string_at(p, stride.value * H), dtype=np.uint8
    ).reshape(H, stride.value)[:, :W].copy()
    u_arr = np.frombuffer(
        ctypes.string_at(u, uv_stride.value * ch), dtype=np.uint8
    ).reshape(ch, uv_stride.value)[:, :cw].copy()
    v_arr = np.frombuffer(
        ctypes.string_at(v, uv_stride.value * ch), dtype=np.uint8
    ).reshape(ch, uv_stride.value)[:, :cw].copy()
    _LIB.WebPFree(p)
    return y_arr, u_arr, v_arr


# ---------------------------------------------------------------------------
# advanced decoder API (for bypass_filtering: the UNFILTERED reference)
# ---------------------------------------------------------------------------
class _Features(ctypes.Structure):
    _fields_ = [("width", ctypes.c_int), ("height", ctypes.c_int),
                ("has_alpha", ctypes.c_int), ("has_animation", ctypes.c_int),
                ("format", ctypes.c_int), ("pad", ctypes.c_uint32 * 5)]


class _Options(ctypes.Structure):
    _fields_ = [("bypass_filtering", ctypes.c_int),
                ("no_fancy_upsampling", ctypes.c_int),
                ("use_cropping", ctypes.c_int),
                ("crop_left", ctypes.c_int), ("crop_top", ctypes.c_int),
                ("crop_width", ctypes.c_int), ("crop_height", ctypes.c_int),
                ("use_scaling", ctypes.c_int),
                ("scaled_width", ctypes.c_int), ("scaled_height", ctypes.c_int),
                ("use_threads", ctypes.c_int),
                ("dithering_strength", ctypes.c_int),
                ("flip", ctypes.c_int),
                ("alpha_dithering_strength", ctypes.c_int),
                ("pad", ctypes.c_uint32 * 5)]


class _YUVA(ctypes.Structure):
    _fields_ = [("y", ctypes.POINTER(ctypes.c_uint8)),
                ("u", ctypes.POINTER(ctypes.c_uint8)),
                ("v", ctypes.POINTER(ctypes.c_uint8)),
                ("a", ctypes.POINTER(ctypes.c_uint8)),
                ("y_stride", ctypes.c_int), ("u_stride", ctypes.c_int),
                ("v_stride", ctypes.c_int), ("a_stride", ctypes.c_int),
                ("y_size", ctypes.c_size_t), ("u_size", ctypes.c_size_t),
                ("v_size", ctypes.c_size_t), ("a_size", ctypes.c_size_t)]


class _RGBA(ctypes.Structure):
    _fields_ = [("rgba", ctypes.POINTER(ctypes.c_uint8)),
                ("stride", ctypes.c_int), ("size", ctypes.c_size_t)]


class _BufUnion(ctypes.Union):
    _fields_ = [("RGBA", _RGBA), ("YUVA", _YUVA)]


class _DecBuffer(ctypes.Structure):
    _fields_ = [("colorspace", ctypes.c_int), ("width", ctypes.c_int),
                ("height", ctypes.c_int), ("is_external_memory", ctypes.c_int),
                ("u", _BufUnion), ("pad", ctypes.c_uint32 * 4),
                ("private_memory", ctypes.POINTER(ctypes.c_uint8))]


class _DecoderConfig(ctypes.Structure):
    _fields_ = [("input", _Features), ("options", _Options),
                ("output", _DecBuffer)]


_MODE_YUV = 11  # MODE_YUV in decode.h
_ABI = 0x0209

if HAVE_LIBWEBP:
    _LIB.WebPInitDecoderConfigInternal.restype = ctypes.c_int
    _LIB.WebPInitDecoderConfigInternal.argtypes = [
        ctypes.POINTER(_DecoderConfig), ctypes.c_int]
    _LIB.WebPDecode.restype = ctypes.c_int
    _LIB.WebPDecode.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                ctypes.POINTER(_DecoderConfig)]
    _LIB.WebPFreeDecBuffer.restype = None
    _LIB.WebPFreeDecBuffer.argtypes = [ctypes.POINTER(_DecBuffer)]


def decode_yuv_opts(data: bytes, bypass_filtering=False,
                    no_fancy=False):
    """Advanced-API YUV decode with options; returns (y, u, v)."""
    cfg = _DecoderConfig()
    if not _LIB.WebPInitDecoderConfigInternal(ctypes.byref(cfg), _ABI):
        raise RuntimeError("WebPInitDecoderConfig failed (ABI?)")
    cfg.options.bypass_filtering = int(bypass_filtering)
    cfg.options.no_fancy_upsampling = int(no_fancy)
    cfg.output.colorspace = _MODE_YUV
    rc = _LIB.WebPDecode(data, len(data), ctypes.byref(cfg))
    if rc != 0:
        raise RuntimeError(f"WebPDecode rc={rc}")
    yv = cfg.output.u.YUVA
    H, W = cfg.output.height, cfg.output.width
    ch, cw = (H + 1) // 2, (W + 1) // 2
    y_arr = np.frombuffer(ctypes.string_at(yv.y, yv.y_stride * H),
                          dtype=np.uint8).reshape(H, yv.y_stride)[:, :W].copy()
    u_arr = np.frombuffer(ctypes.string_at(yv.u, yv.u_stride * ch),
                          dtype=np.uint8).reshape(ch, yv.u_stride)[:, :cw].copy()
    v_arr = np.frombuffer(ctypes.string_at(yv.v, yv.v_stride * ch),
                          dtype=np.uint8).reshape(ch, yv.v_stride)[:, :cw].copy()
    _LIB.WebPFreeDecBuffer(ctypes.byref(cfg.output))
    return y_arr, u_arr, v_arr


if HAVE_LIBWEBP:
    _LIB.WebPEncodeRGBA.restype = ctypes.c_size_t
    _LIB.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    _LIB.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    _LIB.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]


def encode_lossy_rgba(rgba: np.ndarray, quality: float = 80.0) -> bytes:
    """(h, w, 4) uint8 -> lossy VP8 + ALPH chunk bytes."""
    h, w = rgba.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LIB.WebPEncodeRGBA(np.ascontiguousarray(rgba).tobytes(), w, h,
                            w * 4, ctypes.c_float(quality),
                            ctypes.byref(out))
    if n == 0:
        raise RuntimeError("WebPEncodeRGBA failed")
    data = ctypes.string_at(out, n)
    _LIB.WebPFree(out)
    return data


def decode_rgba(data: bytes) -> np.ndarray:
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = _LIB.WebPDecodeRGBA(data, len(data), ctypes.byref(w),
                            ctypes.byref(h))
    if not p:
        raise RuntimeError("WebPDecodeRGBA failed")
    buf = np.frombuffer(ctypes.string_at(p, w.value * h.value * 4),
                        dtype=np.uint8).reshape(h.value, w.value, 4).copy()
    _LIB.WebPFree(p)
    return buf


if HAVE_LIBWEBP:
    _LIB.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    _LIB.WebPEncodeLosslessRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]


def encode_lossless_rgba(rgba: np.ndarray) -> bytes:
    h, w = rgba.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LIB.WebPEncodeLosslessRGBA(
        np.ascontiguousarray(rgba).tobytes(), w, h, w * 4,
        ctypes.byref(out))
    if n == 0:
        raise RuntimeError("WebPEncodeLosslessRGBA failed")
    data = ctypes.string_at(out, n)
    _LIB.WebPFree(out)
    return data
