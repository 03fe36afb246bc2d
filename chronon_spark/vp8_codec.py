"""From-scratch VP8 (lossy WebP) KEY-FRAME decoder — RFC 6386.

Pure Python + numpy, no external codec libraries: boolean arithmetic
decoder, frame/segment/filter header parsing, per-macroblock intra mode
parsing (incl. B_PRED sub-modes with above/left context), DCT token
decoding over the 4x8x3x11 probability lattice with per-frame updates,
dequantization, the exact integer inverse WHT/DCT pairs, all intra
predictors (16x16, 8x8 chroma, ten 4x4 B_PRED modes with the spec's
border conventions), and the in-loop deblocking filter (normal and
simple profiles).

Output is bit-exact YUV 4:2:0 versus libwebp's decoder (pinned in
tests/test_vp8.py via the ctypes oracle over real libwebp-encoded
streams), followed by libwebp's exact fixed-point BT.601 conversion
with fancy (bilinear) chroma upsampling to RGB.

Reference parity: rajkiran2190/chronon has no media codecs; this module
belongs to the LLM-data-pipeline surface (multimodal decode operators,
operators/multimodal.py) where lossy WebP dominates crawl data.

Scale shape: invoked inside the same Arrow-batched mapInPandas decode
pass as the other codecs — embarrassingly parallel across images, bytes
never shuffled.
"""

from __future__ import annotations

import struct

import numpy as np

from chronon_spark.vp8_tables import (
    AC_QLOOKUP,
    COEFF_BANDS,
    COEFF_UPDATE_PROBS_FLAT,
    DC_QLOOKUP,
    DEFAULT_COEFF_PROBS_FLAT,
    KF_BMODE_PROBS_FLAT,
)

# ---------------------------------------------------------------------------
# mode enums (RFC 6386 §8.2, §11.2)
# ---------------------------------------------------------------------------
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
# B-mode numbering follows the ORDER OF THE KF_BMODE_PROBS TABLE ROWS
# (B_RD=4, B_VR=5, B_LD=6 — extracted from libwebp, whose enum this
# is). RFC 6386's enum lists B_LD before B_RD; using that numbering to
# index the context rows mis-selects probability rows whenever a
# neighboring subblock used LD/RD/VR and desyncs the whole partition-0
# mode stream.
(B_DC_PRED, B_TM_PRED, B_VE_PRED, B_HE_PRED, B_RD_PRED, B_VR_PRED,
 B_LD_PRED, B_VL_PRED, B_HD_PRED, B_HU_PRED) = range(10)

# trees (RFC 6386 §8.2/§11.3/§13.2) — structural constants of the format
KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROBS = (145, 156, 163, 128)
UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROBS = (142, 114, 183)
# B_PRED sub-mode tree: "0"=DC "10"=TM "110"=VE "11100"=HE
# "111010"=RD "111011"=VR "11110"=LD "111110"=VL "1111110"=HD
# "1111111"=HU — paths verified against libwebp's compiled
# kYModesIntra4 walk table byte-for-byte.
BMODE_TREE = (
    -B_DC_PRED, 2, -B_TM_PRED, 4, -B_VE_PRED, 6, 8, 12, -B_HE_PRED, 10,
    -B_RD_PRED, -B_VR_PRED, -B_LD_PRED, 14, -B_VL_PRED, 16, -B_HD_PRED,
    -B_HU_PRED,
)
SEGMENT_TREE = (2, 4, -0, -1, -2, -3)

ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# DCT token category extra-bit probabilities (§13.2); cat1/cat2 are the
# two smallest categories, cat3..6 as published
CAT_PROBS = (
    (159,),
    (165, 145),
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
)
CAT_BASE = (5, 7, 11, 19, 35, 67)


def _unflatten_probs(flat):
    out = []
    i = 0
    for _t in range(4):
        bands = []
        for _b in range(8):
            ctxs = []
            for _c in range(3):
                ctxs.append(list(flat[i:i + 11]))
                i += 11
            bands.append(ctxs)
        out.append(bands)
    return out


_DEFAULT_COEFF_PROBS = _unflatten_probs(DEFAULT_COEFF_PROBS_FLAT)
_UPDATE_PROBS = _unflatten_probs(COEFF_UPDATE_PROBS_FLAT)
_KF_BMODE_PROBS = [
    [list(KF_BMODE_PROBS_FLAT[(a * 10 + l) * 9:(a * 10 + l) * 9 + 9])
     for l in range(10)]
    for a in range(10)
]


# ---------------------------------------------------------------------------
# boolean decoder (RFC 6386 §7)
# ---------------------------------------------------------------------------
class _Bool:
    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        self.value = (data[0] << 8 | data[1]) if len(data) >= 2 else (
            (data[0] << 8) if data else 0)
        self.range = 255
        self.bit_count = 0

    def bool(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                self.pos += 1
        return ret

    def literal(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            v = (v << 1) | self.bool(128)
        return v

    def signed(self, bits: int) -> int:
        v = self.literal(bits)
        return -v if self.bool(128) else v

    def tree(self, tree, probs) -> int:
        i = 0
        while True:
            i = tree[i + self.bool(probs[i >> 1])]
            if i <= 0:
                return -i


# ---------------------------------------------------------------------------
# inverse transforms (RFC 6386 §14.3/§14.4) — exact integer versions
# ---------------------------------------------------------------------------
_C1 = 20091   # sqrt(2) * cos(pi/8) in Q16, minus one
_C2 = 35468   # sqrt(2) * sin(pi/8) in Q16


def _idct_batch(blocks: np.ndarray) -> np.ndarray:
    """(N, 16) int64 dequantized coefficients -> (N, 4, 4) residuals —
    the same exact integer transform as _idct4x4, vectorized over the
    batch axis (per-MB batching cuts the numpy call overhead ~12x)."""
    ip = blocks.reshape(-1, 4, 4)
    a1 = ip[:, 0] + ip[:, 2]
    b1 = ip[:, 0] - ip[:, 2]
    t1 = (ip[:, 1] * _C2) >> 16
    t2 = ip[:, 3] + ((ip[:, 3] * _C1) >> 16)
    c1 = t1 - t2
    t1 = ip[:, 1] + ((ip[:, 1] * _C1) >> 16)
    t2 = (ip[:, 3] * _C2) >> 16
    d1 = t1 + t2
    col = np.empty_like(ip)
    col[:, 0] = a1 + d1
    col[:, 3] = a1 - d1
    col[:, 1] = b1 + c1
    col[:, 2] = b1 - c1
    ip2 = col.transpose(0, 2, 1)
    a1 = ip2[:, 0] + ip2[:, 2]
    b1 = ip2[:, 0] - ip2[:, 2]
    t1 = (ip2[:, 1] * _C2) >> 16
    t2 = ip2[:, 3] + ((ip2[:, 3] * _C1) >> 16)
    c1 = t1 - t2
    t1 = ip2[:, 1] + ((ip2[:, 1] * _C1) >> 16)
    t2 = (ip2[:, 3] * _C2) >> 16
    d1 = t1 + t2
    out = np.empty_like(ip2)
    out[:, 0] = (a1 + d1 + 4) >> 3
    out[:, 3] = (a1 - d1 + 4) >> 3
    out[:, 1] = (b1 + c1 + 4) >> 3
    out[:, 2] = (b1 - c1 + 4) >> 3
    return out.transpose(0, 2, 1)


def _idct4x4(block: np.ndarray) -> np.ndarray:
    """block: (16,) int32 dequantized coefficients -> (4,4) residual."""
    ip = block.reshape(4, 4).astype(np.int64)
    # columns
    a1 = ip[0] + ip[2]
    b1 = ip[0] - ip[2]
    t1 = (ip[1] * _C2) >> 16
    t2 = ip[3] + ((ip[3] * _C1) >> 16)
    c1 = t1 - t2
    t1 = ip[1] + ((ip[1] * _C1) >> 16)
    t2 = (ip[3] * _C2) >> 16
    d1 = t1 + t2
    col = np.empty((4, 4), dtype=np.int64)
    col[0] = a1 + d1
    col[3] = a1 - d1
    col[1] = b1 + c1
    col[2] = b1 - c1
    # rows
    ip = col.T
    a1 = ip[0] + ip[2]
    b1 = ip[0] - ip[2]
    t1 = (ip[1] * _C2) >> 16
    t2 = ip[3] + ((ip[3] * _C1) >> 16)
    c1 = t1 - t2
    t1 = ip[1] + ((ip[1] * _C1) >> 16)
    t2 = (ip[3] * _C2) >> 16
    d1 = t1 + t2
    out = np.empty((4, 4), dtype=np.int64)
    out[0] = (a1 + d1 + 4) >> 3
    out[3] = (a1 - d1 + 4) >> 3
    out[1] = (b1 + c1 + 4) >> 3
    out[2] = (b1 - c1 + 4) >> 3
    return out.T


def _iwht4x4(block: np.ndarray) -> np.ndarray:
    """Inverse Walsh-Hadamard for the Y2 block -> 16 DC values."""
    ip = block.reshape(4, 4).astype(np.int64)
    a1 = ip[0] + ip[3]
    b1 = ip[1] + ip[2]
    c1 = ip[1] - ip[2]
    d1 = ip[0] - ip[3]
    col = np.empty((4, 4), dtype=np.int64)
    col[0] = a1 + b1
    col[1] = c1 + d1
    col[2] = a1 - b1
    col[3] = d1 - c1
    ip = col.T
    a1 = ip[0] + ip[3]
    b1 = ip[1] + ip[2]
    c1 = ip[1] - ip[2]
    d1 = ip[0] - ip[3]
    out = np.empty((4, 4), dtype=np.int64)
    out[0] = (a1 + b1 + 3) >> 3
    out[1] = (c1 + d1 + 3) >> 3
    out[2] = (a1 - b1 + 3) >> 3
    out[3] = (d1 - c1 + 3) >> 3
    return out.T


# ---------------------------------------------------------------------------
# header containers
# ---------------------------------------------------------------------------
class _Segment:
    __slots__ = ("enabled", "update_map", "abs_delta", "quant", "lf",
                 "tree_probs")

    def __init__(self):
        self.enabled = False
        self.update_map = False
        self.abs_delta = False
        self.quant = [0, 0, 0, 0]
        self.lf = [0, 0, 0, 0]
        self.tree_probs = [255, 255, 255]


def _clamp127(v):
    return max(0, min(127, v))


class _QuantFactors:
    __slots__ = ("y1dc", "y1ac", "y2dc", "y2ac", "uvdc", "uvac")


def _compute_quant(base_qi, deltas, seg, seg_id):
    q = base_qi
    if seg.enabled:
        q = seg.quant[seg_id] if seg.abs_delta else q + seg.quant[seg_id]
    q = _clamp127(q)
    y_dc_d, y2_dc_d, y2_ac_d, uv_dc_d, uv_ac_d = deltas
    f = _QuantFactors()
    f.y1dc = DC_QLOOKUP[_clamp127(q + y_dc_d)]
    f.y1ac = AC_QLOOKUP[q]
    f.y2dc = DC_QLOOKUP[_clamp127(q + y2_dc_d)] * 2
    f.y2ac = AC_QLOOKUP[_clamp127(q + y2_ac_d)] * 155 // 100
    if f.y2ac < 8:
        f.y2ac = 8
    # chroma DC index is capped at 117 (=> step 132, the spec's cap)
    f.uvdc = DC_QLOOKUP[min(117, _clamp127(q + uv_dc_d))]
    f.uvac = AC_QLOOKUP[_clamp127(q + uv_ac_d)]
    return f


# ---------------------------------------------------------------------------
# coefficient token decoding (RFC 6386 §13.3)
# ---------------------------------------------------------------------------
def _decode_block_coeffs(bd: _Bool, probs, block_type, first, ctx, qdc, qac):
    """Returns (coeffs[16] int32 in raster order, nonzero flag)."""
    coeffs = np.zeros(16, dtype=np.int64)
    n = first
    type_probs = probs[block_type]
    p = type_probs[COEFF_BANDS[n]][ctx]
    nonzero = False
    # EOB check is skipped right after a zero token
    if not bd.bool(p[0]):
        return coeffs, False
    while True:
        # token decode starting past the EOB branch
        if not bd.bool(p[1]):
            # DCT_0
            n += 1
            if n >= 16:
                break
            p = type_probs[COEFF_BANDS[n]][0]
            # after a zero no EOB check — continue straight to p[1]
            continue
        if not bd.bool(p[2]):
            v = 1
            next_ctx = 1
        else:
            next_ctx = 2
            if not bd.bool(p[3]):
                if not bd.bool(p[4]):
                    v = 2
                else:
                    v = 3 + bd.bool(p[5])
            elif not bd.bool(p[6]):
                if not bd.bool(p[7]):
                    v = 5 + bd.bool(159)                     # cat1
                else:
                    v = 7 + 2 * bd.bool(165) + bd.bool(145)  # cat2
            else:
                b1 = bd.bool(p[8])
                b2 = bd.bool(p[9 + b1])
                cat = 2 + 2 * b1 + b2                        # cat3..cat6
                extra = 0
                for cp in CAT_PROBS[cat]:
                    extra = (extra << 1) | bd.bool(cp)
                v = CAT_BASE[cat] + extra
        if bd.bool(128):
            v = -v
        coeffs[ZIGZAG[n]] = v * (qdc if n == 0 else qac)
        nonzero = True
        n += 1
        if n >= 16:
            break
        p = type_probs[COEFF_BANDS[n]][next_ctx]
        if not bd.bool(p[0]):                                # EOB
            break
    return coeffs, nonzero


# ---------------------------------------------------------------------------
# intra predictors
# ---------------------------------------------------------------------------
def _pred16(mode, plane, px, py, size):
    """Predict a size x size block (16 luma / 8 chroma) from the bordered
    plane (border already holds the 127/129 conventions)."""
    above = plane[py - 1, px:px + size].astype(np.int64)
    left = plane[py:py + size, px - 1].astype(np.int64)
    corner = int(plane[py - 1, px - 1])
    have_above = py > 1
    have_left = px > 1
    if mode == DC_PRED:
        if have_above and have_left:
            dc = (int(above.sum()) + int(left.sum()) + size) >> (
                5 if size == 16 else 4)
        elif have_above:
            dc = (int(above.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
        elif have_left:
            dc = (int(left.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
        else:
            dc = 128
        return np.full((size, size), dc, dtype=np.int64)
    if mode == V_PRED:
        return np.tile(above, (size, 1))
    if mode == H_PRED:
        return np.tile(left[:, None], (1, size))
    # TM
    out = left[:, None] + above[None, :] - corner
    return np.clip(out, 0, 255)


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _avg2(a, b):
    return (a + b + 1) >> 1


def _pred4(mode, A, L, C, TR):
    """4x4 B_PRED (RFC 6386 §12.3 canonical layouts). A = above[0..3],
    TR = above-right[0..3], L = left[0..3], C = corner; plain ints.
    Returns (4,4) int array."""
    out = np.empty((4, 4), dtype=np.int64)
    if mode == B_DC_PRED:
        out[:] = (sum(A) + sum(L) + 4) >> 3
    elif mode == B_TM_PRED:
        for r in range(4):
            for c in range(4):
                out[r, c] = max(0, min(255, L[r] + A[c] - C))
    elif mode == B_VE_PRED:
        e = [C, A[0], A[1], A[2], A[3], TR[0]]
        row = [_avg3(e[i], e[i + 1], e[i + 2]) for i in range(4)]
        out[:] = np.array(row)[None, :]
    elif mode == B_HE_PRED:
        col = [_avg3(C, L[0], L[1]), _avg3(L[0], L[1], L[2]),
               _avg3(L[1], L[2], L[3]), _avg3(L[2], L[3], L[3])]
        out[:] = np.array(col)[:, None]
    elif mode == B_LD_PRED:
        e = list(A) + list(TR)
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    out[r, c] = _avg3(e[i], e[i + 1], e[i + 2])
                else:
                    out[r, c] = _avg3(e[6], e[7], e[7])
    elif mode == B_RD_PRED:
        e = [L[3], L[2], L[1], L[0], C, A[0], A[1], A[2], A[3]]
        for r in range(4):
            for c in range(4):
                i = c - r + 3
                # window CENTERED at e[i+1]: main diagonal (r==c) is
                # avg3(L0, C, A0), corner (3,0) is avg3(L3, L2, L1)
                out[r, c] = _avg3(e[i], e[i + 1], e[i + 2])
    elif mode == B_VR_PRED:
        pp = [L[3], L[2], L[1], L[0], C, A[0], A[1], A[2], A[3]]
        out[3, 0] = _avg3(pp[1], pp[2], pp[3])
        out[2, 0] = _avg3(pp[2], pp[3], pp[4])
        out[3, 1] = out[1, 0] = _avg3(pp[3], pp[4], pp[5])
        out[2, 1] = out[0, 0] = _avg2(pp[4], pp[5])
        out[3, 2] = out[1, 1] = _avg3(pp[4], pp[5], pp[6])
        out[2, 2] = out[0, 1] = _avg2(pp[5], pp[6])
        out[3, 3] = out[1, 2] = _avg3(pp[5], pp[6], pp[7])
        out[2, 3] = out[0, 2] = _avg2(pp[6], pp[7])
        out[1, 3] = _avg3(pp[6], pp[7], pp[8])
        out[0, 3] = _avg2(pp[7], pp[8])
    elif mode == B_VL_PRED:
        pp = list(A) + list(TR)
        out[0, 0] = _avg2(pp[0], pp[1])
        out[1, 0] = _avg3(pp[0], pp[1], pp[2])
        out[2, 0] = out[0, 1] = _avg2(pp[1], pp[2])
        out[1, 1] = out[3, 0] = _avg3(pp[1], pp[2], pp[3])
        out[2, 1] = out[0, 2] = _avg2(pp[2], pp[3])
        out[3, 1] = out[1, 2] = _avg3(pp[2], pp[3], pp[4])
        out[0, 3] = out[2, 2] = _avg2(pp[3], pp[4])
        out[1, 3] = out[3, 2] = _avg3(pp[3], pp[4], pp[5])
        out[2, 3] = _avg3(pp[4], pp[5], pp[6])
        out[3, 3] = _avg3(pp[5], pp[6], pp[7])
    elif mode == B_HD_PRED:
        pp = [L[3], L[2], L[1], L[0], C, A[0], A[1], A[2]]
        out[3, 0] = _avg2(pp[0], pp[1])
        out[3, 1] = _avg3(pp[0], pp[1], pp[2])
        out[2, 0] = out[3, 2] = _avg2(pp[1], pp[2])
        out[2, 1] = out[3, 3] = _avg3(pp[1], pp[2], pp[3])
        out[1, 0] = out[2, 2] = _avg2(pp[2], pp[3])
        out[1, 1] = out[2, 3] = _avg3(pp[2], pp[3], pp[4])
        out[0, 0] = out[1, 2] = _avg2(pp[3], pp[4])
        out[0, 1] = out[1, 3] = _avg3(pp[3], pp[4], pp[5])
        out[0, 2] = _avg3(pp[4], pp[5], pp[6])
        out[0, 3] = _avg3(pp[5], pp[6], pp[7])
    else:  # B_HU_PRED
        seq = [_avg2(L[0], L[1]), _avg3(L[0], L[1], L[2]),
               _avg2(L[1], L[2]), _avg3(L[1], L[2], L[3]),
               _avg2(L[2], L[3]), _avg3(L[2], L[3], L[3]),
               L[3], L[3], L[3], L[3]]
        for r in range(4):
            for c in range(4):
                out[r, c] = seq[min(2 * r + c, 9)]
    return out


# ---------------------------------------------------------------------------
# main decode
# ---------------------------------------------------------------------------
class VP8Error(ValueError):
    pass


def decode_vp8_yuv(data: bytes):
    """VP8 chunk payload -> (y, u, v) uint8 planes (cropped to frame
    size). Key frames only (stills are always key frames)."""
    if len(data) < 10:
        raise VP8Error("VP8 payload too short")
    tag = data[0] | data[1] << 8 | data[2] << 16
    key_frame = not (tag & 1)
    version = (tag >> 1) & 7
    part0_size = tag >> 5
    if not key_frame:
        raise VP8Error("not a key frame (stills must be key frames)")
    if version > 3:
        raise VP8Error("bad VP8 version")
    if data[3:6] != b"\x9d\x01\x2a":
        raise VP8Error("bad VP8 start code")
    w_code = data[6] | data[7] << 8
    h_code = data[8] | data[9] << 8
    width = w_code & 0x3FFF
    height = h_code & 0x3FFF
    if width == 0 or height == 0:
        raise VP8Error("zero VP8 dimensions")
    if 10 + part0_size > len(data):
        raise VP8Error("VP8 partition 0 past EOF")
    bd = _Bool(data[10:10 + part0_size])

    bd.bool(128)                      # color space (0 required)
    bd.bool(128)                      # clamping type

    seg = _Segment()
    seg.enabled = bool(bd.bool(128))
    if seg.enabled:
        seg.update_map = bool(bd.bool(128))
        update_data = bd.bool(128)
        if update_data:
            seg.abs_delta = bool(bd.bool(128))
            for i in range(4):
                if bd.bool(128):
                    seg.quant[i] = bd.signed(7)
            for i in range(4):
                if bd.bool(128):
                    seg.lf[i] = bd.signed(6)
        if seg.update_map:
            for i in range(3):
                seg.tree_probs[i] = bd.literal(8) if bd.bool(128) else 255

    filter_simple = bd.bool(128)
    filter_level = bd.literal(6)
    filter_sharpness = bd.literal(3)
    lf_delta_enabled = bool(bd.bool(128))
    ref_lf_deltas = [0, 0, 0, 0]
    mode_lf_deltas = [0, 0, 0, 0]
    if lf_delta_enabled:
        if bd.bool(128):              # deltas updated this frame
            for i in range(4):
                if bd.bool(128):
                    ref_lf_deltas[i] = bd.signed(6)
            for i in range(4):
                if bd.bool(128):
                    mode_lf_deltas[i] = bd.signed(6)

    n_parts = 1 << bd.literal(2)
    part_base = 10 + part0_size
    sizes_len = 3 * (n_parts - 1)
    if part_base + sizes_len > len(data):
        raise VP8Error("token partition table past EOF")
    part_sizes = []
    off = part_base + sizes_len
    for i in range(n_parts - 1):
        (sz,) = struct.unpack_from("<I", data[part_base + 3 * i:
                                             part_base + 3 * i + 3] + b"\0")
        part_sizes.append(sz)
    parts = []
    for sz in part_sizes:
        if off + sz > len(data):
            raise VP8Error("token partition past EOF")
        parts.append(_Bool(data[off:off + sz]))
        off += sz
    parts.append(_Bool(data[off:]))   # last partition runs to EOF

    y_ac_qi = bd.literal(7)
    deltas = []
    for _ in range(5):
        deltas.append(bd.signed(4) if bd.bool(128) else 0)
    quants = [_compute_quant(y_ac_qi, deltas, seg, s) for s in range(4)]

    bd.bool(128)                      # refresh entropy probs (key frame)

    probs = [[[list(_DEFAULT_COEFF_PROBS[t][b][c]) for c in range(3)]
              for b in range(8)] for t in range(4)]
    for t in range(4):
        for b in range(8):
            for c in range(3):
                up = _UPDATE_PROBS[t][b][c]
                row = probs[t][b][c]
                for p_i in range(11):
                    if bd.bool(up[p_i]):
                        row[p_i] = bd.literal(8)

    mb_no_skip = bd.bool(128)
    prob_skip = bd.literal(8) if mb_no_skip else 0

    mb_w = (width + 15) >> 4
    mb_h = (height + 15) >> 4

    # bordered reconstruction planes (1px top/left border carrying the
    # 127/129 edge conventions, +4 right for above-right reads)
    W = mb_w * 16
    H = mb_h * 16
    y_plane = np.empty((H + 1, W + 1 + 4), dtype=np.uint8)
    y_plane[0, :] = 127
    y_plane[:, 0] = 129
    y_plane[0, 0] = 127
    cw = mb_w * 8
    chh = mb_h * 8
    u_plane = np.empty((chh + 1, cw + 1), dtype=np.uint8)
    v_plane = np.empty((chh + 1, cw + 1), dtype=np.uint8)
    for p in (u_plane, v_plane):
        p[0, :] = 127
        p[:, 0] = 129
        p[0, 0] = 127

    # ---- parse all intra modes first (they live in partition 0) ----
    seg_ids = np.zeros((mb_h, mb_w), dtype=np.int64)
    skips = np.zeros((mb_h, mb_w), dtype=bool)
    ymodes = np.zeros((mb_h, mb_w), dtype=np.int64)
    uvmodes = np.zeros((mb_h, mb_w), dtype=np.int64)
    bmodes = np.zeros((mb_h, mb_w, 16), dtype=np.int64)
    above_sub = np.full((mb_w, 4), B_DC_PRED, dtype=np.int64)
    for my in range(mb_h):
        left_sub = np.full(4, B_DC_PRED, dtype=np.int64)
        for mx in range(mb_w):
            if seg.enabled and seg.update_map:
                seg_ids[my, mx] = bd.tree(SEGMENT_TREE, seg.tree_probs)
            if mb_no_skip:
                skips[my, mx] = bool(bd.bool(prob_skip))
            ym = bd.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            ymodes[my, mx] = ym
            if ym == B_PRED:
                for sy in range(4):
                    for sx in range(4):
                        a = (bmodes[my, mx, (sy - 1) * 4 + sx] if sy > 0
                             else above_sub[mx, sx])
                        l = (bmodes[my, mx, sy * 4 + sx - 1] if sx > 0
                             else left_sub[sy])
                        m = bd.tree(BMODE_TREE, _KF_BMODE_PROBS[a][l])
                        bmodes[my, mx, sy * 4 + sx] = m
                above_sub[mx] = bmodes[my, mx, 12:16]
                left_sub[:] = bmodes[my, mx, 3::4]
            else:
                # implied sub-modes for context of later B_PRED MBs
                implied = {DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED,
                           H_PRED: B_HE_PRED, TM_PRED: B_TM_PRED}[ym]
                bmodes[my, mx, :] = implied
                above_sub[mx] = implied
                left_sub[:] = implied
            uvmodes[my, mx] = bd.tree(UV_MODE_TREE, KF_UV_MODE_PROBS)

    # ---- residuals + reconstruction ----
    # nonzero contexts: per-plane, per-4x4 column/row
    above_nz_y = np.zeros((mb_w, 4), dtype=np.int64)
    above_nz_u = np.zeros((mb_w, 2), dtype=np.int64)
    above_nz_v = np.zeros((mb_w, 2), dtype=np.int64)
    above_nz_y2 = np.zeros(mb_w, dtype=np.int64)
    filter_levels = np.zeros((mb_h, mb_w), dtype=np.int64)
    # loop-filter skip: transmitted skip OR "no coded coefficients"
    # (libvpx forces mb_skip_coeff = (eobtotal == 0) after token decode,
    # so inner edges of all-zero MBs are never filtered even when the
    # skip flag is absent from the stream)
    filter_skips = np.zeros((mb_h, mb_w), dtype=bool)

    for my in range(mb_h):
        left_nz_y = np.zeros(4, dtype=np.int64)
        left_nz_u = np.zeros(2, dtype=np.int64)
        left_nz_v = np.zeros(2, dtype=np.int64)
        left_nz_y2 = 0
        td = parts[my % n_parts]
        for mx in range(mb_w):
            sid = seg_ids[my, mx]
            qf = quants[sid]
            ym = ymodes[my, mx]
            have_y2 = ym != B_PRED
            skip = skips[my, mx]

            y_coeffs = np.zeros((16, 16), dtype=np.int64)
            u_coeffs = np.zeros((4, 16), dtype=np.int64)
            v_coeffs = np.zeros((4, 16), dtype=np.int64)
            dc_vals = None
            if not skip:
                any_nz = False
                if have_y2:
                    ctx = left_nz_y2 + above_nz_y2[mx]
                    c2, nz = _decode_block_coeffs(
                        td, probs, 1, 0, ctx, qf.y2dc, qf.y2ac)
                    left_nz_y2 = above_nz_y2[mx] = int(nz)
                    any_nz |= nz
                    dc_vals = _iwht4x4(c2).reshape(-1)
                    first = 1
                    btype = 0
                else:
                    first = 0
                    btype = 3
                for sb in range(16):
                    sy, sx = divmod(sb, 4)
                    ctx = left_nz_y[sy] + above_nz_y[mx, sx]
                    cf, nz = _decode_block_coeffs(
                        td, probs, btype, first, ctx, qf.y1dc, qf.y1ac)
                    left_nz_y[sy] = above_nz_y[mx, sx] = int(nz)
                    any_nz |= nz
                    y_coeffs[sb] = cf
                for plane_coeffs, left_nz, above_nz in (
                        (u_coeffs, left_nz_u, above_nz_u),
                        (v_coeffs, left_nz_v, above_nz_v)):
                    for sb in range(4):
                        sy, sx = divmod(sb, 2)
                        ctx = left_nz[sy] + above_nz[mx, sx]
                        cf, nz = _decode_block_coeffs(
                            td, probs, 2, 0, ctx, qf.uvdc, qf.uvac)
                        left_nz[sy] = above_nz[mx, sx] = int(nz)
                        any_nz |= nz
                        plane_coeffs[sb] = cf
            else:
                left_nz_y[:] = 0
                above_nz_y[mx, :] = 0
                left_nz_u[:] = 0
                above_nz_u[mx, :] = 0
                left_nz_v[:] = 0
                above_nz_v[mx, :] = 0
                any_nz = False
                if have_y2:
                    # Y2 context persists across a skipped MB with Y2
                    dc_vals = np.zeros(16, dtype=np.int64)

            if have_y2 and dc_vals is not None:
                for sb in range(16):
                    y_coeffs[sb, 0] = dc_vals[sb]
            elif have_y2:
                for sb in range(16):
                    y_coeffs[sb, 0] = 0

            # ---- luma reconstruction ----
            px = 1 + mx * 16
            py = 1 + my * 16
            if ym != B_PRED:
                pred = _pred16(ym, y_plane, px, py, 16)
                recon = pred.copy()
                if (not skip) or (dc_vals is not None and dc_vals.any()):
                    res = _idct_batch(y_coeffs)         # (16, 4, 4)
                    recon4 = recon.reshape(4, 4, 4, 4).swapaxes(1, 2)
                    recon4 += res.reshape(4, 4, 4, 4)
                y_plane[py:py + 16, px:px + 16] = np.clip(
                    recon, 0, 255).astype(np.uint8)
            else:
                # B_PRED: reconstruct subblock by subblock
                # top-right beyond this MB: from the row above the MB
                for sb in range(16):
                    sy, sx = divmod(sb, 4)
                    bx = px + sx * 4
                    by = py + sy * 4
                    A = [int(v) for v in y_plane[by - 1, bx:bx + 4]]
                    L = [int(v) for v in y_plane[by:by + 4, bx - 1]]
                    C = int(y_plane[by - 1, bx - 1])
                    if sx < 3:
                        if sy == 0:
                            TR = [int(v) for v in
                                  y_plane[by - 1, bx + 4:bx + 8]]
                        else:
                            # interior: above-right subblock already
                            # reconstructed this MB
                            TR = [int(v) for v in
                                  y_plane[by - 1, bx + 4:bx + 8]]
                    else:
                        # rightmost column: always the row above the MB
                        TR = [int(v) for v in
                              y_plane[py - 1, px + 16:px + 20]]
                    pred = _pred4(int(bmodes[my, mx, sb]), A, L, C, TR)
                    res = _idct4x4(y_coeffs[sb]) if not skip else 0
                    y_plane[by:by + 4, bx:bx + 4] = np.clip(
                        pred + res, 0, 255).astype(np.uint8)

            # ---- chroma ----
            cx = 1 + mx * 8
            cy = 1 + my * 8
            uvm = uvmodes[my, mx]
            for plane, pc in ((u_plane, u_coeffs), (v_plane, v_coeffs)):
                pred = _pred16(uvm, plane, cx, cy, 8)
                recon = pred.copy()
                if not skip:
                    res = _idct_batch(pc)               # (4, 4, 4)
                    recon4 = recon.reshape(2, 4, 2, 4).swapaxes(1, 2)
                    recon4 += res.reshape(2, 2, 4, 4)
                plane[cy:cy + 8, cx:cx + 8] = np.clip(
                    recon, 0, 255).astype(np.uint8)

            # filter level for this MB
            lvl = filter_level
            if seg.enabled:
                lvl = seg.lf[sid] if seg.abs_delta else lvl + seg.lf[sid]
            lvl = max(0, min(63, lvl))
            if lf_delta_enabled:
                lvl += ref_lf_deltas[0]
                if ym == B_PRED:
                    lvl += mode_lf_deltas[0]
                lvl = max(0, min(63, lvl))
            filter_levels[my, mx] = lvl
            filter_skips[my, mx] = skip or not any_nz

        # fill the above-right border beyond the frame for the next row:
        # rightmost +4 columns replicate the last pixel of the row
        row_end = 1 + mb_w * 16
        y_plane[1 + my * 16:1 + my * 16 + 16, row_end:row_end + 4] = (
            y_plane[1 + my * 16:1 + my * 16 + 16, row_end - 1][:, None])

    # truncation detection: the bool decoder zero-pads past EOF (as
    # hardware decoders do), so a cut stream "decodes" silently; cap
    # the tolerated overrun at the 2-byte lookahead the renormalizer
    # legitimately reads
    for part in [bd] + parts:
        if part.pos > len(part.data) + 2:
            raise VP8Error("VP8 bitstream truncated")

    y = y_plane[1:, 1:1 + W]
    u = u_plane[1:, 1:]
    v = v_plane[1:, 1:]

    if filter_level > 0:
        _loop_filter(y, u, v, filter_levels, filter_sharpness,
                     bool(filter_simple), ymodes, filter_skips, mb_w, mb_h)

    return (np.ascontiguousarray(y[:height, :width]),
            np.ascontiguousarray(u[:(height + 1) // 2, :(width + 1) // 2]),
            np.ascontiguousarray(v[:(height + 1) // 2, :(width + 1) // 2]))


# ---------------------------------------------------------------------------
# loop filter (RFC 6386 §15) — vectorized along each edge
# ---------------------------------------------------------------------------
def _s(v):
    """uint8 -> signed domain (value - 128) as int64 array."""
    return v.astype(np.int64) - 128


def _clamp_s(v):
    return np.clip(v, -128, 127)


def _u(v):
    return (np.clip(v, -128, 127) + 128).astype(np.uint8)


def _filter_common(p1, p0, q0, q1, use_outer):
    a = _clamp_s(3 * (q0 - p0) + _clamp_s(p1 - q1) * use_outer)
    f1 = _clamp_s(a + 4) >> 3
    f2 = _clamp_s(a + 3) >> 3
    q0n = _clamp_s(q0 - f1)
    p0n = _clamp_s(p0 + f2)
    return p0n, q0n, f1


def _simple_edge(plane, pos, axis, limit_v):
    """Simple filter on one edge line (all rows/cols at once)."""
    if axis == 0:   # vertical edge: columns pos-2..pos+1
        p1 = _s(plane[:, pos - 2])
        p0 = _s(plane[:, pos - 1])
        q0 = _s(plane[:, pos])
        q1 = _s(plane[:, pos + 1])
    else:
        p1 = _s(plane[pos - 2, :])
        p0 = _s(plane[pos - 1, :])
        q0 = _s(plane[pos, :])
        q1 = _s(plane[pos + 1, :])
    mask = (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= limit_v
    p0n, q0n, _ = _filter_common(p1, p0, q0, q1, 1)
    p0f = np.where(mask, p0n, p0)
    q0f = np.where(mask, q0n, q0)
    if axis == 0:
        plane[:, pos - 1] = _u(p0f)
        plane[:, pos] = _u(q0f)
    else:
        plane[pos - 1, :] = _u(p0f)
        plane[pos, :] = _u(q0f)


def _normal_edge(plane, pos, axis, mb_edge, elimit_v, ilimit_v, hev_t):
    # one contiguous gather for all eight taps (8 separate column reads
    # cost ~8x the numpy dispatch for these short vectors)
    if axis == 0:
        window = plane[:, pos - 4:pos + 4].astype(np.int64) - 128
    else:
        window = plane[pos - 4:pos + 4, :].astype(np.int64).T - 128
    p3, p2, p1, p0, q0, q1, q2, q3 = window.T
    # fused masks: adjacent-tap diffs in ONE abs(diff) pass — columns
    # 0..6 = |p2-p3| |p1-p2| |p0-p1| |q0-p0| |q1-q0| |q2-q1| |q3-q2|
    d = np.abs(np.diff(window, axis=1))
    mask = (2 * d[:, 3] + (np.abs(p1 - q1) >> 1)) <= elimit_v
    mask &= np.max(d[:, (0, 1, 2, 4, 5, 6)], axis=1) <= ilimit_v
    if not mask.any():
        return
    hev = (d[:, 2] > hev_t) | (d[:, 4] > hev_t)
    q0mp0_3 = 3 * (q0 - p0)
    outer = np.clip(p1 - q1, -128, 127)

    if mb_edge:
        # wide (6-tap) filter where not hev; 4-tap with outer where hev
        w = np.clip(outer + q0mp0_3, -128, 127)
        fa = (27 * w + 63) >> 7
        fb = (18 * w + 63) >> 7
        fc = (9 * w + 63) >> 7
        a_h = np.clip(outer + q0mp0_3, -128, 127)
        f1 = np.clip(a_h + 4, -128, 127) >> 3
        f2 = np.clip(a_h + 3, -128, 127) >> 3
        sel_w = mask & ~hev
        sel_h = mask & hev
        window[:, 1] = np.where(sel_w, p2 + fc, p2)
        window[:, 2] = np.where(sel_w, p1 + fb, p1)
        window[:, 3] = np.where(sel_w, p0 + fa,
                                np.where(sel_h, p0 + f2, p0))
        window[:, 4] = np.where(sel_w, q0 - fa,
                                np.where(sel_h, q0 - f1, q0))
        window[:, 5] = np.where(sel_w, q1 - fb, q1)
        window[:, 6] = np.where(sel_w, q2 - fc, q2)
        lo, hi = 1, 7
    else:
        a = np.clip(outer * hev + q0mp0_3, -128, 127)
        f1 = np.clip(a + 4, -128, 127) >> 3
        f2 = np.clip(a + 3, -128, 127) >> 3
        a2 = (f1 + 1) >> 1
        sel_nh = mask & ~hev
        window[:, 2] = np.where(sel_nh, p1 + a2, p1)
        window[:, 3] = np.where(mask, p0 + f2, p0)
        window[:, 4] = np.where(mask, q0 - f1, q0)
        window[:, 5] = np.where(sel_nh, q1 - a2, q1)
        lo, hi = 2, 6
    np.clip(window[:, lo:hi], -128, 127, out=window[:, lo:hi])
    if axis == 0:
        plane[:, pos - 4:pos + 4] = window + 128
    else:
        plane[pos - 4:pos + 4, :] = (window + 128).T


def _loop_filter(y, u, v, levels, sharpness, simple, ymodes, skips,
                 mb_w, mb_h):
    for my in range(mb_h):
        for mx in range(mb_w):
            lvl = int(levels[my, mx])
            if lvl == 0:
                continue
            ilevel = lvl
            if sharpness:
                ilevel >>= 2 if sharpness > 4 else 1
                if ilevel > 9 - sharpness:
                    ilevel = 9 - sharpness
            if ilevel < 1:
                ilevel = 1
            hev_t = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)
            mb_lim = (lvl + 2) * 2 + ilevel
            sub_lim = lvl * 2 + ilevel
            # interior edges are skipped for skipped non-B_PRED MBs
            inner = (not skips[my, mx]) or ymodes[my, mx] == B_PRED

            ys = slice(my * 16, my * 16 + 16)
            xs = slice(mx * 16, mx * 16 + 16)
            cys = slice(my * 8, my * 8 + 8)
            cxs = slice(mx * 8, mx * 8 + 8)
            if simple:
                if mx > 0:
                    _simple_edge(y[ys, :], mx * 16, 0, mb_lim)
                if inner:
                    for c in (4, 8, 12):
                        _simple_edge(y[ys, :], mx * 16 + c, 0, sub_lim)
                if my > 0:
                    _simple_edge(y[:, xs], my * 16, 1, mb_lim)
                if inner:
                    for r in (4, 8, 12):
                        _simple_edge(y[:, xs], my * 16 + r, 1, sub_lim)
            else:
                if mx > 0:
                    _normal_edge(y[ys, :], mx * 16, 0, True, mb_lim,
                                 ilevel, hev_t)
                    _normal_edge(u[cys, :], mx * 8, 0, True, mb_lim,
                                 ilevel, hev_t)
                    _normal_edge(v[cys, :], mx * 8, 0, True, mb_lim,
                                 ilevel, hev_t)
                if inner:
                    for c in (4, 8, 12):
                        _normal_edge(y[ys, :], mx * 16 + c, 0, False,
                                     sub_lim, ilevel, hev_t)
                    _normal_edge(u[cys, :], mx * 8 + 4, 0, False, sub_lim,
                                 ilevel, hev_t)
                    _normal_edge(v[cys, :], mx * 8 + 4, 0, False, sub_lim,
                                 ilevel, hev_t)
                if my > 0:
                    _normal_edge(y[:, xs], my * 16, 1, True, mb_lim,
                                 ilevel, hev_t)
                    _normal_edge(u[:, cxs], my * 8, 1, True, mb_lim,
                                 ilevel, hev_t)
                    _normal_edge(v[:, cxs], my * 8, 1, True, mb_lim,
                                 ilevel, hev_t)
                if inner:
                    for r in (4, 8, 12):
                        _normal_edge(y[:, xs], my * 16 + r, 1, False,
                                     sub_lim, ilevel, hev_t)
                    _normal_edge(u[:, cxs], my * 8 + 4, 1, False, sub_lim,
                                 ilevel, hev_t)
                    _normal_edge(v[:, cxs], my * 8 + 4, 1, False, sub_lim,
                                 ilevel, hev_t)


# ---------------------------------------------------------------------------
# YUV -> RGB (libwebp's exact fixed-point BT.601 + fancy upsampling)
# ---------------------------------------------------------------------------
def _mult_hi(v, coeff):
    return (v * coeff) >> 8


def yuv_to_rgb(y, u, v):
    """Per-pixel fixed-point conversion (u, v already full-res)."""
    yv = y.astype(np.int64)
    uv = u.astype(np.int64)
    vv = v.astype(np.int64)
    r = _mult_hi(yv, 19077) + _mult_hi(vv, 26149) - 14234
    g = (_mult_hi(yv, 19077) - _mult_hi(uv, 6419)
         - _mult_hi(vv, 13320) + 8708)
    b = _mult_hi(yv, 19077) + _mult_hi(uv, 33050) - 17685
    out = np.stack([r, g, b], axis=-1)
    return np.clip(out >> 6, 0, 255).astype(np.uint8)


def fancy_upsample(c, out_h, out_w):
    """libwebp's fancy chroma upsampler: each output pixel is a
    (9, 3, 3, 1)/16 blend of the four nearest chroma samples."""
    ch, cw = c.shape
    c = c.astype(np.int64)
    # pad by edge replication for the 2x2 gather
    cp = np.pad(c, 1, mode="edge")
    out = np.empty((out_h, out_w), dtype=np.int64)
    ys = np.arange(out_h)
    xs = np.arange(out_w)
    # nearest sample indices and diagonal neighbors
    cy = (ys >> 1)
    cx = (xs >> 1)
    dy = np.where((ys & 1) == 0, -1, 1)
    dx = np.where((xs & 1) == 0, -1, 1)
    main = cp[1 + cy][:, 1 + cx]
    vert = cp[1 + np.clip(cy + dy, -1, ch)][:, 1 + cx]
    horz = cp[1 + cy][:, 1 + np.clip(cx + dx, -1, cw)]
    diag = cp[1 + np.clip(cy + dy, -1, ch)][:, 1 + np.clip(cx + dx, -1, cw)]
    out = (9 * main + 3 * vert + 3 * horz + diag + 8) >> 4
    return out.astype(np.uint8)


def decode_vp8_rgb(data: bytes) -> np.ndarray:
    """VP8 chunk payload -> (h, w, 3) uint8 RGB."""
    y, u, v = decode_vp8_yuv(data)
    h, w = y.shape
    uf = fancy_upsample(u, h, w)
    vf = fancy_upsample(v, h, w)
    return yuv_to_rgb(y, uf, vf)
