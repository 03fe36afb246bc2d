"""From-scratch PNG and baseline-JPEG codecs (pure Python + numpy +
stdlib zlib) — the real-format decode path for the image payload axis.

The container ships no PIL/libjpeg, so the engine's image pipeline
previously decoded only the synthetic 'rgb8'/'half' layouts.  These two
codecs close that gap with REAL interchange formats, built solely from
the public specifications:

  * PNG  (RFC 2083 / W3C PNG spec): 8-bit truecolor, all five scanline
    filters on decode (None/Sub/Up/Average/Paeth), filter-0 + zlib on
    encode.  Lossless — decoded pixels are bit-identical.
  * JPEG (ITU-T T.81 baseline sequential DCT, JFIF YCbCr): encoder
    emits SOI/APP0/DQT/SOF0/DHT/[DRI]/SOS with libjpeg-style
    quality-scaled quantization tables and per-image canonical Huffman
    tables built by the spec's own Annex-K code-size procedure (so the
    decoder exercises real DQT/DHT parsing, not baked-in tables);
    4:4:4 / 4:2:0 / 4:2:2 / 4:4:0 chroma subsampling (box-average down,
    libjpeg-style fancy triangle upsampling back) and restart markers
    (DRI/RSTn: byte-aligned segments, DC-predictor resets) on both
    sides — the layouts real web JPEGs actually use. Decoder does
    marker parse -> Huffman -> dequant -> IDCT -> upsample -> color.
    Lossy — smooth content at quality>=85 lands PSNR >= 40dB (tested
    for every subsampling x restart combination).

Throughput note: entropy decode is a per-symbol Python loop (the honest
cost of a no-C-extension container); everything block-shaped (DCT/IDCT,
quantization, color transforms, PNG unfiltering of filter-0 rows) is
vectorized numpy.  Production deployments swap `decode_jpeg` for
libjpeg-turbo behind the same signature; the Spark-side plumbing
(schema, Arrow batching, fused decode pass) is identical either way.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# decode-side allocation guards: a corrupt header dimension (or a crafted
# zlib bomb behind one) must raise ValueError BEFORE the decoder allocates
# plane arrays sized from it — at 10^12 web images a flipped SOF/IHDR byte
# would otherwise OOM the executor instead of becoming a decode_ok=false
# row. Pixels alone are not enough: bytes-per-pixel reaches 8 (RGBA16),
# so the budget is expressed in header-implied BYTES, and the heavy
# working arrays stay narrow (int16 unfilter, int16 coefficients,
# float32 IDCT) so the peak is a small constant times the budget.
# 2^26 px = 67 MP and 2^27 B = 134 MB raw samples (33 MP RGBA8) — both
# far above any feature-pipeline input.
_MAX_PIXELS = 1 << 26
_MAX_DECODE_BYTES = 1 << 27
# JPEG: total 8x8 blocks across all components; 2^20 blocks ≈ 22 MP at
# 4:4:4 / 45 MP at 4:2:0, and caps the dequantized float32 plane of any
# one component at 256 MB.
_MAX_JPEG_BLOCKS = 1 << 20


def _check_dims(w: int, h: int) -> None:
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise ValueError(f"implausible image dimensions {w}x{h}")


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


# PNG color types: 0 grayscale, 2 truecolor, 3 palette, 4 gray+alpha,
# 6 truecolor+alpha (PNG spec 11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# Adam7 interlace pass geometry: (x0, y0, dx, dy) per pass (spec 8.2)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _adam7_dims(w: int, h: int) -> list[tuple[int, int, int, int, int, int]]:
    """(x0, y0, dx, dy, wp, hp) per non-empty Adam7 pass."""
    out = []
    for x0, y0, dx, dy in _ADAM7:
        wp = (w - x0 + dx - 1) // dx if w > x0 else 0
        hp = (h - y0 + dy - 1) // dy if h > y0 else 0
        if wp > 0 and hp > 0:
            out.append((x0, y0, dx, dy, wp, hp))
    return out


def encode_png(
    pix: np.ndarray,
    color_type: int = 2,
    interlace: bool = False,
    alpha: np.ndarray | None = None,
) -> bytes:
    """8-bit PNG, filter type 0 per scanline.

    pix: (h, w, 3) uint8. color_type 2 (truecolor, default), 0 (grayscale
    — requires r==g==b), 3 (palette — requires <= 256 distinct colors),
    4 (gray+alpha) or 6 (truecolor+alpha); `alpha` is an optional (h, w)
    uint8 plane for types 4/6 (opaque by default). interlace=True emits
    Adam7 passes."""
    h, w, c = pix.shape
    assert c == 3 and pix.dtype == np.uint8
    extra_chunks = []
    if color_type == 2:
        samples = pix
    elif color_type == 0:
        if not (np.array_equal(pix[:, :, 0], pix[:, :, 1])
                and np.array_equal(pix[:, :, 0], pix[:, :, 2])):
            raise ValueError("grayscale PNG requires r==g==b content")
        samples = pix[:, :, :1]
    elif color_type in (4, 6):
        a = (np.full((h, w), 255, np.uint8) if alpha is None
             else alpha.astype(np.uint8))
        if color_type == 4:
            if not (np.array_equal(pix[:, :, 0], pix[:, :, 1])
                    and np.array_equal(pix[:, :, 0], pix[:, :, 2])):
                raise ValueError("gray+alpha PNG requires r==g==b content")
            samples = np.stack([pix[:, :, 0], a], axis=-1)
        else:
            samples = np.concatenate([pix, a[:, :, None]], axis=-1)
    elif color_type == 3:
        flat = pix.reshape(-1, 3)
        palette, inv = np.unique(flat, axis=0, return_inverse=True)
        if len(palette) > 256:
            raise ValueError(f"palette PNG: {len(palette)} colors > 256")
        extra_chunks.append(_png_chunk(b"PLTE", palette.astype(np.uint8).tobytes()))
        samples = inv.astype(np.uint8).reshape(h, w, 1)
    else:
        raise ValueError(f"unsupported color type {color_type}")
    ch = samples.shape[2]

    def _serialize(rows: np.ndarray) -> bytes:
        hh = rows.shape[0]
        return np.concatenate(
            [np.zeros((hh, 1), dtype=np.uint8),
             rows.reshape(hh, -1)], axis=1
        ).tobytes()

    if interlace:
        raw = b"".join(
            _serialize(samples[y0::dy, x0::dx])
            for x0, y0, dx, dy, wp, hp in _adam7_dims(w, h)
        )
    else:
        raw = _serialize(samples)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0,
                       1 if interlace else 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + b"".join(extra_chunks)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG to (h, w, 3) uint8: color types 0/2/3/4/6, bit depths
    8 and 16 (16-bit scaled to 8 via the high byte), tRNS palette
    transparency, and Adam7 interlacing — the layouts real-world PNGs
    use. Alpha is composited over white. Handles every scanline filter
    type so externally-produced PNGs (which usually mix Sub/Up/Average/
    Paeth) decode too, not just our own filter-0 output.  Malformed
    input raises ValueError (the decode pipeline's integrity gate turns
    that into a decode_ok=false row)."""
    try:
        return _decode_png_inner(data)
    except (IndexError, struct.error, zlib.error, ValueError) as e:
        raise ValueError(f"corrupt PNG: {e}") from e


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters: raw flat uint8 of h*(stride+1) bytes
    (leading filter byte per row) -> (h, stride) uint8."""
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG scanline data truncated")
    rows = raw[: h * (stride + 1)].reshape(h, stride + 1)
    filters = rows[:, 0]
    # int16 is wide enough for every intermediate (samples 0-255, Paeth
    # p = a+b-c in [-255, 510]) and keeps the working set at 4x the raw
    # bytes instead of int64's 16x — the allocation-guard budget assumes
    # this (a header at the byte cap must not imply a multi-GB unfilter).
    cur = rows[:, 1:].astype(np.int16)
    out = np.zeros((h, stride), dtype=np.int16)
    for r in range(h):
        f = filters[r]
        line = cur[r].copy()
        up = out[r - 1] if r else np.zeros(stride, dtype=np.int16)
        if f == 0:
            pass
        elif f == 2:  # Up — no intra-row dependency, vectorized
            line = (line + up) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = up[x]
                if f == 1:
                    line[x] = (line[x] + a) & 0xFF
                elif f == 3:
                    line[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                else:
                    cdiag = up[x - bpp] if x >= bpp else 0
                    p = a + b - cdiag
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cdiag)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else cdiag
                    )
                    line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[r] = line
    return out.astype(np.uint8)


def _decode_png_rgba(data: bytes) -> np.ndarray:
    """Core PNG decode to (h, w, 4) uint8 RGBA — alpha NOT composited.
    decode_png composites this over white (the still-image contract);
    the APNG path composites frames onto the animation canvas instead,
    which needs the true per-pixel alpha."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, w = 8, None
    idat = bytearray()
    plte = trns = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (
                comp or filt or interlace not in (0, 1)
                or ctype not in _PNG_CHANNELS
                or depth not in (8, 16)
                or (ctype == 3 and depth != 8)
            ):
                raise ValueError(
                    f"unsupported PNG layout depth={depth} ctype={ctype} "
                    f"interlace={interlace}"
                )
        elif typ == b"PLTE":
            if length % 3:
                raise ValueError("PLTE length not a multiple of 3")
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    _check_dims(w, h)
    channels = _PNG_CHANNELS[ctype]
    bpp = channels * (depth // 8)
    if interlace:
        expected = sum(hp * (wp * bpp + 1) for *_, wp, hp in _adam7_dims(w, h))
    else:
        expected = h * (w * bpp + 1)
    if expected > _MAX_DECODE_BYTES:
        raise ValueError(
            f"implausible decoded size {expected} bytes ({w}x{h} bpp={bpp})"
        )
    # bounded inflate: never decompress past the header-implied size (a
    # crafted stream cannot force a larger allocation than its own claim,
    # and the claim itself is capped by _check_dims + the byte budget)
    d = zlib.decompressobj()
    raw = np.frombuffer(d.decompress(bytes(idat), expected), dtype=np.uint8)
    if len(raw) != expected or d.decompress(d.unconsumed_tail, 1):
        raise ValueError("PNG pixel data length mismatch")
    if interlace:
        arr = np.zeros((h, w, bpp), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy, wp, hp in _adam7_dims(w, h):
            n = hp * (wp * bpp + 1)
            sub = _unfilter(raw[off : off + n], hp, wp * bpp, bpp)
            arr[y0::dy, x0::dx] = sub.reshape(hp, wp, bpp)
            off += n
    else:
        arr = _unfilter(raw, h, w * bpp, bpp).reshape(h, w, bpp)
    # tRNS for non-alpha layouts (spec 11.3.2.1): one 16-bit sample value
    # per channel; pixels that match EXACTLY (at source depth, before any
    # downconversion) are fully transparent. Must be evaluated on the
    # full-depth samples — two 16-bit colors sharing a high byte differ.
    tmask = None
    if trns is not None and ctype in (0, 2):
        tv = np.frombuffer(bytes(trns), dtype=">u2").astype(np.int32)
        if len(tv) != channels:
            raise ValueError("tRNS length mismatch for color type")
        if depth == 16:
            full = arr.reshape(h, w, channels, 2).astype(np.int32)
            samples = (full[..., 0] << 8) | full[..., 1]
        else:
            # depth 8: the transparent value lives in the low byte; a
            # high byte > 0 can match no sample (spec requires 0 there)
            samples = arr.reshape(h, w, channels).astype(np.int32)
        tmask = (samples == tv).all(axis=2)
    if depth == 16:  # big-endian: high byte is the 8-bit downconversion
        arr = np.ascontiguousarray(arr.reshape(h, w, channels, 2)[..., 0])
    else:
        arr = arr.reshape(h, w, channels)

    def _rgba(rgb: np.ndarray, a: np.ndarray) -> np.ndarray:
        return np.concatenate([rgb, a[:, :, None]], axis=2)

    def _opaque_with_tmask(rgb: np.ndarray) -> np.ndarray:
        a = np.full((h, w), 255, np.uint8)
        if tmask is not None and tmask.any():
            a[tmask] = 0  # binary transparency
        return _rgba(rgb, a)

    if ctype == 2:
        return _opaque_with_tmask(arr)
    if ctype == 0:
        return _opaque_with_tmask(np.repeat(arr, 3, axis=2))
    if ctype == 4:
        return _rgba(np.repeat(arr[:, :, :1], 3, axis=2), arr[:, :, 1])
    if ctype == 6:
        return arr.copy()
    # ctype 3: palette lookup (+ optional tRNS per-index alpha)
    if plte is None:
        raise ValueError("palette PNG missing PLTE")
    idx = arr[:, :, 0]
    if int(idx.max(initial=0)) >= len(plte):
        raise ValueError("palette index out of range")
    rgb = plte[idx]
    if trns is not None and len(trns):
        a8 = np.full(len(plte), 255, np.uint8)
        a8[: len(trns)] = trns
        return _rgba(rgb, a8[idx])
    return _rgba(rgb, np.full((h, w), 255, np.uint8))


def _rgba_over_white(rgba: np.ndarray) -> np.ndarray:
    """Composite (h, w, 4) over white — EXACTLY the historical rounding
    ((rgb*a + 255*(255-a) + 127) // 255), so still-image outputs are
    bit-identical to the pre-RGBA-refactor decoder. For fully opaque
    pixels the formula reduces to identity."""
    rgb = rgba[:, :, :3].astype(np.int32)
    a = rgba[:, :, 3].astype(np.int32)[:, :, None]
    return ((rgb * a + 255 * (255 - a) + 127) // 255).astype(np.uint8)


def _decode_png_inner(data: bytes) -> np.ndarray:
    return _rgba_over_white(_decode_png_rgba(data))


# ---------------------------------------------------------------------------
# JPEG (baseline sequential, 4:4:4)
# ---------------------------------------------------------------------------

# Annex-K base quantization tables (the spec's example tables, the ones
# every libjpeg-compatible encoder scales by quality)
_QY = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64)
_QC = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float64)

_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZZ = np.argsort(_ZZ)

_DCT_M = np.zeros((8, 8))
for _u in range(8):
    _cu = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _DCT_M[_u, _x] = _cu * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(100, max(1, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    qy = np.clip(np.floor((_QY * scale + 50) / 100), 1, 255)
    qc = np.clip(np.floor((_QC * scale + 50) / 100), 1, 255)
    return qy, qc


def _rgb_to_ycbcr(pix: np.ndarray) -> np.ndarray:
    p = pix.astype(np.float64)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    return np.stack([
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _blockify(chan: np.ndarray) -> np.ndarray:
    """(H, W) -> (H//8 * W//8, 8, 8) in raster block order."""
    hh, ww = chan.shape
    return (
        chan.reshape(hh // 8, 8, ww // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _unblockify(blocks: np.ndarray, hh: int, ww: int) -> np.ndarray:
    return (
        blocks.reshape(hh // 8, ww // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(hh, ww)
    )


def _magnitude_category(v: np.ndarray) -> np.ndarray:
    """JPEG size category: number of bits of |v| (0 for v == 0)."""
    out = np.zeros(v.shape, dtype=np.int64)
    nz = v != 0
    out[nz] = np.floor(np.log2(np.abs(v[nz]))).astype(np.int64) + 1
    return out


def _huffman_lengths(freq: np.ndarray) -> dict[int, int]:
    """Code lengths per T.81 Annex K.2 (CODE_SIZE with reserved symbol
    256 — guarantees no all-ones code) + K.3 ADJUST_BITS (cap at 16)."""
    freq = freq.astype(np.int64).copy()
    freq = np.append(freq, 1)  # the reserved symbol
    others = np.full(len(freq), -1, dtype=np.int64)
    codesize = np.zeros(len(freq), dtype=np.int64)
    while True:
        nz = np.flatnonzero(freq > 0)
        if len(nz) <= 1:
            break
        order = nz[np.lexsort((-nz, freq[nz]))]
        v1, v2 = int(order[0]), int(order[1])
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = int(others[v1])
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = int(others[v2])
            codesize[v2] += 1
    bits = np.zeros(60, dtype=np.int64)
    for s in codesize[codesize > 0]:
        bits[s] += 1
    i = len(bits) - 1
    while i > 16:  # ADJUST_BITS fold-back
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    # drop the reserved symbol's code (the longest one)
    for s in range(16, 0, -1):
        if bits[s] > 0:
            bits[s] -= 1
            break
    # canonical: symbols sorted by (codesize, symbol), reserved excluded
    real = [
        (int(codesize[s]), s) for s in range(len(freq) - 1) if codesize[s] > 0
    ]
    real.sort()
    lengths: dict[int, int] = {}
    counts = list(bits[1:17])
    li, taken = 0, 0
    for _, sym in real:
        while li < 16 and taken >= counts[li]:
            li += 1
            taken = 0
        if li >= 16:
            li = 15  # safety: should not happen after ADJUST_BITS
        lengths[sym] = li + 1
        taken += 1
    return lengths


def _canonical_codes(lengths: dict[int, int]):
    """(bits[1..16], symbol list, symbol -> (code, length)) canonical."""
    by_len: list[list[int]] = [[] for _ in range(17)]
    for sym, ln in lengths.items():
        by_len[ln].append(sym)
    for ln in range(17):
        by_len[ln].sort()
    code, table = 0, {}
    bits, vals = [], []
    for ln in range(1, 17):
        bits.append(len(by_len[ln]))
        for sym in by_len[ln]:
            table[sym] = (code, ln)
            vals.append(sym)
            code += 1
        code <<= 1
    return bits, vals, table


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _mcu_scan_order(
    mcus_y: int, mcus_x: int, hi: int, vi: int, bpr: int
) -> np.ndarray:
    """Raster-block indices of one component in MCU scan order: per MCU,
    its hi x vi blocks in raster order within the MCU (T.81 A.2.3)."""
    m = np.arange(mcus_y * mcus_x)
    my, mx = np.divmod(m, mcus_x)
    j = np.arange(vi * hi)
    by, bx = np.divmod(j, hi)
    rows = my[:, None] * vi + by[None, :]
    cols = mx[:, None] * hi + bx[None, :]
    return (rows * bpr + cols).reshape(-1)


def _dc_diff(dc: np.ndarray, blocks_per_mcu: int, restart_interval: int
             ) -> np.ndarray:
    """DPCM differences in scan order; predictors reset at every restart
    boundary (T.81 F.2.1.3.1)."""
    diff = np.diff(dc, prepend=0)
    if restart_interval:
        starts = np.arange(0, len(dc), restart_interval * blocks_per_mcu)
        diff[starts] = dc[starts]
    return diff


def _component_symbols(qblocks: np.ndarray, dc_diff: np.ndarray):
    """Per-block (dc_symbols, dc_extra, ac_symbol_runs) for one component.
    qblocks: (nb, 64) zigzagged quantized ints; dc_diff: scan-order DPCM
    differences (restart resets already applied)."""
    dc_size = _magnitude_category(dc_diff)
    per_block = []
    for b in range(len(qblocks)):
        ac = qblocks[b, 1:]
        syms = []
        run = 0
        nz = np.flatnonzero(ac)
        last = nz[-1] if len(nz) else -1
        for i in range(last + 1):
            v = int(ac[i])
            if v == 0:
                run += 1
                if run == 16:
                    syms.append((0xF0, 0, 0))  # ZRL
                    run = 0
            else:
                size = int(_magnitude_category(np.array([v]))[0])
                syms.append(((run << 4) | size, v, size))
                run = 0
        if last < 62:
            syms.append((0x00, 0, 0))  # EOB
        per_block.append(syms)
    return dc_diff, dc_size, per_block


def _encode_magnitude(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def encode_jpeg(
    pix: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline sequential JFIF JPEG, per-image Huffman tables.

    subsampling: '444' (1x1x1), '420' (Y 2x2 — box-averaged 2x2 chroma,
    the dominant web layout), '422' (Y 2x1, horizontal-only chroma
    downsample) or '440' (Y 1x2, vertical-only). restart_interval > 0
    emits a DRI marker and RSTn every that many MCUs with byte-aligned
    padding and DC-predictor resets (T.81 F.1.2.3 / B.2.4.4)."""
    h, w, _ = pix.shape
    qy, qc = _quality_tables(quality)
    try:
        sh, sv = {"444": (1, 1), "420": (2, 2), "422": (2, 1),
                  "440": (1, 2)}[subsampling]
    except KeyError:
        raise ValueError(f"unsupported subsampling {subsampling!r}") from None
    mcu_px = 8 * sh, 8 * sv
    ph = (-h) % mcu_px[1]
    pw = (-w) % mcu_px[0]
    padded = np.pad(pix, ((0, ph), (0, pw), (0, 0)), mode="edge")
    ycc = _rgb_to_ycbcr(padded) - 128.0
    hh, ww = padded.shape[:2]
    mcus_x, mcus_y = ww // mcu_px[0], hh // mcu_px[1]
    nmcus = mcus_x * mcus_y
    samp = [(sh, sv), (1, 1), (1, 1)]

    comp_q = []
    for ci in range(3):
        plane = ycc[:, :, ci]
        hi, vi = samp[ci]
        if (hi, vi) != (sh, sv):  # chroma: (sv x sh) box average
            plane = plane.reshape(hh // sv, sv, ww // sh, sh).mean(axis=(1, 3))
        blocks = _blockify(plane)
        if hi * vi > 1:  # Y blocks leave raster order at 420
            blocks = blocks[
                _mcu_scan_order(mcus_y, mcus_x, hi, vi, plane.shape[1] // 8)
            ]
        coef = np.matmul(_DCT_M, np.matmul(blocks, _DCT_M.T))
        q = qy if ci == 0 else qc
        qb = np.round(coef / q).astype(np.int64)
        comp_q.append(qb.reshape(-1, 64)[:, _ZZ])

    # two passes: frequencies -> Huffman tables -> bitstream
    bpm = [hi * vi for hi, vi in samp]
    enc = [
        _component_symbols(
            cq, _dc_diff(cq[:, 0], bpm[ci], restart_interval)
        )
        for ci, cq in enumerate(comp_q)
    ]
    freq_dc = [np.zeros(17), np.zeros(17)]
    freq_ac = [np.zeros(256), np.zeros(256)]
    for ci in range(3):
        t = 0 if ci == 0 else 1
        _, dc_size, per_block = enc[ci]
        for s in dc_size:
            freq_dc[t][s] += 1
        for syms in per_block:
            for sym, _, _ in syms:
                freq_ac[t][sym] += 1
    tables = {}
    for t in range(2):
        tables[("dc", t)] = _canonical_codes(_huffman_lengths(freq_dc[t]))
        tables[("ac", t)] = _canonical_codes(_huffman_lengths(freq_ac[t]))

    bw = _BitWriter()
    for m in range(nmcus):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()  # byte-align (1-padding) before the marker
            bw.buf += bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)])
        for ci in range(3):
            t = 0 if ci == 0 else 1
            dc_diff, dc_size, per_block = enc[ci]
            dct = tables[("dc", t)][2]
            act = tables[("ac", t)][2]
            for b in range(m * bpm[ci], (m + 1) * bpm[ci]):
                size = int(dc_size[b])
                code, ln = dct[size]
                bw.write(code, ln)
                if size:
                    bw.write(_encode_magnitude(int(dc_diff[b]), size), size)
                for sym, v, vsize in per_block[b]:
                    code, ln = act[sym]
                    bw.write(code, ln)
                    if vsize:
                        bw.write(_encode_magnitude(v, vsize), vsize)
    bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0/JFIF: version 1.1, no density units, 1x1 density, no thumbnail
    app0 = b"JFIF\x00" + b"\x01\x01" + b"\x00" + b"\x00\x01\x00\x01" + b"\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    for tid, q in ((0, qy), (1, qc)):
        body = bytes([tid]) + bytes(
            int(x) for x in q.reshape(64)[_ZZ]
        )
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci in range(3):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    for (kind, t), (bits, vals, _) in tables.items():
        tc = 0 if kind == "dc" else 1
        body = bytes([(tc << 4) | t]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([3])
    for ci in range(3):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _entropy_segments(scan: bytes) -> list[bytes]:
    """Split the scan's entropy data at RST0-7 markers (stuffed 0xFF00
    stays inside its segment; any other marker byte is an error surfaced
    by _entropy_windows downstream)."""
    arr = np.frombuffer(scan, dtype=np.uint8)
    ff = np.flatnonzero(arr[:-1] == 0xFF)
    cuts = [f for f in ff.tolist() if 0xD0 <= arr[f + 1] <= 0xD7]
    segments, start = [], 0
    for f in cuts:
        segments.append(scan[start:f])
        start = f + 2
    segments.append(scan[start:])
    return segments


def _fancy_upsample2(c: np.ndarray, axis: int) -> np.ndarray:
    """libjpeg-style triangle (fancy) x2 upsampling along one axis:
    out[2i] = (3*c[i] + c[i-1]) / 4, out[2i+1] = (3*c[i] + c[i+1]) / 4,
    edges clamped — the smooth inverse of the encoder's box average."""
    c = np.moveaxis(c, axis, 0)
    prev = np.concatenate([c[:1], c[:-1]], axis=0)
    nxt = np.concatenate([c[1:], c[-1:]], axis=0)
    out = np.empty((2 * c.shape[0],) + c.shape[1:], dtype=np.float64)
    out[0::2] = (3.0 * c + prev) / 4.0
    out[1::2] = (3.0 * c + nxt) / 4.0
    return np.moveaxis(out, 0, axis)


def _entropy_windows(seg: bytes) -> tuple[list[int], int]:
    """De-stuff the entropy segment ONCE (0xFF00 -> 0xFF, any other 0xFF
    is a stray marker -> error) and precompute, for every bit offset p,
    the next 16 bits as an integer. Decoding then never touches bytes:
    a Huffman symbol is one window lookup + one table lookup, an n-bit
    magnitude is `win[p] >> (16 - n)`. Returns (windows, real_bit_count)
    — windows past the end are padded with 1s (the encoder's own byte
    padding), and the caller bounds-checks against real_bit_count."""
    arr = np.frombuffer(seg, dtype=np.uint8)
    ff = np.flatnonzero(arr == 0xFF)
    if len(ff):
        nxt = ff + 1
        if nxt[-1] >= len(arr) or not np.all(arr[nxt] == 0x00):
            raise ValueError("unexpected marker in entropy data")
        arr = np.delete(arr, nxt)
    bits = np.unpackbits(arr)
    nbits = len(bits)
    padded = np.concatenate([bits, np.ones(16, dtype=np.uint8)])
    powers = (1 << np.arange(15, -1, -1)).astype(np.uint32)
    win = (
        np.lib.stride_tricks.sliding_window_view(padded, 16)[: nbits + 1]
        .astype(np.uint32)
        @ powers
    )
    # plain list: scalar indexing in the per-symbol loop is ~3x faster
    # than numpy scalar indexing
    return win.tolist(), nbits


def _primary_lut(table: dict[tuple[int, int], int]) -> tuple[list[int], list[int]]:
    """9-bit first-level Huffman LUT (sym, length per 9-bit prefix;
    length 0 = code longer than 9 bits -> dict walk fallback). 512
    entries keeps the per-image build cost trivial even though this
    encoder emits per-image tables."""
    sym = [0] * 512
    ln_ = [0] * 512
    for (ln, code), s in table.items():
        if ln <= 9:
            start = code << (9 - ln)
            for i in range(start, start + (1 << (9 - ln))):
                sym[i] = s
                ln_[i] = ln
    return sym, ln_


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline sequential JPEG (8-bit, interleaved scan; 4:4:4 / 4:2:0 /
    4:2:2 / 4:4:0 sampling; restart markers) to (h, w, 3) uint8 — marker
    parse, DHT/DQT/DRI from the stream, chroma reconstructed with
    libjpeg-style fancy (triangle) upsampling.  Malformed input raises
    ValueError (integrity gate -> decode_ok=false row)."""
    try:
        return _decode_jpeg_inner(data)
    except (IndexError, KeyError, OverflowError, struct.error, ValueError) as e:
        # OverflowError: a corrupt stream's runaway DC predictor can
        # exceed the int16 coefficient store — same integrity outcome
        raise ValueError(f"corrupt JPEG: {e}") from e


def _decode_jpeg_inner(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = None
    comp_info = []
    scan_comp = []
    entropy_start = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.frombuffer(
                    body[bpos + 1 : bpos + 65], dtype=np.uint8
                ).astype(np.float64)[_UNZZ].reshape(8, 8)
                qt[tq] = tbl
                bpos += 65
        elif marker == 0xC0:  # SOF0 baseline
            _, h, w, nc = struct.unpack(">BHHB", body[:6])
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = samp >> 4, samp & 0xF
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise ValueError(f"sampling factors {hi}x{vi} unsupported")
                comp_info.append((cid, tq, hi, vi))
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xC4:  # DHT
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 0xF
                counts = list(body[bpos + 1 : bpos + 17])
                nsyms = sum(counts)
                vals = list(body[bpos + 17 : bpos + 17 + nsyms])
                table: dict[tuple[int, int], int] = {}
                code, vi = 0, 0
                for ln in range(1, 17):
                    for _ in range(counts[ln - 1]):
                        table[(ln, code)] = vals[vi]
                        code += 1
                        vi += 1
                    code <<= 1
                huff[(tc, th)] = table
                bpos += 17 + nsyms
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for ci in range(ns):
                cid = body[1 + 2 * ci]
                tdc = body[2 + 2 * ci] >> 4
                tac = body[2 + 2 * ci] & 0xF
                scan_comp.append((cid, tdc, tac))
            entropy_start = pos + seglen
            break
        pos += seglen
    if entropy_start is None or h is None:
        raise ValueError("JPEG missing SOS/SOF0")
    _check_dims(w, h)
    end = data.rfind(b"\xff\xd9")
    segments = [
        _entropy_windows(s)
        for s in _entropy_segments(
            data[entropy_start : end if end > 0 else len(data)]
        )
    ]
    luts = {key: _primary_lut(tbl) for key, tbl in huff.items()}

    info = {cid: (tq, hi, vi) for cid, tq, hi, vi in comp_info}
    samp = [(info[cid][1], info[cid][2]) for cid, _, _ in scan_comp]
    max_h = max(hi for hi, _ in samp)
    max_v = max(vi for _, vi in samp)
    for hi, vi in samp:
        if max_h % hi or max_v % vi:
            raise ValueError("non-dividing sampling factors unsupported")
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    nmcus = mcus_x * mcus_y
    bpm = [hi * vi for hi, vi in samp]
    if restart_interval:
        expected = -(-nmcus // restart_interval)
        if len(segments) != expected:
            raise ValueError(
                f"restart markers: {len(segments)} segments, "
                f"expected {expected}"
            )
    elif len(segments) != 1:
        raise ValueError("RST markers present without DRI")
    # plausibility before allocation: every block costs >= 2 bits (one
    # DC code + one EOB), so dims implying more blocks than the entropy
    # stream could possibly carry are corrupt — raise, don't allocate.
    # The hard block budget bounds the coefficient/IDCT allocations even
    # when a corrupt SOF arrives with a large garbage entropy stream.
    total_blocks = nmcus * sum(bpm)
    if total_blocks > _MAX_JPEG_BLOCKS:
        raise ValueError(
            f"implausible block count {total_blocks} ({w}x{h})"
        )
    total_bits = sum(nb for _, nb in segments)
    if total_blocks * 2 > total_bits:
        raise ValueError(
            f"entropy stream too short for {total_blocks} blocks"
        )
    # int16 holds every baseline coefficient (|v| <= 2047, 11 bits) and
    # keeps the persistent buffer at 128 B/block instead of float64's 512
    coefs = [
        np.zeros((nmcus * bpm[ci], 64), dtype=np.int16)
        for ci in range(len(scan_comp))
    ]
    comp_tables = [
        (huff[(0, tdc)], *luts[(0, tdc)], huff[(1, tac)], *luts[(1, tac)])
        for (cid, tdc, tac) in scan_comp
    ]
    seg_idx = 0
    win, nbits = segments[0]
    pos = 0
    pred = [0, 0, 0]
    for m in range(nmcus):
        if restart_interval and m and m % restart_interval == 0:
            seg_idx += 1  # next RST segment: byte-aligned, predictors reset
            win, nbits = segments[seg_idx]
            pos = 0
            pred = [0, 0, 0]
        for ci in range(len(scan_comp)):
            dct, dsym9, dlen9, act, asym9, alen9 = comp_tables[ci]
            for b in range(m * bpm[ci], (m + 1) * bpm[ci]):
                if pos >= nbits:
                    raise ValueError("JPEG entropy stream truncated")
                wv = win[pos]
                ln = dlen9[wv >> 7]
                if ln:
                    size = dsym9[wv >> 7]
                else:  # code longer than 9 bits
                    for ln in range(10, 17):
                        size = dct.get((ln, wv >> (16 - ln)))
                        if size is not None:
                            break
                    else:
                        raise ValueError("bad Huffman code")
                pos += ln
                if size:
                    v = win[pos] >> (16 - size)
                    pos += size
                    pred[ci] += (
                        v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                    )
                blk = coefs[ci][b]
                blk[0] = pred[ci]
                k = 1
                while k < 64:
                    if pos >= nbits:
                        raise ValueError("JPEG entropy stream truncated")
                    wv = win[pos]
                    ln = alen9[wv >> 7]
                    if ln:
                        sym = asym9[wv >> 7]
                    else:
                        for ln in range(10, 17):
                            sym = act.get((ln, wv >> (16 - ln)))
                            if sym is not None:
                                break
                        else:
                            raise ValueError("bad Huffman code")
                    pos += ln
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 0xF
                    if size == 0:
                        if run == 15:
                            k += 16  # ZRL
                            continue
                        break
                    k += run
                    if k > 63:
                        raise ValueError("AC run past block end")
                    v = win[pos] >> (16 - size)
                    pos += size
                    blk[k] = (
                        v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                    )
                    k += 1

    chans = []
    for ci, (cid, _, _) in enumerate(scan_comp):
        tq, hi, vi = info[cid]
        # float64 IDCT deliberately: float32 halves the transient and
        # doubles BLAS throughput but flips ~1/1500 phash bits vs the
        # float64-decoded sidecars (measured), breaking bit-exact decode
        # parity; the transient is already bounded by _MAX_JPEG_BLOCKS
        dz = coefs[ci][:, _UNZZ].reshape(-1, 8, 8) * qt[tq]
        # spatial[n] = Mᵀ · dz[n] · M as two batched BLAS matmuls — the
        # 3-operand einsum contracts pairwise anyway but ~20x slower here
        spatial = np.matmul(_DCT_M.T, np.matmul(dz, _DCT_M))
        chh, cww = mcus_y * 8 * vi, mcus_x * 8 * hi
        if hi * vi > 1:  # undo the MCU scan order before reassembly
            order = _mcu_scan_order(mcus_y, mcus_x, hi, vi, cww // 8)
            spatial = spatial[np.argsort(order)]
        plane = _unblockify(spatial, chh, cww) + 128.0
        if max_v // vi == 2:
            plane = _fancy_upsample2(plane, 0)
        if max_h // hi == 2:
            plane = _fancy_upsample2(plane, 1)
        chans.append(plane)
    ycc = np.stack(chans, axis=-1)[:h, :w]
    return _ycbcr_to_rgb(ycc)


# ---------------------------------------------------------------------------
# GIF (GIF87a/GIF89a per the published GRAPHICS INTERCHANGE FORMAT spec):
# LZW-compressed palette frames, local/global color tables, interlacing,
# GCE transparency + frame disposal, multi-frame animation.  The decoder
# composites frames the way browsers do — canvas starts white (the same
# convention as the PNG alpha-over-white path), transparent pixels keep
# the underlying canvas, disposal 2 restores the region to white and
# disposal 3 restores the previous canvas.  decode_gif returns the first
# composited frame (image path); decode_gif_frames returns every frame
# (video path — animated GIF is the container's one REAL animation
# format, so it feeds sample_frames/extract_video_features directly).
#
# Robustness contract matches PNG/JPEG: corrupt layouts (header, LZW
# code stream, block structure, frame rects outside the screen) raise
# ValueError before any allocation sized from a corrupt header; LZW
# output is clamped to the frame's pixel count so a crafted code stream
# cannot balloon memory.
# ---------------------------------------------------------------------------

_GIF_MAX_FRAMES = 4096


def _check_video_budget(n_frames: int, w: int, h: int) -> None:
    """Total decoded-output budget for animation containers: frame
    COUNT caps alone don't bound allocation (4096 frames x a large
    canvas is hundreds of GB from a small bomb payload), so the
    accumulated (n, h, w, 3) output is capped in BYTES like every other
    decode-side allocation."""
    if n_frames * w * h * 3 > _MAX_DECODE_BYTES:
        raise ValueError(
            f"animation output {n_frames}x{h}x{w} exceeds decode budget")


def _gif_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a sub-block chain starting at pos; returns (payload,
    position after the 0 terminator)."""
    parts = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        if pos + n > len(data):
            raise ValueError("GIF sub-block declares bytes past EOF")
        parts.append(data[pos:pos + n])
        pos += n


def _lzw_decode(payload: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-flavor LZW (LSB-first variable-width codes, CLEAR/EOI,
    4096-entry dictionary) -> exactly n_pixels palette indices."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad LZW min code size: {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)]
    table: list[bytes] = []
    code_size = min_code_size + 1
    out: list[bytes] = []
    out_len = 0
    prev: bytes | None = None
    bitbuf = bitcnt = 0
    i = 0
    n_bytes = len(payload)
    while True:
        while bitcnt < code_size:
            if i >= n_bytes:
                raise ValueError("LZW stream ended before EOI")
            bitbuf |= payload[i] << bitcnt
            bitcnt += 8
            i += 1
        code = bitbuf & ((1 << code_size) - 1)
        bitbuf >>= code_size
        bitcnt -= code_size
        if code == clear:
            table = list(base) + [b"", b""]  # slots for clear/eoi
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table or base):
                raise ValueError("first LZW code not a literal")
            entry = base[code] if not table else table[code]
            if not table:
                table = list(base) + [b"", b""]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError(f"LZW code {code} beyond table")
        out.append(entry)
        out_len += len(entry)
        if out_len > n_pixels:
            raise ValueError("LZW output exceeds frame pixel count")
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        prev = entry
        if out_len == n_pixels:
            break
    idx = np.frombuffer(b"".join(out), dtype=np.uint8)
    if len(idx) != n_pixels:
        raise ValueError(
            f"LZW decoded {len(idx)} pixels, frame needs {n_pixels}")
    return idx


def _gif_deinterlace(rows: np.ndarray) -> np.ndarray:
    """Undo GIF 4-pass interlacing on a (h, w) index array."""
    h = rows.shape[0]
    order = np.concatenate([
        np.arange(0, h, 8), np.arange(4, h, 8),
        np.arange(2, h, 4), np.arange(1, h, 2),
    ])
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif_frames(data: bytes, max_frames: int | None = None) -> np.ndarray:
    """GIF bytes -> (n_frames, h, w, 3) uint8, frames composited onto
    the logical screen per the spec's disposal/transparency rules."""
    if data is None:
        raise TypeError("NULL payload")
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh = struct.unpack_from("<HH", data, 6)
    _check_dims(sw, sh)
    flags = data[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(data):
            raise ValueError("global color table past EOF")
        gct = np.frombuffer(data[pos:pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n

    canvas = np.full((sh, sw, 3), 255, dtype=np.uint8)
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while True:
        if pos >= len(data):
            raise ValueError("GIF stream ended without trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("truncated GIF extension")
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                payload, pos = _gif_subblocks(data, pos)
                if len(payload) < 4:
                    raise ValueError("short graphic control extension")
                packed = payload[0]
                disposal = (packed >> 2) & 0x07
                transparent = payload[3] if packed & 0x01 else None
            else:  # application/comment/plain text: skip sub-blocks
                _, pos = _gif_subblocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
        # image descriptor
        if pos + 9 > len(data):
            raise ValueError("truncated image descriptor")
        left, top, fw, fh = struct.unpack_from("<HHHH", data, pos)
        iflags = data[pos + 8]
        pos += 9
        if left + fw > sw or top + fh > sh or fw == 0 or fh == 0:
            raise ValueError("frame rect outside logical screen")
        lct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            if pos + 3 * n > len(data):
                raise ValueError("local color table past EOF")
            lct = np.frombuffer(
                data[pos:pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if lct is None:
            raise ValueError("frame has neither local nor global color table")
        if pos >= len(data):
            raise ValueError("missing LZW min code size")
        mcs = data[pos]
        pos += 1
        payload, pos = _gif_subblocks(data, pos)
        idx = _lzw_decode(payload, mcs, fw * fh).reshape(fh, fw)
        if iflags & 0x40:
            idx = _gif_deinterlace(idx)
        if int(idx.max()) >= len(lct):
            raise ValueError("palette index beyond color table")

        prev_canvas = canvas.copy() if disposal == 3 else None
        region = canvas[top:top + fh, left:left + fw]
        rgb = lct[idx]
        if transparent is not None:
            opaque = idx != transparent
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        _check_video_budget(len(frames) + 1, sw, sh)
        frames.append(canvas.copy())
        if len(frames) >= (max_frames or _GIF_MAX_FRAMES):
            break
        # disposal applies AFTER the frame is shown
        if disposal == 2:
            canvas[top:top + fh, left:left + fw] = 255
        elif disposal == 3 and prev_canvas is not None:
            canvas = prev_canvas
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image frames")
    return np.stack(frames)


def decode_gif(data: bytes) -> np.ndarray:
    """First composited frame of a GIF -> (h, w, 3) uint8."""
    return decode_gif_frames(data, max_frames=1)[0]


def _lzw_encode(idx: np.ndarray, min_code_size: int) -> bytes:
    """GIF-flavor LZW encoder (dict reset at 4096, LSB-first packing)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = bitcnt = 0

    def emit(code: int, size: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += size
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    buf = b""
    for b in idx.tobytes():
        cand = buf + bytes([b])
        if cand in table:
            buf = cand
            continue
        emit(table[buf], code_size)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        buf = bytes([b])
    if buf:
        emit(table[buf], code_size)
    emit(eoi, code_size)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def encode_gif(
    frames: np.ndarray,
    interlace: bool = False,
    transparent_color: tuple[int, int, int] | None = None,
    delay_cs: int = 4,
    disposals: list[int] | None = None,
) -> bytes:
    """(h, w, 3) or (n, h, w, 3) uint8 -> GIF89a bytes.  All frames
    share one global color table built from their unique colors (must
    quantize to <= 256 first — e.g. (pix // 32) * 32); pixels equal to
    `transparent_color` are written as the transparent index."""
    if frames.ndim == 3:
        frames = frames[None]
    n, h, w, _ = frames.shape
    colors = np.unique(frames.reshape(-1, 3), axis=0)
    if transparent_color is not None:
        tc = np.array(transparent_color, dtype=np.uint8)
        colors = colors[~(colors == tc).all(axis=1)]
        colors = np.concatenate([colors, tc[None]])  # t-index = last
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} colors exceed GIF's 256")
    depth = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    table_n = 1 << depth
    palette = np.zeros((table_n, 3), dtype=np.uint8)
    palette[:len(colors)] = colors
    t_index = len(colors) - 1 if transparent_color is not None else None

    # color -> index lookup via a packed-int sort
    packed = (colors[:, 0].astype(np.int64) << 16) \
        | (colors[:, 1].astype(np.int64) << 8) | colors[:, 2]
    order = np.argsort(packed)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += palette.tobytes()
    # NETSCAPE2.0 looping application extension (animation realism)
    if n > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    mcs = max(2, depth)
    for fi in range(n):
        fpx = (frames[fi][:, :, 0].astype(np.int64) << 16) \
            | (frames[fi][:, :, 1].astype(np.int64) << 8) \
            | frames[fi][:, :, 2].astype(np.int64)
        pos_in_sorted = np.searchsorted(packed[order], fpx.reshape(-1))
        idx = order[pos_in_sorted].astype(np.uint8).reshape(h, w)
        disposal = (disposals[fi] if disposals else (1 if n > 1 else 0))
        packed_gce = (disposal & 0x07) << 2 \
            | (1 if t_index is not None else 0)
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", packed_gce, delay_cs,
            t_index if t_index is not None else 0) + b"\x00"
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
        if interlace:
            hh = np.concatenate([
                np.arange(0, h, 8), np.arange(4, h, 8),
                np.arange(2, h, 4), np.arange(1, h, 2),
            ])
            idx = idx[hh]
        out.append(mcs)
        lzw = _lzw_encode(idx, mcs)
        for j in range(0, len(lzw), 255):
            chunk = lzw[j:j + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


# ---------------------------------------------------------------------------
# BMP (Windows BITMAPINFOHEADER family): uncompressed BI_RGB at 8
# (palette) / 24 / 32 bits, BI_BITFIELDS 32-bit with the standard
# channel masks, bottom-up and top-down row orders, 4-byte row padding.
# V4/V5 headers (108/124 bytes) parse through the same fixed prefix.
# ---------------------------------------------------------------------------

def encode_bmp(pix: np.ndarray, bpp: int = 24) -> bytes:
    """(h, w, 3) uint8 -> BMP bytes (bottom-up BI_RGB)."""
    h, w, _ = pix.shape
    if bpp == 24:
        bgr = pix[::-1, :, ::-1]
        stride = (w * 3 + 3) & ~3
        body = np.zeros((h, stride), dtype=np.uint8)
        body[:, :w * 3] = bgr.reshape(h, w * 3)
        palette = b""
        offset = 14 + 40
    elif bpp == 8:
        colors, inv = np.unique(pix.reshape(-1, 3), axis=0,
                                return_inverse=True)
        if len(colors) > 256:
            raise ValueError(f"{len(colors)} colors exceed 8-bit palette")
        palette = np.zeros((256, 4), dtype=np.uint8)
        palette[:len(colors), 0] = colors[:, 2]  # BGRA quads
        palette[:len(colors), 1] = colors[:, 1]
        palette[:len(colors), 2] = colors[:, 0]
        palette = palette.tobytes()
        idx = inv.astype(np.uint8).reshape(h, w)[::-1]
        stride = (w + 3) & ~3
        body = np.zeros((h, stride), dtype=np.uint8)
        body[:, :w] = idx
        offset = 14 + 40 + 1024
    else:
        raise ValueError(f"unsupported encode bpp: {bpp}")
    raw = body.tobytes()
    hdr = b"BM" + struct.pack("<IHHI", offset + len(raw), 0, 0, offset)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(raw),
                      2835, 2835, 256 if bpp == 8 else 0, 0)
    return hdr + dib + palette + raw


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> (h, w, 3) uint8."""
    if data is None:
        raise TypeError("NULL payload")
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_signed, _planes, bpp, compression = struct.unpack_from(
        "<iiHHI", data, 18)
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h <= 0:
        raise ValueError(f"bad BMP dimensions {w}x{h_signed}")
    _check_dims(w, h)
    if compression not in (0, 3):
        raise ValueError(f"unsupported BMP compression {compression}")
    if compression == 3:
        if bpp != 32 or hdr_size < 52 and len(data) < 14 + 40 + 12:
            raise ValueError("BI_BITFIELDS only supported at 32 bpp")
        masks = struct.unpack_from("<III", data, 14 + 40)
        if masks != (0x00FF0000, 0x0000FF00, 0x000000FF):
            raise ValueError(f"unsupported BI_BITFIELDS masks {masks}")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    stride = (w * (bpp // 8) + 3) & ~3
    need = stride * h
    if offset + need > len(data):
        raise ValueError("BMP pixel data past EOF")
    body = np.frombuffer(data[offset:offset + need],
                         dtype=np.uint8).reshape(h, stride)
    if bpp == 8:
        (n_colors,) = struct.unpack_from("<I", data, 46)
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        if pal_off + 4 * n_colors > offset:
            raise ValueError("BMP palette overlaps pixel data")
        pal = np.frombuffer(data[pal_off:pal_off + 4 * n_colors],
                            dtype=np.uint8).reshape(n_colors, 4)
        idx = body[:, :w]
        if int(idx.max()) >= n_colors:
            raise ValueError("palette index beyond BMP color table")
        rgb = pal[idx][:, :, [2, 1, 0]]  # BGRA quads -> RGB
    elif bpp == 24:
        rgb = body[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]
    else:
        rgb = body[:, :w * 4].reshape(h, w, 4)[:, :, [2, 1, 0]]
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


# ---------------------------------------------------------------------------
# AVI / Motion-JPEG (the OpenDML/AVI RIFF layout Microsoft published; each
# video frame is a standalone baseline-JPEG compressed by THIS module's
# encoder): the second REAL video container next to animated GIF, and the
# lossy one — per-frame image quality rides the same JPEG >=40dB bar as
# still images. The RIFF chunk-walking discipline (even-byte padding,
# unknown chunks skipped, declared sizes validated against the payload)
# is shared with the WAV codec's container handling.
#
# Robustness contract: corrupt layouts raise ValueError — truncated or
# oversized chunk declarations, a non-MJPG stream handler, frame
# dimension drift between the header and the decoded JPEGs, zero frames.
# ---------------------------------------------------------------------------

_AVI_MAX_FRAMES = 100_000


def encode_avi_mjpeg(frames: np.ndarray, fps: int = 8,
                     quality: int = 92) -> bytes:
    """(n, h, w, 3) uint8 -> AVI bytes with one baseline-JPEG per frame."""
    if frames.ndim != 4 or frames.shape[-1] != 3:
        raise ValueError(f"expected (n, h, w, 3) frames, got {frames.shape}")
    n, h, w, _ = frames.shape
    if n == 0:
        raise ValueError("empty frame stack")
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    avih = struct.pack(
        "<14I", 1_000_000 // fps, 0, 0, 0, n, 0, 1, 0, w, h, 0, 0, 0, 0)
    strh = b"vids" + b"MJPG" + struct.pack(
        "<10I", 0, 0, 0, 1, fps, 0, n, 0, 0xFFFFFFFF, 0) \
        + struct.pack("<4h", 0, 0, w, h)
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_frames(data: bytes, max_frames: int | None = None
                      ) -> tuple[np.ndarray, int]:
    """AVI/MJPEG bytes -> ((n, h, w, 3) uint8 frames, fps)."""
    if data is None:
        raise TypeError("NULL payload")
    if len(data) < 24 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    pos, end = 12, len(data)
    dims = None
    fps = None
    handler_ok = False
    jpegs: list[bytes] = []

    def walk(pos: int, end: int, depth: int) -> None:
        nonlocal dims, fps, handler_ok
        if depth > 4:
            raise ValueError("AVI LIST nesting too deep")
        while pos + 8 <= end:
            cid = data[pos:pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            if pos + 8 + size > end:
                raise ValueError("AVI chunk declares bytes past EOF")
            body_at = pos + 8
            if cid == b"LIST":
                walk(body_at + 4, body_at + size, depth + 1)
            elif cid == b"avih":
                if size < 40:
                    raise ValueError("short avih header")
                vals = struct.unpack_from("<10I", data, body_at)
                uspf, nframes, width, height = vals[0], vals[4], vals[8], vals[9]
                if nframes > _AVI_MAX_FRAMES:
                    raise ValueError(f"AVI declares {nframes} frames")
                dims = (width, height)
                if uspf:
                    fps = round(1_000_000 / uspf)
            elif cid == b"strh":
                if size >= 8 and data[body_at:body_at + 4] == b"vids":
                    if data[body_at + 4:body_at + 8] != b"MJPG":
                        raise ValueError("AVI video stream is not MJPG")
                    handler_ok = True
            elif cid in (b"00dc", b"00db"):
                if len(jpegs) >= (max_frames or _AVI_MAX_FRAMES):
                    pos += 8 + size + (size & 1)
                    continue
                jpegs.append(data[body_at:body_at + size])
            pos += 8 + size + (size & 1)

    walk(pos, end, 0)
    if not handler_ok:
        raise ValueError("AVI has no MJPG video stream header")
    if not jpegs:
        raise ValueError("AVI contains no video frames")
    if dims is not None:
        _check_video_budget(len(jpegs), dims[0], dims[1])
    frames = []
    for j in jpegs:
        frames.append(decode_jpeg(j))
        fh0, fw0 = frames[0].shape[:2]
        _check_video_budget(len(jpegs), fw0, fh0)
    h0, w0 = frames[0].shape[:2]
    if dims is not None and (w0, h0) != dims:
        raise ValueError(
            f"decoded frame {w0}x{h0} != header {dims[0]}x{dims[1]}")
    for f in frames[1:]:
        if f.shape != frames[0].shape:
            raise ValueError("AVI frame dimensions drift mid-stream")
    return np.stack(frames), int(fps or 0)


# ---------------------------------------------------------------------------
# APNG (the animated-PNG extension standardized into the PNG spec, third
# edition): acTL / fcTL / fdAT chunks over the ordinary PNG stream. The
# third REAL animation container next to GIF and MJPEG-AVI — and the
# lossless truecolor one. Each frame's pixel data is an ordinary
# IDAT-format zlib stream for the frame's sub-rectangle, decoded by
# synthesizing a standalone PNG around it and running the SAME RGBA core
# as still images (_decode_png_rgba), then composited onto a persistent
# RGBA canvas per the spec's dispose/blend rules:
#
#   dispose 0 none / 1 background (region -> transparent) / 2 previous;
#   blend   0 source (replace region) / 1 over (alpha compositing).
#
# Returned frames follow the module's video contract: RGB composited
# over white (same as the GIF path). Corrupt layouts raise ValueError:
# out-of-order sequence numbers, frame rects outside the canvas, frame
# count drift vs acTL, truncated chunks.
# ---------------------------------------------------------------------------

_APNG_MAX_FRAMES = 4096


def _png_chunks(data: bytes):
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        if pos + 12 + length > len(data):
            raise ValueError("PNG chunk declares bytes past EOF")
        yield typ, data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if typ == b"IEND":
            return
    raise ValueError("PNG stream ended without IEND")


def decode_apng_frames(data: bytes, max_frames: int | None = None
                       ) -> np.ndarray:
    """APNG bytes -> (n_frames, h, w, 3) uint8 composited frames."""
    if data is None:
        raise TypeError("NULL payload")
    ihdr = None
    plte_raw = trns_raw = None
    n_declared = None
    fctl = None          # pending frame control for the next data chunk
    idat_is_frame = False
    cur_data = bytearray()
    frames_meta: list[tuple] = []   # (fctl, payload bytes)
    expected_seq = 0

    def flush_frame():
        nonlocal fctl, cur_data
        if fctl is not None and cur_data:
            frames_meta.append((fctl, bytes(cur_data)))
            fctl, cur_data = None, bytearray()

    for typ, body in _png_chunks(data):
        if typ == b"IHDR":
            ihdr = body
        elif typ == b"PLTE":
            plte_raw = body
        elif typ == b"tRNS":
            trns_raw = body
        elif typ == b"acTL":
            if len(body) < 8:
                raise ValueError("short acTL chunk")
            (n_declared,) = struct.unpack(">I", body[:4])
            if not 1 <= n_declared <= _APNG_MAX_FRAMES:
                raise ValueError(f"APNG declares {n_declared} frames")
        elif typ == b"fcTL":
            if len(body) < 26:
                raise ValueError("short fcTL chunk")
            (seq,) = struct.unpack(">I", body[:4])
            if seq != expected_seq:
                raise ValueError(
                    f"APNG sequence number {seq}, expected {expected_seq}")
            expected_seq += 1
            flush_frame()
            fw, fh, fx, fy = struct.unpack(">IIII", body[4:20])
            _dn, _dd = struct.unpack(">HH", body[20:24])
            dispose, blend = body[24], body[25]
            if dispose > 2 or blend > 1:
                raise ValueError(
                    f"reserved APNG dispose/blend {dispose}/{blend}")
            fctl = (fw, fh, fx, fy, dispose, blend)
            idat_is_frame = not frames_meta and not cur_data
        elif typ == b"IDAT":
            if fctl is not None and idat_is_frame:
                cur_data += body     # IDAT doubles as the first frame
        elif typ == b"fdAT":
            if len(body) < 4:
                raise ValueError("short fdAT chunk")
            (seq,) = struct.unpack(">I", body[:4])
            if seq != expected_seq:
                raise ValueError(
                    f"APNG sequence number {seq}, expected {expected_seq}")
            expected_seq += 1
            if fctl is None:
                raise ValueError("fdAT without a preceding fcTL")
            cur_data += body[4:]
    flush_frame()
    if ihdr is None:
        raise ValueError("APNG missing IHDR")
    if n_declared is None:
        raise ValueError("PNG has no acTL chunk (not an APNG)")
    if len(frames_meta) != n_declared:
        raise ValueError(
            f"APNG has {len(frames_meta)} frames, acTL declares {n_declared}")

    w, h, depth, ctype, comp, filt, _interlace = struct.unpack(
        ">IIBBBBB", ihdr)
    _check_dims(w, h)

    def frame_png(fw: int, fh: int, payload: bytes) -> bytes:
        sub_ihdr = struct.pack(">IIBBBBB", fw, fh, depth, ctype, comp,
                               filt, 0)
        out = bytearray(_PNG_SIG)
        out += _png_chunk(b"IHDR", sub_ihdr)
        if plte_raw is not None:
            out += _png_chunk(b"PLTE", plte_raw)
        if trns_raw is not None:
            out += _png_chunk(b"tRNS", trns_raw)
        out += _png_chunk(b"IDAT", payload)
        out += _png_chunk(b"IEND", b"")
        return bytes(out)

    canvas = np.zeros((h, w, 4), dtype=np.uint8)  # transparent
    out_frames: list[np.ndarray] = []
    for (fw, fh, fx, fy, dispose, blend), payload in frames_meta:
        if fx + fw > w or fy + fh > h or fw == 0 or fh == 0:
            raise ValueError("APNG frame rect outside the canvas")
        sub = _decode_png_rgba(frame_png(fw, fh, payload))
        if sub.shape[:2] != (fh, fw):
            raise ValueError("APNG frame data does not match fcTL rect")
        prev = canvas.copy() if dispose == 2 else None
        region = canvas[fy:fy + fh, fx:fx + fw]
        if blend == 0:
            region[:] = sub
        else:  # over: integer-free float compositing, rounded once
            fa = sub[:, :, 3:4].astype(np.float64) / 255.0
            ca = region[:, :, 3:4].astype(np.float64) / 255.0
            oa = fa + ca * (1.0 - fa)
            rgb = np.where(
                oa > 0,
                (sub[:, :, :3] * fa + region[:, :, :3] * ca * (1.0 - fa))
                / np.maximum(oa, 1e-12),
                0.0,
            )
            region[:, :, :3] = np.round(rgb).astype(np.uint8)
            region[:, :, 3] = np.round(oa[:, :, 0] * 255.0).astype(np.uint8)
        _check_video_budget(len(out_frames) + 1, w, h)
        out_frames.append(_rgba_over_white(canvas))
        if len(out_frames) >= (max_frames or _APNG_MAX_FRAMES):
            break
        if dispose == 1:
            canvas[fy:fy + fh, fx:fx + fw] = 0
        elif dispose == 2 and prev is not None:
            canvas = prev
    return np.stack(out_frames)


def encode_apng(frames: np.ndarray, delay_cs: int = 4) -> bytes:
    """(n, h, w, 3) or (h, w, 3) uint8 -> APNG bytes (truecolor frames,
    full-rect, blend source, dispose none). Frame payloads reuse the
    still-image PNG encoder (its emitted IDAT stream is lifted into
    fdAT), so every scanline-filter behavior is shared."""
    if frames.ndim == 3:
        frames = frames[None]
    if frames.ndim != 4 or frames.shape[-1] != 3:
        raise ValueError(f"expected (n, h, w, 3) frames, got {frames.shape}")
    n, h, w, _ = frames.shape
    if n == 0:
        raise ValueError("empty frame stack")

    def idat_of(pix: np.ndarray) -> bytes:
        payload = bytearray()
        for typ, body in _png_chunks(encode_png(pix)):
            if typ == b"IDAT":
                payload += body
        return bytes(payload)

    out = bytearray(_PNG_SIG)
    out += _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
    out += _png_chunk(b"acTL", struct.pack(">II", n, 0))
    seq = 0
    for i, f in enumerate(frames):
        fctl = struct.pack(">IIIIIHHBB", seq, w, h, 0, 0, delay_cs, 100, 0, 0)
        out += _png_chunk(b"fcTL", fctl)
        seq += 1
        data = idat_of(f)
        if i == 0:
            out += _png_chunk(b"IDAT", data)
        else:
            out += _png_chunk(b"fdAT", struct.pack(">I", seq) + data)
            seq += 1
    out += _png_chunk(b"IEND", b"")
    return bytes(out)
