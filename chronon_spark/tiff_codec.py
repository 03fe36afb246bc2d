"""From-scratch baseline TIFF codec (public spec: TIFF 6.0, Adobe 1992)
— the fifth real interchange image format next to PNG/JPEG/GIF/BMP, and
the native container of scanned/archival corpora. Shares the bounded
IFD machinery with exif_codec.py (TIFF *is* the EXIF structure), so
image metadata ops work on TIFF files for free.

Decoder surface (the layouts real writers emit for baseline images):
  * Compression 1 (none), 5 (LZW — MSB-first variable-width codes with
    the spec's early-change rule), 32773 (PackBits RLE)
  * Predictor 2 (horizontal differencing) for LZW
  * PhotometricInterpretation 0/1 (grayscale, both polarities),
    2 (RGB chunky), 3 (palette via 16-bit ColorMap)
  * Multi-strip files (RowsPerStrip < height), both byte orders

Everything else (tiles, planar config 2, CCITT/JPEG-in-TIFF, >8-bit
samples) raises ValueError and becomes a decode_ok=false row upstream.
Allocation hardening follows codecs.py: dimensions are capped before
any allocation, strip byte counts are validated against the payload,
and LZW output is clamped to the header-implied pixel count.
"""

from __future__ import annotations

import struct

import numpy as np

from chronon_spark.codecs import _check_dims
from chronon_spark.exif_codec import _IfdBuilder, _bo_char, _read_ifd, _value

# TIFF baseline tags
T_WIDTH = 256
T_HEIGHT = 257
T_BITS = 258
T_COMPRESSION = 259
T_PHOTOMETRIC = 262
T_STRIP_OFFSETS = 273
T_SPP = 277
T_ROWS_PER_STRIP = 278
T_STRIP_COUNTS = 279
T_PLANAR = 284
T_PREDICTOR = 317
T_COLORMAP = 320


# ---------------------------------------------------------------------------
# TIFF-variant LZW (spec §13): MSB-first bit packing, Clear=256, EOI=257,
# first dynamic code 258, width 9→12 with the EARLY-CHANGE rule (the
# writer widens when the next code to be added would be 2^w - 1, one
# code earlier than GIF's LSB-first variant).
# ---------------------------------------------------------------------------

_CLEAR, _EOI = 256, 257


def _lzw_encode_tiff(data: bytes) -> bytes:
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    emit(_CLEAR, width)
    cur = b""
    for ch in data:
        cand = cur + bytes([ch])
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        table[cand] = nxt
        nxt += 1
        # early change: widen when the NEXT code would not fit, i.e. at
        # nxt == 2^w - 1 (spec: "because of the EOI code, … one earlier")
        if nxt == (1 << width) - 1 and width < 12:
            width += 1
        if nxt == 4094:                   # table full: reset
            emit(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        cur = bytes([ch])
    if cur:
        emit(table[cur], width)
        # phantom add: the decoder appends a table entry for EVERY data
        # code it reads (including this final one), so the width
        # bookkeeping must run once more before EOI or the two sides
        # disagree exactly when the stream ends on a 2^w boundary
        nxt += 1
        if nxt == (1 << width) - 1 and width < 12:
            width += 1
    emit(_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _lzw_decode_tiff(data: bytes, max_out: int) -> bytes:
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                # stream may legally end right at EOI with no padding
                return bytes(out)
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        if code == _EOI:
            return bytes(out)
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            if code > 255:
                raise ValueError("LZW: first code after clear not literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW: code beyond table")
        out += entry
        if len(out) > max_out:
            raise ValueError("LZW output exceeds header-implied size")
        prev = entry
        # early-change mirror: the decoder's table lags the encoder's by
        # exactly one add (the encoder inserts after EMITTING a code, the
        # decoder after READING the next one), so it must widen one entry
        # sooner than the encoder's 2^w - 1 rule
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1


# ---------------------------------------------------------------------------
# PackBits (spec §9)
# ---------------------------------------------------------------------------

def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        lit = i
        while (i < n and i - lit < 128
               and not (i + 1 < n and data[i + 1] == data[i])):
            i += 1
        if i == lit:                      # at least one literal
            i += 1
        out.append(i - lit - 1)
        out += data[lit:i]
    return bytes(out)


def _packbits_decode(data: bytes, max_out: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < max_out:
        b = data[i]
        i += 1
        if b < 128:                       # b+1 literals
            if i + b + 1 > n:
                raise ValueError("PackBits literal run past EOF")
            out += data[i:i + b + 1]
            i += b + 1
        elif b > 128:                     # 257-b repeats of next byte
            if i >= n:
                raise ValueError("PackBits repeat run past EOF")
            out += bytes([data[i]]) * (257 - b)
            i += 1
        # b == 128: no-op
    if len(out) > max_out:
        raise ValueError("PackBits output exceeds header-implied size")
    return bytes(out)


# ---------------------------------------------------------------------------
# Encoder (fixtures/tests)
# ---------------------------------------------------------------------------

def encode_tiff(
    pix: np.ndarray,
    compression: str = "none",
    mode: str = "rgb",
    predictor: bool = False,
    rows_per_strip: int | None = None,
    byte_order: str = "II",
) -> bytes:
    """Baseline TIFF writer. mode='rgb' (chunky), 'gray' (BlackIsZero,
    from the mean plane) or 'palette' (pix values must use <=256 distinct
    colors). compression in none|lzw|packbits; predictor=True applies
    horizontal differencing (LZW only, per baseline practice)."""
    if pix.ndim != 3 or pix.shape[2] != 3 or pix.dtype != np.uint8:
        raise ValueError("encode_tiff expects (h, w, 3) uint8")
    h, w = pix.shape[:2]
    comp_tag = {"none": 1, "lzw": 5, "packbits": 32773}[compression]
    bo = "<" if byte_order == "II" else ">"

    cmap = None
    if mode == "rgb":
        spp, photometric = 3, 2
        raw = pix
    elif mode == "gray":
        spp, photometric = 1, 1
        raw = np.round(pix.astype(np.float64).mean(axis=2)).astype(
            np.uint8)[:, :, None]
    elif mode == "palette":
        spp, photometric = 1, 3
        flat = pix.reshape(-1, 3)
        colors, inv = np.unique(flat, axis=0, return_inverse=True)
        if len(colors) > 256:
            raise ValueError("palette mode needs <= 256 distinct colors")
        raw = inv.astype(np.uint8).reshape(h, w)[:, :, None]
        cmap = np.zeros((3, 256), dtype=np.uint16)
        cmap[:, : len(colors)] = (colors.astype(np.uint16) * 257).T
    else:
        raise ValueError(f"unknown mode {mode!r}")

    rps = rows_per_strip or h
    strips: list[bytes] = []
    for y0 in range(0, h, rps):
        seg = raw[y0:y0 + rps]
        if predictor and comp_tag == 5:
            seg = seg.astype(np.int16)
            seg[:, 1:, :] = seg[:, 1:, :] - seg[:, :-1, :]
            seg = (seg & 0xFF).astype(np.uint8)
        payload = seg.tobytes()
        if comp_tag == 5:
            payload = _lzw_encode_tiff(payload)
        elif comp_tag == 32773:
            payload = _packbits_encode(payload)
        strips.append(payload)

    data = b"".join(strips)
    data_at = 8
    offsets = []
    at = data_at
    for s in strips:
        offsets.append(at)
        at += len(s)
    ifd_at = at + (at & 1)

    ifd = _IfdBuilder(bo)
    ifd.long(T_WIDTH, w)
    ifd.long(T_HEIGHT, h)
    ifd.shorts(T_BITS, [8] * spp)
    ifd.short(T_COMPRESSION, comp_tag)
    ifd.short(T_PHOTOMETRIC, photometric)
    ifd.longs(T_STRIP_OFFSETS, offsets)
    ifd.short(T_SPP, spp)
    ifd.long(T_ROWS_PER_STRIP, rps)
    ifd.longs(T_STRIP_COUNTS, [len(s) for s in strips])
    ifd.short(T_PLANAR, 1)
    if predictor and comp_tag == 5:
        ifd.short(T_PREDICTOR, 2)
    if cmap is not None:
        ifd.shorts(T_COLORMAP, [int(v) for v in cmap.ravel()])

    head = (byte_order.encode("ascii") + struct.pack(bo + "H", 42)
            + struct.pack(bo + "I", ifd_at))
    pad = b"\x00" * (ifd_at - at)
    return head + data + pad + ifd.place(ifd_at)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def _one(v, default=None):
    if v is None:
        return default
    if isinstance(v, list):
        return v[0] if v else default
    return v


def decode_tiff(data: bytes) -> np.ndarray:
    """-> (h, w, 3) uint8. Raises ValueError on anything outside the
    baseline surface (the integrity-gate contract)."""
    if len(data) < 8:
        raise ValueError("TIFF truncated")
    bo = _bo_char(data)
    (magic,) = struct.unpack_from(bo + "H", data, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    (ifd_at,) = struct.unpack_from(bo + "I", data, 4)
    entries, _nxt = _read_ifd(data, bo, ifd_at)
    tags: dict[int, object] = {}
    for tag, typ, cnt, raw4, _pos in entries:
        if tag in (T_WIDTH, T_HEIGHT, T_BITS, T_COMPRESSION, T_PHOTOMETRIC,
                   T_STRIP_OFFSETS, T_SPP, T_ROWS_PER_STRIP, T_STRIP_COUNTS,
                   T_PLANAR, T_PREDICTOR, T_COLORMAP):
            tags[tag] = _value(data, bo, typ, cnt, raw4)

    w = _one(tags.get(T_WIDTH))
    h = _one(tags.get(T_HEIGHT))
    if not w or not h:
        raise ValueError("TIFF missing dimensions")
    _check_dims(int(w), int(h))
    w, h = int(w), int(h)
    spp = int(_one(tags.get(T_SPP), 1))
    bits = tags.get(T_BITS, [8])
    bits = bits if isinstance(bits, list) else [bits]
    if any(b != 8 for b in bits) or spp not in (1, 3):
        raise ValueError("only 8-bit samples, 1 or 3 per pixel")
    comp = int(_one(tags.get(T_COMPRESSION), 1))
    if comp not in (1, 5, 32773):
        raise ValueError(f"unsupported TIFF compression {comp}")
    photo = int(_one(tags.get(T_PHOTOMETRIC), 1))
    if photo not in (0, 1, 2, 3):
        raise ValueError(f"unsupported photometric {photo}")
    if int(_one(tags.get(T_PLANAR), 1)) != 1:
        raise ValueError("only chunky planar config")
    if (photo == 2) != (spp == 3):
        raise ValueError("photometric/samples mismatch")
    pred = int(_one(tags.get(T_PREDICTOR), 1))
    if pred not in (1, 2):
        raise ValueError(f"unsupported predictor {pred}")

    offsets = tags.get(T_STRIP_OFFSETS)
    counts = tags.get(T_STRIP_COUNTS)
    if offsets is None or counts is None:
        raise ValueError("TIFF missing strip layout")
    offsets = offsets if isinstance(offsets, list) else [offsets]
    counts = counts if isinstance(counts, list) else [counts]
    if len(offsets) != len(counts):
        raise ValueError("strip offsets/counts length mismatch")
    rps = int(_one(tags.get(T_ROWS_PER_STRIP), h)) or h
    rps = min(rps, h)
    n_strips = (h + rps - 1) // rps
    if len(offsets) != n_strips:
        raise ValueError("strip count does not match rows per strip")

    rows = np.empty((h, w, spp), dtype=np.uint8)
    stride = w * spp
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        off, cnt = int(off), int(cnt)
        if off + cnt > len(data) or off < 0 or cnt < 0:
            raise ValueError("strip extends past EOF")
        nrows = min(rps, h - si * rps)
        want = nrows * stride
        payload = data[off:off + cnt]
        if comp == 5:
            payload = _lzw_decode_tiff(payload, want)
        elif comp == 32773:
            payload = _packbits_decode(payload, want)
        if len(payload) < want:
            raise ValueError("strip data shorter than implied")
        seg = np.frombuffer(payload[:want], dtype=np.uint8).reshape(
            nrows, w, spp)
        if pred == 2:
            seg = np.cumsum(seg.astype(np.int64), axis=1).astype(
                np.uint8).reshape(nrows, w, spp)
        rows[si * rps:si * rps + nrows] = seg

    if photo == 2:
        return rows
    plane = rows[:, :, 0]
    if photo == 3:
        cmap = tags.get(T_COLORMAP)
        if not isinstance(cmap, list) or len(cmap) < 3 * 256:
            raise ValueError("palette TIFF missing ColorMap")
        cm = (np.array(cmap[: 3 * 256], dtype=np.uint32)
              .reshape(3, 256) >> 8).astype(np.uint8)
        return np.stack([cm[0][plane], cm[1][plane], cm[2][plane]], axis=2)
    if photo == 0:                        # WhiteIsZero
        plane = 255 - plane
    return np.repeat(plane[:, :, None], 3, axis=2)
