"""From-scratch WebP-lossless (VP8L) codec — sixth real interchange
image format (public specs: RIFF container per the WebP Container
Specification; bitstream per the "WebP Lossless Bitstream
Specification", Google 2012/2023).

Decoder covers the FULL VP8L feature surface so files from real
encoders decode:
  * LSB-first bit reading; canonical prefix codes in DEFLATE bit order,
    both "simple" (1-2 symbol) and code-length-coded forms with 16/17/18
    repeats and the optional max-symbol cap
  * color cache (1..11 bits, 0x1e35a7bd multiplier hash)
  * meta-prefix groups via a subresolution entropy image
  * LZ77 backward references with the 120-entry 2D distance mapping
  * all four transforms, inverted in reverse order: predictor (all 14
    modes incl. Select and the ClampAddSubtract pair), cross-color
    (3.5-bit signed fixed point), subtract-green, color indexing
    (palette) with sub-byte index bundling (1/2/4-bit packs)

Lossy VP8 key frames decode through chronon_spark.vp8_codec (from-
scratch RFC 6386 boolean decoder, token lattice, iDCT/iWHT, intra
predictors, loop filter — bit-exact YUV AND RGB against libwebp across
the size x quality battery in tests/test_vp8.py); VP8X extended
containers are walked for the payload and give WebP an EXIF metadata
channel — exif_codec routes fmt='webp' through `webp_exif_chunk` /
`webp_scrub`. An ALPH chunk's alpha plane decodes too (raw or
headerless-VP8L green channel, all four prediction filters) and
composites over white like the PNG path.

The encoder emits the plain literal subset (no transforms, no LZ77 —
prefix-coded ARGB literals with an 8-bit flat code, constant-alpha via
a 1-symbol simple code) for fixtures/round trips, optionally wrapped in
VP8X with an EXIF chunk. Hardening: dimensions capped before
allocation, every chunk length validated against the payload, LZ77
copies bounded by the pixel count.
"""

from __future__ import annotations

import struct

import numpy as np

from chronon_spark.codecs import _check_dims

_MAX_WEBP = 1 << 27
_ENABLE_FAST_LITERAL = True


# ---------------------------------------------------------------------------
# bit IO (LSB-first, DEFLATE-style)
# ---------------------------------------------------------------------------

class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0          # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte_i = self.pos >> 3
            if byte_i >= len(self.data):
                raise ValueError("VP8L bitstream truncated")
            v |= ((self.data[byte_i] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v

    def read_bit(self) -> int:
        byte_i = self.pos >> 3
        if byte_i >= len(self.data):
            raise ValueError("VP8L bitstream truncated")
        b = (self.data[byte_i] >> (self.pos & 7)) & 1
        self.pos += 1
        return b

    def peek_lsb(self, n: int) -> int:
        """Next n stream bits as an LSB-first integer (zero-padded past
        EOF — consumers bound-check on consume)."""
        byte_i = self.pos >> 3
        chunk = int.from_bytes(self.data[byte_i:byte_i + 5], "little")
        return (chunk >> (self.pos & 7)) & ((1 << n) - 1)


class _BitWriterLSB:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """Prefix codes go MSB-first (DEFLATE convention)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------

class _PrefixCode:
    """Canonical prefix code decoded via a full-width LUT indexed by the
    next max_len stream bits read LSB-first (one table lookup per
    symbol instead of per bit)."""

    __slots__ = ("max_len", "single", "syms", "lens", "byte_flat")

    def __init__(self, lengths: list[int]):
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.max_len = 0
            self.syms = self.lens = None
            self.byte_flat = False
            return
        self.single = None
        # completeness (Kraft): an incomplete code decodes garbage on the
        # unassigned codewords; an over-subscribed one is internally
        # inconsistent — reject both up front
        kraft = sum(1 / (1 << l) for l, _ in nz)
        if abs(kraft - 1.0) > 1e-9:
            raise ValueError("incomplete prefix code")
        nz.sort()                         # canonical: by (length, symbol)
        self.max_len = ml = nz[-1][0]
        if ml > 15:
            raise ValueError("prefix code longer than 15 bits")
        syms = np.zeros(1 << ml, dtype=np.int32)
        lens = np.zeros(1 << ml, dtype=np.int8)
        code = 0
        prev_len = nz[0][0]
        for l, s in nz:
            code <<= (l - prev_len)
            prev_len = l
            # stream bit i is bit (l-1-i) of the code -> LUT index is the
            # bit-reverse of the codeword, extended by every suffix
            rev = int(f"{code:0{l}b}"[::-1], 2)
            ext = np.arange(1 << (ml - l), dtype=np.int64) << l
            syms[rev + ext] = s
            lens[rev + ext] = l
            code += 1
        self.syms = syms
        self.lens = lens
        # fast-path marker: exactly the 256 byte literals, each 8 bits,
        # canonical code == symbol value
        self.byte_flat = (
            ml == 8 and len(nz) == 256
            and all(l == 8 for l, _ in nz)
            and [s for _, s in nz] == list(range(256))
        )

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        v = br.peek_lsb(self.max_len)
        l = int(self.lens[v])
        if l == 0 or br.pos + l > len(br.data) * 8:
            raise ValueError("bad prefix code in VP8L stream")
        br.pos += l
        return int(self.syms[v])


_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15]

# LUT construction is the per-image fixed cost; identical code layouts
# (e.g. every row of a fixture written by the same encoder) share one
_CODE_CACHE: dict = {}


def _make_code(lengths: list) -> _PrefixCode:
    key = tuple(lengths)
    pc = _CODE_CACHE.get(key)
    if pc is None:
        pc = _PrefixCode(lengths)
        if len(_CODE_CACHE) < 1024:
            _CODE_CACHE[key] = pc
    return pc


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read_bit():                     # simple code
        n_sym = br.read(1) + 1
        if br.read_bit():
            first = br.read(8)
        else:
            first = br.read(1)
        lengths = [0] * alphabet_size
        if first >= alphabet_size:
            raise ValueError("simple-code symbol out of range")
        if n_sym == 2:
            second = br.read(8)
            if second >= alphabet_size:
                raise ValueError("simple-code symbol out of range")
            lengths[first] = 1
            lengths[second] = 1
        else:
            return _single(first)         # one symbol: 0-bit code
        return _make_code(lengths)
    # normal: code-length code
    num_cl = br.read(4) + 4
    if num_cl > 19:
        raise ValueError("bad code-length count")
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths) if sum(
        1 for l in cl_lengths if l) > 1 else _single(
        next(s for s, l in enumerate(cl_lengths) if l))

    if br.read_bit():                     # max-symbol cap present
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    i = 0
    while i < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        sym = cl_code.decode(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev_len = sym
        elif sym == 16:
            rep = 3 + br.read(2)
            if i + rep > alphabet_size:
                raise ValueError("code-length repeat overflows alphabet")
            for _ in range(rep):
                lengths[i] = prev_len
                i += 1
        elif sym == 17:
            i += 3 + br.read(3)
        else:                             # 18
            i += 11 + br.read(7)
        if i > alphabet_size:
            raise ValueError("code-length run overflows alphabet")
    return _make_code(lengths)


def _single(sym: int) -> _PrefixCode:
    pc = _PrefixCode.__new__(_PrefixCode)
    pc.single = sym
    pc.syms = pc.lens = None
    pc.max_len = 0
    pc.byte_flat = False
    return pc


# ---------------------------------------------------------------------------
# LZ77 helpers
# ---------------------------------------------------------------------------

def _lz77_value(code: int, br: _BitReader) -> int:
    """Length/distance prefix value (spec 'LZ77 prefix coding')."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


# The spec's 120-entry (dx, dy) near-distance table, stored as the
# published plane codes (yoff<<4 | 8-xoff with yoff in 0..7 and xoff in
# -7..8 — note the ASYMMETRIC domain: no dy=8 row, dx reaches +8 but
# only -7). An earlier build GENERATED the table by sorting the
# symmetric neighborhood on (d^2, -dy, |dx|, sign) — that reproduces
# the first 96 entries but diverges on the last 24 (the generated
# domain admitted dy=8 / dx=-8 offsets the spec's packing cannot even
# express), which mis-mapped long LZ77 distances: real-encoder streams
# decoded small contiguous runs of wrong residuals or tripped the
# distance-before-start guard. This literal is byte-verified against
# real libwebp output (tests/test_webp.py pixel-exact round trips
# through the system encoder).
_PLANE_CODES = bytes([
    24, 7, 23, 25, 40, 6, 39, 41, 22, 26, 38, 42, 56, 5, 55, 57,
    21, 27, 54, 58, 37, 43, 72, 4, 71, 73, 20, 28, 53, 59, 70, 74,
    36, 44, 88, 69, 75, 52, 60, 3, 87, 89, 19, 29, 86, 90, 35, 45,
    68, 76, 85, 91, 51, 61, 104, 2, 103, 105, 18, 30, 102, 106, 34, 46,
    84, 92, 67, 77, 101, 107, 50, 62, 120, 1, 119, 121, 83, 93, 17, 31,
    100, 108, 66, 78, 118, 122, 33, 47, 117, 123, 49, 63, 99, 109, 82, 94,
    0, 116, 124, 65, 79, 16, 32, 98, 110, 48, 115, 125, 81, 95, 64, 114,
    126, 97, 111, 80, 113, 127, 96, 112,
])
_DIST_MAP = [(8 - (b & 0xF), b >> 4) for b in _PLANE_CODES]
assert len(_DIST_MAP) == 120 and len(set(_DIST_MAP)) == 120


def _map_distance(dist_code: int, xsize: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    dx, dy = _DIST_MAP[dist_code - 1]
    d = dy * xsize + dx
    return d if d >= 1 else 1


# ---------------------------------------------------------------------------
# entropy-coded image
# ---------------------------------------------------------------------------

def _decode_entropy_image(br: _BitReader, w: int, h: int,
                          is_main: bool) -> np.ndarray:
    """-> (h*w,) uint32 ARGB pixels.

    Per the spec grammar (RFC 9649: entropy-coded-image =
    color-cache-info data; spatially-coded-image = color-cache-info
    meta-prefix data) EVERY image stream — including the predictor /
    color-transform / palette / entropy sub-images — begins with the
    1-bit color-cache flag; only the meta-prefix field is exclusive to
    the main image. Gating the cache bit on is_main (the r4 bug)
    desyncs by >=1 bit on any real-encoder file using transforms."""
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad color-cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta = None
    meta_bits = 0
    n_groups = 1
    if is_main and br.read_bit():
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_px = _decode_entropy_image(br, mw, mh, False)
        # meta group index = (red << 8) | green = bits 8..23 of ARGB
        meta = ((meta_px >> 8) & 0xFFFF).reshape(mh, mw)
        n_groups = int(meta.max()) + 1

    green_size = 256 + 24 + cache_size
    groups = []
    for _ in range(n_groups):
        g = _read_prefix_code(br, green_size)
        r = _read_prefix_code(br, 256)
        b = _read_prefix_code(br, 256)
        a = _read_prefix_code(br, 256)
        d = _read_prefix_code(br, 40)
        groups.append((g, r, b, a, d))

    n = w * h
    px = np.zeros(n, dtype=np.uint32)
    cache = [0] * cache_size if cache_size else None

    def cache_insert(v: int) -> None:
        cache[(0x1E35A7BD * v & 0xFFFFFFFF) >> (32 - cache_bits)] = v

    # (module flag so tests can force the general path and pin both
    # paths bit-identical on the same stream)
    # Vectorized all-literal fast path: one group, no cache/meta, green/
    # red/blue are exactly the 256-literal byte-flat code and alpha is a
    # 1-symbol code. The green code then CANNOT emit LZ77 or cache
    # symbols, so the rest of the stream is precisely 24 bits per pixel
    # (g,r,b codewords == byte values, MSB-first) — unpack in bulk.
    if (_ENABLE_FAST_LITERAL and cache is None and meta is None
            and groups[0][0].byte_flat and groups[0][1].byte_flat
            and groups[0][2].byte_flat and groups[0][3].single is not None):
        need = 24 * n
        if br.pos + need > len(br.data) * 8:
            raise ValueError("VP8L bitstream truncated")
        start_byte = br.pos >> 3
        off = br.pos & 7
        raw = np.frombuffer(
            br.data, dtype=np.uint8,
            count=min(len(br.data) - start_byte, (need + off + 7) // 8),
            offset=start_byte)
        bits = np.unpackbits(raw, bitorder="little")[off:off + need]
        vals = (bits.reshape(n, 3, 8)
                << np.arange(7, -1, -1, dtype=np.uint8)).sum(
            axis=2, dtype=np.uint32)
        alpha = np.uint32(groups[0][3].single)
        px = ((alpha << np.uint32(24)) | (vals[:, 1] << np.uint32(16))
              | (vals[:, 0] << np.uint32(8)) | vals[:, 2])
        br.pos += need
        return px

    pos = 0
    grp = groups[0]
    while pos < n:
        if meta is not None:
            x = pos % w
            y = pos // w
            grp = groups[int(meta[y >> meta_bits, x >> meta_bits])]
        gcode, rcode, bcode, acode, dcode = grp
        sym = gcode.decode(br)
        if sym < 256:
            red = rcode.decode(br)
            blue = bcode.decode(br)
            alpha = acode.decode(br)
            v = (alpha << 24) | (red << 16) | (sym << 8) | blue
            px[pos] = v
            pos += 1
            if cache is not None:
                cache_insert(v)
        elif sym < 280:
            length = _lz77_value(sym - 256, br)
            dist_code = dcode.decode(br)
            dist = _map_distance(_lz77_value(dist_code, br), w)
            if dist > pos:
                raise ValueError("LZ77 distance before stream start")
            if pos + length > n:
                raise ValueError("LZ77 copy past image end")
            for _ in range(length):
                v = int(px[pos - dist])
                px[pos] = v
                pos += 1
                if cache is not None:
                    cache_insert(v)
        else:
            if cache is None:
                raise ValueError("cache symbol without color cache")
            idx = sym - 280
            if idx >= cache_size:
                raise ValueError("color-cache index out of range")
            px[pos] = cache[idx]
            pos += 1
    return px


# ---------------------------------------------------------------------------
# transforms (inverse)
# ---------------------------------------------------------------------------

def _avg2(a, b):
    return (a + b) // 2


def _inv_predictor(px: np.ndarray, w: int, h: int, bits: int,
                   modes_img: np.ndarray) -> np.ndarray:
    """Inverse spatial prediction, scalar walk (images are small in the
    fixtures; a production build would block this)."""
    a = (px >> 24) & 0xFF
    r = (px >> 16) & 0xFF
    g = (px >> 8) & 0xFF
    b = px & 0xFF
    ch = np.stack([a, r, g, b]).astype(np.int64).reshape(4, h, w)
    mw = (w + (1 << bits) - 1) >> bits
    modes = ((modes_img >> 8) & 0xFF).reshape(-1)

    def clamp(v):
        return max(0, min(255, v))

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = tuple(int(ch[c, 0, x - 1]) for c in range(4))
            elif x == 0:
                pred = tuple(int(ch[c, y - 1, 0]) for c in range(4))
            else:
                m = int(modes[(y >> bits) * mw + (x >> bits)])
                L = tuple(int(ch[c, y, x - 1]) for c in range(4))
                T = tuple(int(ch[c, y - 1, x]) for c in range(4))
                TL = tuple(int(ch[c, y - 1, x - 1]) for c in range(4))
                # TR at the right edge wraps to the CURRENT row's first
                # pixel (libwebp reads data[i - width + 1] from a linear
                # array, already reconstructed at this point in the
                # inverse scan) — NOT the row above's first pixel.
                TR = (tuple(int(ch[c, y - 1, x + 1]) for c in range(4))
                      if x + 1 < w else
                      tuple(int(ch[c, y, 0]) for c in range(4)))
                if m == 0:
                    pred = (255, 0, 0, 0)
                elif m == 1:
                    pred = L
                elif m == 2:
                    pred = T
                elif m == 3:
                    pred = TR
                elif m == 4:
                    pred = TL
                elif m == 5:
                    pred = tuple(_avg2(_avg2(L[c], TR[c]), T[c])
                                 for c in range(4))
                elif m == 6:
                    pred = tuple(_avg2(L[c], TL[c]) for c in range(4))
                elif m == 7:
                    pred = tuple(_avg2(L[c], T[c]) for c in range(4))
                elif m == 8:
                    pred = tuple(_avg2(TL[c], T[c]) for c in range(4))
                elif m == 9:
                    pred = tuple(_avg2(T[c], TR[c]) for c in range(4))
                elif m == 10:
                    pred = tuple(_avg2(_avg2(L[c], TL[c]),
                                       _avg2(T[c], TR[c]))
                                 for c in range(4))
                elif m == 11:
                    pL = sum(abs(T[c] - TL[c]) for c in range(4))
                    pT = sum(abs(L[c] - TL[c]) for c in range(4))
                    pred = L if pL < pT else T
                elif m == 12:
                    pred = tuple(clamp(L[c] + T[c] - TL[c])
                                 for c in range(4))
                elif m == 13:
                    # ClampAddSubtractHalf: a + (a - b) / 2 with C
                    # integer division (truncation toward ZERO, not
                    # floor — differs by 1 for negative odd a-b)
                    def _asch(a_, b_):
                        d = a_ - b_
                        half = d // 2 if d >= 0 else -((-d) // 2)
                        return clamp(a_ + half)
                    pred = tuple(_asch(_avg2(L[c], T[c]), TL[c])
                                 for c in range(4))
                else:
                    raise ValueError(f"bad predictor mode {m}")
            for c in range(4):
                ch[c, y, x] = (ch[c, y, x] + pred[c]) & 0xFF
    out = ((ch[0].astype(np.uint32) << 24)
           | (ch[1].astype(np.uint32) << 16)
           | (ch[2].astype(np.uint32) << 8)
           | ch[3].astype(np.uint32))
    return out.reshape(-1)


def _inv_color_transform(px: np.ndarray, w: int, h: int, bits: int,
                         elts_img: np.ndarray) -> np.ndarray:
    a = ((px >> 24) & 0xFF).astype(np.int64)
    r = ((px >> 16) & 0xFF).astype(np.int64)
    g = ((px >> 8) & 0xFF).astype(np.int64)
    b = (px & 0xFF).astype(np.int64)
    mw = (w + (1 << bits) - 1) >> bits
    elts = elts_img.reshape(-1)
    ys, xs = np.divmod(np.arange(w * h), w)
    e = elts[(ys >> bits) * mw + (xs >> bits)]
    # ColorTransformElement packing per the spec: the element PIXEL's
    # red component is red_to_blue, green is green_to_blue, and blue is
    # green_to_red (verified against real libwebp-encoded streams —
    # the reversed mapping decodes green correctly but shifts red/blue)
    r2b = ((e >> 16) & 0xFF).astype(np.int8).astype(np.int64)
    g2b = ((e >> 8) & 0xFF).astype(np.int8).astype(np.int64)
    g2r = (e & 0xFF).astype(np.int8).astype(np.int64)
    gs = g.astype(np.int8).astype(np.int64)
    r = (r + ((g2r * gs) >> 5)) & 0xFF
    rs = r.astype(np.uint8).astype(np.int8).astype(np.int64)
    b = (b + ((g2b * gs) >> 5) + ((r2b * rs) >> 5)) & 0xFF
    return ((a.astype(np.uint32) << 24) | (r.astype(np.uint32) << 16)
            | (g.astype(np.uint32) << 8) | b.astype(np.uint32))


def _inv_subtract_green(px: np.ndarray) -> np.ndarray:
    g = (px >> 8) & 0xFF
    r = (((px >> 16) & 0xFF) + g) & 0xFF
    b = ((px & 0xFF) + g) & 0xFF
    return (px & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b


# ---------------------------------------------------------------------------
# top-level decode
# ---------------------------------------------------------------------------

def _decode_vp8l(payload: bytes) -> np.ndarray:
    """-> (h, w, 3) uint8, alpha composited over white (the pipeline's
    rgb8 contract, same formula as the PNG path)."""
    rgba = _decode_vp8l_rgba(payload)
    af = rgba[:, :, 3:4].astype(np.float64) / 255.0
    out = np.round(rgba[:, :, :3].astype(np.float64) * af
                   + 255.0 * (1.0 - af))
    return np.clip(out, 0, 255).astype(np.uint8)


def _decode_vp8l_rgba(payload: bytes) -> np.ndarray:
    br = _BitReader(payload)
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    _check_dims(w, h)
    br.read(1)                            # alpha hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    px = _decode_lossless_body(br, w, h)
    a = ((px >> 24) & 0xFF).astype(np.uint8)
    r = ((px >> 16) & 0xFF).astype(np.uint8)
    g = ((px >> 8) & 0xFF).astype(np.uint8)
    b = (px & 0xFF).astype(np.uint8)
    return np.stack([r, g, b, a], axis=1).reshape(h, w, 4)


def _decode_lossless_body(br: _BitReader, w: int, h: int) -> np.ndarray:
    """Everything after the VP8L size header: transforms +
    spatially-coded image + inverse transforms -> flat ARGB pixels.
    Shared by the main VP8L path and the headerless ALPH stream (whose
    grammar is the same minus signature/dimensions)."""
    transforms = []                       # (type, data...) in read order
    seen_types = set()
    xsize = w
    while br.read_bit():
        ttype = br.read(2)
        if ttype in seen_types:
            raise ValueError("duplicate VP8L transform")
        seen_types.add(ttype)
        if ttype in (0, 1):               # predictor / color
            bits = br.read(3) + 2
            tw = (xsize + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            timg = _decode_entropy_image(br, tw, th, False)
            transforms.append((ttype, bits, timg))
        elif ttype == 2:                  # subtract green
            transforms.append((2,))
        else:                             # color indexing
            n_colors = br.read(8) + 1
            pal_px = _decode_entropy_image(br, n_colors, 1, False)
            # palette entries are delta-coded componentwise
            pal = np.zeros(n_colors, dtype=np.uint32)
            prev = 0
            for i in range(n_colors):
                v = int(pal_px[i])
                cur = (((prev >> 24 & 0xFF) + (v >> 24 & 0xFF) & 0xFF) << 24
                       | ((prev >> 16 & 0xFF) + (v >> 16 & 0xFF) & 0xFF) << 16
                       | ((prev >> 8 & 0xFF) + (v >> 8 & 0xFF) & 0xFF) << 8
                       | ((prev & 0xFF) + (v & 0xFF) & 0xFF))
                pal[i] = cur
                prev = cur
            if n_colors <= 2:
                ibits = 3
            elif n_colors <= 4:
                ibits = 2
            elif n_colors <= 16:
                ibits = 1
            else:
                ibits = 0
            transforms.append((3, pal, ibits, xsize))
            if ibits:
                xsize = (xsize + (1 << ibits) - 1) >> ibits

    px = _decode_entropy_image(br, xsize, h, True)

    for t in reversed(transforms):
        if t[0] == 0:
            px = _inv_predictor(px, xsize, h, t[1], t[2])
        elif t[0] == 1:
            px = _inv_color_transform(px, xsize, h, t[1], t[2])
        elif t[0] == 2:
            px = _inv_subtract_green(px)
        else:
            _t, pal, ibits, orig_w = t
            if ibits:
                packed = px.reshape(h, xsize)
                per = 1 << ibits          # pixels per packed unit
                ibw = 8 >> ibits          # index bit width
                idx = np.zeros((h, orig_w), dtype=np.int64)
                green = (packed >> 8) & 0xFF
                for j in range(per):
                    cols = np.arange(j, orig_w, per)
                    vals = (green[:, (cols // per)] >> (j * ibw)) & (
                        (1 << ibw) - 1)
                    idx[:, cols] = vals[:, : len(cols)]
                idx = idx.reshape(-1)
                xsize = orig_w
            else:
                idx = ((px >> 8) & 0xFF).astype(np.int64)
            if int(idx.max(initial=0)) >= len(pal):
                raise ValueError("palette index out of range")
            px = pal[idx]

    return px


def _riff_chunks(data: bytes):
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF) file")
    (total,) = struct.unpack_from("<I", data, 4)
    if total + 8 > len(data) + 1 or len(data) > _MAX_WEBP:
        raise ValueError("WebP RIFF size mismatch")
    pos = 12
    while pos + 8 <= min(len(data), total + 8):
        tag = data[pos:pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        if pos + 8 + ln > len(data):
            raise ValueError("WebP chunk past EOF")
        yield tag, pos, pos + 8, ln
        pos += 8 + ln + (ln & 1)


def _decode_alpha(data: bytes, w: int, h: int) -> np.ndarray:
    """ALPH chunk -> (h, w) uint8 alpha plane. Per the container spec:
    1 header byte (bits 0-1 compression: 0 raw / 1 lossless, bits 2-3
    the prediction filter, bits 4-5 preprocessing — a lossy pre-step
    with no decode-side inverse), then either w*h raw bytes or a
    HEADERLESS VP8L image-stream (spatially-coded-image: color-cache
    info + meta-prefix + data, NO signature/dimensions) whose GREEN
    channel carries the alpha values."""
    if not data:
        raise ValueError("empty ALPH chunk")
    hdr = data[0]
    comp = hdr & 3
    filt = (hdr >> 2) & 3
    if comp == 0:
        if len(data) < 1 + w * h:
            raise ValueError("raw ALPH plane truncated")
        plane = np.frombuffer(data, dtype=np.uint8, count=w * h,
                              offset=1).reshape(h, w).astype(np.int64)
    elif comp == 1:
        # headerless VP8L: same grammar as the main stream minus the
        # signature/dimension header — transforms included
        br = _BitReader(data[1:])
        px = _decode_lossless_body(br, w, h)
        plane = ((px >> np.uint32(8)) & np.uint32(0xFF)).astype(
            np.int64).reshape(h, w)
    else:
        raise ValueError(f"reserved ALPH compression {comp}")
    if filt:
        # inverse prediction, PNG-style: 1=left, 2=top, 3=gradient
        # clip(left + top - topleft); borders predict from 0
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = 0
                elif y == 0:
                    pred = plane[0, x - 1]
                elif x == 0:
                    pred = plane[y - 1, 0]
                elif filt == 1:
                    pred = plane[y, x - 1]
                elif filt == 2:
                    pred = plane[y - 1, x]
                else:
                    pred = max(0, min(255, plane[y, x - 1]
                                      + plane[y - 1, x]
                                      - plane[y - 1, x - 1]))
                plane[y, x] = (plane[y, x] + pred) & 0xFF
    return plane.astype(np.uint8)


def decode_webp(data: bytes) -> np.ndarray:
    """-> (h, w, 3) uint8 over-white composite. Lossless (VP8L) and
    lossy (VP8 key frame, vp8_codec.py — bit-exact YUV and RGB vs
    libwebp) are both decoded from scratch. Lossy files carrying an
    ALPH chunk decode the alpha plane too (raw or headerless-VP8L,
    all four prediction filters) and composite over white like the
    PNG path. A still decode of an ANIMATED file returns its first
    frame (the APNG default-image convention)."""
    has_anim = False
    alpha_chunk = None
    for tag, _s, ds, dl in _riff_chunks(data):
        if tag == b"VP8L":
            return _decode_vp8l(data[ds:ds + dl])
        if tag == b"VP8 ":
            from chronon_spark.vp8_codec import decode_vp8_rgb

            rgb = decode_vp8_rgb(data[ds:ds + dl])
            if alpha_chunk is not None:
                h, w = rgb.shape[:2]
                a = _decode_alpha(alpha_chunk, w, h)
                af = a[:, :, None].astype(np.float64) / 255.0
                rgb = np.clip(np.round(
                    rgb.astype(np.float64) * af + 255.0 * (1.0 - af)),
                    0, 255).astype(np.uint8)
            return rgb
        if tag == b"ALPH":
            alpha_chunk = data[ds:ds + dl]
        if tag == b"ANMF":
            has_anim = True
    if has_anim:
        return decode_webp_frames(data, max_frames=1)[0]
    raise ValueError("WebP: no image chunk found")


# ---------------------------------------------------------------------------
# encoder (literal subset) + VP8X/EXIF wrap
# ---------------------------------------------------------------------------

def encode_webp(pix: np.ndarray, exif_tiff: bytes | None = None) -> bytes:
    """Lossless WebP from (h, w, 3) uint8: VP8L literal stream (flat
    8-bit prefix codes for R/G/B, 1-symbol codes for constant alpha and
    the unused distance alphabet, no transforms, no LZ77). With
    exif_tiff, wraps in a VP8X extended container carrying an EXIF
    chunk (the WebP metadata channel)."""
    if pix.ndim != 3 or pix.shape[2] != 3 or pix.dtype != np.uint8:
        raise ValueError("encode_webp expects (h, w, 3) uint8")
    h, w = pix.shape[:2]
    if w > 1 << 14 or h > 1 << 14:
        raise ValueError("VP8L dimension limit is 16384")
    bw = _BitWriterLSB()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)                        # no alpha
    bw.write(0, 3)                        # version
    bw.write(0, 1)                        # no transform
    bw.write(0, 1)                        # no color cache
    bw.write(0, 1)                        # no meta prefix

    def write_flat_code(alphabet: int) -> None:
        """Normal code: 256 literals at length 8 (complete), the
        remaining alphabet (LZ77 lengths) absent via 17-runs."""
        bw.write(0, 1)                    # not simple
        # CL lengths: symbol 8 -> 1 bit, symbol 17 -> 1 bit. kOrder index
        # of 17 is 0, of 8 is 11 -> write 12 entries
        bw.write(12 - 4, 4)
        order_vals = {17: 1, 8: 1}
        for i in range(12):
            bw.write(order_vals.get(_CL_ORDER[i], 0), 3)
        bw.write(0, 1)                    # no max-symbol cap
        # canonical CL code: symbols {8, 17} both length 1 -> 8='0', 17='1'
        for _ in range(256):
            bw.write_code(0, 1)           # '8' x 256
        rest = alphabet - 256
        while rest > 0:
            run = min(rest, 10)
            if run < 3:
                # pad with explicit zero-length? CL '0' has no code here;
                # alphabets in use always leave rest=0 or >=3
                raise ValueError("unsupported alphabet tail")
            bw.write_code(1, 1)           # '17'
            bw.write(run - 3, 3)
            rest -= run

    def write_single(sym: int, wide: bool) -> None:
        bw.write(1, 1)                    # simple
        bw.write(0, 1)                    # one symbol
        if wide:
            bw.write(1, 1)
            bw.write(sym, 8)
        else:
            bw.write(0, 1)
            bw.write(sym, 1)

    write_flat_code(256 + 24)             # green
    write_flat_code(256)                  # red
    write_flat_code(256)                  # blue
    write_single(255, True)               # alpha: constant 255
    write_single(0, False)                # distance: unused

    # pixel section vectorized: 24 bits per pixel (g,r,b codewords ==
    # byte values, MSB-first) appended to the header bits in one
    # packbits pass
    header_bits = np.unpackbits(
        np.frombuffer(bytes(bw.out), dtype=np.uint8), bitorder="little")
    tail_bits = np.array(
        [(bw.acc >> i) & 1 for i in range(bw.nbits)], dtype=np.uint8)
    flat = pix.reshape(-1, 3)
    grb = flat[:, [1, 0, 2]]              # order g, r, b
    px_bits = ((grb[:, :, None] >> np.arange(7, -1, -1, dtype=np.uint8))
               & 1).astype(np.uint8).reshape(-1)
    all_bits = np.concatenate([header_bits, tail_bits, px_bits])
    payload = np.packbits(all_bits, bitorder="little").tobytes()

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (tag + struct.pack("<I", len(body)) + body
                + (b"\x00" if len(body) & 1 else b""))

    chunks = b""
    if exif_tiff is not None:
        vp8x_flags = 1 << 3               # EXIF flag (bit 3 of byte 0)
        vp8x = (bytes([vp8x_flags, 0, 0, 0])
                + struct.pack("<I", w - 1)[:3]
                + struct.pack("<I", h - 1)[:3])
        chunks += chunk(b"VP8X", vp8x)
    chunks += chunk(b"VP8L", payload)
    if exif_tiff is not None:
        chunks += chunk(b"EXIF", exif_tiff)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks


# ---------------------------------------------------------------------------
# metadata channel (used by exif_codec for fmt='webp')
# ---------------------------------------------------------------------------

def webp_exif_chunk(data: bytes) -> bytes | None:
    for tag, _s, ds, dl in _riff_chunks(data):
        if tag == b"EXIF":
            return data[ds:ds + dl]
    return None


def webp_scrub(data: bytes, gps_neutralizer=None) -> bytes:
    """Metadata scrub for WebP containers. With gps_neutralizer (a
    callable mutating a TIFF bytearray in place), performs GPS-only
    surgery inside the EXIF chunk (byte length preserved). Without it,
    drops EXIF/XMP chunks entirely and clears their VP8X flag bits."""
    if gps_neutralizer is not None:
        out = bytearray(data)
        for tag, _s, ds, dl in _riff_chunks(data):
            if tag == b"EXIF":
                tiff = bytearray(data[ds:ds + dl])
                if gps_neutralizer(tiff):
                    out[ds:ds + dl] = tiff
        return bytes(out)
    kept = b""
    for tag, s, ds, dl in _riff_chunks(data):
        if tag in (b"EXIF", b"XMP "):
            continue
        body = data[ds:ds + dl]
        if tag == b"VP8X":
            body = bytes([body[0] & ~((1 << 3) | (1 << 2))]) + body[1:]
        kept += (tag + struct.pack("<I", dl) + body
                 + (b"\x00" if dl & 1 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(kept)) + b"WEBP" + kept


# ---------------------------------------------------------------------------
# animated WebP (VP8X + ANIM/ANMF — fourth real video container, per the
# WebP Container Specification's animation extension)
# ---------------------------------------------------------------------------

_WEBP_MAX_FRAMES = 4096
_F_ANIM = 0x02
_F_EXIF = 0x08


def _u24(b: bytes, off: int) -> int:
    return b[off] | (b[off + 1] << 8) | (b[off + 2] << 16)


def _rgba_over_white(rgba: np.ndarray) -> np.ndarray:
    af = rgba[:, :, 3:4].astype(np.float64) / 255.0
    out = np.round(rgba[:, :, :3].astype(np.float64) * af
                   + 255.0 * (1.0 - af))
    return np.clip(out, 0, 255).astype(np.uint8)


def decode_webp_frames(data: bytes,
                       max_frames: int | None = None) -> np.ndarray:
    """Animated WebP -> (n, h, w, 3) uint8 frame snapshots, each the
    canvas composited over white after rendering one ANMF frame.
    Compositing follows the container spec: sub-rect frames at even
    (2x, 2y) offsets, blending method 0 = alpha-blend over the canvas /
    1 = overwrite, disposal 0 = keep / 1 = fill the frame rect with the
    ANIM background color. Frame payloads may be lossless (VP8L, alpha
    in-stream) or lossy (VP8 key frames, optional ALPH alpha chunk)."""
    vp8x = None
    anim = None
    frames = []
    for tag, _s, ds, dl in _riff_chunks(data):
        if tag == b"VP8X":
            if dl < 10:
                raise ValueError("VP8X chunk too short")
            vp8x = data[ds:ds + dl]
        elif tag == b"ANIM":
            if dl < 6:
                raise ValueError("ANIM chunk too short")
            anim = data[ds:ds + dl]
        elif tag == b"ANMF":
            if dl < 16:
                raise ValueError("ANMF chunk too short")
            frames.append(data[ds:ds + dl])
    if vp8x is None or not (vp8x[0] & _F_ANIM) or anim is None:
        raise ValueError("not an animated WebP (no VP8X/ANIM)")
    w = _u24(vp8x, 4) + 1
    h = _u24(vp8x, 7) + 1
    _check_dims(w, h)
    if not frames:
        raise ValueError("animated WebP with no ANMF frames")
    if len(frames) > _WEBP_MAX_FRAMES:
        raise ValueError("animated WebP frame count exceeds cap")
    # total-output budget: frame count alone doesn't bound allocation
    n_budget = min(len(frames), max_frames or len(frames))
    if n_budget * w * h * 3 > _MAX_WEBP:
        raise ValueError("animated WebP output exceeds decode budget")
    # ANIM background color is stored B, G, R, A
    bg = np.array([anim[2], anim[1], anim[0], anim[3]], dtype=np.uint8)

    canvas = np.zeros((h, w, 4), dtype=np.uint8)
    out_frames: list[np.ndarray] = []
    for body in frames:
        fx = 2 * _u24(body, 0)
        fy = 2 * _u24(body, 3)
        fw = _u24(body, 6) + 1
        fh = _u24(body, 9) + 1
        flags = body[15]
        blend_none = bool(flags & 0x02)
        dispose_bg = bool(flags & 0x01)
        if fx + fw > w or fy + fh > h:
            raise ValueError("ANMF frame rect outside the canvas")
        # frame image subchunks inside the ANMF payload
        sub = body[16:]
        pos = 0
        rgba = None
        frame_alpha = None
        while pos + 8 <= len(sub):
            tag = sub[pos:pos + 4]
            (ln,) = struct.unpack_from("<I", sub, pos + 4)
            if pos + 8 + ln > len(sub):
                raise ValueError("ANMF subchunk past end")
            if tag == b"VP8L":
                rgba = _decode_vp8l_rgba(sub[pos + 8:pos + 8 + ln])
            elif tag == b"ALPH":
                frame_alpha = sub[pos + 8:pos + 8 + ln]
            elif tag == b"VP8 ":
                from chronon_spark.vp8_codec import decode_vp8_rgb

                rgb = decode_vp8_rgb(sub[pos + 8:pos + 8 + ln])
                if frame_alpha is not None:
                    a = _decode_alpha(frame_alpha, rgb.shape[1],
                                      rgb.shape[0])[:, :, None]
                else:
                    a = np.full(rgb.shape[:2] + (1,), 255, np.uint8)
                rgba = np.concatenate([rgb, a], axis=2)
            pos += 8 + ln + (ln & 1)
        if rgba is None:
            raise ValueError("ANMF frame with no image subchunk")
        if rgba.shape[:2] != (fh, fw):
            raise ValueError("ANMF frame data does not match header rect")
        region = canvas[fy:fy + fh, fx:fx + fw]
        if blend_none:
            region[:] = rgba
        else:
            fa = rgba[:, :, 3:4].astype(np.float64) / 255.0
            ca = region[:, :, 3:4].astype(np.float64) / 255.0
            oa = fa + ca * (1.0 - fa)
            rgb = np.where(
                oa > 0,
                (rgba[:, :, :3] * fa + region[:, :, :3] * ca * (1.0 - fa))
                / np.maximum(oa, 1e-12),
                0.0,
            )
            region[:, :, :3] = np.round(rgb).astype(np.uint8)
            region[:, :, 3] = np.round(oa[:, :, 0] * 255.0).astype(np.uint8)
        out_frames.append(_rgba_over_white(canvas))
        if max_frames and len(out_frames) >= max_frames:
            break
        if dispose_bg:
            canvas[fy:fy + fh, fx:fx + fw] = bg
    return np.stack(out_frames)


def encode_webp_anim(
    frames: np.ndarray,
    duration_ms: int = 40,
    rects: "list[tuple[int, int]] | None" = None,
    dispose_bg: bool = False,
    bg_rgba: tuple = (255, 255, 255, 255),
) -> bytes:
    """(n, h, w, 3) uint8 -> animated WebP (VP8X+ANIM+ANMF, lossless
    VP8L frames, blend=none). With `rects`, frame i is placed at the
    given (x, y) — must be even per the 2-pixel-unit encoding — and may
    be smaller than the canvas; canvas size is taken from frame 0."""
    if frames.ndim == 3:
        frames = frames[None]
    if frames.ndim != 4 or frames.shape[-1] != 3:
        raise ValueError("encode_webp_anim expects (n, h, w, 3) uint8")
    ch, cw = frames.shape[1:3]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (tag + struct.pack("<I", len(body)) + body
                + (b"\x00" if len(body) & 1 else b""))

    def u24(v: int) -> bytes:
        return bytes([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF])

    vp8x = (bytes([_F_ANIM, 0, 0, 0]) + u24(cw - 1) + u24(ch - 1))
    r, g, b, a = bg_rgba
    anim = bytes([b, g, r, a]) + struct.pack("<H", 0)   # loop forever
    out = chunk(b"VP8X", vp8x) + chunk(b"ANIM", anim)
    for i, fr in enumerate(frames):
        x, y = (rects[i] if rects else (0, 0))
        if x % 2 or y % 2:
            raise ValueError("ANMF offsets must be even")
        fh, fw = fr.shape[:2]
        # lift the still encoder's VP8L payload out of its RIFF wrapper
        still = encode_webp(np.ascontiguousarray(fr))
        vp8l_payload = None
        for tag, _s, ds, dl in _riff_chunks(still):
            if tag == b"VP8L":
                vp8l_payload = still[ds:ds + dl]
        body = (u24(x // 2) + u24(y // 2) + u24(fw - 1) + u24(fh - 1)
                + u24(duration_ms)
                + bytes([0x02 | (0x01 if dispose_bg else 0x00)])
                + chunk(b"VP8L", vp8l_payload))
        out += chunk(b"ANMF", body)
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WEBP" + out
