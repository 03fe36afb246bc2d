"""From-scratch Apache DataSketches CPC sketch WIRE FORMAT — the
reference's APPROX_UNIQUE_COUNT IR persistence option
(/root/reference/spark/src/main/scala/ai/chronon/spark/SimpleAggregators.scala:499-543
serializes `CpcSketch` IRs into IR tables).

Pure Python implementation of the full serialized surface:

  * build: values -> coupon bit matrix (MurmurHash3 x64 128, seed 9001,
    row = h0 & (K-1), col = min(63, nlz(h1)) — verified against the
    library's pair tables);
  * matrix -> sketch state: flavor thresholds, window offset, window
    bytes + surprising-value pairs (the CpcUnion.getResult
    construction, so every sketch we emit carries mergeFlag=true and
    estimates via ICON — exactly like a DataSketches union result);
  * serialize / deserialize: all eight preamble formats, the
    Huffman-coded window (22 pseudo-phase tables), the
    column-delta/row-delta Golomb+length-limited-unary pair codec, the
    HYBRID window-bits-as-pairs trick and the SLIDING column
    permutation;
  * merge: bit-matrix OR (reading back HIP-mode sketches written by a
    live DataSketches updater works — their pairs/window decompress to
    the same matrix);
  * estimate: the ICON estimator (polynomial table + exponential
    approximation).

Every byte layout and constant was transcribed from the
datasketches-java 6.2.0 bytecode THAT SHIPS WITH APACHE SPARK
(jars/datasketches-java-6.2.0.jar) and is pinned against that library
through the Spark session JVM in tests/test_cpc.py: serialize ->
library-heapify -> estimates match; library-serialize -> our
deserialize -> matrices match; byte-identical output for
union-produced sketches.

Scale shape: sketch build runs inside applyInPandas per key group (one
shuffle on the group keys); merge is a numpy OR of K-long vectors.
"""

from __future__ import annotations

import struct

import numpy as np

from chronon_spark.cpc_tables import (
    COLUMN_PERMUTATIONS_FOR_ENCODING,
    ENCODING_TABLES_HIGH_ENTROPY_BYTE,
    ICON_POLYNOMIAL_COEFFICIENTS,
    LENGTH_LIMITED_UNARY_65,
)

DEFAULT_LG_K = 11
DEFAULT_SEED_HASH = 0x93CC        # ThetaUtil.computeSeedHash(9001)
_MASK64 = (1 << 64) - 1

# ---------------------------------------------------------------------------
# MurmurHash3 x64 128 (seed 9001) — DataSketches' hash
# ---------------------------------------------------------------------------
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK64
    return k ^ (k >> 33)


def murmur128(data: bytes, seed: int = 9001):
    h1 = h2 = seed & _MASK64
    n = len(data)
    nblocks = n // 16
    for i in range(nblocks):
        k1, k2 = struct.unpack_from("<QQ", data, i * 16)
        k1 = (k1 * _C1) & _MASK64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _MASK64
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _MASK64
        h1 = (h1 * 5 + 0x52DCE729) & _MASK64
        k2 = (k2 * _C2) & _MASK64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _MASK64
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _MASK64
        h2 = (h2 * 5 + 0x38495AB5) & _MASK64
    tail = data[nblocks * 16:]
    k1 = k2 = 0
    t = len(tail)
    for i in range(min(t, 8)):
        k1 |= tail[i] << (8 * i)
    for i in range(8, t):
        k2 |= tail[i] << (8 * (i - 8))
    if t > 8:
        k2 = (k2 * _C2) & _MASK64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _MASK64
        h2 ^= k2
    if t > 0:
        k1 = (k1 * _C1) & _MASK64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _MASK64
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    return h1, h2


def row_col(h0: int, h1: int, lg_k: int) -> int:
    """Coupon from the two hash halves (CpcSketch semantics)."""
    col = min(63, 64 - h1.bit_length() if h1 else 64)
    row = h0 & ((1 << lg_k) - 1)
    rc = (row << 6) | col
    if rc == 0xFFFFFFFF:          # the library avoids the -1 sentinel
        rc ^= 1 << 6
    return rc


def coupon_of(value, lg_k: int = DEFAULT_LG_K) -> int:
    """Hash a long/bytes/str exactly as CpcSketch.update() does."""
    if isinstance(value, (int, np.integer)):
        data = struct.pack("<q", int(value))
    elif isinstance(value, bytes):
        data = value
    else:
        data = str(value).encode("utf-8")
    h0, h1 = murmur128(data)
    return row_col(h0, h1, lg_k)


# ---------------------------------------------------------------------------
# state derivation (flavor / offset / ICON estimate)
# ---------------------------------------------------------------------------
EMPTY, SPARSE, HYBRID, PINNED, SLIDING = range(5)


def determine_flavor(lg_k: int, c: int) -> int:
    k = 1 << lg_k
    if c == 0:
        return EMPTY
    if (c << 5) < 3 * k:
        return SPARSE
    if (c << 1) < k:
        return HYBRID
    if (c << 3) < 27 * k:
        return PINNED
    return SLIDING


def determine_correct_offset(lg_k: int, c: int) -> int:
    k = 1 << lg_k
    tmp = (c << 3) - 19 * k
    if tmp < 0:
        return 0
    return tmp >> (lg_k + 3)


def _determine_pseudo_phase(lg_k: int, c: int) -> int:
    k = 1 << lg_k
    if 1000 * c < 2375 * k:
        if 4 * c < 3 * k:
            return 16
        if 10 * c < 11 * k:
            return 17
        if 100 * c < 132 * k:
            return 18
        if 3 * c < 5 * k:
            return 19
        if 1000 * c < 1965 * k:
            return 20
        if 1000 * c < 2275 * k:
            return 21
        return 6
    return (c >> (lg_k - 4)) & 15


def icon_estimate(lg_k: int, c: int) -> float:
    if c < 2:
        return 0.0 if c == 0 else 1.0
    k = 1 << lg_k
    factor = 5.7 if lg_k < 14 else 5.6
    cd = float(c)
    kd = float(k)
    if cd > factor * kd:
        return 0.7940236163830469 * kd * (2.0 ** (cd / kd))
    # Horner over the 20 coefficients for this lgK
    start = 20 * (lg_k - 4)
    x = cd / (2.0 * kd)
    acc = ICON_POLYNOMIAL_COEFFICIENTS[start + 19]
    for i in range(start + 18, start - 1, -1):
        acc = acc * x + ICON_POLYNOMIAL_COEFFICIENTS[i]
    ratio = cd / kd
    term_b = 1.0 + (ratio * ratio * ratio) / 66.774757
    est = cd * acc * term_b
    return est if est > cd else cd


# ---------------------------------------------------------------------------
# low-level bit codecs (LSB-first into 32-bit words)
# ---------------------------------------------------------------------------
class _BitWriter:
    __slots__ = ("words", "buf", "bits")

    def __init__(self):
        self.words = []
        self.buf = 0
        self.bits = 0

    def put(self, value: int, nbits: int) -> None:
        self.buf |= value << self.bits
        self.bits += nbits
        while self.bits >= 32:
            self.words.append(self.buf & 0xFFFFFFFF)
            self.buf >>= 32
            self.bits -= 32

    def pad_flush(self, pad_bits: int) -> None:
        self.bits += pad_bits
        while self.bits >= 32:
            self.words.append(self.buf & 0xFFFFFFFF)
            self.buf >>= 32
            self.bits -= 32
        if self.bits > 0:
            self.words.append(self.buf & 0xFFFFFFFF)
            self.buf = 0
            self.bits = 0

    def put_unary(self, value: int) -> None:
        v = value
        while v >= 16:
            v -= 16
            self.put(0, 16)
        self.put(1 << v, v + 1)


class _BitReader:
    __slots__ = ("words", "idx", "buf", "bits")

    def __init__(self, words):
        self.words = words
        self.idx = 0
        self.buf = 0
        self.bits = 0

    def _fill(self, need: int) -> None:
        while self.bits < need:
            w = self.words[self.idx] if self.idx < len(self.words) else 0
            self.idx += 1
            self.buf |= (w & 0xFFFFFFFF) << self.bits
            self.bits += 32

    def take(self, nbits: int) -> int:
        self._fill(nbits)
        v = self.buf & ((1 << nbits) - 1)
        self.buf >>= nbits
        self.bits -= nbits
        return v

    def peek12(self) -> int:
        self._fill(12)
        return self.buf & 0xFFF

    def drop(self, nbits: int) -> None:
        self.buf >>= nbits
        self.bits -= nbits

    def take_unary(self) -> int:
        v = 0
        while True:
            self._fill(16)
            chunk = self.buf & 0xFFFF
            if chunk == 0:
                self.drop(16)
                v += 16
                continue
            tz = (chunk & -chunk).bit_length() - 1
            self.drop(tz + 1)
            return v + tz


def _derive_decode_lut(enc_table) -> np.ndarray:
    """(length << 8) | byte for every 12-bit window — the library's
    decoding tables derived from the encoding tables."""
    lut = np.zeros(4096, dtype=np.uint16)
    for sym, e in enumerate(enc_table):
        code = e & 0xFFF
        length = e >> 12
        step = 1 << length
        for w in range(code, 4096, step):
            lut[w] = (length << 8) | sym
    return lut


_DECODE_TABLES = [
    _derive_decode_lut(t) for t in ENCODING_TABLES_HIGH_ENTROPY_BYTE
]
_LLU_DECODE = _derive_decode_lut(LENGTH_LIMITED_UNARY_65)

_PERM_DECODE = []
for _p in COLUMN_PERMUTATIONS_FOR_ENCODING:
    _inv = [0] * 56
    for _i, _v in enumerate(_p):
        _inv[_v] = _i
    _PERM_DECODE.append(_inv)


def _compress_bytes(data, enc_table) -> list:
    bw = _BitWriter()
    for b in data:
        e = enc_table[b]
        bw.put(e & 0xFFF, e >> 12)
    bw.pad_flush(11)
    return bw.words


def _uncompress_bytes(words, n, lut) -> bytearray:
    br = _BitReader(words)
    out = bytearray(n)
    for i in range(n):
        e = int(lut[br.peek12()])
        br.drop(e >> 8)
        out[i] = e & 0xFF
    return out


def _golomb_base_bits(k: int, count: int) -> int:
    q = (k - count) // count
    if q <= 0:
        return 0
    return q.bit_length() - 1


def _compress_pairs(pairs, lg_k: int) -> tuple:
    """sorted pairs -> (words, base_bits). Column deltas via the
    65-symbol length-limited code, row deltas via Golomb (unary high
    part + base_bits low bits)."""
    k = 1 << lg_k
    n = len(pairs)
    b = _golomb_base_bits(k + n, n)
    bw = _BitWriter()
    row_prev = 0
    col_prev = 0
    for p in pairs:
        row = p >> 6
        col = p & 63
        if row != row_prev:
            col_prev = 0
        row_delta = row - row_prev
        col_delta = col - col_prev
        row_prev = row
        col_prev = col + 1
        e = LENGTH_LIMITED_UNARY_65[col_delta]
        bw.put(e & 0xFFF, e >> 12)
        bw.put_unary(row_delta >> b)
        if b:
            bw.put(row_delta & ((1 << b) - 1), b)
    bw.pad_flush(max(0, 10 - b))
    return bw.words, b


def _uncompress_pairs(words, n, lg_k: int) -> list:
    k = 1 << lg_k
    b = _golomb_base_bits(k + n, n)
    br = _BitReader(words)
    out = []
    row_prev = 0
    col_prev = 0
    for _ in range(n):
        e = int(_LLU_DECODE[br.peek12()])
        br.drop(e >> 8)
        col_delta = e & 0xFF
        hi = br.take_unary()
        lo = br.take(b) if b else 0
        row_delta = (hi << b) | lo
        row = row_prev + row_delta
        # the encoder resets its column base to 0 whenever the row
        # advances, else the base is previous col + 1
        col = col_delta + (0 if row_delta else col_prev)
        row_prev = row
        col_prev = col + 1
        out.append((row << 6) | col)
    return out


# ---------------------------------------------------------------------------
# matrix <-> sketch state
# ---------------------------------------------------------------------------
def matrix_from_values(values, lg_k: int = DEFAULT_LG_K) -> np.ndarray:
    m = np.zeros(1 << lg_k, dtype=np.uint64)
    for v in values:
        rc = coupon_of(v, lg_k)
        m[rc >> 6] |= np.uint64(1 << (rc & 63))
    return m


def _popcount_matrix(matrix: np.ndarray) -> int:
    if hasattr(np, "bitwise_count"):
        return int(np.bitwise_count(matrix).sum())
    v = matrix.view(np.uint8)
    return int(np.unpackbits(v).sum())


def _state_from_matrix(matrix: np.ndarray, lg_k: int) -> dict:
    """CpcUnion.getResult construction: window + XOR-exception pairs,
    fiCol = min(ntz of all-patterns-OR, offset), mergeFlag."""
    c = _popcount_matrix(matrix)
    st = {"lgK": lg_k, "numCoupons": c, "mergeFlag": True,
          "fiCol": 0, "window": None, "pairs": [], "offset": 0}
    if c == 0:
        return st
    flavor = determine_flavor(lg_k, c)
    k = 1 << lg_k
    if flavor == SPARSE:
        pairs = []
        for row in range(k):
            w = int(matrix[row])
            while w:
                col = (w & -w).bit_length() - 1
                w ^= 1 << col
                pairs.append((row << 6) | col)
        st["pairs"] = sorted(pairs)
        return st
    offset = determine_correct_offset(lg_k, c)
    window = bytearray(k)
    pairs = []
    default_low = (1 << offset) - 1
    all_surprises = 0
    for row in range(k):
        w = int(matrix[row])
        window[row] = (w >> offset) & 0xFF
        pattern = (w & ~(0xFF << offset) & _MASK64) ^ default_low
        all_surprises |= pattern
        while pattern:
            col = (pattern & -pattern).bit_length() - 1
            pattern ^= 1 << col
            pairs.append((row << 6) | col)
    fi = (all_surprises & -all_surprises).bit_length() - 1 \
        if all_surprises else 64
    st["fiCol"] = min(fi, offset)
    st["window"] = bytes(window)
    st["pairs"] = sorted(pairs)
    st["offset"] = offset
    return st


def matrix_from_state(st: dict) -> np.ndarray:
    lg_k = st["lgK"]
    k = 1 << lg_k
    offset = st["offset"]
    m = np.full(k, (1 << offset) - 1, dtype=np.uint64)
    if st["numCoupons"] == 0:
        return np.zeros(k, dtype=np.uint64)
    if st["window"] is not None:
        m |= (np.frombuffer(bytes(st["window"]), dtype=np.uint8)
              .astype(np.uint64) << np.uint64(offset))
    for p in st["pairs"]:
        m[p >> 6] ^= np.uint64(1 << (p & 63))
    return m


# ---------------------------------------------------------------------------
# serialization (PreambleUtil formats)
# ---------------------------------------------------------------------------
_PRE_INTS = (2, 2, 4, 8, 4, 8, 6, 10)
_SER_VER = 1
_FAMILY = 16

_COMPRESSED = 2
_HIP = 4
_SUP_VAL = 8
_WINDOW = 16


def serialize(st: dict, kxp: float = None, hip: float = None) -> bytes:
    """Sketch state -> DataSketches CPC bytes. States built by this
    module carry mergeFlag=True (no HIP) — byte-identical to
    CpcUnion.getResult().toByteArray()."""
    lg_k = st["lgK"]
    c = st["numCoupons"]
    flavor = determine_flavor(lg_k, c)
    merge = st.get("mergeFlag", True)

    csv_words = []
    num_csv = 0
    cw_words = []
    if flavor == SPARSE and c > 0:
        csv_words, _ = _compress_pairs(st["pairs"], lg_k)
        num_csv = len(st["pairs"])
    elif flavor == HYBRID:
        # window bits (cols < 8, offset 0) become pairs, merged with
        # the exception pairs: every coupon is a pair
        pairs = list(st["pairs"])
        win = st["window"]
        for row in range(1 << lg_k):
            w = win[row]
            while w:
                col = (w & -w).bit_length() - 1
                w ^= 1 << col
                pairs.append((row << 6) | col)
        pairs.sort()
        assert len(pairs) == c
        csv_words, _ = _compress_pairs(pairs, lg_k)
        num_csv = len(pairs)
    elif flavor in (PINNED, SLIDING):
        phase = _determine_pseudo_phase(lg_k, c)
        cw_words = _compress_bytes(
            st["window"], ENCODING_TABLES_HIGH_ENTROPY_BYTE[phase])
        if st["pairs"]:
            if flavor == PINNED:
                pairs = sorted(p - 8 for p in st["pairs"])
            else:
                assert phase < 16
                perm = COLUMN_PERMUTATIONS_FOR_ENCODING[phase]
                offset = st["offset"]
                pairs = sorted(
                    ((p >> 6) << 6) | perm[((p & 63) + 56 - offset) & 63]
                    for p in st["pairs"])
            csv_words, _ = _compress_pairs(pairs, lg_k)
            num_csv = len(st["pairs"])

    fmt = ((4 if cw_words else 0) | (2 if num_csv > 0 else 0)
           | (0 if merge else 1))
    pre_ints = _PRE_INTS[fmt]
    flags = _COMPRESSED
    if not merge:
        flags |= _HIP
    if num_csv > 0:
        flags |= _SUP_VAL
    if cw_words:
        flags |= _WINDOW

    out = bytearray()
    out += struct.pack("<BBBBBBH", pre_ints, _SER_VER, _FAMILY, lg_k,
                       st.get("fiCol", 0), flags, DEFAULT_SEED_HASH)
    if fmt in (0, 1):
        return bytes(out)
    out += struct.pack("<I", c)                      # NUM_COUPONS @ 8
    if fmt in (2, 3):                                # SPARSE_HYBRID
        out += struct.pack("<I", len(csv_words))     # SV_LENGTH @ 12
        if fmt == 3:
            out += struct.pack("<dd", kxp, hip)      # KXP @16, HIP @24
        out += b"".join(struct.pack("<I", w) for w in csv_words)
    elif fmt in (4, 5):                              # PINNED/SLIDING no SV
        out += struct.pack("<I", len(cw_words))      # W_LENGTH @ 12
        if fmt == 5:
            out += struct.pack("<dd", kxp, hip)
        out += b"".join(struct.pack("<I", w) for w in cw_words)
    else:                                            # 6, 7: both streams
        out += struct.pack("<I", num_csv)            # NUM_SV @ 12
        if fmt == 7:
            out += struct.pack("<dd", kxp, hip)
        out += struct.pack("<I", len(csv_words))     # SV_LENGTH
        out += struct.pack("<I", len(cw_words))      # W_LENGTH
        # the library lays the WINDOW stream first, then the SV stream
        out += b"".join(struct.pack("<I", w) for w in cw_words)
        out += b"".join(struct.pack("<I", w) for w in csv_words)
    return bytes(out)


def deserialize(data: bytes) -> dict:
    """DataSketches CPC bytes -> sketch state (incl. sketches written
    by a live HIP-mode updater)."""
    if len(data) < 8:
        raise ValueError("CPC bytes too short")
    pre_ints, ser_ver, family, lg_k, fi_col, flags, seed_hash = \
        struct.unpack_from("<BBBBBBH", data, 0)
    if family != _FAMILY:
        raise ValueError(f"not a CPC sketch (family {family})")
    if ser_ver != _SER_VER:
        raise ValueError(f"unsupported CPC serial version {ser_ver}")
    if not flags & _COMPRESSED:
        raise ValueError("uncompressed CPC not supported")
    merge = not flags & _HIP
    has_sv = bool(flags & _SUP_VAL)
    has_w = bool(flags & _WINDOW)
    fmt = (4 if has_w else 0) | (2 if has_sv else 0) | (0 if merge else 1)
    if pre_ints != _PRE_INTS[fmt]:
        raise ValueError("CPC preamble size mismatch")
    st = {"lgK": lg_k, "numCoupons": 0, "mergeFlag": merge,
          "fiCol": fi_col, "window": None, "pairs": [], "offset": 0,
          "kxp": None, "hip": None}
    if fmt in (0, 1):
        return st
    c = struct.unpack_from("<I", data, 8)[0]
    st["numCoupons"] = c
    flavor = determine_flavor(lg_k, c)
    k = 1 << lg_k

    def words_at(off, n):
        return list(struct.unpack_from(f"<{n}I", data, off))

    if fmt in (2, 3):
        sv_len = struct.unpack_from("<I", data, 12)[0]
        off = 16
        if fmt == 3:
            st["kxp"], st["hip"] = struct.unpack_from("<dd", data, 16)
            off = 32
        pairs = _uncompress_pairs(words_at(off, sv_len), c, lg_k)
        if flavor == SPARSE:
            st["pairs"] = pairs
        else:                      # HYBRID: cols < 8 back into window
            window = bytearray(k)
            exc = []
            for p in pairs:
                col = p & 63
                if col < 8:
                    window[p >> 6] |= 1 << col
                else:
                    exc.append(p)
            st["window"] = bytes(window)
            st["pairs"] = exc
        return st
    if fmt in (4, 5):
        w_len = struct.unpack_from("<I", data, 12)[0]
        off = 16
        if fmt == 5:
            st["kxp"], st["hip"] = struct.unpack_from("<dd", data, 16)
            off = 32
        phase = _determine_pseudo_phase(lg_k, c)
        st["window"] = bytes(_uncompress_bytes(
            words_at(off, w_len), k, _DECODE_TABLES[phase]))
        st["offset"] = determine_correct_offset(lg_k, c)
        return st
    # fmt 6 / 7
    num_sv = struct.unpack_from("<I", data, 12)[0]
    off = 16
    if fmt == 7:
        st["kxp"], st["hip"] = struct.unpack_from("<dd", data, 16)
        off = 32
    sv_len = struct.unpack_from("<I", data, off)[0]
    w_len = struct.unpack_from("<I", data, off + 4)[0]
    off += 8
    cw_words = words_at(off, w_len)                  # window stream first
    sv_words = words_at(off + 4 * w_len, sv_len)
    phase = _determine_pseudo_phase(lg_k, c)
    st["window"] = bytes(_uncompress_bytes(cw_words, k,
                                           _DECODE_TABLES[phase]))
    st["offset"] = determine_correct_offset(lg_k, c)
    raw = _uncompress_pairs(sv_words, num_sv, lg_k)
    if flavor == PINNED:
        st["pairs"] = sorted(p + 8 for p in raw)
    else:
        perm = _PERM_DECODE[phase]
        offset = st["offset"]
        st["pairs"] = sorted(
            ((p >> 6) << 6) | ((perm[p & 63] + offset + 8) & 63)
            for p in raw)
    return st


# ---------------------------------------------------------------------------
# public surface
# ---------------------------------------------------------------------------
def cpc_from_values(values, lg_k: int = DEFAULT_LG_K) -> bytes:
    """Distinct-count sketch over values, DataSketches CPC wire bytes
    (union-style: mergeFlag set, ICON estimation)."""
    return serialize(_state_from_matrix(matrix_from_values(values, lg_k),
                                        lg_k))


def cpc_merge(blobs, lg_k: int = None) -> bytes:
    """OR the coupon matrices of many serialized sketches."""
    acc = None
    for b in blobs:
        st = deserialize(b)
        if lg_k is None:
            lg_k = st["lgK"]
        if st["lgK"] != lg_k:
            raise ValueError("CPC lgK mismatch in merge")
        m = matrix_from_state(st)
        acc = m if acc is None else (acc | m)
    if acc is None:
        raise ValueError("nothing to merge")
    return serialize(_state_from_matrix(acc, lg_k))


def cpc_estimate(blob: bytes) -> float:
    """ICON estimate (a DataSketches union result estimates the same
    way; live HIP sketches may differ by a fraction of a percent)."""
    st = deserialize(blob)
    return icon_estimate(st["lgK"], st["numCoupons"])
