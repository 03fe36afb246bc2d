"""From-scratch FLAC codec (pure Python + numpy) — the COMPRESSED
real-format decode path for the audio payload axis, completing the
container's audio surface the way GIF/BMP completed images: WAV covers
the uncompressed interchange layout (audio_codecs.py); this covers the
dominant lossless compressed one, built solely from the public FLAC
format specification (RFC 9639 / flac format documents).

Implemented surface:
  * stream layout: fLaC magic, METADATA_BLOCK walk (STREAMINFO parsed;
    padding/vorbis-comment/seektable/etc. skipped), fixed-blocksize
    frames with UTF-8-coded frame numbers, CRC-8 header check and
    CRC-16 frame check (both verified on decode — a flipped bit raises).
  * subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC any order
    (QLP precision + arithmetic-shift accumulator per the spec).
  * residuals: rice (4-bit params) and rice2 (5-bit params) partitions,
    any partition order, escape code (raw n-bit residuals).
  * stereo decorrelation: independent, left/side, right/side, mid/side
    (side channel carries bits-per-sample + 1, per the spec).
  * wasted bits (unary-coded shift per subframe).

The ENCODER emits a deliberately plain subset every conformant decoder
(including this one) must accept: 16-bit, fixed predictor per-channel
(best of orders 0-2 by residual magnitude), rice partitions of order 0,
mono / independent / mid-side stereo, 4096-sample frames. The DECODER
accepts the full surface above, so spec fixtures exercising LPC /
rice2 / escapes / wasted bits are decoded without the encoder's help.

Decode-side robustness (module contract shared with codecs.py): corrupt
payloads raise ValueError — bad magic, truncated bit stream, CRC
mismatch, reserved/invalid codes, residual counts that do not fit the
block — never any other exception, and allocations are bounded by the
STREAMINFO-declared stream length, not corrupt interior fields.
"""

from __future__ import annotations

import struct

import numpy as np

# STREAMINFO's total-samples field is 36 bits; decode-side allocations are
# additionally sanity-capped well below that so a corrupt header cannot
# balloon memory (~70 min stereo @ 48k)
_SANE_SAMPLES = 200_000_000


# ---------------------------------------------------------------- CRCs

def _crc8(buf: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — frame-header CRC."""
    crc = 0
    for b in buf:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(buf: bytes) -> int:
    """CRC-16, poly 0x8005, init 0 — whole-frame CRC."""
    crc = 0
    for b in buf:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


# ---------------------------------------------------------------- bit io

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self._acc = (self._acc << bits) | (value & ((1 << bits) - 1))
        self._n += bits
        while self._n >= 8:
            self._n -= 8
            self.out.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)

    def bytes(self) -> bytes:
        assert self._n == 0
        return bytes(self.out)


class _BitReader:
    """Bit reader over an unpacked 0/1 array; `ones` indexes every 1-bit
    so rice quotients resolve via searchsorted instead of a scan."""

    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.ones = np.flatnonzero(self.bits)
        self.pos = 0

    def read(self, n: int) -> int:
        if self.pos + n > len(self.bits):
            raise ValueError("FLAC bit stream exhausted")
        v = 0
        for b in self.bits[self.pos:self.pos + n]:
            v = (v << 1) | int(b)
        self.pos += n
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        i = np.searchsorted(self.ones, self.pos)
        if i >= len(self.ones):
            raise ValueError("FLAC bit stream exhausted in unary code")
        j = int(self.ones[i])
        q = j - self.pos
        self.pos = j + 1
        return q

    def read_signed_array(self, n: int, count: int) -> np.ndarray:
        """count n-bit signed ints, vectorized."""
        end = self.pos + n * count
        if end > len(self.bits):
            raise ValueError("FLAC bit stream exhausted")
        m = self.bits[self.pos:end].reshape(count, n).astype(np.int64)
        self.pos = end
        w = (1 << np.arange(n - 1, -1, -1, dtype=np.int64))
        v = m @ w
        return v - ((v >> (n - 1)) << n)  # sign-extend

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7


# ---------------------------------------------------------------- rice

def _zigzag(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, x << 1, (-x << 1) - 1)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    return np.where(u & 1, -((u + 1) >> 1), u >> 1)


def _rice_write(w: _BitWriter, res: np.ndarray, k: int) -> None:
    u = _zigzag(res.astype(np.int64))
    for v in u:
        w.write_unary(int(v) >> k)
        if k:
            w.write(int(v) & ((1 << k) - 1), k)


def _rice_read(r: _BitReader, k: int, count: int) -> np.ndarray:
    out = np.empty(count, dtype=np.int64)
    bits, ones, pos = r.bits, r.ones, r.pos
    n_bits = len(bits)
    kw = (1 << np.arange(k - 1, -1, -1, dtype=np.int64)) if k else None
    oi = int(np.searchsorted(ones, pos))
    for i in range(count):
        # next terminator 1-bit at/after pos (remainders may contain 1s,
        # so re-searchsort after each fixed-width skip)
        oi = int(np.searchsorted(ones, pos, side="left"))
        if oi >= len(ones):
            raise ValueError("FLAC rice stream exhausted")
        j = int(ones[oi])
        q = j - pos
        pos = j + 1
        if k:
            if pos + k > n_bits:
                raise ValueError("FLAC rice stream exhausted")
            rem = int(bits[pos:pos + k] @ kw)
            pos += k
        else:
            rem = 0
        out[i] = (q << k) | rem
    r.pos = pos
    return _unzigzag(out)


# ---------------------------------------------------------------- fixed predictors

def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    return np.diff(x.astype(np.int64), n=order)


def _fixed_restore(warmup: np.ndarray, residual: np.ndarray,
                   order: int) -> np.ndarray:
    """Invert the order-th difference: iterated cumsum seeded from the
    warmup's difference tower (vectorized — no per-sample loop)."""
    w = warmup.astype(np.int64)
    seq = residual.astype(np.int64)
    for j in range(order, 0, -1):
        seq = np.cumsum(seq) + int(np.diff(w, j - 1)[-1])
    return np.concatenate([w, seq])


# ---------------------------------------------------------------- encode

_BLOCK = 4096


def _write_utf8_number(w: _BitWriter, n: int) -> None:
    if n < 0x80:
        w.write(n, 8)
        return
    # multi-byte UTF-8-style (frames beyond 127 in long clips)
    for total in range(2, 8):
        if n < (1 << (total * 5 + 1)) or total == 7:
            break
    w.write(((0xFF << (8 - total)) & 0xFF) | (n >> (6 * (total - 1))), 8)
    for i in range(total - 2, -1, -1):
        w.write(0x80 | ((n >> (6 * i)) & 0x3F), 8)


def _best_fixed_order(x: np.ndarray) -> int:
    best, best_cost = 0, float(np.abs(_fixed_residual(x, 0)).sum())
    for order in (1, 2):
        if len(x) <= order:
            break
        c = float(np.abs(_fixed_residual(x, order)).sum())
        if c < best_cost:
            best, best_cost = order, c
    return best


def _rice_param(res: np.ndarray) -> int:
    if len(res) == 0:
        return 0
    mean = float(np.abs(res.astype(np.float64)).mean())
    k = 0
    while (1 << k) < mean + 1 and k < 14:
        k += 1
    return k


def _write_subframe(w: _BitWriter, x: np.ndarray, bps: int) -> None:
    x = x.astype(np.int64)
    if np.all(x == x[0]):
        w.write(0, 1)
        w.write(0b000000, 6)  # CONSTANT
        w.write(0, 1)
        w.write(int(x[0]), bps)
        return
    order = _best_fixed_order(x)
    w.write(0, 1)
    w.write(0b001000 | order, 6)  # FIXED
    w.write(0, 1)  # no wasted bits
    for v in x[:order]:
        w.write(int(v), bps)
    res = _fixed_residual(x, order)
    k = _rice_param(res)
    w.write(0b00, 2)   # rice, 4-bit params
    w.write(0, 4)      # partition order 0
    w.write(k, 4)
    _rice_write(w, res, k)


def encode_flac(sig: np.ndarray, sr: int, stereo_mode: str = "auto") -> bytes:
    """float [-1, 1] signal, shape (n,) or (n, 2) -> FLAC bytes (16-bit).

    stereo_mode: 'independent' | 'mid_side' | 'auto' (mid/side when the
    channels correlate enough that the side channel is cheaper)."""
    sig = np.asarray(sig, dtype=np.float64)
    if sig.ndim == 1:
        chans = [np.clip(np.round(sig * 32767.0), -32768, 32767).astype(np.int64)]
    elif sig.ndim == 2 and sig.shape[1] == 2:
        q = np.clip(np.round(sig * 32767.0), -32768, 32767).astype(np.int64)
        chans = [q[:, 0], q[:, 1]]
    else:
        raise ValueError(f"expected (n,) or (n, 2) signal, got {sig.shape}")
    n_total = len(chans[0])
    if n_total == 0:
        raise ValueError("empty signal")
    n_ch = len(chans)
    bps = 16

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block): header + 34-byte body
    si = _BitWriter()
    si.write(_BLOCK, 16)
    si.write(_BLOCK, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sr, 20)
    si.write(n_ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n_total, 36)
    body = si.bytes() + b"\x00" * 16  # MD5 unset (all zeros = unknown)
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    use_ms = False
    if n_ch == 2:
        if stereo_mode == "mid_side":
            use_ms = True
        elif stereo_mode == "auto":
            side = chans[0] - chans[1]
            use_ms = float(np.abs(side).mean()) < 0.5 * float(
                np.abs(chans[1]).mean() + 1)
        elif stereo_mode != "independent":
            raise ValueError(f"unknown stereo_mode: {stereo_mode}")

    for fi, start in enumerate(range(0, n_total, _BLOCK)):
        blk = [c[start:start + _BLOCK] for c in chans]
        bs = len(blk[0])
        h = _BitWriter()
        h.write(0b11111111111110, 14)
        h.write(0, 1)   # reserved
        h.write(0, 1)   # fixed blocksize strategy
        h.write(0b0111, 4)   # block size: 16-bit value - 1 at header end
        h.write(0b0000, 4)   # sample rate: from STREAMINFO
        if n_ch == 1:
            h.write(0b0000, 4)
        elif use_ms:
            h.write(0b1010, 4)   # mid/side
        else:
            h.write(0b0001, 4)   # independent stereo
        h.write(0b100, 3)    # 16 bits per sample
        h.write(0, 1)        # reserved
        _write_utf8_number(h, fi)
        h.write(bs - 1, 16)
        hdr = h.bytes()
        f = _BitWriter()
        for b in hdr:
            f.write(b, 8)
        f.write(_crc8(hdr), 8)
        if n_ch == 1:
            _write_subframe(f, blk[0], bps)
        elif use_ms:
            mid = (blk[0] + blk[1]) >> 1
            side = blk[0] - blk[1]
            _write_subframe(f, mid, bps)
            _write_subframe(f, side, bps + 1)
        else:
            _write_subframe(f, blk[0], bps)
            _write_subframe(f, blk[1], bps)
        f.align()
        frame = f.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


# ---------------------------------------------------------------- decode

_BLOCKSIZE_TABLE = {
    0b0001: 192, 0b0010: 576, 0b0011: 1152, 0b0100: 2304, 0b0101: 4608,
    0b1000: 256, 0b1001: 512, 0b1010: 1024, 0b1011: 2048, 0b1100: 4096,
    0b1101: 8192, 0b1110: 16384, 0b1111: 32768,
}
_SR_TABLE = {
    0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
    0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
    0b1001: 44100, 0b1010: 48000, 0b1011: 96000,
}
_BPS_TABLE = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24, 0b111: 32}


def _read_utf8_number(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n_follow = 0
    mask = 0x40
    while b0 & mask:
        n_follow += 1
        mask >>= 1
    if n_follow == 0 or n_follow > 6:
        raise ValueError("bad FLAC UTF-8 frame number")
    v = b0 & (mask - 1)
    for _ in range(n_follow):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad FLAC UTF-8 continuation byte")
        v = (v << 6) | (b & 0x3F)
    return v


def _read_residual(r: _BitReader, bs: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    n_part = 1 << porder
    if bs % n_part:
        raise ValueError("FLAC block size not divisible by partition count")
    parts = []
    for p in range(n_part):
        cnt = (bs >> porder) - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("FLAC partition order does not fit block")
        k = r.read(pbits)
        if k == escape:
            raw_bits = r.read(5)
            parts.append(
                r.read_signed_array(raw_bits, cnt) if raw_bits
                else np.zeros(cnt, dtype=np.int64))
        else:
            parts.append(_rice_read(r, k, cnt))
    return np.concatenate(parts) if parts else np.zeros(0, dtype=np.int64)


def _read_subframe(r: _BitReader, bs: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("FLAC subframe padding bit set")
    t = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC wasted bits exceed sample size")
    if t == 0b000000:
        x = np.full(bs, r.read_signed(eff), dtype=np.int64)
    elif t == 0b000001:
        x = r.read_signed_array(eff, bs)
    elif 0b001000 <= t <= 0b001100:
        order = t & 0x07
        if order > bs:
            raise ValueError("FLAC fixed order exceeds block size")
        warm = r.read_signed_array(eff, order) if order else \
            np.zeros(0, dtype=np.int64)
        res = _read_residual(r, bs, order)
        x = _fixed_restore(warm, res, order) if order else res
    elif t & 0b100000:
        order = (t & 0x1F) + 1
        if order > bs:
            raise ValueError("FLAC LPC order exceeds block size")
        warm = r.read_signed_array(eff, order)
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC QLP precision escape")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC QLP shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        res = _read_residual(r, bs, order)
        x = np.empty(bs, dtype=np.int64)
        x[:order] = warm
        for i in range(order, bs):
            acc = 0
            for m, c in enumerate(coefs):
                acc += c * int(x[i - 1 - m])
            x[i] = int(res[i - order]) + (acc >> shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {t:06b}")
    return x << wasted


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> (mono float64 samples at int16 scale, sample rate).
    Multi-channel audio is downmixed by the channel mean (same contract
    as decode_wav). Raises ValueError on any corrupt layout, including
    CRC-8/CRC-16 mismatches."""
    if data is None:
        raise TypeError("NULL payload")
    if len(data) < 42 or data[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata")
        last = data[pos] & 0x80
        btype = data[pos] & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1:pos + 4])
        pos += 4
        if pos + blen > len(data):
            raise ValueError("FLAC metadata block past EOF")
        if btype == 0:
            if blen != 34:
                raise ValueError(f"STREAMINFO length {blen} != 34")
            si = _BitReader(data[pos:pos + 34])
            si.read(16)  # min block size
            si.read(16)  # max block size
            si.read(24)
            si.read(24)
            sr = si.read(20)
            n_ch = si.read(3) + 1
            bps = si.read(5) + 1
            n_total = si.read(36)
            streaminfo = (sr, n_ch, bps, n_total)
        elif btype == 127:
            raise ValueError("invalid FLAC metadata block type 127")
        pos += blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC stream has no STREAMINFO")
    sr, n_ch, bps, n_total = streaminfo
    if sr == 0 or n_ch < 1:
        raise ValueError("bad FLAC STREAMINFO")
    if n_total > _SANE_SAMPLES:
        raise ValueError(f"FLAC declares {n_total} samples (cap {_SANE_SAMPLES})")

    r = _BitReader(data[pos:])
    chunks: list[np.ndarray] = []
    got = 0
    while got < n_total:
        frame_start_bits = r.pos
        if r.read(14) != 0b11111111111110:
            raise ValueError("bad FLAC frame sync")
        if r.read(1):
            raise ValueError("reserved FLAC frame bit set")
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        bps_code = r.read(3)
        if r.read(1):
            raise ValueError("reserved FLAC frame bit set")
        _read_utf8_number(r)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code 0")
        elif bs_code == 0b0110:
            bs = r.read(8) + 1
        elif bs_code == 0b0111:
            bs = r.read(16) + 1
        else:
            bs = _BLOCKSIZE_TABLE[bs_code]
        if sr_code == 0b1100:
            r.read(8)
        elif sr_code in (0b1101, 0b1110):
            r.read(16)
        elif sr_code == 0b1111:
            raise ValueError("invalid FLAC sample rate code")
        fbps = bps if bps_code == 0 else _BPS_TABLE.get(bps_code)
        if fbps is None:
            raise ValueError(f"reserved FLAC sample size code {bps_code:03b}")
        hdr_bytes = np.packbits(
            r.bits[frame_start_bits:r.pos]).tobytes()
        if r.read(8) != _crc8(hdr_bytes):
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if bs > n_total - got:
            raise ValueError("FLAC frame larger than remaining stream")

        if ch_code <= 0b0111:
            n_sub = ch_code + 1
            if n_sub != n_ch:
                raise ValueError("FLAC frame channel count != STREAMINFO")
            subs = [_read_subframe(r, bs, fbps) for _ in range(n_sub)]
        elif ch_code in (0b1000, 0b1001, 0b1010):
            if n_ch != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            if ch_code == 0b1000:   # left/side
                left = _read_subframe(r, bs, fbps)
                side = _read_subframe(r, bs, fbps + 1)
                subs = [left, left - side]
            elif ch_code == 0b1001:  # right/side
                side = _read_subframe(r, bs, fbps + 1)
                right = _read_subframe(r, bs, fbps)
                subs = [right + side, right]
            else:                    # mid/side
                mid = _read_subframe(r, bs, fbps)
                side = _read_subframe(r, bs, fbps + 1)
                lr_sum = (mid << 1) | (side & 1)
                subs = [(lr_sum + side) >> 1, (lr_sum - side) >> 1]
        else:
            raise ValueError(f"reserved FLAC channel code {ch_code:04b}")

        r.byte_align()
        frame_bytes = np.packbits(r.bits[frame_start_bits:r.pos]).tobytes()
        if r.read(16) != _crc16(frame_bytes):
            raise ValueError("FLAC frame CRC-16 mismatch")
        chunks.append(np.stack(subs, axis=1) if n_ch > 1
                      else subs[0][:, None])
        got += bs
    if got != n_total:
        raise ValueError("FLAC frames do not sum to STREAMINFO total")
    if not chunks:
        raise ValueError("FLAC stream contains no audio frames")
    allch = np.concatenate(chunks, axis=0)[:n_total]
    mono = allch.mean(axis=1)
    # normalize to int16 scale regardless of stream bit depth
    return mono * (32768.0 / (1 << (bps - 1))), sr
