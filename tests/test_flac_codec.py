"""FLAC codec tests: encoder-subset round trips (bit-exact — FLAC is
lossless), decoder-only spec surface via hand-assembled frames (LPC,
rice2, escape partitions, partition orders, wasted bits, left/right-side
stereo, verbatim), and the corruption/CRC matrix."""

import struct

import numpy as np
import pytest

from chronon_spark.flac_codec import (
    _BitWriter,
    _crc8,
    _crc16,
    decode_flac,
    encode_flac,
)


def _sig(n, sr=8000, seed=0, noisy=True):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    x = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 950 * t)
    if noisy:
        x = x + 0.03 * rng.standard_normal(n)
    return np.clip(x, -1, 1)


def _q16(x):
    return np.clip(np.round(np.asarray(x) * 32767.0), -32768, 32767)


# ------------------------------------------------------------ round trips


def test_flac_mono_round_trip_bit_exact():
    for n in (100, 4096, 9000):  # below/at/above the frame size
        x = _sig(n, seed=n)
        dec, sr = decode_flac(encode_flac(x, 8000))
        assert sr == 8000
        assert np.array_equal(dec, _q16(x))


def test_flac_stereo_modes_bit_exact():
    n = 5000
    x, y = _sig(n, seed=1), _sig(n, seed=2)
    sig = np.stack([x, y], axis=1)
    expect = np.stack([_q16(x), _q16(y)], axis=1).mean(axis=1)
    for mode in ("independent", "mid_side", "auto"):
        dec, _ = decode_flac(encode_flac(sig, 16000, stereo_mode=mode))
        assert np.array_equal(dec, expect), mode


def test_flac_constant_and_tiny_signals():
    x = np.full(300, 0.25)
    dec, _ = decode_flac(encode_flac(x, 8000))
    assert np.array_equal(dec, _q16(x))
    dec1, _ = decode_flac(encode_flac(np.array([0.5]), 8000))
    assert np.array_equal(dec1, _q16([0.5]))


def test_flac_compresses_smooth_content():
    # low-frequency content: successive differences are small, so the
    # fixed predictor + rice coding should roughly halve the raw size
    t = np.arange(8000) / 8000
    x = np.clip(0.4 * np.sin(2 * np.pi * 60 * t)
                + 0.2 * np.sin(2 * np.pi * 132 * t), -1, 1)
    data = encode_flac(x, 8000)
    assert len(data) < 2 * len(x) * 0.6  # beats raw int16 by >= 40%


def test_flac_empty_signal_raises():
    with pytest.raises(ValueError):
        encode_flac(np.zeros(0), 8000)


# -------------------------------------------------- hand-assembled frames


def _stream(frames_payload: bytes, sr=8000, n_ch=1, bps=16, n_total=0):
    """fLaC magic + STREAMINFO + raw frame bytes."""
    si = _BitWriter()
    si.write(16, 16)
    si.write(65535, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sr, 20)
    si.write(n_ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n_total, 36)
    body = si.bytes() + b"\x00" * 16
    return (b"fLaC" + bytes([0x80]) + struct.pack(">I", len(body))[1:]
            + body + frames_payload)


def _frame(subframe_bits, bs, ch_code=0, bps_code=0b100, bs_code=0b0111,
           sr_code=0b0000, frame_no=0, sr_end=None):
    """Build one frame: header + CRC-8 + subframe bits + pad + CRC-16."""
    h = _BitWriter()
    h.write(0b11111111111110, 14)
    h.write(0, 2)
    h.write(bs_code, 4)
    h.write(sr_code, 4)
    h.write(ch_code, 4)
    h.write(bps_code, 3)
    h.write(0, 1)
    h.write(frame_no, 8)  # utf8 single byte
    if bs_code == 0b0110:
        h.write(bs - 1, 8)
    elif bs_code == 0b0111:
        h.write(bs - 1, 16)
    if sr_code == 0b1100:
        h.write(sr_end, 8)
    elif sr_code in (0b1101, 0b1110):
        h.write(sr_end, 16)
    hdr = h.bytes()
    f = _BitWriter()
    for b in hdr:
        f.write(b, 8)
    f.write(_crc8(hdr), 8)
    for v, nbits in subframe_bits:
        if nbits == "unary":
            f.write_unary(v)
        else:
            f.write(v, nbits)
    f.align()
    frame = f.bytes()
    return frame + struct.pack(">H", _crc16(frame))


def _subframe_verbatim(samples, bps=16):
    bits = [(0, 1), (0b000001, 6), (0, 1)]
    for s in samples:
        bits.append((int(s) & ((1 << bps) - 1), bps))
    return bits


def test_flac_decodes_verbatim_subframe():
    samples = [100, -200, 32000, -32768, 0, 7]
    data = _stream(_frame(_subframe_verbatim(samples), bs=6), n_total=6)
    dec, sr = decode_flac(data)
    assert np.array_equal(dec, np.array(samples, dtype=float))


def test_flac_decodes_lpc_subframe():
    # order-2 LPC: coefs [3, -1], shift 1 -> x[i] = r[i] + (3x[i-1]-x[i-2])>>1
    warm = [10, 14]
    res = [1, -2, 3, 0]
    x = list(warm)
    for r_ in res:
        x.append(r_ + ((3 * x[-1] - 1 * x[-2]) >> 1))
    f = [(0, 1), (0b100001, 6), (0, 1),               # LPC, order 2 (code o-1)
         (10, 16), (14, 16),                           # warmup
         (14, 4), (1, 5),                              # precision 15, shift 1
         (3, 15), ((-1) & 0x7FFF, 15),                 # coefficients
         (0b00, 2), (0, 4),                            # rice, partition order 0
         (6, 4)]                                       # rice param k=6
    for v in res:
        u = int(v) * 2 if v >= 0 else -2 * int(v) - 1
        f.append((u >> 6, "unary"))
        f.append((u & 63, 6))
    data = _stream(_frame(f, bs=6), n_total=6)
    dec, _ = decode_flac(data)
    assert np.array_equal(dec, np.array(x, dtype=float))


def test_flac_decodes_rice2_and_escape_partitions():
    # fixed order 0, partition order 1 (2 partitions over bs=8):
    # partition 1 rice2 k=3, partition 2 escaped raw 5-bit
    p1 = np.array([3, -4, 7, 0])
    p2 = np.array([-15, 14, -1, 9])
    f = [(0, 1), (0b001000, 6), (0, 1), (0b01, 2), (1, 4)]
    f.append((3, 5))  # rice2 param
    for v in p1:
        u = int(v) * 2 if v >= 0 else -2 * int(v) - 1
        f.append((u >> 3, "unary"))
        f.append((u & 7, 3))
    f.append((31, 5))  # escape
    f.append((5, 5))   # raw width 5
    for v in p2:
        f.append((int(v) & 31, 5))
    data = _stream(_frame(f, bs=8), n_total=8)
    dec, _ = decode_flac(data)
    assert np.array_equal(dec, np.concatenate([p1, p2]).astype(float))


def test_flac_decodes_wasted_bits():
    # constant subframe with 2 wasted bits: stored value 5 -> sample 20
    f = [(0, 1), (0b000000, 6), (1, 1), (1, "unary"), (5, 14)]
    data = _stream(_frame(f, bs=4), n_total=4)
    dec, _ = decode_flac(data)
    assert np.array_equal(dec, np.full(4, 20.0))


def test_flac_decodes_left_side_and_right_side():
    L = np.array([100, 120, 90, 80])
    R = np.array([60, 90, 100, 70])
    side = L - R
    # left/side (code 8): subframe0 = L @16, subframe1 = side @17
    f = _subframe_verbatim(L, 16) + _subframe_verbatim(side, 17)
    d = _stream(_frame(f, bs=4, ch_code=0b1000), n_ch=2, n_total=4)
    dec, _ = decode_flac(d)
    assert np.array_equal(dec, (L + R) / 2)
    # right/side (code 9): subframe0 = side @17, subframe1 = R @16
    f = _subframe_verbatim(side, 17) + _subframe_verbatim(R, 16)
    d = _stream(_frame(f, bs=4, ch_code=0b1001), n_ch=2, n_total=4)
    dec, _ = decode_flac(d)
    assert np.array_equal(dec, (L + R) / 2)


def test_flac_blocksize_table_and_frame_sr_codes():
    # bs from the 8-bit end-of-header field; sr code 1100 (kHz byte)
    samples = list(range(-8, 8))
    f = _subframe_verbatim(samples)
    d = _stream(_frame(f, bs=16, bs_code=0b0110, sr_code=0b1100, sr_end=8),
                n_total=16)
    dec, sr = decode_flac(d)
    assert np.array_equal(dec, np.array(samples, dtype=float))
    assert sr == 8000  # STREAMINFO rate governs the return value


def test_flac_8bit_stream_normalizes_to_int16_scale():
    samples = [10, -20, 30, -40]
    f = _subframe_verbatim(samples, bps=8)
    d = _stream(_frame(f, bs=4, bps_code=0b001), bps=8, n_total=4)
    dec, _ = decode_flac(d)
    assert np.array_equal(dec, np.array(samples, dtype=float) * 256.0)


# ------------------------------------------------------------- corruption


def test_flac_corruptions_raise():
    x = _sig(3000, seed=9)
    good = encode_flac(x, 8000)
    with pytest.raises(ValueError):
        decode_flac(b"NOPE" + good[4:])
    with pytest.raises(ValueError):
        decode_flac(good[:-4])                 # truncated final frame
    bad = bytearray(good)
    bad[len(bad) // 2] ^= 0x08                 # mid-frame bit flip
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))
    hdr = bytearray(good)
    hdr[23] ^= 0xFF    # STREAMINFO total-samples corrupted: frame sum drifts
    with pytest.raises(ValueError):
        decode_flac(bytes(hdr))
    with pytest.raises(TypeError):
        decode_flac(None)


def test_flac_fuzz_never_escapes_valueerror():
    rng = np.random.default_rng(11)
    base = [encode_flac(_sig(1200, seed=3), 8000),
            encode_flac(np.stack([_sig(900, seed=4), _sig(900, seed=5)],
                                 axis=1), 16000, stereo_mode="mid_side")]
    for trial in range(120):
        data = bytearray(base[trial % 2])
        for _ in range(int(rng.integers(1, 4))):
            mode = int(rng.integers(0, 3))
            if mode == 0:
                i = int(rng.integers(4, len(data)))
                data[i] ^= 1 << int(rng.integers(0, 8))
            elif mode == 1 and len(data) > 60:
                data = data[: int(rng.integers(50, len(data)))]
            else:
                i = int(rng.integers(4, len(data) + 1))
                data = data[:i] + bytes([int(rng.integers(0, 256))]) + data[i:]
        try:
            out, sr = decode_flac(bytes(data))
            assert out.ndim == 1 and sr > 0
        except (ValueError, TypeError):
            pass


# ------------------------------------------------------ engine integration


def test_flac_rows_flow_through_audio_features(spark):
    from chronon_spark.fixtures import audio_features_np
    from chronon_spark.operators.multimodal import extract_audio_features

    x = _sig(4000, seed=21)
    good = encode_flac(x, 8000)
    bad = bytearray(good)
    bad[len(bad) // 2] ^= 0x10
    df = spark.createDataFrame(
        [("f0", good, 8000, "flac"), ("fbad", bytes(bad), 8000, "flac")],
        "audio_id string, bytes binary, sr int, fmt string",
    )
    out = {r.audio_id: r for r in extract_audio_features(df).collect()}
    assert out["fbad"].decode_ok is False and out["fbad"].rms is None
    assert out["f0"].decode_ok is True
    expect = audio_features_np(_q16(x).astype(np.float64), 8000)
    assert out["f0"].rms == pytest.approx(expect["rms"])
    assert out["f0"].zcr == pytest.approx(expect["zcr"])


def test_flac_hypothesis_round_trip_property():
    """Randomized signals (content, length, channel count, stereo mode)
    always round-trip bit-exactly."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        seed=st.integers(0, 10_000),
        n=st.integers(1, 6000),
        stereo=st.booleans(),
        mode=st.sampled_from(["independent", "mid_side", "auto"]),
        sr=st.sampled_from([8000, 16000, 44100]),
    )
    def prop(seed, n, stereo, mode, sr):
        rng = np.random.default_rng(seed)
        kind = seed % 3
        if kind == 0:       # pure noise (rice stress)
            x = rng.uniform(-1, 1, n)
        elif kind == 1:     # smooth (predictor stress)
            x = 0.8 * np.sin(np.arange(n) * rng.uniform(0.001, 0.2))
        else:               # constant / near-silence
            x = np.full(n, rng.uniform(-1, 1) * (seed % 2))
        if stereo:
            y = np.roll(x, 1) * 0.9
            sig = np.stack([x, y], axis=1)
            expect = (_q16(x) + _q16(y)) / 2
            data = encode_flac(sig, sr, stereo_mode=mode)
        else:
            expect = _q16(x)
            data = encode_flac(x, sr)
        dec, got_sr = decode_flac(data)
        assert got_sr == sr
        assert np.array_equal(dec, expect)

    prop()
