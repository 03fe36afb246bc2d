"""WAV/RIFF codec (chronon_spark/audio_codecs.py): round trips across
the encoding matrix, G.711 codeword idempotence, container robustness,
corrupt-payload fuzz, and the Spark-side Arrow feature pass."""

import struct

import numpy as np
import pytest

from chronon_spark.audio_codecs import (
    _ALAW_LUT,
    _ULAW_LUT,
    alaw_encode,
    decode_wav,
    encode_wav,
    ulaw_encode,
)


def _signal(n=6000, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    return np.clip(
        0.4 * np.sin(2 * np.pi * 440 * t)
        + 0.3 * np.sin(2 * np.pi * 1200 * t)
        + 0.05 * rng.standard_normal(n),
        -1.0, 1.0,
    )


def _snr_db(ref, out):
    err = ref - out
    return 10 * np.log10((ref * ref).mean() / max((err * err).mean(), 1e-300))


# round-trip quality floors: exact for floats, quantization-bounded for
# integer PCM, the native 8-bit dynamic range for pcm8 and G.711
_SNR_FLOOR = {
    "pcm8": 40, "pcm16": 85, "pcm24": 120, "pcm32": 150,
    "float32": 140, "float64": 300, "ulaw": 33, "alaw": 33,
}


@pytest.mark.parametrize("encoding", sorted(_SNR_FLOOR))
@pytest.mark.parametrize("extensible", [False, True])
def test_round_trip_snr(encoding, extensible):
    x = _signal()
    out, sr = decode_wav(encode_wav(x, 16000, encoding, extensible=extensible))
    assert sr == 16000 and len(out) == len(x)
    assert _snr_db(x, out) >= _SNR_FLOOR[encoding]


def test_stereo_downmix_is_channel_mean():
    x = _signal()
    st = np.stack([x, np.roll(x, 7)], axis=1)
    out, sr = decode_wav(encode_wav(st, 8000, "pcm16"))
    q = np.clip(np.round(st * 32767.0), -32768, 32767) / 32767.0
    assert sr == 8000
    np.testing.assert_allclose(out, q.mean(axis=1), atol=0)


def test_g711_codeword_idempotence():
    """encode(decode(codeword)) == codeword for every byte — A-law for
    all 256; mu-law for 255 (0x7F is the spec's negative zero, which
    decodes to 0 and canonically re-encodes as +0 = 0xFF)."""
    a = alaw_encode(_ALAW_LUT.copy())
    np.testing.assert_array_equal(a, np.arange(256))
    u = ulaw_encode(_ULAW_LUT.copy())
    mism = np.nonzero(u != np.arange(256))[0]
    assert list(mism) == [0x7F] and u[0x7F] == 0xFF and _ULAW_LUT[0x7F] == 0


def test_unknown_chunks_and_pad_bytes_are_skipped():
    """A LIST chunk (odd-sized, so with a pad byte) inserted before fmt
    must not disturb the chunk walk."""
    x = _signal(n=2000)
    wav = bytearray(encode_wav(x, 16000, "pcm16"))
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad byte
    mutated = bytes(wav[:12]) + extra + bytes(wav[12:])
    # fix the RIFF size field (decoder tolerates it, but keep it honest)
    out, sr = decode_wav(mutated)
    ref, _ = decode_wav(bytes(wav))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("mutate,msg", [
    (lambda d: d[:-3], "past EOF"),
    (lambda d: b"RIFX" + d[4:], "not a RIFF/WAVE"),
    (lambda d: d[:8] + b"WAVX" + d[12:], "not a RIFF/WAVE"),
    (lambda d: d[:20] + b"\x02\x00" + d[22:], "format tag"),  # ADPCM
    (lambda d: d[:22] + b"\x00\x00" + d[24:], "channel count"),  # 0 channels
    (lambda d: d[:22] + b"\xff\x00" + d[24:], "channel count"),  # 255 ch
    (lambda d: d[:32] + b"\x07\x00" + d[34:], "block align"),
    (lambda d: d[:12], "no fmt chunk"),
])
def test_corrupt_layouts_raise_valueerror(mutate, msg):
    wav = encode_wav(_signal(n=2000), 16000, "pcm16")
    with pytest.raises(ValueError, match=msg):
        decode_wav(mutate(wav))


def test_data_before_fmt_raises():
    body = (b"WAVE" + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="data chunk before fmt"):
        decode_wav(blob)


def test_misaligned_data_size_raises():
    """data size not a multiple of the frame stride (stereo pcm16 with
    an odd trailing byte) must raise, not silently drop samples."""
    st = np.stack([_signal(n=500)] * 2, axis=1)
    wav = bytearray(encode_wav(st, 8000, "pcm16"))
    i = bytes(wav).find(b"data")
    (size,) = struct.unpack_from("<I", wav, i + 4)
    struct.pack_into("<I", wav, i + 4, size - 2)  # still even, half-frame
    with pytest.raises(ValueError, match="frame stride"):
        decode_wav(bytes(wav[:-2]))


def test_extensible_rejects_unknown_subformat_guid():
    wav = bytearray(encode_wav(_signal(n=1000), 16000, "pcm16",
                               extensible=True))
    # SubFormat GUID suffix lives at fmt payload + 8..24; clobber a byte
    i = bytes(wav).find(b"fmt ") + 8 + 24 + 5
    wav[i] ^= 0xFF
    with pytest.raises(ValueError, match="SubFormat"):
        decode_wav(bytes(wav))


def test_wav_fuzz_corrupt_bytes_never_escape_valueerror():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    x = _signal(n=1500)
    streams = [
        encode_wav(x, 16000, "pcm16"),
        encode_wav(np.stack([x, -x], axis=1), 8000, "pcm24", extensible=True),
        encode_wav(x, 22050, "ulaw"),
        encode_wav(x, 16000, "float32"),
        encode_wav(x, 16000, "alaw", extensible=True),
    ]

    @st.composite
    def mutation(draw):
        base = bytearray(streams[draw(st.integers(0, len(streams) - 1))])
        kind = draw(st.sampled_from(["flip", "truncate", "delete", "insert"]))
        if kind == "flip":
            for _ in range(draw(st.integers(1, 8))):
                base[draw(st.integers(0, len(base) - 1))] ^= draw(
                    st.integers(1, 255))
        elif kind == "truncate":
            del base[draw(st.integers(0, len(base) - 1)):]
        elif kind == "delete":
            i = draw(st.integers(0, len(base) - 2))
            del base[i:i + draw(st.integers(1, 16))]
        else:
            i = draw(st.integers(0, len(base) - 1))
            base[i:i] = draw(st.binary(min_size=1, max_size=16))
        return bytes(base)

    @settings(max_examples=300, deadline=None)
    @given(mutation())
    def run(data):
        try:
            out, sr = decode_wav(data)
        except ValueError:
            return  # the integrity-gate contract
        assert isinstance(out, np.ndarray) and out.dtype == np.float64
        assert out.ndim == 1 and sr > 0

    run()


def test_spark_feature_pass_mixes_wav_pcm16_and_stubs(spark):
    """One Arrow pass over wav + raw-pcm16 + unsupported-fmt rows: wav
    rows use the CONTAINER's sample rate (not the column), raw rows use
    the column, mp3 rows come back decode_ok=false."""
    from chronon_spark.fixtures import audio_features_np, encode_pcm16
    from chronon_spark.operators.multimodal import extract_audio_features

    x = _signal(n=4000, sr=16000, seed=3)
    rows = [
        ("wav_hdr_sr", bytes(encode_wav(x, 16000, "ulaw")), 999, "wav"),
        ("raw", bytes(encode_pcm16(x)), 16000, "pcm16"),
        ("stub", b"\xffmp3data", 16000, "mp3"),
        ("corrupt", bytes(encode_wav(x, 16000, "pcm16"))[:-3], 16000, "wav"),
    ]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary, "
                                     "sr int, fmt string")
    got = {r["audio_id"]: r for r in
           extract_audio_features(df).collect()}
    assert got["stub"]["decode_ok"] is False
    assert got["corrupt"]["decode_ok"] is False
    # wav row decoded at header sr=16000 despite the bogus column value
    dec, _ = decode_wav(rows[0][1])
    want = audio_features_np(dec, 16000)
    assert got["wav_hdr_sr"]["decode_ok"] is True
    assert got["wav_hdr_sr"]["duration_s"] == pytest.approx(
        want["duration_s"], abs=1e-12)
    assert got["wav_hdr_sr"]["spectral_centroid_hz"] == pytest.approx(
        want["spectral_centroid_hz"], abs=1e-9)
    assert got["raw"]["rms"] == pytest.approx(
        audio_features_np(np.frombuffer(rows[1][1], dtype="<i2")
                          .astype(np.float64) / 32767.0, 16000)["rms"],
        abs=1e-12)


def test_real_audio_fixture_contract():
    """Fixture invariants: every non-corrupt row's sidecars reproduce
    from its payload; every corrupt row's payload raises."""
    from chronon_spark.fixtures import decode_pcm16, gen_real_audio_rows

    from chronon_spark.flac_codec import decode_flac

    rows = gen_real_audio_rows(80, seed=91)
    encs = {r["enc"].replace("_corrupt", "") for r in rows}
    assert {"pcm16x2", "pcm8x1", "pcm24x2_ext", "float32x1", "ulawx1",
            "alawx2", "raw"} <= encs
    # fixture v2: compressed FLAC rows across the stereo modes
    assert {"flac_mono", "flac_independent", "flac_mid_side"} <= encs
    decoders = {"wav": decode_wav, "flac": decode_flac}
    n_corrupt = 0
    for r in rows:
        if not r["decode_ok"]:
            n_corrupt += 1
            with pytest.raises((ValueError, TypeError)):
                if r["fmt"] in decoders:
                    decoders[r["fmt"]](r["bytes"])
                else:
                    decode_pcm16(r["bytes"])
            assert r["rms"] is None
        else:
            if r["fmt"] in decoders:
                dec, sr = decoders[r["fmt"]](r["bytes"])
                assert sr == r["sr"]
            else:
                dec = decode_pcm16(r["bytes"])
            assert float(np.sqrt((dec * dec).mean())) == pytest.approx(
                r["rms"], abs=1e-12)
    assert n_corrupt >= 2
