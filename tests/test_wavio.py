"""WAV codec + resampler tests (the framework's replacement for
librosa/torchaudio/soundfile, which the reference relied on)."""

import numpy as np
import pytest

from rawaudiovae_kelsey_tpu.io import (
    WavFormatError,
    load,
    read_wav,
    resample,
    to_mono,
    write_wav,
)


def test_float32_roundtrip(tmp_path):
    wave = np.sin(np.linspace(0, 20 * np.pi, 4410)).astype(np.float32) * 0.7
    p = tmp_path / "a.wav"
    write_wav(p, wave, 44100)
    out, sr = read_wav(p)
    assert sr == 44100
    np.testing.assert_array_equal(out[:, 0], wave)


def test_pcm16_roundtrip(tmp_path):
    wave = np.sin(np.linspace(0, 6 * np.pi, 1000)).astype(np.float32) * 0.5
    p = tmp_path / "a.wav"
    write_wav(p, wave, 22050, subtype="pcm16")
    out, sr = read_wav(p)
    assert sr == 22050
    np.testing.assert_allclose(out[:, 0], wave, atol=1.0 / 32768)


def test_stereo_roundtrip_and_mono(tmp_path):
    left = np.linspace(-0.5, 0.5, 256).astype(np.float32)
    right = np.linspace(0.5, -0.5, 256).astype(np.float32)
    stereo = np.stack([left, right], axis=1)
    p = tmp_path / "s.wav"
    write_wav(p, stereo, 48000)
    out, sr = read_wav(p)
    assert out.shape == (256, 2)
    np.testing.assert_array_equal(out, stereo)
    # mono modes: mean (librosa path) vs first channel (streaming path)
    np.testing.assert_allclose(to_mono(out, "mean"), (left + right) / 2, atol=1e-7)
    np.testing.assert_array_equal(to_mono(out, "first"), left)


def test_pcm24_decode(tmp_path):
    # hand-build a 24-bit PCM file via scipy-free struct packing
    import struct

    vals = np.array([0, 8388607, -8388608, 4194304], dtype=np.int64)
    payload = b"".join(
        struct.pack("<i", int(v) << 8)[1:4] for v in vals
    )
    fmt = struct.pack("<HHIIHH", 1, 1, 44100, 44100 * 3, 3, 24)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    riff = b"WAVE" + chunks
    p = tmp_path / "p24.wav"
    p.write_bytes(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    out, sr = read_wav(p)
    np.testing.assert_allclose(
        out[:, 0], vals.astype(np.float64) / 8388608.0, atol=1e-7
    )


def test_extra_chunks_skipped(tmp_path):
    import struct

    wave = np.ones(64, dtype=np.float32) * 0.25
    p = tmp_path / "a.wav"
    write_wav(p, wave, 44100)
    # splice a LIST chunk before fmt
    data = p.read_bytes()
    listchunk = b"LIST" + struct.pack("<I", 6) + b"INFOab"
    new = data[:12] + listchunk + data[12:]
    new = new[:4] + struct.pack("<I", len(new) - 8) + new[8:]
    p.write_bytes(new)
    out, sr = read_wav(p)
    np.testing.assert_array_equal(out[:, 0], wave)


def test_bad_file_raises(tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(b"not a wav file at all")
    with pytest.raises(WavFormatError):
        read_wav(p)


def test_resample_preserves_tone(tmp_path):
    sr1, sr2 = 48000, 44100
    t = np.arange(sr1) / sr1
    wave = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = resample(wave, sr1, sr2)
    assert abs(len(out) - sr2) <= 2
    # the dominant frequency should still be 440 Hz
    spec = np.abs(np.fft.rfft(out[: sr2 // 2 * 2]))
    freq = np.fft.rfftfreq(sr2 // 2 * 2, 1 / sr2)
    assert abs(freq[np.argmax(spec)] - 440.0) < 2.0


def test_resample_identity():
    wave = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
    np.testing.assert_array_equal(resample(wave, 44100, 44100), wave)


def test_load_contract(tmp_path):
    """load() mirrors librosa.load(f, sr=...): mono float32 at requested sr."""
    stereo = np.stack(
        [np.ones(4800, np.float32) * 0.3, np.ones(4800, np.float32) * 0.1], axis=1
    )
    p = tmp_path / "s.wav"
    write_wav(p, stereo, 48000)
    wave, sr = load(p, sr=44100)
    assert sr == 44100
    assert wave.ndim == 1
    assert wave.dtype == np.float32
    assert abs(len(wave) - 4410) <= 2
    # mean-mixdown: interior ≈ 0.2
    assert abs(float(np.median(wave)) - 0.2) < 1e-3


def test_fuzz_decoder_only_raises_wavformaterror(tmp_path):
    """Random and semi-structured garbage must decode or raise
    WavFormatError — never a different exception type (the drivers' dataset
    validator relies on this contract)."""
    import struct

    rng = np.random.default_rng(1)
    p = tmp_path / "f.wav"
    for trial in range(300):
        tag = int(rng.choice([1, 3, 0xFFFE, 7]))
        ch = int(rng.integers(0, 4))
        bits = int(rng.choice([8, 16, 24, 32, 64, 12]))
        fmt = struct.pack("<HHIIHH", tag, ch, 44100, 1, 1, bits)
        if tag == 0xFFFE and trial % 2:
            fmt += bytes(24)
        payload = rng.integers(0, 256, int(rng.integers(0, 50)),
                               dtype=np.uint8).tobytes()
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"data" + struct.pack("<I", int(rng.integers(0, 100)))
        chunks += payload
        riff = b"WAVE" + chunks
        p.write_bytes(b"RIFF" + struct.pack("<I", len(riff)) + riff)
        try:
            out, _ = read_wav(p)
            # garbage float payloads may decode to NaN/inf — that's the
            # dataset validator's job to flag, not the decoder's
            assert out.dtype == np.float32
        except WavFormatError:
            pass


def test_truncated_payload_drops_partial_sample(tmp_path):
    wave = np.linspace(-0.5, 0.5, 100).astype(np.float32)
    p = tmp_path / "t.wav"
    write_wav(p, wave, 44100)
    data = p.read_bytes()
    p.write_bytes(data[:-2])  # cut mid-sample
    out, sr = read_wav(p)
    assert len(out) == 99
    np.testing.assert_array_equal(out[:, 0], wave[:99])


def test_wav_info_header_only(tmp_path):
    wave = np.sin(np.linspace(0, 10, 54321)).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, wave, 22050)
    from rawaudiovae_kelsey_tpu.io import wav_info

    n, ch, sr, bits = wav_info(p)
    assert (n, ch, sr, bits) == (54321, 1, 22050, 32)
    # stereo pcm16
    stereo = np.zeros((1000, 2), np.float32)
    p2 = tmp_path / "s.wav"
    write_wav(p2, stereo, 48000, subtype="pcm16")
    assert wav_info(p2) == (1000, 2, 48000, 16)
    with pytest.raises(WavFormatError):
        (tmp_path / "bad.wav").write_bytes(b"nope")
        wav_info(tmp_path / "bad.wav")


def _raw_wav(tag: int, bits: int, payload: bytes, channels=1,
             rate=44100) -> bytes:
    import struct

    block = max(1, channels * (bits // 8))
    fmt = struct.pack("<HHIIHH", tag, channels, rate, rate * block,
                      block, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_wav_info_rejects_compressed_and_odd_depths(tmp_path):
    """Review regression: header-only consumers (validate fast scan, stream
    frame estimates) must see the same format gate as the decoders — an
    ADPCM or 12-bit file previously yielded a garbage frame count."""
    from rawaudiovae_kelsey_tpu.io import wav_info
    from rawaudiovae_kelsey_tpu.io.wavio import WavFormatError

    adpcm = tmp_path / "adpcm.wav"
    adpcm.write_bytes(_raw_wav(0x11, 4, b"\x00" * 256))
    with pytest.raises(WavFormatError, match="format tag"):
        wav_info(adpcm)
    odd = tmp_path / "odd.wav"
    odd.write_bytes(_raw_wav(1, 12, b"\x00" * 256))
    with pytest.raises(WavFormatError, match="bit depth"):
        wav_info(odd)


def test_native_unsupported_depth_matches_numpy(tmp_path):
    """Review regression: the C++ path must REJECT depths it can't decode
    (so the numpy codec raises), never return silence for them."""
    from rawaudiovae_kelsey_tpu.io.native import decode_mono, native_available
    from rawaudiovae_kelsey_tpu.io.wavio import WavFormatError

    if not native_available():
        pytest.skip("native lib unavailable")
    p = tmp_path / "odd.wav"
    p.write_bytes(_raw_wav(1, 12, b"\x11" * 256))
    with pytest.raises(WavFormatError):
        decode_mono(p)


def test_validate_deep_handles_empty_wav(tmp_path):
    """Review regression: a valid wav with an empty data chunk must be
    reported (silent), not crash the whole validation run."""
    import numpy as np

    from rawaudiovae_kelsey_tpu.data.validate import validate_dataset
    from rawaudiovae_kelsey_tpu.io import write_wav

    write_wav(tmp_path / "empty.wav", np.zeros(0, np.float32), 44100)
    write_wav(tmp_path / "ok.wav",
              np.sin(np.linspace(0, 30, 4000)).astype(np.float32), 44100)
    rep = validate_dataset(tmp_path, 44100, deep=True)
    assert "empty.wav" in rep.silent
    assert not rep.corrupt


def test_header_payload_split_equals_encode(tmp_path):
    """wav_header_bytes + encode_wav_payload (the HTTP streaming writer's
    primitives) must concatenate to exactly encode_wav_bytes, for both
    subtypes, mono and stereo, and chunked payload emission."""
    from rawaudiovae_kelsey_tpu.io.wavio import (
        encode_wav_bytes,
        encode_wav_payload,
        wav_header_bytes,
    )

    rng = np.random.default_rng(0)
    for subtype in ("float32", "pcm16"):
        for shape in ((777,), (777, 2), (0,)):
            s = rng.uniform(-1, 1, shape).astype(np.float32)
            ch = s.shape[1] if s.ndim == 2 else 1
            whole = encode_wav_bytes(s, 44100, subtype)
            split = (wav_header_bytes(s.shape[0], 44100, ch, subtype)
                     + encode_wav_payload(s, subtype))
            assert whole == split, (subtype, shape)
        # progressive chunk emission
        s = rng.uniform(-1, 1, 777).astype(np.float32)
        parts = [encode_wav_payload(s[i:i + 100], subtype)
                 for i in range(0, len(s), 100)]
        assert (wav_header_bytes(len(s), 44100, 1, subtype)
                + b"".join(parts)) == encode_wav_bytes(s, 44100, subtype)
