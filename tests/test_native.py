"""Native C++ audio decoder parity vs the pure-NumPy codec, plus fallback
behavior.  Skipped cleanly when no compiler/library is available."""

import numpy as np
import pytest

from rawaudiovae_kelsey_tpu.io import write_wav
from rawaudiovae_kelsey_tpu.io.native import decode_mono, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="libtpuaudio.so not built"
)


@pytest.mark.parametrize("subtype", ["float32", "pcm16"])
@pytest.mark.parametrize("mono", ["mean", "first"])
def test_native_matches_numpy_stereo(tmp_path, subtype, mono):
    rng = np.random.default_rng(0)
    stereo = rng.uniform(-0.9, 0.9, (5000, 2)).astype(np.float32)
    p = tmp_path / "s.wav"
    write_wav(p, stereo, 48000, subtype=subtype)
    nat, sr_n = decode_mono(p, mono=mono)
    ref, sr_r = decode_mono(p, mono=mono, force_fallback=True)
    assert sr_n == sr_r == 48000
    assert nat.dtype == np.float32
    np.testing.assert_allclose(nat, ref, atol=1e-7)


def test_native_mono_float_fastpath(tmp_path):
    wave = np.sin(np.linspace(0, 50, 12345)).astype(np.float32) * 0.5
    p = tmp_path / "m.wav"
    write_wav(p, wave, 44100)
    nat, sr = decode_mono(p)
    assert sr == 44100
    np.testing.assert_array_equal(nat, wave)  # memcpy path: bit-exact


def test_native_pcm24(tmp_path):
    import struct

    vals = np.array([0, 8388607, -8388608, 123456], dtype=np.int64)
    payload = b"".join(struct.pack("<i", int(v) << 8)[1:4] for v in vals)
    fmt = struct.pack("<HHIIHH", 1, 1, 44100, 44100 * 3, 3, 24)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    riff = b"WAVE" + chunks
    p = tmp_path / "p24.wav"
    p.write_bytes(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    nat, _ = decode_mono(p)
    ref, _ = decode_mono(p, force_fallback=True)
    np.testing.assert_allclose(nat, ref, atol=1e-7)


def test_native_bad_file_falls_back_to_numpy_error(tmp_path):
    from rawaudiovae_kelsey_tpu.io import WavFormatError

    p = tmp_path / "bad.wav"
    p.write_bytes(b"RIFF\x00\x00\x00\x00JUNK")
    with pytest.raises(WavFormatError):
        decode_mono(p)


def test_extra_chunks(tmp_path):
    import struct

    wave = np.linspace(-0.5, 0.5, 777).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, wave, 22050)
    data = p.read_bytes()
    listchunk = b"LIST" + struct.pack("<I", 6) + b"INFOab"
    new = data[:12] + listchunk + data[12:]
    new = new[:4] + struct.pack("<I", len(new) - 8) + new[8:]
    p.write_bytes(new)
    nat, sr = decode_mono(p)
    assert sr == 22050
    np.testing.assert_array_equal(nat, wave)
